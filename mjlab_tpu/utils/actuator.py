"""Electric-actuator physics helpers (reference src/mjlab/utils/actuator.py)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple


@dataclass(frozen=True)
class ElectricActuator:
    reflected_inertia: float
    velocity_limit: float
    effort_limit: float


def reflected_inertia(rotor_inertia: float, gear_ratio: float) -> float:
    """Rotor inertia reflected through a single-stage gearbox: I * G^2."""
    return rotor_inertia * gear_ratio**2


def reflected_inertia_from_two_stage_planetary(
    rotor_inertia: tuple[float, float, float],
    gear_ratio: tuple[float, float, float],
) -> float:
    """Reflected inertia of a two-stage planetary gearbox: each stage's
    inertia scaled by the square of the downstream ratio product."""
    assert gear_ratio[0] == 1
    return (
        rotor_inertia[0] * (gear_ratio[1] * gear_ratio[2]) ** 2
        + rotor_inertia[1] * gear_ratio[2] ** 2
        + rotor_inertia[2]
    )


def rpm_to_rad(rpm: float) -> float:
    return rpm * 2.0 * math.pi / 60.0


class LinearJointProperties(NamedTuple):
    armature: float
    velocity_limit: float
    effort_limit: float


def reflect_rotary_to_linear(
    armature_rotary: float,
    velocity_limit_rotary: float,
    effort_limit_rotary: float,
    transmission_ratio: float,
) -> LinearJointProperties:
    """Reflect rotary motor specs through a linear transmission
    (m = I/r^2, v = r*w, F = tau/r)."""
    return LinearJointProperties(
        armature_rotary / transmission_ratio**2,
        velocity_limit_rotary * transmission_ratio,
        effort_limit_rotary / transmission_ratio,
    )
