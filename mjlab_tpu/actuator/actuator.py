"""Actuator base interface.

Config surface mirrors the reference (reference src/mjlab/actuator/
actuator.py:17-175); the runtime contract is functional: actuators carry
their per-env state (gains, delay buffers, ...) in a pytree that lives in
the env state, and ``compute`` is a pure function executed inside the jitted
control step (batched over envs, at physics rate).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any

import jax
import mujoco
import numpy as np

from mjlab_tpu.utils.struct import pytree

if TYPE_CHECKING:
    from mjlab_tpu.entity.entity import Entity


@pytree
class ActuatorCmd:
    """Batched actuator command (num_envs, num_joints_in_group)."""

    position_target: jax.Array
    velocity_target: jax.Array
    effort_target: jax.Array
    joint_pos: jax.Array
    joint_vel: jax.Array


@dataclass(kw_only=True)
class ActuatorCfg(ABC):
    joint_names_expr: tuple[str, ...]
    """Joint names or regex expressions in this actuator group."""
    armature: float = 0.0
    """Reflected rotor inertia added to the joint."""
    frictionloss: float = 0.0
    """Dry friction force limit on the joint."""

    @abstractmethod
    def build(
        self, entity: "Entity", joint_ids: list[int], joint_names: list[str]
    ) -> "Actuator":
        raise NotImplementedError


class Actuator(ABC):
    """Host-side actuator object; runtime state is a separate pytree."""

    is_passthrough: bool = False  # builtin actuators: ctrl = target directly

    def __init__(self, entity, joint_ids: list[int], joint_names: list[str]):
        self.entity = entity
        self.joint_ids = list(joint_ids)  # local (entity) joint indices
        self.joint_names = list(joint_names)
        self.ctrl_ids: np.ndarray | None = None  # global actuator ids
        self._mjs_actuators: list = []

    # -- host-side hooks --

    def edit_spec(self, spec: mujoco.MjSpec, joint_names: list[str]) -> None:
        """Add actuator elements / set joint properties on the spec."""

    def initialize(self, num_envs: int, rng) -> Any:
        """Return the actuator's initial runtime state pytree (or None)."""
        return None

    # -- runtime (pure, inside jit, physics rate) --

    def compute(self, state: Any, cmd: ActuatorCmd):
        """Return (new_state, ctrl) where ctrl is the per-actuator control
        value written to data.ctrl (target for builtins, torque for motor-
        backed custom actuators)."""
        return state, cmd.effort_target

    def reset(self, state: Any, mask: jax.Array, rng) -> Any:
        """Reset per-env state for masked envs."""
        return state
