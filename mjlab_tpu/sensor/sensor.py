"""Sensor base interface (reference src/mjlab/sensor/sensor.py:20-111)."""

from __future__ import annotations

from abc import ABC
from dataclasses import dataclass
from typing import TYPE_CHECKING

import mujoco

if TYPE_CHECKING:
    from mjlab_tpu.scene.scene import Scene


@dataclass(kw_only=True)
class SensorCfg(ABC):
    def build(self, scene: "Scene") -> "Sensor":
        raise NotImplementedError


class Sensor(ABC):
    def __init__(self, scene: "Scene"):
        self.scene = scene
        self.name: str = ""

    def edit_spec(self, spec: mujoco.MjSpec) -> None:
        """Add sensor elements to the merged scene spec (host)."""

    def initialize(self, mj_model, num_envs: int, rng, ctx) -> None:
        """Resolve indices and allocate per-env state in ctx.sensor_states."""

    def update(self, ctx, dt: float) -> None:
        """Per-physics-substep state update (inside jit)."""

    def reset(self, ctx, mask) -> None:
        """Reset per-env state for masked envs (inside jit)."""

    @property
    def data(self):
        raise NotImplementedError
