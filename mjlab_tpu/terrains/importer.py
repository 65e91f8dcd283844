"""Terrain importer: flat plane and (later) generated sub-terrain grids.

Round-1 scope of reference src/mjlab/terrains/terrain_importer.py:55: plane
terrain with grid env-origin assignment; the procedural generator
(primitive box terrains, curriculum rows) lands in a follow-up.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp
import mujoco
import numpy as np


@dataclass
class TerrainImporterCfg:
    terrain_type: Literal["plane", "generator"] = "plane"
    terrain_generator: object | None = None
    env_spacing: float = 2.0
    max_init_terrain_level: int | None = None
    friction: tuple[float, float, float] = (1.0, 0.005, 0.0001)

    def __post_init__(self):
        if self.terrain_type == "generator" and self.terrain_generator is None:
            raise ValueError("generator terrain requires terrain_generator")


class TerrainImporter:
    def __init__(self, cfg: TerrainImporterCfg, num_envs: int):
        self.cfg = cfg
        self.num_envs = num_envs
        self.spec = mujoco.MjSpec()
        if cfg.terrain_type == "plane":
            g = self.spec.worldbody.add_geom(name="terrain")
            g.type = mujoco.mjtGeom.mjGEOM_PLANE
            g.size = [0.0, 0.0, 1.0]
            g.friction[:] = cfg.friction
            self._origins = None  # grid origins, built in initialize
        else:
            raise NotImplementedError("generator terrains: follow-up round")
        self.terrain_levels = None
        self.terrain_types = None

    def initialize(self, num_envs: int) -> None:
        side = int(np.ceil(np.sqrt(num_envs)))
        idx = np.arange(num_envs)
        row, col = idx // side, idx % side
        origins = np.zeros((num_envs, 3), np.float32)
        origins[:, 0] = (row - (side - 1) / 2) * self.cfg.env_spacing
        origins[:, 1] = (col - (side - 1) / 2) * self.cfg.env_spacing
        self._origins = jnp.asarray(origins)

    @property
    def env_origins(self) -> jax.Array:
        assert self._origins is not None
        return self._origins

    def update_env_origins(self, env_ids, move_up, move_down):
        """Curriculum level promotion: no-op for plane terrain."""

    def randomize_env_origins(self, env_ids, rng):
        """No-op for plane terrain."""
