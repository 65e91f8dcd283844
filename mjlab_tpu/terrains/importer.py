"""Terrain importer (reference src/mjlab/terrains/terrain_importer.py:55).

Supports "plane" (infinite ground plane, grid env origins) and "generator"
(procedural sub-terrain grid -> global heightfield, curriculum env origins).

TPU-native state handling: per-env terrain levels/types/origins are traced
state (EnvState.terrain_state), updated by PURE masked functions — the
curriculum promotion that the reference does with in-place torch indexing
(terrain_importer.py:186-223) is a jnp.where over the whole batch here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.terrains.terrain_generator import TerrainGenerator, TerrainGeneratorCfg


@dataclass
class TerrainImporterCfg:
    terrain_type: Literal["plane", "generator"] = "plane"
    terrain_generator: TerrainGeneratorCfg | None = None
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
        self.generator: TerrainGenerator | None = None
        self._origins = None

        if cfg.terrain_type == "plane":
            # geoms live in a body named "terrain" so contact sensors can
            # target the terrain uniformly across plane/generator modes
            body = self.spec.worldbody.add_body(name="terrain")
            g = body.add_geom(name="terrain")
            g.type = mujoco.mjtGeom.mjGEOM_PLANE
            g.size = [0.0, 0.0, 1.0]
            g.friction[:] = cfg.friction
        else:
            assert cfg.terrain_generator is not None
            self.generator = TerrainGenerator(cfg.terrain_generator)
            self.generator.compile(self.spec)
            for g in self.spec.geoms:
                g.friction[:] = cfg.friction
            # (rows, cols, 3) spawn origins, static constant
            self.terrain_origins = jnp.asarray(
                self.generator.terrain_origins, jnp.float32
            )

        self._ctx = None  # set by Scene.initialize

    # -- host-side init --

    def initialize(self, num_envs: int, ctx=None) -> None:
        self._ctx = ctx
        if self.generator is None:
            side = int(np.ceil(np.sqrt(num_envs)))
            idx = np.arange(num_envs)
            row, col = idx // side, idx % side
            origins = np.zeros((num_envs, 3), np.float32)
            origins[:, 0] = (row - (side - 1) / 2) * self.cfg.env_spacing
            origins[:, 1] = (col - (side - 1) / 2) * self.cfg.env_spacing
            self._origins = jnp.asarray(origins)

    def init_state(self, num_envs: int, rng) -> dict:
        """Initial terrain state (reference _compute_env_origins_curriculum,
        terrain_importer.py:225-245): random init level up to
        max_init_terrain_level, types assigned round-robin by env index."""
        if self.generator is None:
            return {}
        rows, cols = self.terrain_origins.shape[:2]
        max_init = rows - 1
        if self.cfg.max_init_terrain_level is not None:
            max_init = min(self.cfg.max_init_terrain_level, rows - 1)
        levels = jax.random.randint(rng, (num_envs,), 0, max_init + 1)
        types = (jnp.arange(num_envs) // max(num_envs / cols, 1e-9)).astype(
            jnp.int32
        )
        types = jnp.clip(types, 0, cols - 1)
        origins = self.terrain_origins[levels, types]
        return {
            "levels": levels.astype(jnp.int32),
            "types": types,
            "origins": origins,
        }

    # -- traced accessors / pure updates --

    @property
    def max_terrain_level(self) -> int:
        assert self.generator is not None
        return int(self.terrain_origins.shape[0])

    @property
    def env_origins(self) -> jax.Array:
        if self.generator is None:
            assert self._origins is not None
            return self._origins
        assert self._ctx is not None, "generator terrain needs scene ctx"
        return self._ctx.terrain_state["origins"]

    @property
    def terrain_levels(self) -> jax.Array:
        assert self._ctx is not None
        return self._ctx.terrain_state["levels"]

    @property
    def terrain_types(self) -> jax.Array:
        assert self._ctx is not None
        return self._ctx.terrain_state["types"]

    def update_env_origins(self, mask, move_up, move_down, rng) -> None:
        """Masked level promotion (reference terrain_importer.py:186-202):
        +1 on move_up, -1 on move_down; envs that max out are re-assigned a
        random level (keeps hard rows populated without saturating)."""
        if self.generator is None or self._ctx is None:
            return
        st = self._ctx.terrain_state
        rows = self.max_terrain_level
        levels = st["levels"] + jnp.where(
            mask, move_up.astype(jnp.int32) - move_down.astype(jnp.int32), 0
        )
        rand_levels = jax.random.randint(rng, levels.shape, 0, rows)
        levels = jnp.where(levels >= rows, rand_levels, jnp.clip(levels, 0))
        origins = self.terrain_origins[levels, st["types"]]
        self._ctx.terrain_state = {
            "levels": levels,
            "types": st["types"],
            "origins": origins,
        }

    def randomize_env_origins(self, mask, rng) -> None:
        """Masked random re-assignment of level AND type (reference
        terrain_importer.py:204-223), for play/eval variety."""
        if self.generator is None or self._ctx is None:
            return
        st = self._ctx.terrain_state
        rows, cols = self.terrain_origins.shape[:2]
        k1, k2 = jax.random.split(rng)
        new_levels = jax.random.randint(k1, st["levels"].shape, 0, rows)
        new_types = jax.random.randint(k2, st["types"].shape, 0, cols)
        levels = jnp.where(mask, new_levels, st["levels"])
        types = jnp.where(mask, new_types, st["types"])
        self._ctx.terrain_state = {
            "levels": levels,
            "types": types,
            "origins": self.terrain_origins[levels, types],
        }
