"""Procedural terrain generator (reference src/mjlab/terrains/terrain_generator.py:47-260).

TPU-first re-design: every sub-terrain — including the reference's box
(primitive) family — is generated as a *height patch* (a numpy elevation
grid at a fixed horizontal resolution) instead of a pile of MJCF box geoms.
The generator assembles all patches into ONE global heightfield, emitted as
a single MuJoCo ``hfield`` asset + geom for host-side compilation and
rendering. The same elevation grid is what the device narrowphase samples
(mjlab_tpu/phys/collision.py hfield kernels): terrain collision cost is
O(robot geoms) with static shapes, independent of terrain complexity —
the TPU answer to the reference's thousands of terrain box geoms colliding
through a CUDA broadphase.

Semantics mirrored from the reference generator:
- grid of num_rows x num_cols sub-terrains, rows = difficulty axis,
  centered on the world origin, with a flat border around it
  (terrain_generator.py:149-235),
- curriculum mode: difficulty = (row + u)/num_rows; column's sub-terrain
  type chosen by cumulative proportions (terrain_generator.py:169-176),
- random mode: type sampled by proportion, difficulty uniform in range
  (terrain_generator.py:125-147),
- per-sub-terrain spawn origins -> terrain_origins[row, col] (L148).
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field
from typing import Literal

import mujoco
import numpy as np


@dataclass
class TerrainPatch:
    """Output of one sub-terrain: elevation grid + spawn origin.

    ``heights`` has shape (npx, npy): index 0 runs along +x (terrain rows),
    index 1 along +y, in meters, relative to the sub-terrain's base plane.
    ``origin`` is the spawn point relative to the sub-terrain corner.
    """

    heights: np.ndarray
    origin: np.ndarray


@dataclass
class SubTerrainCfg(abc.ABC):
    """Base sub-terrain config (reference terrain_generator.py:30-43)."""

    proportion: float = 1.0
    size: tuple[float, float] = (10.0, 10.0)
    # horizontal resolution of the rasterized height patch; stamped by the
    # generator from TerrainGeneratorCfg.resolution.
    resolution: float = 0.1

    def grid_shape(self) -> tuple[int, int]:
        nx = int(round(self.size[0] / self.resolution))
        ny = int(round(self.size[1] / self.resolution))
        return nx + 1, ny + 1

    def xy_grid(self) -> tuple[np.ndarray, np.ndarray]:
        """Meshgrid of sample coordinates in [0, size]."""
        nx, ny = self.grid_shape()
        x = np.linspace(0.0, self.size[0], nx)
        y = np.linspace(0.0, self.size[1], ny)
        return np.meshgrid(x, y, indexing="ij")

    @abc.abstractmethod
    def function(
        self, difficulty: float, rng: np.random.Generator
    ) -> TerrainPatch:
        raise NotImplementedError


@dataclass(kw_only=True)
class TerrainGeneratorCfg:
    """Mirrors reference TerrainGeneratorCfg (terrain_generator.py:47-60)."""

    seed: int | None = None
    curriculum: bool = False
    size: tuple[float, float]
    border_width: float = 0.0
    border_height: float = 1.0
    num_rows: int = 1
    num_cols: int = 1
    color_scheme: Literal["height", "random", "none"] = "height"
    sub_terrains: dict[str, SubTerrainCfg] = field(default_factory=dict)
    difficulty_range: tuple[float, float] = (0.0, 1.0)
    add_lights: bool = False
    # TPU addition: horizontal resolution of the global heightfield.
    resolution: float = 0.1


class TerrainGenerator:
    """Builds the global heightfield + spawn-origin grid."""

    def __init__(self, cfg: TerrainGeneratorCfg):
        if not cfg.sub_terrains:
            raise ValueError("At least one sub_terrain must be specified.")
        self.cfg = cfg
        for sub in cfg.sub_terrains.values():
            sub.size = cfg.size
            sub.resolution = cfg.resolution
        seed = cfg.seed if cfg.seed is not None else np.random.randint(0, 10000)
        self.np_rng = np.random.default_rng(seed)

        # cells per sub-terrain
        self._cx = int(round(cfg.size[0] / cfg.resolution))
        self._cy = int(round(cfg.size[1] / cfg.resolution))
        self._bx = int(round(cfg.border_width / cfg.resolution))
        self._by = int(round(cfg.border_width / cfg.resolution))

        nx = cfg.num_rows * self._cx + 2 * self._bx + 1
        ny = cfg.num_cols * self._cy + 2 * self._by + 1
        self.heights = np.zeros((nx, ny), np.float32)
        self.terrain_origins = np.zeros((cfg.num_rows, cfg.num_cols, 3))

        if cfg.curriculum:
            self._generate_curriculum()
        else:
            self._generate_random()

        # world extent: grid centered at origin (terrain_generator.py:178-193)
        self.x_min = -cfg.num_rows * cfg.size[0] * 0.5 - cfg.border_width
        self.y_min = -cfg.num_cols * cfg.size[1] * 0.5 - cfg.border_width
        self.x_max = self.x_min + (nx - 1) * cfg.resolution
        self.y_max = self.y_min + (ny - 1) * cfg.resolution

    # -- grid assembly --

    def _proportions(self) -> np.ndarray:
        p = np.array([s.proportion for s in self.cfg.sub_terrains.values()])
        return p / p.sum()

    def _place(self, row: int, col: int, difficulty: float, sub: SubTerrainCfg):
        patch = sub.function(difficulty, self.np_rng)
        nx, ny = sub.grid_shape()
        assert patch.heights.shape == (nx, ny), (
            f"sub-terrain produced {patch.heights.shape}, expected {(nx, ny)}"
        )
        i0 = self._bx + row * self._cx
        j0 = self._by + col * self._cy
        self.heights[i0 : i0 + nx, j0 : j0 + ny] = patch.heights
        corner = np.array(
            [
                -self.cfg.num_rows * self.cfg.size[0] * 0.5 + row * self.cfg.size[0],
                -self.cfg.num_cols * self.cfg.size[1] * 0.5 + col * self.cfg.size[1],
                0.0,
            ]
        )
        self.terrain_origins[row, col] = corner + patch.origin

    def _generate_random(self):
        p = self._proportions()
        subs = list(self.cfg.sub_terrains.values())
        lo, hi = self.cfg.difficulty_range
        for row in range(self.cfg.num_rows):
            for col in range(self.cfg.num_cols):
                k = self.np_rng.choice(len(p), p=p)
                difficulty = self.np_rng.uniform(lo, hi)
                self._place(row, col, difficulty, subs[k])

    def _generate_curriculum(self):
        p = self._proportions()
        subs = list(self.cfg.sub_terrains.values())
        csum = np.cumsum(p)
        col_type = [
            int(np.min(np.where(c / self.cfg.num_cols + 0.001 < csum)[0]))
            for c in range(self.cfg.num_cols)
        ]
        lo, hi = self.cfg.difficulty_range
        for col in range(self.cfg.num_cols):
            for row in range(self.cfg.num_rows):
                d = (row + self.np_rng.uniform()) / self.cfg.num_rows
                self._place(row, col, lo + (hi - lo) * d, subs[col_type[col]])

    # -- spec emission --

    def compile(self, spec: mujoco.MjSpec) -> None:
        """Add the global hfield asset + geom to the spec.

        MuJoCo hfield data is normalized to [0,1] with elevation =
        data*size[2]; we normalize here and offset the geom so world
        elevations match ``self.heights`` exactly.
        """
        h = self.heights
        h_min = float(h.min())
        h_max = float(h.max())
        zscale = max(h_max - h_min, 1e-4)
        norm = (h - h_min) / zscale

        nx, ny = h.shape
        # mjModel hfield layout: row-major (nrow, ncol) with col -> x,
        # row -> y; our heights are (x, y) so transpose.
        hf = spec.add_hfield(
            name="terrain",
            size=[
                (self.x_max - self.x_min) / 2,
                (self.y_max - self.y_min) / 2,
                zscale,
                max(self.cfg.border_height, 0.1),
            ],
            nrow=ny,
            ncol=nx,
            userdata=norm.T.reshape(-1).astype(np.float64),
        )
        del hf
        body = spec.worldbody.add_body(name="terrain")
        g = body.add_geom(
            name="terrain",
            type=mujoco.mjtGeom.mjGEOM_HFIELD,
            hfieldname="terrain",
            pos=[
                (self.x_min + self.x_max) / 2,
                (self.y_min + self.y_max) / 2,
                h_min,
            ],
            rgba=(0.45, 0.45, 0.45, 1.0),
        )
        del g
        if self.cfg.add_lights:
            spec.worldbody.add_light(
                pos=(0.0, 0.0, max(self.x_max, self.y_max) * 0.6),
                directional=True,
            )
