"""Terrain subsystem tests: generator grids/origins, MJCF hfield roundtrip,
hfield narrowphase physics, and importer curriculum state updates.

Mirrors the coverage the reference gets from its terrain tests plus the
TPU-specific heightfield collision path (no reference analog — mujoco-warp
disables heightfields, reference terrains/config.py:29-52).
"""

import copy

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.terrains.config import ROUGH_TERRAINS_CFG
from mjlab_tpu.terrains.importer import TerrainImporter, TerrainImporterCfg
from mjlab_tpu.terrains.primitive_terrains import (
    BoxFlatTerrainCfg,
    BoxPyramidStairsTerrainCfg,
    BoxRandomGridTerrainCfg,
)
from mjlab_tpu.terrains.heightfield_terrains import (
    HfPyramidSlopedTerrainCfg,
    HfRandomUniformTerrainCfg,
    HfWaveTerrainCfg,
)
from mjlab_tpu.terrains.terrain_generator import TerrainGenerator, TerrainGeneratorCfg


def small_cfg(**kw):
    base = dict(
        size=(4.0, 4.0),
        border_width=2.0,
        num_rows=3,
        num_cols=4,
        seed=0,
        resolution=0.1,
        sub_terrains={
            "flat": BoxFlatTerrainCfg(proportion=0.5),
            "stairs": BoxPyramidStairsTerrainCfg(
                proportion=0.5,
                step_height_range=(0.0, 0.2),
                step_width=0.3,
                platform_width=1.0,
                border_width=0.5,
            ),
        },
    )
    base.update(kw)
    return TerrainGeneratorCfg(**base)


class TestGenerator:
    def test_grid_shape_and_extent(self):
        gen = TerrainGenerator(small_cfg())
        nx = 3 * 40 + 2 * 20 + 1
        ny = 4 * 40 + 2 * 20 + 1
        assert gen.heights.shape == (nx, ny)
        assert gen.x_min == pytest.approx(-3 * 4 / 2 - 2)
        assert gen.y_max == pytest.approx(4 * 4 / 2 + 2)

    def test_curriculum_difficulty_increases_along_rows(self):
        gen = TerrainGenerator(small_cfg(curriculum=True))
        # stairs columns: platform (origin z) grows with row index
        z = gen.terrain_origins[:, :, 2]
        stairs_cols = [c for c in range(4) if z[:, c].max() > 0]
        assert stairs_cols, "no stairs column generated"
        for c in stairs_cols:
            assert z[-1, c] > z[0, c]

    def test_curriculum_column_types_follow_proportions(self):
        gen = TerrainGenerator(small_cfg(curriculum=True))
        z = gen.terrain_origins[:, :, 2]
        # 0.5/0.5 proportions over 4 columns: first 2 flat, last 2 stairs
        assert np.allclose(z[:, :2], 0.0)
        assert (z[-1, 2:] > 0).all()

    def test_origins_inside_sub_terrains(self):
        gen = TerrainGenerator(small_cfg())
        for r in range(3):
            for c in range(4):
                ox, oy, _ = gen.terrain_origins[r, c]
                assert -6 + r * 4 <= ox <= -6 + (r + 1) * 4
                assert -8 + c * 4 <= oy <= -8 + (c + 1) * 4

    def test_mjcf_roundtrip_elevation(self):
        gen = TerrainGenerator(small_cfg(curriculum=True))
        spec = mujoco.MjSpec()
        gen.compile(spec)
        mj = spec.compile()
        assert mj.nhfield == 1
        nr, nc = int(mj.hfield_nrow[0]), int(mj.hfield_ncol[0])
        assert (nr, nc) == (gen.heights.shape[1], gen.heights.shape[0])
        gid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_GEOM, "terrain")
        sz = mj.hfield_size[0]
        dat = mj.hfield_data.reshape(nr, nc)
        gp = mj.geom_pos[gid]
        res = gen.cfg.resolution
        rng = np.random.default_rng(1)
        for _ in range(20):
            i = rng.integers(0, gen.heights.shape[0])
            j = rng.integers(0, gen.heights.shape[1])
            x = gen.x_min + i * res
            y = gen.y_min + j * res
            ix = round((x - gp[0]) / sz[0] / 2 * (nc - 1) + (nc - 1) / 2)
            iy = round((y - gp[1]) / sz[1] / 2 * (nr - 1) + (nr - 1) / 2)
            world_h = gp[2] + dat[iy, ix] * sz[2]
            assert world_h == pytest.approx(gen.heights[i, j], abs=1e-3)

    def test_all_sub_terrain_families(self):
        cfg = small_cfg(
            sub_terrains={
                "grid": BoxRandomGridTerrainCfg(
                    proportion=1.0, grid_width=0.45,
                    grid_height_range=(0.05, 0.2), platform_width=1.0,
                ),
                "slope": HfPyramidSlopedTerrainCfg(
                    proportion=1.0, slope_range=(0.1, 0.4), platform_width=1.0,
                ),
                "rough": HfRandomUniformTerrainCfg(
                    proportion=1.0, noise_range=(0.02, 0.1), noise_step=0.02,
                ),
                "wave": HfWaveTerrainCfg(
                    proportion=1.0, amplitude_range=(0.05, 0.2), num_waves=2,
                ),
            }
        )
        gen = TerrainGenerator(cfg)
        assert np.isfinite(gen.heights).all()
        assert np.abs(gen.heights).max() > 0.01

    def test_default_rough_cfg(self):
        cfg = copy.deepcopy(ROUGH_TERRAINS_CFG)
        cfg.num_rows, cfg.num_cols, cfg.border_width = 2, 3, 1.0
        gen = TerrainGenerator(cfg)
        assert np.isfinite(gen.heights).all()


class TestImporterState:
    def make(self, num_envs=8):
        cfg = TerrainImporterCfg(
            terrain_type="generator",
            terrain_generator=small_cfg(curriculum=True),
            max_init_terrain_level=1,
        )
        imp = TerrainImporter(cfg, num_envs)

        class _Ctx:
            terrain_state = {}

        ctx = _Ctx()
        imp.initialize(num_envs, ctx)
        ctx.terrain_state = imp.init_state(num_envs, jax.random.PRNGKey(0))
        return imp, ctx

    def test_init_state(self):
        imp, ctx = self.make()
        st = ctx.terrain_state
        assert st["levels"].shape == (8,)
        assert int(st["levels"].max()) <= 1  # max_init_terrain_level
        assert int(st["types"].max()) <= 3
        np.testing.assert_allclose(
            np.asarray(st["origins"]),
            np.asarray(imp.terrain_origins)[
                np.asarray(st["levels"]), np.asarray(st["types"])
            ],
        )

    def test_update_env_origins_promotion(self):
        imp, ctx = self.make()
        lv0 = np.asarray(ctx.terrain_state["levels"]).copy()
        mask = jnp.ones(8, bool)
        up = jnp.ones(8, bool)
        down = jnp.zeros(8, bool)
        imp.update_env_origins(mask, up, down, jax.random.PRNGKey(1))
        lv1 = np.asarray(ctx.terrain_state["levels"])
        # promoted by one or wrapped to a random level when maxed out
        assert ((lv1 == lv0 + 1) | (lv0 + 1 >= imp.max_terrain_level)).all()
        assert (lv1 < imp.max_terrain_level).all()

    def test_update_masked(self):
        imp, ctx = self.make()
        lv0 = np.asarray(ctx.terrain_state["levels"]).copy()
        mask = jnp.zeros(8, bool).at[0].set(True)
        imp.update_env_origins(
            mask, jnp.ones(8, bool), jnp.zeros(8, bool), jax.random.PRNGKey(1)
        )
        lv1 = np.asarray(ctx.terrain_state["levels"])
        assert (lv1[1:] == lv0[1:]).all()

    def test_randomize_env_origins(self):
        imp, ctx = self.make()
        imp.randomize_env_origins(jnp.ones(8, bool), jax.random.PRNGKey(2))
        st = ctx.terrain_state
        assert int(st["levels"].max()) < imp.max_terrain_level
        np.testing.assert_allclose(
            np.asarray(st["origins"]),
            np.asarray(imp.terrain_origins)[
                np.asarray(st["levels"]), np.asarray(st["types"])
            ],
        )


class TestHfieldPhysics:
    def _drop(self, geom_xml, h_fn):
        from mjlab_tpu.phys.model import put_model
        from mjlab_tpu.phys.data import make_data
        from mjlab_tpu.phys import forward as F

        XML = f"""
        <mujoco>
          <asset><hfield name="hf" nrow="41" ncol="41" size="2 2 0.5 0.5"/></asset>
          <worldbody>
            <body name="terrain"><geom name="terrain" type="hfield" hfield="hf"/></body>
            <body name="obj" pos="0.1 0.05 1.0"><freejoint/>{geom_xml}</body>
          </worldbody>
        </mujoco>"""
        spec = mujoco.MjSpec.from_string(XML)
        x = np.linspace(-1, 1, 41)
        xx, yy = np.meshgrid(x, x, indexing="ij")
        h = h_fn(xx, yy)
        spec.hfields[0].userdata = h.T.reshape(-1)
        mj = spec.compile()
        m = put_model(mj, dtype=jnp.float32)
        d = make_data(m, dtype=jnp.float32)
        d = d.replace(qpos=m.qpos0)
        step = jax.jit(lambda m, d: F.step(m, d))
        for _ in range(300):
            d = step(m, d)
        q = np.asarray(d.qpos)
        assert np.isfinite(q).all()
        return q, h

    def test_sphere_rests_on_flat_hfield(self):
        q, h = self._drop(
            '<geom name="g" type="sphere" size="0.05" mass="1"/>',
            lambda xx, yy: np.zeros_like(xx),
        )
        assert q[2] == pytest.approx(0.05, abs=5e-3)

    def test_capsule_rests_on_flat_hfield(self):
        q, h = self._drop(
            '<geom name="g" type="capsule" size="0.03 0.1" mass="1" euler="90 0 0"/>',
            lambda xx, yy: np.zeros_like(xx),
        )
        assert q[2] == pytest.approx(0.03, abs=5e-3)

    def test_box_rests_on_flat_hfield(self):
        q, h = self._drop(
            '<geom name="g" type="box" size="0.1 0.05 0.02" mass="1"/>',
            lambda xx, yy: np.zeros_like(xx),
        )
        assert q[2] == pytest.approx(0.02, abs=5e-3)

    def test_sphere_on_plateau(self):
        # MuJoCo's compiler renormalizes hfield userdata to [0,1]; a plateau
        # of normalized height 1.0 sits at size[2] = 0.5 m
        q, h = self._drop(
            '<geom name="g" type="sphere" size="0.05" mass="1"/>',
            lambda xx, yy: ((np.abs(xx) < 0.6) & (np.abs(yy) < 0.6)) * 0.5,
        )
        assert q[2] == pytest.approx(0.55, abs=1e-2)

    def test_sphere_rolls_down_slope(self):
        q, h = self._drop(
            '<geom name="g" type="sphere" size="0.1" mass="1"/>',
            lambda xx, yy: 0.4 * np.clip(1 - np.abs(xx) - 0.5 * np.abs(yy), 0, 1),
        )
        # rolled away from the apex
        assert abs(q[0]) + abs(q[1]) > 0.3
