"""Domain randomization (reference tests/test_domain_randomization.py:20-80):
startup randomize_field expands the model field with a leading env axis,
lands values in range, and draws different values per env."""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def g1_env():
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv

    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = 4
    env = ManagerBasedRlEnv(cfg)
    yield env
    env.close()


def test_friction_field_env_expanded(g1_env):
    gf = g1_env.ctx.model.geom_friction
    assert gf.ndim == 3 and gf.shape[0] == 4  # (E, ngeom, 3)


def test_friction_values_in_range_and_distinct(g1_env):
    env = g1_env
    # the startup event randomizes the robot foot geoms' sliding friction
    ev = env.cfg.events["foot_friction"]
    lo, hi = ev.params["ranges"]
    asset_cfg = ev.params["asset_cfg"]
    robot = env.scene["robot"]
    ids, _ = robot.find_geoms(list(asset_cfg.geom_names))
    gids = np.asarray(robot.indexing.geom_ids)[np.asarray(ids)]
    vals = np.asarray(env.ctx.model.geom_friction)[:, gids, 0]  # (E, n)
    assert (vals >= lo - 1e-6).all() and (vals <= hi + 1e-6).all()
    # different draws across envs
    assert np.unique(vals.round(6), axis=0).shape[0] > 1


def test_unrandomized_fields_stay_unbatched(g1_env):
    m = g1_env.ctx.model
    # mass was not randomized by this task: no env axis
    assert m.body_mass.ndim == 1


def test_non_dr_geoms_keep_default_friction(g1_env):
    env = g1_env
    ev = env.cfg.events["foot_friction"]
    asset_cfg = ev.params["asset_cfg"]
    robot = env.scene["robot"]
    ids, _ = robot.find_geoms(list(asset_cfg.geom_names))
    gids = set(np.asarray(robot.indexing.geom_ids)[np.asarray(ids)].tolist())
    default = np.asarray(env.sim.get_default_field("geom_friction"))
    cur = np.asarray(env.ctx.model.geom_friction)
    for g in range(default.shape[0]):
        if g in gids:
            continue
        np.testing.assert_allclose(cur[:, g], np.broadcast_to(default[g], cur[:, g].shape), rtol=1e-6)
