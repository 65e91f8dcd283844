"""Event term semantics on a tiny floating-ball scene (reference
tests/test_events.py): velocity pushes, external wrenches, masked resets."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.entity.entity import EntityCfg
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg
from mjlab_tpu.scene.scene import Scene, SceneCfg, SimContext
from mjlab_tpu.sim.sim import Simulation, SimulationCfg
from mjlab_tpu.envs.mdp import events

E = 4


def _ball_spec():
    return mujoco.MjSpec.from_string(
        """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="ball" pos="0 0 0.5">
      <freejoint name="ball_free"/>
      <geom name="ball_geom" type="sphere" size="0.1" mass="1.0"/>
    </body>
  </worldbody>
</mujoco>
"""
    )


class _EnvStub:
    pass


@pytest.fixture()
def env():
    scfg = SceneCfg(
        num_envs=E,
        entities={"ball": EntityCfg(spec_fn=_ball_spec)},
    )
    scene = Scene(scfg)
    mj_model = scene.compile()
    sim = Simulation(E, SimulationCfg(), mj_model)
    ctx = SimContext(sim.model, sim.data)
    scene.initialize(sim.mj_model, ctx, jax.random.PRNGKey(0))
    ctx.rng = jax.random.PRNGKey(1)

    def next_key():
        ctx.rng, k = jax.random.split(ctx.rng)
        return k

    ctx.next_key = next_key
    e = _EnvStub()
    e.scene = scene
    e.ctx = ctx
    e.num_envs = E
    e.sim = sim
    mask = jnp.ones((E,), bool)
    events.reset_scene_to_default(e, mask)
    scene.write_data_to_sim()
    return e


def test_push_by_setting_velocity_masked(env):
    mask = jnp.asarray([True, False, True, False])
    events.push_by_setting_velocity(
        env,
        mask,
        velocity_range={"x": (2.0, 2.0)},
        asset_cfg=SceneEntityCfg("ball"),
    )
    env.scene.write_data_to_sim()
    vx = np.asarray(env.ctx.data.qvel)[:, 0]
    np.testing.assert_allclose(vx[[0, 2]], 2.0, atol=1e-6)
    np.testing.assert_allclose(vx[[1, 3]], 0.0, atol=1e-6)


def test_reset_root_state_uniform_ranges(env):
    mask = jnp.ones((E,), bool)
    events.reset_root_state_uniform(
        env,
        mask,
        pose_range={"x": (-0.5, 0.5), "yaw": (-1.0, 1.0)},
        velocity_range={},
        asset_cfg=SceneEntityCfg("ball"),
    )
    env.scene.write_data_to_sim()
    qpos = np.asarray(env.ctx.data.qpos)
    origins = np.asarray(env.scene.env_origins)
    x_rel = qpos[:, 0] - origins[:, 0]
    assert (np.abs(x_rel) <= 0.5 + 1e-5).all()
    # draws differ across envs
    assert np.unique(x_rel.round(6)).size > 1
    # quaternions stay normalized
    np.testing.assert_allclose(
        np.linalg.norm(qpos[:, 3:7], axis=-1), 1.0, atol=1e-5
    )


def test_apply_external_force_torque(env):
    mask = jnp.ones((E,), bool)
    events.apply_external_force_torque(
        env,
        mask,
        force_range=(5.0, 5.0),
        torque_range=(0.0, 0.0),
        asset_cfg=SceneEntityCfg("ball", body_names=("ball",)),
    )
    env.scene.write_data_to_sim()
    xfrc = np.asarray(env.ctx.data.xfrc_applied)
    assert np.abs(xfrc).max() > 0
