"""EntityData views vs ground-truth MuJoCo (reference
tests/test_entity_data.py): root/body poses, joint state, projected
gravity for a floating ball dropped in the same deterministic scene."""

import jax
import mujoco
import numpy as np
import pytest

from mjlab_tpu.entity.entity import EntityCfg
from mjlab_tpu.scene.scene import Scene, SceneCfg, SimContext
from mjlab_tpu.sim.sim import Simulation, SimulationCfg

E = 2


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


@pytest.fixture(scope="module")
def setup():
    scfg = SceneCfg(
        num_envs=E,
        entities={
            "ball": EntityCfg(
                spec_fn=_ball_spec,
                init_state=EntityCfg.InitialStateCfg(
                    pos=(0.1, 0.2, 0.5),
                    rot=(0.9238795, 0.0, 0.3826834, 0.0),  # 45 deg about y
                    lin_vel=(0.3, 0.0, 0.0),
                    ang_vel=(0.0, 1.0, 0.0),
                ),
            )
        },
    )
    scene = Scene(scfg)
    mj_model = scene.compile()
    sim = Simulation(E, SimulationCfg(), mj_model)
    ctx = SimContext(sim.model, sim.data)
    scene.initialize(sim.mj_model, ctx, jax.random.PRNGKey(0))
    # apply defaults to the live state then forward + a few steps
    mask = np.ones(E, bool)
    scene.reset(ctx, jax.numpy.asarray(mask), jax.random.PRNGKey(1))
    from mjlab_tpu.envs.mdp.events import reset_scene_to_default

    class _EnvStub:
        pass

    env = _EnvStub()
    env.scene = scene
    env.ctx = ctx
    env.num_envs = E
    reset_scene_to_default(env, jax.numpy.asarray(mask))
    scene.write_data_to_sim()
    fwd = jax.jit(sim.forward_fn())
    step = jax.jit(sim.step_fn())
    ctx.data = fwd(sim.model, ctx.data)
    for _ in range(10):
        ctx.data = step(sim.model, ctx.data)

    # ground truth: same model, same init, mujoco CPU
    mjd = mujoco.MjData(sim.mj_model)
    mjd.qpos[:3] = (0.1, 0.2, 0.5)
    mjd.qpos[3:7] = (0.9238795, 0.0, 0.3826834, 0.0)
    mjd.qvel[:3] = (0.3, 0.0, 0.0)
    mjd.qvel[3:6] = (0.0, 1.0, 0.0)
    mujoco.mj_forward(sim.mj_model, mjd)
    for _ in range(10):
        mujoco.mj_step(sim.mj_model, mjd)
    return scene, ctx, mjd


def test_root_pose_matches_mujoco(setup):
    scene, ctx, mjd = setup
    data = scene["ball"].data
    pos = np.asarray(data.root_link_pos_w)
    quat = np.asarray(data.root_link_quat_w)
    origins = np.asarray(scene.env_origins)
    for e in range(E):
        np.testing.assert_allclose(
            pos[e] - origins[e], mjd.qpos[:3], atol=5e-3
        )
        d = abs(np.dot(quat[e], mjd.qpos[3:7]))
        assert d > 1 - 1e-3, (quat[e], mjd.qpos[3:7])


def test_root_velocity_matches_mujoco(setup):
    scene, ctx, mjd = setup
    data = scene["ball"].data
    lin = np.asarray(data.root_link_lin_vel_w)
    ang = np.asarray(data.root_link_ang_vel_w)
    for e in range(E):
        np.testing.assert_allclose(lin[e], mjd.qvel[:3], atol=2e-2)
        # free-joint angular velocity is in the BODY frame in qvel; the
        # view reports world frame — rotate ground truth
        R = np.zeros(9)
        mujoco.mju_quat2Mat(R, mjd.qpos[3:7])
        ang_w = R.reshape(3, 3) @ mjd.qvel[3:6]
        np.testing.assert_allclose(ang[e], ang_w, atol=2e-2)


def test_projected_gravity_unit_and_downward(setup):
    scene, ctx, mjd = setup
    g_b = np.asarray(scene["ball"].data.projected_gravity_b)
    np.testing.assert_allclose(np.linalg.norm(g_b, axis=-1), 1.0, atol=1e-5)
    # rotate back to world: must be (0, 0, -1)
    quat = np.asarray(scene["ball"].data.root_link_quat_w)
    for e in range(E):
        R = np.zeros(9)
        mujoco.mju_quat2Mat(R, quat[e])
        g_w = R.reshape(3, 3) @ g_b[e]
        np.testing.assert_allclose(g_w, [0, 0, -1], atol=1e-5)
