"""Contact sensor semantics on a tiny scene (reference
tests/test_contact_sensor.py): found/force/dist on a sphere dropped onto
a plane, and the air/contact-time state machine."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.entity.entity import EntityCfg
from mjlab_tpu.scene.scene import Scene, SceneCfg, SimContext
from mjlab_tpu.sensor.contact_sensor import ContactMatch, ContactSensorCfg
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
                init_state=EntityCfg.InitialStateCfg(pos=(0, 0, 0.5)),
            )
        },
        sensors={
            "ball_contact": ContactSensorCfg(
                name="ball_contact",
                primary=ContactMatch(
                    mode="geom", pattern="ball_geom", entity="ball"
                ),
                fields=("found", "force", "dist"),
                track_air_time=True,
            )
        },
    )
    scene = Scene(scfg)
    mj_model = scene.compile()
    sim = Simulation(E, SimulationCfg(), mj_model)
    ctx = SimContext(sim.model, sim.data)
    scene.initialize(sim.mj_model, ctx, jax.random.PRNGKey(0))
    return scene, sim, ctx


def test_airborne_then_contact(setup):
    scene, sim, ctx = setup
    sensor = scene.sensors["ball_contact"]
    step = jax.jit(sim.step_fn())
    fwd = jax.jit(sim.forward_fn())

    ctx.data = fwd(sim.model, ctx.data)
    data = sensor._compute(ctx)
    assert not bool(np.asarray(data.found).any()), "ball starts airborne"

    dt = sim.mj_model.opt.timestep
    air_time = 0.0
    for _ in range(200):  # 1 s: falls ~0.4 m onto the plane
        ctx.data = step(sim.model, ctx.data)
        sensor.update(ctx, dt)
    data = sensor._compute(ctx)
    found = np.asarray(data.found)
    assert found.all(), "ball should rest on the plane"
    # netforce is the force applied BY the primary (native mjSENS_CONTACT
    # sign): resting ball presses -mg into the plane
    fz = np.asarray(data.force)[..., 2]
    np.testing.assert_allclose(fz, -9.81, rtol=0.2)
    # contact time accumulated, air time frozen at the fall duration
    st = ctx.sensor_states["ball_contact"]
    assert (np.asarray(st.current_contact_time) > 0).all()
    last_air = np.asarray(st.last_air_time)
    assert (last_air > 0.1).all() and (last_air < 1.0).all()


def test_dist_sign(setup):
    scene, sim, ctx = setup
    sensor = scene.sensors["ball_contact"]
    data = sensor._compute(ctx)
    # resting contact: penetration depth is small and negative
    dist = np.asarray(data.dist)
    assert (dist < 0.01).all() and (dist > -0.05).all()
