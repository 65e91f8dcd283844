"""Actuator activation dynamics parity vs CPU MuJoCo.

Covers mjtDyn integrator / filter / filterexact, actrange clamping and
actearly, through full mj_step trajectories (reference relies on
mujoco_warp's implementation of the same semantics; here the contract is
MuJoCo's engine_forward.c mj_fwdActuation + mj_advance)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjlab_tpu.phys.forward as fwd
from mjlab_tpu.phys.data import put_data
from mjlab_tpu.phys.model import put_model

XML = """
<mujoco>
  <option timestep="0.005" integrator="{integrator}"/>
  <worldbody>
    <body>
      <joint name="j0" type="hinge" axis="0 0 1" damping="0.08"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" density="800"/>
      <body pos="0.3 0 0">
        <joint name="j1" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.035" density="700"/>
        <body pos="0.25 0 0">
          <joint name="j2" type="slide" axis="1 0 0" damping="0.2"/>
          <geom type="box" size="0.05 0.05 0.05" density="600"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <general name="int" joint="j0" dyntype="integrator" gainprm="1.6"
             actrange="-1 1" actlimited="true"/>
    <general name="filt" joint="j1" dyntype="filter" dynprm="0.08"
             gainprm="2.5"/>
    <general name="fexact" joint="j2" dyntype="filterexact" dynprm="0.03"
             gainprm="3.0" {early}/>
  </actuator>
</mujoco>
"""


def _roll(xml: str, nsteps: int = 150, seed: int = 0):
    with jax.enable_x64(True):
        mj = mujoco.MjModel.from_xml_string(xml)
        dmj = mujoco.MjData(mj)
        m = put_model(mj, dtype=jnp.float64)
        rng = np.random.RandomState(seed)
        ctrls = rng.uniform(-2.0, 2.0, (nsteps, mj.nu))
        d = put_data(m, dmj, dtype=jnp.float64)
        step = jax.jit(lambda d: fwd.step(m, d))
        for t in range(nsteps):
            dmj.ctrl[:] = ctrls[t]
            d = d.replace(ctrl=jnp.asarray(ctrls[t], jnp.float64))
            mujoco.mj_step(mj, dmj)
            d = step(d)
            np.testing.assert_allclose(
                np.asarray(d.act), dmj.act, rtol=1e-9, atol=1e-11,
                err_msg=f"act mismatch at step {t}",
            )
        jax.block_until_ready(d)
    return dmj, d


@pytest.mark.parametrize("integrator", ["Euler", "implicitfast"])
@pytest.mark.parametrize("early", ["", 'actearly="true"'])
def test_activation_trajectory_parity(integrator, early):
    dmj, d = _roll(XML.format(integrator=integrator, early=early))
    np.testing.assert_allclose(np.asarray(d.qpos), dmj.qpos, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(d.qvel), dmj.qvel, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(d.actuator_force), dmj.actuator_force, rtol=1e-8, atol=1e-10
    )


def test_act_reset_on_env_reset():
    """Activation states go through make_data, so Simulation.reset clears them."""
    mj = mujoco.MjModel.from_xml_string(
        XML.format(integrator="Euler", early="")
    )
    m = put_model(mj, dtype=jnp.float64)
    from mjlab_tpu.phys.data import make_data

    d = make_data(m, dtype=jnp.float64)
    assert d.act.shape == (3,)
    assert np.all(np.asarray(d.act) == 0.0)


def test_muscle_dyntype_rejected():
    xml = """
    <mujoco>
      <worldbody><body>
        <joint name="j" type="hinge"/>
        <geom type="sphere" size="0.05" density="1000"/>
      </body></worldbody>
      <actuator><general joint="j" dyntype="muscle"/></actuator>
    </mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    with pytest.raises(NotImplementedError):
        put_model(mj)
