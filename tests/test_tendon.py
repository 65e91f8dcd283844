"""Fixed-tendon parity vs CPU MuJoCo: lengths/velocities, springs with
deadband, dampers, tendon limits (efc rows), tendon actuators, and the
tendon sensor trio.

The engine treats fixed tendons as STATIC coefficient rows (mj_tendon,
engine_core_smooth.c computes the same J from wrap_prm every step); the
reference gets them via mujoco_warp. Spatial tendons are rejected at load.
"""

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
      <joint name="j0" type="hinge" axis="0 0 1" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" density="900"/>
      <body pos="0.3 0 0">
        <joint name="j1" type="hinge" axis="0 1 0" damping="0.04"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.035" density="800"/>
        <body pos="0.25 0 0">
          <joint name="j2" type="slide" axis="1 0 0" damping="0.1"/>
          <geom type="box" size="0.04 0.04 0.04" density="700"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t_couple" stiffness="3.0" damping="0.4" springlength="0.02 0.09"
           limited="true" range="-0.4 0.5">
      <joint joint="j0" coef="0.5"/>
      <joint joint="j1" coef="-0.35"/>
    </fixed>
    <fixed name="t_drive">
      <joint joint="j1" coef="0.8"/>
      <joint joint="j2" coef="1.2"/>
    </fixed>
  </tendon>
  <actuator>
    <general name="u_ten" tendon="t_drive" gear="1.5" gainprm="2.0"/>
    <general name="u_jnt" joint="j0" gainprm="1.0"/>
  </actuator>
  <sensor>
    <tendonpos tendon="t_couple"/>
    <tendonvel tendon="t_couple"/>
    <tendonactuatorfrc tendon="t_drive"/>
  </sensor>
</mujoco>
"""


def _roll(xml, nsteps=200, seed=3):
    with jax.enable_x64(True):
        mj = mujoco.MjModel.from_xml_string(xml)
        dmj = mujoco.MjData(mj)
        m = put_model(mj, dtype=jnp.float64)
        rng = np.random.RandomState(seed)
        ctrls = rng.uniform(-1.5, 1.5, (nsteps, mj.nu))
        d = put_data(m, dmj, dtype=jnp.float64)
        step = jax.jit(lambda d: fwd.step(m, d))
        for t in range(nsteps):
            dmj.ctrl[:] = ctrls[t]
            d = d.replace(ctrl=jnp.asarray(ctrls[t], jnp.float64))
            mujoco.mj_step(mj, dmj)
            d = step(d)
            np.testing.assert_allclose(
                np.asarray(d.qvel), dmj.qvel, rtol=1e-6, atol=1e-8,
                err_msg=f"qvel mismatch at step {t}",
            )
        jax.block_until_ready(d)
    return mj, dmj, d


@pytest.mark.parametrize("integrator", ["Euler", "implicitfast"])
def test_tendon_trajectory_parity(integrator):
    mj, dmj, d = _roll(XML.format(integrator=integrator))
    np.testing.assert_allclose(np.asarray(d.qpos), dmj.qpos, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(d.ten_length), dmj.ten_length, rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(d.ten_velocity), dmj.ten_velocity, rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(d.actuator_force), dmj.actuator_force, rtol=1e-6, atol=1e-9
    )


def test_tendon_limit_rows_engage():
    """Drive the limited tendon outside its range; the constraint force
    must match MuJoCo's efc solution (qfrc_constraint comparison)."""
    with jax.enable_x64(True):
        xml = XML.format(integrator="Euler")
        mj = mujoco.MjModel.from_xml_string(xml)
        dmj = mujoco.MjData(mj)
        dmj.qpos[:] = [1.3, 0.3, 0.1]  # t_couple length 0.545 > hi 0.5
        dmj.qvel[:] = [2.0, -1.0, 0.5]
        m = put_model(mj, dtype=jnp.float64)
        d = put_data(m, dmj, dtype=jnp.float64)
        mujoco.mj_forward(mj, dmj)
        df = jax.jit(lambda d: fwd.forward(m, d))(d)
        assert np.any(np.asarray(df.efc_lim_side)[m.nlimit :] != 0.0), (
            "tendon limit row should be active"
        )
        np.testing.assert_allclose(
            np.asarray(df.qfrc_constraint), dmj.qfrc_constraint,
            rtol=1e-6, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(df.qacc), dmj.qacc, rtol=1e-6, atol=1e-8
        )


def test_tendon_sensors_match_mujoco():
    with jax.enable_x64(True):
        xml = XML.format(integrator="Euler")
        mj = mujoco.MjModel.from_xml_string(xml)
        dmj = mujoco.MjData(mj)
        dmj.qpos[:] = [0.4, -0.2, 0.05]
        dmj.qvel[:] = [0.3, 0.7, -0.2]
        dmj.ctrl[:] = [0.9, -0.4]
        mujoco.mj_forward(mj, dmj)
        m = put_model(mj, dtype=jnp.float64)
        d = put_data(m, dmj, dtype=jnp.float64)
        df = jax.jit(lambda d: fwd.forward(m, d))(d)
        # sensordata layout: [tendonpos, tendonvel, tendonactuatorfrc]
        np.testing.assert_allclose(
            float(df.ten_length[0]), dmj.sensordata[0], rtol=1e-12
        )
        np.testing.assert_allclose(
            float(df.ten_velocity[0]), dmj.sensordata[1], rtol=1e-9
        )
        ua = [
            u for u in range(mj.nu)
            if mj.actuator_trntype[u] == mujoco.mjtTrn.mjTRN_TENDON
        ]
        frc = sum(float(df.actuator_force[u]) for u in ua)
        np.testing.assert_allclose(frc, dmj.sensordata[2], rtol=1e-9)


def test_spatial_tendon_rejected():
    xml = """
    <mujoco>
      <worldbody>
        <site name="s0" pos="0 0 1"/>
        <body pos="0 0 0.5">
          <joint type="free"/>
          <geom type="sphere" size="0.05" density="1000"/>
          <site name="s1"/>
        </body>
      </worldbody>
      <tendon>
        <spatial name="cable" range="0 0.6" limited="true">
          <site site="s0"/>
          <site site="s1"/>
        </spatial>
      </tendon>
    </mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    with pytest.raises(NotImplementedError):
        put_model(mj)
