"""Parity tests for joint equality constraints and condim>3 contacts
(the manipulation-task physics additions) vs CPU MuJoCo."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.phys.model import put_model
from mjlab_tpu.phys.data import make_data
from mjlab_tpu.phys import forward as F


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _run_both(xml: str, steps: int, ctrl=None):
    mj = mujoco.MjModel.from_xml_string(xml)
    dmj = mujoco.MjData(mj)
    if ctrl is not None:
        dmj.ctrl[:] = ctrl
    m = put_model(mj, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64)
    d = d.replace(qpos=jnp.asarray(dmj.qpos.copy()))
    if ctrl is not None:
        d = d.replace(ctrl=jnp.asarray(np.asarray(ctrl), jnp.float64))
    step = jax.jit(lambda m, d: F.step(m, d))
    for _ in range(steps):
        mujoco.mj_step(mj, dmj)
        d = step(m, d)
    return np.asarray(d.qpos), dmj.qpos.copy()


JOINT_EQ_XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="0.5"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.025" mass="0.3"/>
      </body>
    </body>
  </worldbody>
  <equality>
    <joint joint1="j1" joint2="j2" polycoef="0.1 -0.5 0 0 0"/>
  </equality>
</mujoco>
"""


def test_joint_equality_trajectory(x64):
    q, q_ref = _run_both(JOINT_EQ_XML, steps=200)
    np.testing.assert_allclose(q, q_ref, atol=1e-6)


GRIPPER_XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body pos="0 0 0.2">
      <body name="lf" pos="0 0.05 0">
        <joint name="left_finger" type="slide" axis="0 1 0" range="-0.04 0"/>
        <geom type="box" size="0.01 0.005 0.03" mass="0.05"/>
      </body>
      <body name="rf" pos="0 -0.05 0">
        <joint name="right_finger" type="slide" axis="0 1 0" range="0 0.04"/>
        <geom type="box" size="0.01 0.005 0.03" mass="0.05"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position joint="left_finger" kp="20" kv="1"/>
  </actuator>
  <equality>
    <joint joint1="right_finger" joint2="left_finger" polycoef="0 -1 0 0 0"/>
  </equality>
</mujoco>
"""


def test_gripper_coupling(x64):
    """The reference YAM gripper pattern: only left_finger is actuated,
    right_finger mirrors it via equality (reference yam.xml equality)."""
    q, q_ref = _run_both(GRIPPER_XML, steps=200, ctrl=[-0.03])
    np.testing.assert_allclose(q, q_ref, atol=1e-6)
    # coupled: right = -left
    assert abs(q[1] + q[0]) < 1e-4


CONDIM6_XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1" friction="1 0.05 0.01"
          condim="6"/>
    <body pos="0 0 0.049">
      <freejoint/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.5"
            friction="1 0.05 0.01" condim="6"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_condim6_torsional_spin_decay(x64):
    """A spinning box on a condim-6 floor must be slowed by torsional
    friction (qualitative TPU-path check; exact parity of condim-6
    pyramids vs MuJoCo's is validated by the trajectory staying bounded
    and the spin decaying)."""
    mj = mujoco.MjModel.from_xml_string(CONDIM6_XML)
    m = put_model(mj, dtype=jnp.float64)
    assert m.rows_per_con == 10
    d = make_data(m, dtype=jnp.float64)
    qvel = jnp.zeros(m.nv, jnp.float64).at[5].set(6.0)  # yaw spin
    d = d.replace(qpos=m.qpos0, qvel=qvel)
    step = jax.jit(lambda m, d: F.step(m, d))
    for _ in range(150):
        d = step(m, d)
    assert np.isfinite(np.asarray(d.qpos)).all()
    wz = float(d.qvel[5])
    assert abs(wz) < 3.0, f"torsional friction failed to slow spin: {wz}"


BOX_STACK_XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1"/>
    <body pos="0 0 0.05">
      <freejoint/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.5" friction="1"/>
    </body>
    <body pos="0.01 0.01 0.16">
      <freejoint/>
      <geom type="box" size="0.04 0.04 0.04" mass="0.2" friction="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_box_box_stack(x64):
    """A small box dropped on a bigger one must come to rest on top
    (box-box narrowphase)."""
    mj = mujoco.MjModel.from_xml_string(BOX_STACK_XML)
    m = put_model(mj, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64)
    d = d.replace(qpos=m.qpos0)
    step = jax.jit(lambda m, d: F.step(m, d))
    for _ in range(300):
        d = step(m, d)
    q = np.asarray(d.qpos)
    assert np.isfinite(q).all()
    # top box rests at ~ bottom top face (0.10) + half size (0.04)
    assert q[9] == pytest.approx(0.14, abs=0.01)
    # barely slid
    assert abs(q[7] - 0.01) < 0.02 and abs(q[8] - 0.01) < 0.02


def test_condim6_qacc_first_step(x64):
    """First-step qacc parity vs CPU MuJoCo for the condim-6 contact."""
    mj = mujoco.MjModel.from_xml_string(CONDIM6_XML)
    dmj = mujoco.MjData(mj)
    dmj.qvel[3] = 1.0  # slide
    dmj.qvel[5] = 4.0  # spin
    mujoco.mj_forward(mj, dmj)
    m = put_model(mj, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64)
    d = d.replace(qpos=m.qpos0, qvel=jnp.asarray(dmj.qvel.copy()))
    d = jax.jit(lambda m, d: F.forward(m, d))(m, d)
    np.testing.assert_allclose(np.asarray(d.qacc), dmj.qacc, atol=2e-3)
