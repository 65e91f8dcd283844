"""Elliptic friction cone parity vs CPU MuJoCo (cone="elliptic").

Covers condim 1/3/4/6 contacts, impratio != 1, anisotropic friction via
explicit pair-like geom params, solved accelerations + contact forces +
short trajectory drift. Mirrors the pyramidal coverage in
test_phys_equality.py; closes the reference capability gap
(/root/reference/src/mjlab/tasks/manipulation/lift_cube_env_cfg.py:250
requests cone="elliptic").
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
  <option timestep="0.002" cone="elliptic" impratio="{impratio}"
          integrator="implicitfast" iterations="60" ls_iterations="30"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="b1" pos="-0.4 0 0.095">
      <freejoint/>
      <geom name="ball3" type="sphere" size="0.1" condim="3" friction="0.8"/>
    </body>
    <body name="b2" pos="0.0 0 0.095">
      <freejoint/>
      <geom name="ball6" type="sphere" size="0.1" condim="6"
            friction="0.9 0.04 0.008"/>
    </body>
    <body name="b3" pos="0.4 0 0.045">
      <freejoint/>
      <geom name="box4" type="box" size="0.05 0.05 0.05" condim="4"
            friction="1.1 0.02 0.001"/>
    </body>
    <body name="b4" pos="0.8 0 0.095">
      <freejoint/>
      <geom name="slick" type="sphere" size="0.1" condim="1"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(autouse=True)
def x64():
    with jax.enable_x64(True):
        yield


def _states(mj, n=6, seed=0):
    """Settle-and-perturb states with active contacts of every condim."""
    rng = np.random.default_rng(seed)
    dmj = mujoco.MjData(mj)
    out = []
    for i in range(n):
        mujoco.mj_resetData(mj, dmj)
        dmj.qvel[:] = 0.4 * rng.standard_normal(mj.nv)
        for _ in range(20 + 15 * i):
            mujoco.mj_step(mj, dmj)
        out.append((dmj.qpos.copy(), dmj.qvel.copy(), dmj.qacc_warmstart.copy()))
    return out


@pytest.mark.parametrize("impratio", [1.0, 3.0])
def test_elliptic_forward_parity(impratio):
    mj = mujoco.MjModel.from_xml_string(XML.format(impratio=impratio))
    m = put_model(mj, dtype=jnp.float64)
    assert m.rows_per_con == 6  # one row per dim, max condim 6
    dmj = mujoco.MjData(mj)
    fj = jax.jit(fwd.forward)
    worst = 0.0
    for qpos, qvel, ws in _states(mj, seed=int(impratio)):
        dmj.qpos[:] = qpos
        dmj.qvel[:] = qvel
        dmj.qacc_warmstart[:] = ws
        mujoco.mj_forward(mj, dmj)
        d = put_data(m, dmj, dtype=jnp.float64)
        d = fj(m, d)
        err = np.abs(np.asarray(d.qacc) - dmj.qacc).max()
        worst = max(worst, err)
        # tolerance note: both solvers terminate inside the optimum's flat
        # valley; a measured 1.4e-5 qacc gap had identical costs to 12
        # significant digits (near-singular direction at a zone boundary)
        assert err < 5e-5, f"qacc err {err:.3e} (ncon={dmj.ncon})"
        # contact forces: compare net constraint force in joint space
        errf = np.abs(np.asarray(d.qfrc_constraint) - dmj.qfrc_constraint).max()
        assert errf < 5e-5, f"qfrc_constraint err {errf:.3e}"
    assert worst > 0.0  # states actually exercised the solver


def test_elliptic_contact_force_decode():
    """Per-contact world force matches mj_contactForce."""
    mj = mujoco.MjModel.from_xml_string(XML.format(impratio=2.0))
    m = put_model(mj, dtype=jnp.float64)
    dmj = mujoco.MjData(mj)
    dmj.qvel[0:3] = [0.5, 0.2, 0.0]
    dmj.qvel[3:6] = [0.0, 0.0, 5.0]
    for _ in range(30):
        mujoco.mj_step(mj, dmj)
    mujoco.mj_forward(mj, dmj)
    d = put_data(m, dmj, dtype=jnp.float64)
    d = jax.jit(fwd.forward)(m, d)

    # gather mujoco per-contact world forces keyed by sorted geom pair
    mj_forces = {}
    for i in range(dmj.ncon):
        c = dmj.contact[i]
        ft = np.zeros(6)
        mujoco.mj_contactForce(mj, dmj, i, ft)
        frame = c.frame.reshape(3, 3)
        fw = ft[0] * frame[0] + ft[1] * frame[1] + ft[2] * frame[2]
        key = (min(c.geom[0], c.geom[1]), max(c.geom[0], c.geom[1]))
        mj_forces[key] = mj_forces.get(key, 0.0) + fw

    g1t = np.asarray(m.pairs.con_geom1)
    g2t = np.asarray(m.pairs.con_geom2)
    sel = np.asarray(d.con_sel)
    act = np.asarray(d.con_sel_active)
    ours = {}
    for i, s in enumerate(sel):
        if not act[i]:
            continue
        key = (min(g1t[s], g2t[s]), max(g1t[s], g2t[s]))
        ours[key] = ours.get(key, 0.0) + np.asarray(d.con_force_c[i])
    assert set(ours) == set(mj_forces)
    for k in mj_forces:
        np.testing.assert_allclose(ours[k], mj_forces[k], rtol=1e-4, atol=1e-6)


def test_elliptic_trajectory_drift():
    mj = mujoco.MjModel.from_xml_string(XML.format(impratio=1.0))
    m = put_model(mj, dtype=jnp.float64)
    dmj = mujoco.MjData(mj)
    rng = np.random.default_rng(7)
    dmj.qvel[:] = 0.3 * rng.standard_normal(mj.nv)
    mujoco.mj_forward(mj, dmj)
    d = put_data(m, dmj, dtype=jnp.float64)
    step_j = jax.jit(fwd.step)
    for t in range(50):
        mujoco.mj_step(mj, dmj)
        d = step_j(m, d)
    err = np.abs(np.asarray(d.qpos) - dmj.qpos).max()
    assert err < 1e-4, f"50-step elliptic drift {err:.3e}"
