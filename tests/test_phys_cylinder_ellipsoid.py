"""Cylinder/ellipsoid narrowphase parity vs CPU MuJoCo: standing / tilted
/ lying cylinders on a plane, ellipsoid support points, sphere-cylinder,
forward qacc + trajectory drift."""

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
  <option timestep="0.002" iterations="60" ls_iterations="30"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.25" euler="15 5 0">
      <freejoint/><geom name="cyl" type="cylinder" size="0.1 0.2"/>
    </body>
    <body pos="1 0 0.12" euler="30 10 0">
      <freejoint/><geom name="ell" type="ellipsoid" size="0.1 0.15 0.08"/>
    </body>
    <body pos="2 0 0.3">
      <freejoint/><geom name="sph" type="sphere" size="0.1"/>
    </body>
    <body pos="2 0 0.08">
      <freejoint/><geom name="cyl2" type="cylinder" size="0.12 0.05"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(autouse=True)
def x64():
    with jax.enable_x64(True):
        yield


def _active_set(m, d):
    pk = np.asarray(d.contact.packed)
    act = pk[:, 0] < pk[:, 1]
    pairs = {}
    g1 = np.asarray(m.pairs.con_geom1)
    g2 = np.asarray(m.pairs.con_geom2)
    for i in np.nonzero(act)[0]:
        key = (min(g1[i], g2[i]), max(g1[i], g2[i]))
        pairs.setdefault(key, []).append(float(pk[i, 0]))
    return pairs


def test_contact_sets_and_depths_match():
    mj = mujoco.MjModel.from_xml_string(XML)
    m = put_model(mj, dtype=jnp.float64)
    dmj = mujoco.MjData(mj)
    rng = np.random.default_rng(0)
    fj = jax.jit(fwd.forward)
    for trial in range(5):
        mujoco.mj_resetData(mj, dmj)
        dmj.qvel[:] = 0.3 * rng.standard_normal(mj.nv)
        for _ in range(40 + 30 * trial):
            mujoco.mj_step(mj, dmj)
        mujoco.mj_forward(mj, dmj)
        d = put_data(m, dmj, dtype=jnp.float64)
        d = fj(m, d)
        ours = _active_set(m, d)
        mjs = {}
        for i in range(dmj.ncon):
            c = dmj.contact[i]
            key = (min(c.geom[0], c.geom[1]), max(c.geom[0], c.geom[1]))
            mjs.setdefault(key, []).append(float(c.dist))
        assert set(ours) == set(mjs), (trial, ours.keys(), mjs.keys())
        for k in mjs:
            a = np.sort(ours[k])[: len(mjs[k])]
            b = np.sort(mjs[k])
            np.testing.assert_allclose(a, b, atol=2e-6, err_msg=str((trial, k)))
        err = np.abs(np.asarray(d.qacc) - dmj.qacc).max()
        assert err < 5e-5, f"trial {trial}: qacc err {err:.3e}"


def test_cylinder_trajectory_drift():
    mj = mujoco.MjModel.from_xml_string(XML)
    m = put_model(mj, dtype=jnp.float64)
    dmj = mujoco.MjData(mj)
    rng = np.random.default_rng(3)
    dmj.qvel[:] = 0.25 * rng.standard_normal(mj.nv)
    mujoco.mj_forward(mj, dmj)
    d = put_data(m, dmj, dtype=jnp.float64)
    step_j = jax.jit(fwd.step)
    for _ in range(50):
        mujoco.mj_step(mj, dmj)
        d = step_j(m, d)
    err = np.abs(np.asarray(d.qpos) - dmj.qpos).max()
    assert err < 1e-4, f"50-step drift {err:.3e}"
