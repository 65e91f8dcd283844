"""Explicit <pair> contact support vs CPU MuJoCo: dedup of dynamic pairs,
filter bypass, and the pair's own condim/friction/solref/margin
(reference consumes these through mjwarp; measured semantics in
phys/collision.py:make_pair_table)."""

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
    <body pos="0 0 0.095">
      <freejoint/>
      <geom name="s1" type="sphere" size="0.1" friction="0.3"/>
    </body>
    <body pos="1 0 0.095">
      <freejoint/>
      <geom name="s2" type="sphere" size="0.1" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <contact>
    <pair geom1="floor" geom2="s1" condim="4" friction="2.5 2.0 0.1 0.02 0.02"
          margin="0.01" solref="0.05 1"/>
    <pair geom1="floor" geom2="s2" condim="3" friction="1.5 1.5 0.1"/>
  </contact>
</mujoco>
"""


@pytest.fixture(autouse=True)
def x64():
    with jax.enable_x64(True):
        yield


def test_pair_table_structure():
    mj = mujoco.MjModel.from_xml_string(XML)
    m = put_model(mj, dtype=jnp.float64)
    pt = m.pairs
    # floor-s1 appears ONCE (explicit replaces dynamic), floor-s2 exists
    # only because of the explicit pair (contype filter would kill it)
    pairs = {(int(a), int(b)) for a, b in zip(pt.geom1, pt.geom2)}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert len([1 for a, b in zip(pt.geom1, pt.geom2) if {a, b} == {0, 1}]) == 1
    assert pt.ex_mask.sum() == 2
    # pair condim applied
    i01 = [k for k, (a, b) in enumerate(zip(pt.geom1, pt.geom2))
           if {int(a), int(b)} == {0, 1}][0]
    assert pt.pair_condim[i01] == 4
    np.testing.assert_allclose(
        pt.ex_friction5[i01], [2.5, 2.0, 0.1, 0.02, 0.02]
    )


def test_pair_forward_parity():
    mj = mujoco.MjModel.from_xml_string(XML)
    m = put_model(mj, dtype=jnp.float64)
    dmj = mujoco.MjData(mj)
    rng = np.random.default_rng(0)
    fj = jax.jit(fwd.forward)
    for trial in range(4):
        mujoco.mj_resetData(mj, dmj)
        dmj.qvel[:] = 0.4 * rng.standard_normal(mj.nv)
        for _ in range(25 + 10 * trial):
            mujoco.mj_step(mj, dmj)
        mujoco.mj_forward(mj, dmj)
        d = put_data(m, dmj, dtype=jnp.float64)
        d = fj(m, d)
        err = np.abs(np.asarray(d.qacc) - dmj.qacc).max()
        assert err < 1e-6, f"trial {trial}: qacc err {err:.3e} ncon={dmj.ncon}"


def test_pair_trajectory_drift():
    mj = mujoco.MjModel.from_xml_string(XML)
    m = put_model(mj, dtype=jnp.float64)
    dmj = mujoco.MjData(mj)
    dmj.qvel[0] = 0.5
    dmj.qvel[9] = -0.3
    mujoco.mj_forward(mj, dmj)
    d = put_data(m, dmj, dtype=jnp.float64)
    step_j = jax.jit(fwd.step)
    for _ in range(60):
        mujoco.mj_step(mj, dmj)
        d = step_j(m, d)
    err = np.abs(np.asarray(d.qpos) - dmj.qpos).max()
    assert err < 1e-6, f"60-step drift {err:.3e}"
