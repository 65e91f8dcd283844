"""Physics-engine parity vs CPU MuJoCo on a small model.

Strategy mirrors the reference's CPU-CI approach (reference
tests/conftest.py): small real models, real physics, no mocks. Runs in
float64 via jax.experimental.enable_x64 for tight tolerances.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

XML = """
<mujoco>
  <option timestep="0.002" integrator="Euler" iterations="8" ls_iterations="12"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body name="base" pos="0 0 0.30">
      <freejoint/>
      <geom type="sphere" size="0.1" pos="0.02 0.01 0.0"/>
      <body name="leg" pos="0.1 0 0">
        <joint name="hip" type="hinge" axis="0 1 0" pos="0 0 0.05" range="-1 1"
               damping="0.1" armature="0.01" frictionloss="0.2"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0 0 -0.3"/>
        <body name="foot" pos="0 0 -0.3">
          <joint name="knee" type="hinge" axis="0 1 0" range="-2 0.5" damping="0.05"/>
          <geom type="sphere" size="0.04"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position name="hip_act" joint="hip" kp="30" kv="2"/>
    <motor name="knee_act" joint="knee" gear="1.5"/>
  </actuator>
</mujoco>
"""


@pytest.fixture(scope="module")
def x64():
    with jax.enable_x64(True):
        yield


@pytest.fixture(scope="module")
def setup():
    with jax.enable_x64(True):
        from mjlab_tpu.phys.model import put_model
        from mjlab_tpu.phys.data import put_data
        import mjlab_tpu.phys.forward as fwd

        mj = mujoco.MjModel.from_xml_string(XML)
        rng = np.random.default_rng(3)
        dmj = mujoco.MjData(mj)
        dmj.qpos[:] = mj.qpos0 + 0.05 * rng.standard_normal(mj.nq)
        dmj.qpos[3:7] /= np.linalg.norm(dmj.qpos[3:7])
        dmj.qvel[:] = 0.2 * rng.standard_normal(mj.nv)
        dmj.ctrl[:] = 0.3 * rng.standard_normal(mj.nu)
        mujoco.mj_forward(mj, dmj)

        m = put_model(mj, dtype=jnp.float64)
        d = put_data(m, dmj, dtype=jnp.float64)
        d = d.replace(qacc_warmstart=jnp.zeros(mj.nv, jnp.float64))
        d = jax.jit(fwd.forward)(m, d)
        yield mj, dmj, m, d


def test_kinematics(x64, setup):
    mj, dmj, m, d = setup
    np.testing.assert_allclose(np.asarray(d.xpos), dmj.xpos, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.geom_xpos), dmj.geom_xpos, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.subtree_com), dmj.subtree_com, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.cdof), dmj.cdof, atol=1e-8)


def test_mass_matrix(x64, setup):
    mj, dmj, m, d = setup
    fullM = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, dmj, fullM)
    np.testing.assert_allclose(np.asarray(d.qM), fullM, atol=1e-8)


def test_bias_and_actuation(x64, setup):
    mj, dmj, m, d = setup
    np.testing.assert_allclose(np.asarray(d.qfrc_bias), dmj.qfrc_bias, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_passive), dmj.qfrc_passive, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(d.actuator_force), dmj.actuator_force, atol=1e-10
    )


def test_contacts(x64, setup):
    mj, dmj, m, d = setup
    active = np.asarray(d.contact.dist) < np.asarray(d.contact.includemargin)
    assert int(active.sum()) == dmj.ncon
    # each mujoco contact has a matching slot
    for i in range(dmj.ncon):
        con = dmj.contact[i]
        pt = m.pairs
        found = False
        for c in range(pt.ncon):
            if {int(pt.con_geom1[c]), int(pt.con_geom2[c])} == {con.geom1, con.geom2}:
                if abs(float(d.contact.dist[c]) - con.dist) < 1e-8 and np.allclose(
                    np.asarray(d.contact.pos[c]), con.pos, atol=1e-8
                ):
                    np.testing.assert_allclose(
                        np.asarray(d.contact.frame[c]),
                        con.frame.reshape(3, 3),
                        atol=1e-8,
                    )
                    found = True
        assert found, f"missing contact for pair ({con.geom1},{con.geom2})"


def test_constrained_acceleration(x64, setup):
    mj, dmj, m, d = setup
    assert int(np.asarray(d.efc_active).sum()) == dmj.nefc
    np.testing.assert_allclose(
        np.asarray(d.qfrc_constraint), dmj.qfrc_constraint, atol=5e-6
    )
    np.testing.assert_allclose(np.asarray(d.qacc), dmj.qacc, atol=5e-5)


def test_trajectory_drift(x64, setup):
    import mjlab_tpu.phys.forward as fwd
    from mjlab_tpu.phys.data import put_data

    mj, dmj0, m, _ = setup
    dmj = mujoco.MjData(mj)
    dmj.qpos[:] = dmj0.qpos
    dmj.qvel[:] = dmj0.qvel
    dmj.ctrl[:] = dmj0.ctrl
    d = put_data(m, dmj, dtype=jnp.float64)
    step = jax.jit(fwd.step)
    for _ in range(50):
        mujoco.mj_step(mj, dmj)
        d = step(m, d)
    err = np.max(np.abs(np.asarray(d.qpos) - dmj.qpos))
    assert err < 1e-4, f"trajectory drift {err}"


def test_vmap_batch(x64, setup):
    """Batched stepping: N identical worlds stay identical and finite."""
    import mjlab_tpu.phys.forward as fwd

    mj, dmj, m, d = setup
    B = 4
    db = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), d
    )
    step = jax.jit(jax.vmap(fwd.step, in_axes=(None, 0)))
    db = step(m, db)
    q = np.asarray(db.qpos)
    assert np.all(np.isfinite(q))
    np.testing.assert_allclose(q[0], q[-1], atol=0)
