"""Env-last smooth Pallas kernels (phys/smooth_pallas.py) parity.

Each kernel runs the resurrected scalar-plane stage code (lm/stages.py)
inside pallas_call; on CPU they execute in interpret mode. Gates compare
against the vmapped stages (phys/{kinematics,smooth}.py) in f32 — the
same formulas evaluated in a different association order, so tolerances
are a few f32 ulps of the quantity scale, and the full-step gate
inherits the Newton solve's measured ~1.6e-4 input-sensitivity
amplification (see tests/test_pallas2_solver.py)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjlab_tpu.phys.forward as fwd
from mjlab_tpu.phys import smooth
from mjlab_tpu.phys.data import make_data
from mjlab_tpu.phys.hybrid import _use_smooth_pallas, step_hybrid
from mjlab_tpu.phys.kinematics import com_pos, kinematics
from mjlab_tpu.phys.model import put_model
from mjlab_tpu.phys.smooth_pallas import (
    collision_geoms, crb_packed, kin_com, qm_dense_cm,
    smooth_pallas_supported, vel_smooth,
)
from mjlab_tpu.sim.sim import model_in_axes

from test_hybrid_parity import TOY_XML
from test_pallas2_solver import _state_f32

E = 128


def _toy():
    mj = mujoco.MjModel.from_xml_string(TOY_XML)
    m = put_model(mj, dtype=jnp.float32, nconmax=12)
    return mj, m


def _vmapped_through(m, d, fns):
    axes = model_in_axes(m, frozenset())
    for fn in fns:
        d = jax.jit(jax.vmap(fn, in_axes=(axes, 0)))(m, d)
    return d


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(1.0, float(np.abs(a).max()))
    return float(np.abs(a - b).max()) / scale


@pytest.mark.slow
def test_kin_com_crb_match_vmapped_toy():
    mj, m = _toy()
    d = _state_f32(m, mj, E)
    assert smooth_pallas_supported(m, frozenset(), E, jnp.float32)

    ref = _vmapped_through(m, d, [kinematics, com_pos, smooth.crb])

    qT = d.qpos.T
    gxpos, gxmat, subcom, cdof, cinA, cinc, xipos, xpos, xquat = kin_com(
        m, qT, interpret=True
    )
    cg = collision_geoms(m)
    for o, g in enumerate(cg):
        assert _rel_err(ref.geom_xpos[:, g].T, gxpos[o]) < 2e-6, f"gxpos {g}"
        assert _rel_err(
            ref.geom_xmat[:, g].reshape(E, 9).T, gxmat[o]
        ) < 2e-6, f"gxmat {g}"
    assert _rel_err(np.moveaxis(np.asarray(ref.subtree_com), 0, -1), subcom) < 2e-6
    assert _rel_err(np.moveaxis(np.asarray(ref.cdof), 0, -1), cdof) < 2e-6
    assert _rel_err(np.moveaxis(np.asarray(ref.xipos), 0, -1), xipos) < 2e-6
    assert _rel_err(np.moveaxis(np.asarray(ref.xpos), 0, -1), xpos) < 2e-6
    assert _rel_err(np.moveaxis(np.asarray(ref.xquat), 0, -1), xquat) < 2e-6

    # cinert blocks: compare against the (E, nbody, 6, 6) spatial inertia
    ref_ci = np.asarray(ref.cinert)  # (E, nb, 6, 6)
    sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    for b in range(m.nbody):
        for s, (i, j) in enumerate(sym):
            assert _rel_err(ref_ci[:, b, i, j], cinA[b, s]) < 2e-6
        mass = float(np.asarray(m.body_mass)[b])
        # linear block diag = m; B block = m*skew(c) -> c from B[0,1]=-m*cz
        if mass > 1e-12:
            cz = -ref_ci[:, b, 0, 4] / mass
            cy = ref_ci[:, b, 0, 5] / mass
            cx = -ref_ci[:, b, 1, 5] / mass
            assert _rel_err(cx, cinc[b, 0]) < 2e-6
            assert _rel_err(cy, cinc[b, 1]) < 2e-6
            assert _rel_err(cz, cinc[b, 2]) < 2e-6

    qM_pairs = crb_packed(m, cdof, cinA, cinc, interpret=True)
    qM_cm = qm_dense_cm(m, qM_pairs)
    ref_qM = np.moveaxis(np.asarray(ref.qM), 0, -1).reshape(-1, E)
    assert _rel_err(ref_qM, qM_cm) < 5e-6


@pytest.mark.slow
def test_vel_smooth_matches_vmapped_toy():
    mj, m = _toy()
    d = _state_f32(m, mj, E)
    # give xfrc/qfrc_applied nonzero values so their projection is gated
    rng = np.random.default_rng(3)
    d = d.replace(
        xfrc_applied=jnp.asarray(
            0.1 * rng.standard_normal((E, m.nbody, 6)), jnp.float32
        ),
        qfrc_applied=jnp.asarray(
            0.1 * rng.standard_normal((E, m.nv)), jnp.float32
        ),
    )

    ref = _vmapped_through(
        m, d,
        [kinematics, com_pos, smooth.transmission, smooth.com_vel,
         smooth.rne, smooth.passive, smooth.fwd_actuation],
    )
    axes = model_in_axes(m, frozenset())

    def accum(mm, dd):
        qfs = (
            dd.qfrc_passive - dd.qfrc_bias + dd.qfrc_actuator
            + dd.qfrc_applied + smooth.xfrc_accumulate(mm, dd)
        )
        return dd.replace(qfrc_smooth=qfs)

    ref = jax.jit(jax.vmap(accum, in_axes=(axes, 0)))(m, ref)

    qT, vT, ctrlT = d.qpos.T, d.qvel.T, d.ctrl.T
    gxpos, gxmat, subcom, cdof, cinA, cinc, xipos, xpos, xquat = kin_com(
        m, qT, interpret=True
    )
    xfrcT = jnp.moveaxis(d.xfrc_applied, 0, -1)
    qfs, afrc, avel, mh_diag = vel_smooth(
        m, qT, vT, ctrlT, cdof, cinA, cinc,
        (subcom, xipos, xfrcT, d.qfrc_applied.T),
        interpret=True,
    )
    assert _rel_err(np.asarray(ref.qfrc_smooth).T, qfs) < 5e-6
    assert _rel_err(np.asarray(ref.actuator_force).T, afrc) < 5e-6
    assert _rel_err(np.asarray(ref.actuator_velocity).T, avel) < 5e-6

    # Mh diagonal additions vs the vmapped integrator matrix
    Mh_ref = jax.jit(jax.vmap(fwd.integrator_mh, in_axes=(axes, 0)))(m, ref)
    ref_diag = (
        np.einsum("eii->ie", np.asarray(Mh_ref))
        - np.einsum("eii->ie", np.asarray(ref.qM))
    )
    assert _rel_err(ref_diag, mh_diag) < 5e-6


@pytest.mark.slow
def test_step_envlast_matches_hybrid_toy(monkeypatch):
    """Full lean step: env-last smooth kernels vs vmapped smooth stages,
    both feeding the SAME interpret-mode pallas2 solve — isolates the
    smooth-stage substitution. f32 tolerance includes the Newton solve's
    input-sensitivity amplification."""
    mj, m = _toy()
    dB = _state_f32(m, mj, E)
    axes = model_in_axes(m, frozenset())

    monkeypatch.setenv("MJLAB_TPU_SOLVER", "pallas2")
    monkeypatch.setenv("MJLAB_TPU_SOLVER_INTERPRET", "1")

    monkeypatch.setenv("MJLAB_TPU_SMOOTH", "vmap")
    step_a = jax.jit(
        lambda dd: step_hybrid(m, frozenset(), dd, axes, lean=True)
    )
    da = dB
    for _ in range(3):
        da = step_a(da)

    monkeypatch.setenv("MJLAB_TPU_SMOOTH", "pallas")
    assert _use_smooth_pallas(m, frozenset(), dB, E)
    step_b = jax.jit(
        lambda dd: step_hybrid(m, frozenset(), dd, axes, lean=True)
    )
    db = dB
    for _ in range(3):
        db = step_b(db)

    for f, tol in (
        ("qpos", 1e-4), ("qvel", 1e-3), ("qacc", 5e-3),
        ("qacc_warmstart", 5e-3), ("qfrc_constraint", 5e-3),
        ("efc_force", 5e-3), ("condist", 1e-4), ("con_packed_c", 1e-3),
        ("con_force_c", 5e-3), ("time", 1e-6),
    ):
        err = _rel_err(getattr(da, f), getattr(db, f))
        assert err < tol, f"{f}: {err:.2e}"
    assert np.array_equal(np.asarray(da.con_found), np.asarray(db.con_found))
    assert np.array_equal(np.asarray(da.con_sel), np.asarray(db.con_sel))
    assert int(np.asarray(db.ncheck_reset).sum()) == 0


MOCAP_XML = TOY_XML.replace(
    "</worldbody>",
    """    <body name="target" mocap="true" pos="1 0 0.5">
      <geom type="sphere" size="0.02" contype="0" conaffinity="0"
            mass="0.1"/>
    </body>
  </worldbody>""",
)


@pytest.mark.slow
def test_step_envlast_mocap_and_dr_fields(monkeypatch):
    """Round-5 gate relaxations: mocap bodies (frames fed into kin_com)
    and DR-batched smooth fields (KernelParams per-env plane inputs) on
    the env-last kernel path vs the vmapped smooth stages. The tracking
    task batches body_ipos (base_com event) and YAM lift-cube carries
    nmocap=1 — both previously fell back to the round-3 hybrid substep."""
    mj = mujoco.MjModel.from_xml_string(MOCAP_XML)
    m = put_model(mj, dtype=jnp.float32, nconmax=12)
    assert m.nmocap == 1
    rng = np.random.default_rng(3)

    # DR-batch body_ipos (additive offsets) and dof_damping (scale), the
    # tracking/velocity randomization surface
    bf = frozenset({"body_ipos", "dof_damping"})
    ipos = np.tile(np.asarray(m.body_ipos, np.float32), (E, 1, 1))
    ipos += 0.02 * rng.standard_normal(ipos.shape).astype(np.float32)
    damp = np.tile(np.asarray(m.dof_damping, np.float32), (E, 1))
    damp *= rng.uniform(0.5, 1.5, damp.shape).astype(np.float32)
    mB = m.replace(
        body_ipos=jnp.asarray(ipos), dof_damping=jnp.asarray(damp)
    )
    assert smooth_pallas_supported(mB, bf, E, jnp.float32)

    dB = _state_f32(m, mj, E)
    dB = dB.replace(
        mocap_pos=jnp.asarray(
            rng.uniform(-1, 1, (E, 1, 3)), jnp.float32
        ),
        mocap_quat=jnp.asarray(
            rng.standard_normal((E, 1, 4)), jnp.float32
        ),
    )
    axes = model_in_axes(mB, bf)

    monkeypatch.setenv("MJLAB_TPU_SOLVER", "pallas2")
    monkeypatch.setenv("MJLAB_TPU_SOLVER_INTERPRET", "1")

    monkeypatch.setenv("MJLAB_TPU_SMOOTH", "vmap")
    step_a = jax.jit(lambda dd: step_hybrid(mB, bf, dd, axes, lean=True))
    da = dB
    for _ in range(3):
        da = step_a(da)

    monkeypatch.setenv("MJLAB_TPU_SMOOTH", "pallas")
    assert _use_smooth_pallas(mB, bf, dB, E)
    step_b = jax.jit(lambda dd: step_hybrid(mB, bf, dd, axes, lean=True))
    db = dB
    for _ in range(3):
        db = step_b(db)

    for f, tol in (
        ("qpos", 1e-4), ("qvel", 1e-3), ("qacc", 5e-3),
        ("qfrc_constraint", 5e-3), ("efc_force", 5e-3),
        ("condist", 1e-4),
    ):
        err = _rel_err(getattr(da, f), getattr(db, f))
        assert err < tol, f"{f}: {err:.2e}"
    assert int(np.asarray(db.ncheck_reset).sum()) == 0

    # the DR inputs actually reach the kernels: envs differ
    qa = np.asarray(db.qacc)
    assert np.abs(qa - qa[0]).max() > 1e-6
