"""Fused assembly+solve Pallas kernel (phys/solver_pallas2.py) parity.

The kernel rebuilds the contact Jacobian block in VMEM and runs the whole
Newton solve; on CPU it executes in Pallas interpret mode. Gate: one lean
hybrid step with MJLAB_TPU_SOLVER=pallas2 must match the pure env-last
solver (solve_lm) within the solve's own f32 sensitivity — measured at
~1.6e-4 relative output change for a 1-ulp input perturbation on the toy
model (the Newton solve is iteration-capped at f32, so independent
implementations land at different points of the tolerance ball)."""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.phys.data import make_data
from mjlab_tpu.phys.hybrid import step_hybrid, _use_pallas2
from mjlab_tpu.phys.model import put_model
from mjlab_tpu.sim.sim import model_in_axes

from test_hybrid_parity import TOY_XML


def _state_f32(m, mj, E, seed=0):
    rng = np.random.default_rng(seed)
    d0 = make_data(m, dtype=jnp.float32)
    dB = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), d0
    )
    qpos = np.tile(np.asarray(m.qpos0, np.float32), (E, 1))
    qpos += 0.03 * rng.standard_normal(qpos.shape).astype(np.float32)
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:
            a = mj.jnt_qposadr[j] + 3
            qpos[:, a:a + 4] /= np.linalg.norm(
                qpos[:, a:a + 4], axis=1, keepdims=True
            )
    return dB.replace(
        qpos=jnp.asarray(qpos),
        qvel=jnp.asarray(
            0.3 * rng.standard_normal((E, m.nv)), jnp.float32
        ),
        ctrl=jnp.asarray(
            0.2 * rng.standard_normal((E, m.nu)), jnp.float32
        ),
    )


def _run_both(m, mj, E, monkeypatch, steps=1, settle=0):
    """settle > 0 first advances the random initial state with the pure
    engine and compares from there. The random state interpenetrates
    hard; on the elliptic toy (impratio=10, condim-6 rows with tiny
    torsion/roll D) the solve there is so ill-conditioned that a 1-ulp
    qvel perturbation moves the PURE path's own qacc by 0.26 relative —
    no implementation comparison is meaningful at that state. A few
    settling steps reach the production contact regime where the
    termination ball is ~1e-4 again."""
    dB = _state_f32(m, mj, E)
    axes = model_in_axes(m, frozenset())

    monkeypatch.setenv("MJLAB_TPU_SOLVER", "pure")
    step_pure = jax.jit(
        lambda dd: step_hybrid(m, frozenset(), dd, axes, lean=True)
    )
    for _ in range(settle):
        dB = step_pure(dB)
    da = dB
    for _ in range(steps):
        da = step_pure(da)

    monkeypatch.setenv("MJLAB_TPU_SOLVER", "pallas2")
    monkeypatch.setenv("MJLAB_TPU_SOLVER_INTERPRET", "1")
    assert _use_pallas2(m, da, E)
    step_k = jax.jit(
        lambda dd: step_hybrid(m, frozenset(), dd, axes, lean=True)
    )
    db = dB
    for _ in range(steps):
        db = step_k(db)
    return da, db


def _assert_close(da, db, tol):
    errs = {}
    for f in ("qacc", "qvel", "qpos", "qfrc_constraint", "efc_force",
              "con_force_c", "con_torque_c"):
        a = np.asarray(getattr(da, f), np.float64)
        b = np.asarray(getattr(db, f), np.float64)
        if a.size == 0:
            continue
        scale = max(1.0, float(np.abs(a).max()))
        # per-row forces (and their contact force/torque decodes) are the
        # most ulp-sensitive outputs (rows at the complementarity boundary
        # flip with the last float of jar; elliptic torsion/roll rows sit
        # ON the cone surface at convergence); the dynamics-driving
        # aggregates stay at tol
        errs[f] = float(np.abs(a - b).max()) / scale
        lim = (
            3 * tol
            if f in ("efc_force", "con_force_c", "con_torque_c")
            else tol
        )
        assert errs[f] < lim, f"{f}: max rel err {errs[f]:.3e} ({errs})"


@pytest.mark.slow
def test_pallas2_matches_pure_toy(monkeypatch):
    mj = mujoco.MjModel.from_xml_string(TOY_XML)
    m = put_model(mj, dtype=jnp.float32, nconmax=12)
    da, db = _run_both(m, mj, 128, monkeypatch)
    _assert_close(da, db, 2e-3)


@pytest.mark.slow
def test_pallas2_matches_pure_g1(monkeypatch):
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.scene.scene import Scene

    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = 1
    scene = Scene(cfg.scene)
    mj = scene.compile()
    cfg.sim.mujoco.apply(mj)
    m = put_model(mj, dtype=jnp.float32, nconmax=35)
    da, db = _run_both(m, mj, 128, monkeypatch)
    _assert_close(da, db, 2e-3)


def test_pallas2_gating():
    """pallas2 requires pyramidal cone + contacts + limits + f32 + E%128."""
    mj = mujoco.MjModel.from_xml_string(TOY_XML)
    m = put_model(mj, dtype=jnp.float32, nconmax=12)
    d = make_data(m, dtype=jnp.float32)
    dB = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (128,) + x.shape), d
    )
    os.environ.pop("MJLAB_TPU_SOLVER", None)
    assert not _use_pallas2(m, dB, 100)  # not lane-aligned
    d64 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (64,) + x.shape), d
    )
    assert not _use_pallas2(m, d64, 64)


ELL_XML = TOY_XML.replace(
    '<option timestep="0.002" integrator="implicitfast" iterations="8"',
    '<option cone="elliptic" impratio="10" timestep="0.002" '
    'integrator="implicitfast" iterations="8"',
).replace(
    '<geom type="box" size="0.05 0.03 0.02"/>',
    '<geom type="box" size="0.05 0.03 0.02" condim="6" '
    'friction="0.8 0.02 0.002"/>',
).replace(
    "</worldbody>",
    "</worldbody>\n  <equality>\n"
    '    <joint joint1="hip" joint2="knee" polycoef="0 0.5 0 0 0"/>\n'
    "  </equality>",
)


@pytest.mark.slow
def test_pallas2_matches_pure_elliptic_toy(monkeypatch):
    """Elliptic-cone kernel mode (round 5): 3-zone cone cost/force/
    Hessian inside the fused kernel vs solve_lm's elliptic path, on a toy
    with condim 3+6 contacts and a joint equality (the YAM lift-cube
    feature set: cone="elliptic", impratio=10 — reference
    src/mjlab/tasks/manipulation/lift_cube_env_cfg.py)."""
    mj = mujoco.MjModel.from_xml_string(ELL_XML)
    m = put_model(mj, dtype=jnp.float32, nconmax=12)
    assert int(m.opt.cone) == 1 and m.rows_per_con == 6 and m.neq_jnt == 1
    da, db = _run_both(m, mj, 128, monkeypatch, settle=10)
    _assert_close(da, db, 2e-3)


@pytest.mark.slow
def test_pallas2_matches_pure_elliptic_multistep(monkeypatch):
    """Trajectory-level gate: the per-step solver outputs are covered by
    the single-step test; over 5 chained steps the elliptic contact
    dynamics amplify the f32 termination ball by ~3x/step (the SAME
    divergence arises between two pure-path runs whose inputs differ by
    1 ulp), so the multistep check gates the integrated state at the
    measured chaos scale instead of the raw accelerations."""
    mj = mujoco.MjModel.from_xml_string(ELL_XML)
    m = put_model(mj, dtype=jnp.float32, nconmax=12)
    da, db = _run_both(m, mj, 128, monkeypatch, steps=5, settle=10)
    for f, tol in (("qpos", 2e-4), ("qvel", 2e-2)):
        a = np.asarray(getattr(da, f), np.float64)
        b = np.asarray(getattr(db, f), np.float64)
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(a - b).max()) / scale
        assert err < tol, f"{f}: max rel err {err:.3e}"
