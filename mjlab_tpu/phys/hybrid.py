"""Hybrid batched step: vmapped smooth stages + env-last hot stages.

The vmapped engine (phys/forward.py under jax.vmap) leaves array layout
to vmap: every intermediate is env-MAJOR, so the big contact/constraint
arrays carry tiny trailing dims (3/9/26/nv) on the TPU (8, 128) tile and
pay 2-4x physical HBM traffic plus ~30 under-utilized fusions per substep
(PERF_NOTES.md round-1 trace: ~40 ms narrowphase+smooth and ~23 ms Newton
at 4096 envs). The lane-major engine (phys/lm/) fixes the layout but its
scalar-plane kinematics/RNE blow up compile time at robot scale
(scripts/lm_stage_compile.py: 22.7k jaxpr eqns in kinematics alone; the
full G1 step exceeds 50 min of XLA CPU compile).

This module composes the best of both, per stage (measured per-stage
compile costs in scripts/lm_stage_compile.py):

    kinematics/com_pos/crb/transmission/
    com_vel/rne/passive/actuation/integrate   -> vmapped (small data,
                                                 cheap compile)
    narrowphase + top-K compaction +
    contact constraint rows                   -> env-last lm code
                                                 (3.2k + 1.1k eqns)
    Newton constraint solve                   -> env-last lm solver
                                                 (Pallas kernel on TPU)

Boundary transposes move only the SMALL arrays (geom_xpos/xmat, cdof,
subtree_com, qM, qacc vectors); the full (E, ncon, 26) contact table and
the (E, nefc, nv) constraint Jacobian never materialize env-first — the
contact table is written back env-first ONCE per substep for the contact
sensors, instead of being re-read by ~30 padded fusions.

Semantics match phys/forward.step exactly (same formulas, same row
layout, same solver numerics with the bisection line search); gated by
`hybrid_supported` and verified by tests/test_hybrid_parity.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys import forward as fwd
from mjlab_tpu.phys import smooth
from mjlab_tpu.phys.collision import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_HFIELD, GEOM_PLANE, GEOM_SPHERE,
)
from mjlab_tpu.phys.data import Data
from mjlab_tpu.phys.kinematics import com_pos, kinematics
from mjlab_tpu.phys.lm.base import Params
from mjlab_tpu.phys.lm.collision import collision_lm, slot_params
from mjlab_tpu.phys.lm.constraint import make_constraint_lm
from mjlab_tpu.phys.lm.solver import solve_lm
from mjlab_tpu.phys.model import Model
from mjlab_tpu.phys.solver import _decode_contact_forces_batched

_LM_PAIR_KEYS = {
    (GEOM_PLANE, GEOM_SPHERE), (GEOM_PLANE, GEOM_CAPSULE),
    (GEOM_PLANE, GEOM_BOX),
    (GEOM_SPHERE, GEOM_SPHERE), (GEOM_SPHERE, GEOM_CAPSULE),
    (GEOM_SPHERE, GEOM_BOX),
    (GEOM_CAPSULE, GEOM_CAPSULE), (GEOM_CAPSULE, GEOM_BOX),
    (GEOM_BOX, GEOM_BOX),
    (GEOM_HFIELD, GEOM_SPHERE), (GEOM_HFIELD, GEOM_CAPSULE),
    (GEOM_HFIELD, GEOM_BOX),
}


def hybrid_supported(m: Model) -> bool:
    """True when the env-last fast path covers this model's features.

    Both friction cones are supported (elliptic via the 3-zone env-last
    solver, lm/solver.py); activation dynamics live entirely in the
    vmapped actuation/integrate stages so na is unrestricted. Only
    tendons remain excluded: their limit rows are not assembled by the
    lm constraint (models with tendons fall back to the vmapped engine)."""
    if m.ntendon:
        return False
    pt = m.pairs
    if pt.ncon:
        t1 = np.asarray(m.geom_type)[pt.geom1]
        t2 = np.asarray(m.geom_type)[pt.geom2]
        keys = {(int(a), int(b)) for a, b in zip(t1, t2)}
        if not keys <= _LM_PAIR_KEYS:
            return False
    return True


def _planes_from(arr_t, n, w):
    """(n, w, E) -> list of n w-tuples of (E,) planes (cheap views)."""
    return [tuple(arr_t[i, j] for j in range(w)) for i in range(n)]


def _contact_envlast(m: Model, bf: frozenset, d: Data,
                     assemble_j: bool = True):
    """Env-last narrowphase + compaction + constraint rows. Returns the
    lm `k` dict (holding all env-last efc arrays) and the Params view.
    assemble_j=False defers the contact-Jacobian build to the fused
    Pallas assemble+solve kernel (see make_constraint_lm)."""
    E = d.qpos.shape[0]
    dtype = d.qpos.dtype
    P = Params(m, bf, E)
    G = m.ngeom

    gxT = jnp.moveaxis(d.geom_xpos, 0, -1)  # (G, 3, E)
    gmT = jnp.moveaxis(d.geom_xmat.reshape(E, G, 9), 0, -1)  # (G, 9, E)
    scT = jnp.moveaxis(d.subtree_com, 0, -1)  # (nbody, 3, E)
    cdT = jnp.moveaxis(d.cdof, 0, -1)  # (nv, 6, E)
    k = {
        "geom_xpos": _planes_from(gxT, G, 3),
        "geom_xmat": _planes_from(gmT, G, 9),
        "subtree_com": _planes_from(scT, m.nbody, 3),
        "cdof": _planes_from(cdT, m.nv, 6),
    }
    k = collision_lm(m, P, k, dtype)

    qT = d.qpos.T
    vT = d.qvel.T
    q = tuple(qT[i] for i in range(m.nq))
    qvel = tuple(vT[i] for i in range(m.nv))
    k = make_constraint_lm(m, P, k, q, qvel, dtype, assemble_j=assemble_j)
    return k, P


def _writeback_position(m: Model, d: Data, k: dict, P: Params,
                        lean: bool = False) -> Data:
    """Write the env-first Data fields downstream consumers read.

    lean=True is the per-substep hot path: it writes only what the env
    step actually consumes — condist/con_found (sensor activity), the
    compacted K-slot record (sensor geometry + force decode, viewers).
    The big (E, ncon, 26) packed table and the env-first efc_* rows are
    introspection/parity surfaces; materializing them costs ~4 ms per
    substep at 4096 envs, so they are written only on the full path
    (sim.forward: reset/startup, viewers, tests)."""
    E = d.qpos.shape[0]
    dtype = d.qpos.dtype
    mv = lambda x: jnp.moveaxis(x, -1, 0)  # noqa: E731
    upd = {}
    if not lean:
        upd = dict(
            efc_D=k["efc_D"].T,
            efc_aref=k["efc_aref"].T,
            efc_frictionloss=k["efc_fl"].T,
            efc_pos=k["efc_pos"].T,
            efc_margin=k["efc_margin"].T,
            efc_active=k["efc_active"].T,
            efc_Jeq=mv(jnp.broadcast_to(k["efc_Jeq"], (m.neq_jnt, m.nv, E))),
            efc_lim_side=k["efc_lim_side"].T,
            efc_Jc=mv(k["efc_Jc"]),
        )
    S = m.pairs.ncon
    if S:
        f5, sr, si, inclm = slot_params(m, P, dtype)  # (S, *, Eb)
        found = k["con_dist"] < inclm  # (S, E) via broadcast
        upd.update(
            condist=k["con_dist"].T,
            con_found=found.T,
        )
        if not lean:

            def b3(x, width):
                return jnp.broadcast_to(x, (S, width, E))

            packed_t = jnp.concatenate(
                [
                    k["con_dist"][:, None],
                    b3(inclm[:, None, :], 1),
                    k["con_pos"],
                    b3(f5, 5), b3(sr, 2), b3(si, 5),
                    k["con_frame"],
                ],
                axis=1,
            )  # (S, 26, E)
            upd.update(
                contact=d.contact.replace(packed=mv(packed_t)),
                connormal=mv(k["con_frame"][:, 0:3]),
            )
    K = m.ncon_max
    if S and K:
        cpk = jnp.concatenate(
            [
                k["con_dist_k"][:, None],
                k["con_margin_k"][:, None],
                k["con_pos_k"],
                k["con_mu_k"],
                k["con_solref_k"],
                jnp.broadcast_to(k["con_solimp_k"], (K, 5, E)),
                k["con_frame_k"],
                k["con_dim_k"][:, None],
            ],
            axis=1,
        )  # (K, 27, E)
        upd.update(
            con_sel=k["con_sel"].T.astype(jnp.int32),
            con_sel_active=k["con_sel_active"].T,
            con_packed_c=mv(cpk),
        )
    return d.replace(**upd)


def _batched_stage(fn, m_axes):
    return jax.vmap(fn, in_axes=(m_axes, 0))


def _use_pallas(m: Model, d: Data, E: int) -> bool:
    import os

    mode = os.environ.get("MJLAB_TPU_SOLVER", "auto")
    return (
        mode != "pure"
        and (jax.default_backend() != "cpu" or mode == "pallas")
        and E % 128 == 0
        and d.qpos.dtype == jnp.float32
        and m.nefc > 0
        # the Pallas kernels implement independent per-row costs only;
        # elliptic contacts (coupled (R, R) cone blocks) use solve_lm
        and int(m.opt.cone) == 0
    )


def _use_pallas2(m: Model, d: Data, E: int) -> bool:
    """Fused assembly+solve kernel (solver_pallas2.py): the production
    TPU hot path. MJLAB_TPU_SOLVER=auto|pallas2 selects it; =pallas keeps
    the round-2 solve-only kernel (XLA-side assembly); =pure uses
    solve_lm. Requires the lean step (the full writeback needs the
    XLA-assembled efc rows)."""
    import os

    mode = os.environ.get("MJLAB_TPU_SOLVER", "auto")
    return (
        mode in ("auto", "pallas2")
        and (jax.default_backend() != "cpu" or mode == "pallas2"
             or os.environ.get("MJLAB_TPU_SOLVER_INTERPRET"))
        and E % 128 == 0
        and d.qpos.dtype == jnp.float32
        and m.ncon_max > 0
        and m.pairs.ncon > 0
        and m.nlimit > 0  # kernel assumes a nonempty limit block
        # pyramid rows come in +-direction pairs; elliptic rows are
        # [n, t1, t2, torsion, roll1, roll2][:condim_max]
        and (int(m.opt.cone) != 0 or m.rows_per_con % 2 == 0)
    )


def _solve_pallas2_core(m: Model, k: dict, qM_cm, qfsT, wsT, vT, cdofT,
                        Mh_cm) -> dict:
    """Launch the fused assembly+solve kernel from the compact per-slot
    tensors (make_constraint_lm assemble_j=False outputs), all inputs
    env-last. Mh_cm is the integrator's implicit system matrix
    (nv*nv, E) or None; when given, the kernel also returns the
    integrated qacc (fwd.integrate skips its own dense factorization)."""
    import os

    from mjlab_tpu.phys.solver_pallas2 import newton_assemble_solve

    E = vT.shape[-1]
    nv = m.nv
    K = m.ncon_max
    R = m.rows_per_con
    cone = int(m.opt.cone)
    ndirs = (R - 1) if cone else R // 2
    neq = m.neq_jnt
    nlim = m.nlimit
    NC = neq + nv + nlim

    def cm(x):  # (K, w, E) -> component-major (w*K, E)
        return jnp.moveaxis(x, 0, 1).reshape(-1, E)

    Jeq = jnp.broadcast_to(k["efc_Jeq"], (neq, nv, E)).reshape(neq * nv, E)
    # con_on / con_W* / con_O* arrive in the kernel's own layouts from
    # make_constraint_lm kernel mode (r-major rows, dof/component major)
    # — plain reshapes, no transposes
    on_rm = k["con_on"].astype(jnp.float32)
    do_int = Mh_cm is not None
    # pyramidal: per-direction mu; elliptic: friction-row D (dir-major)
    mu_or_D = cm(k["con_Dfri"]) if cone else cm(k["con_mu_dirs"])

    x, fnc, fcon_rm, qfrc, a_smooth, qacc_int = newton_assemble_solve(
        qM_cm,
        qfsT, wsT, vT, Mh_cm,
        k["efc_D"][:NC], k["efc_aref"][:NC], k["efc_fl"][:NC],
        k["efc_lim_side"], Jeq,
        cdofT, cm(k["con_pos_k"]), k["con_O1"].reshape(3 * K, E),
        k["con_O2"].reshape(3 * K, E),
        cm(k["con_frame_k"]), mu_or_D,
        k["con_mut"] if cone else None,
        k["con_Dc"], k["con_bb"], k["con_kimp"], on_rm,
        k["con_W1"].reshape(nv * K, E), k["con_W2"].reshape(nv * K, E),
        nv=nv, K=K, R=R, ndirs=ndirs, neq=neq, nlim=nlim,
        lim_dofs=tuple(int(a) for a in m.jnt_dofadr[m.limit_jntid]),
        iterations=m.opt.iterations,
        ls_iterations=max(m.opt.ls_iterations, 8),
        tolerance=float(m.opt.tolerance),
        do_int=do_int, cone=cone,
        interpret=bool(os.environ.get("MJLAB_TPU_SOLVER_INTERPRET")),
    )
    fcon = jnp.moveaxis(fcon_rm.reshape(R, K, E), 0, 1).reshape(R * K, E)
    force = jnp.concatenate([fnc, fcon], axis=0)
    out = dict(
        qacc=x, efc_force=force, qfrc_constraint=qfrc,
        qacc_smooth=a_smooth,
    )
    if do_int:
        out["qacc_int"] = qacc_int
    return out


def _solve_pallas2_envlast(m: Model, k: dict, d: Data, Mh) -> dict:
    """Env-first entry: derive the env-last kernel inputs from Data."""
    E = d.qpos.shape[0]
    nv = m.nv
    qM_cm = jnp.swapaxes(k["qM_dense"], 0, 1).reshape(nv * nv, E)
    cdofT = jnp.moveaxis(d.cdof, 0, -1).reshape(nv * 6, E)
    Mh_cm = (
        jnp.moveaxis(Mh, 0, -1).reshape(nv * nv, E)
        if Mh is not None else None
    )  # (i, j, E) row-major flattened == column-major of Mh^T == Mh (SPD)
    return _solve_pallas2_core(
        m, k, qM_cm, d.qfrc_smooth.T, d.qacc_warmstart.T, d.qvel.T,
        cdofT, Mh_cm,
    )


def _solve_pallas_envlast(m: Model, k: dict, d: Data) -> dict:
    """Dense env-last J assembly + the fused Pallas Newton kernel."""
    from mjlab_tpu.phys.model import (
        EFC_CONTACT, EFC_EQUALITY, EFC_FRICTION_DOF, EFC_LIMIT_JOINT,
        EFC_LIMIT_TENDON, limit_rows_static,
    )
    from mjlab_tpu.phys.solver_pallas import newton_solve_pallas_envlast

    E = d.qpos.shape[0]
    nv = m.nv
    dtype = d.qpos.dtype
    nlimit = m.nlimit + m.nlimit_ten
    parts = []
    if m.neq_jnt:
        parts.append(jnp.broadcast_to(k["efc_Jeq"], (m.neq_jnt, nv, E)))
    parts.append(jnp.broadcast_to(jnp.eye(nv, dtype=dtype)[..., None], (nv, nv, E)))
    if nlimit:
        Pl = jnp.asarray(limit_rows_static(m), dtype)  # (nlimit, nv)
        parts.append(k["efc_lim_side"][:, None, :] * Pl[..., None])
    if k["efc_Jc"].shape[0]:
        parts.append(k["efc_Jc"])
    Jrows = jnp.concatenate(parts, axis=0)  # (nefc, nv, E)
    Jt = jnp.swapaxes(Jrows, 0, 1)  # (nv, nefc, E)

    os_mask = tuple(
        bool(b)
        for b in (m.efc_type == EFC_LIMIT_JOINT)
        | (m.efc_type == EFC_LIMIT_TENDON)
        | (m.efc_type == EFC_CONTACT)
    )
    fr_mask = tuple(bool(b) for b in m.efc_type == EFC_FRICTION_DOF)
    eq_mask = tuple(bool(b) for b in m.efc_type == EFC_EQUALITY)
    x, force = newton_solve_pallas_envlast(
        Jt, k["efc_D"], k["efc_aref"], k["efc_fl"], k["qM_dense"],
        d.qacc_smooth.T, d.qacc_warmstart.T,
        nv=nv, nefc=m.nefc,
        os_mask=os_mask, fr_mask=fr_mask, eq_mask=eq_mask,
        iterations=m.opt.iterations,
        ls_iterations=max(m.opt.ls_iterations, 8),
        tolerance=float(m.opt.tolerance),
    )
    qfrc_constraint = jnp.einsum("vre,re->ve", Jt, force)
    return dict(qacc=x, efc_force=force, qfrc_constraint=qfrc_constraint)


def _forward_hybrid_impl(m: Model, bf: frozenset, d: Data, m_axes,
                         lean: bool):
    """Batched mj_forward; returns (Data, qacc_int or None) — qacc_int is
    the integrator's implicit velocity update when the fused kernel
    already solved it (step_hybrid then skips the XLA factorization)."""
    vm = lambda f: _batched_stage(f, m_axes)  # noqa: E731
    E = d.qpos.shape[0]
    # the fused assembly+solve kernel owns the contact J/D/aref rows, so
    # the XLA-side assembly is skipped — only valid on the lean hot path
    # (the full writeback exposes the XLA-assembled efc rows)
    use2 = lean and _use_pallas2(m, d, E)
    d = vm(kinematics)(m, d)
    d = vm(com_pos)(m, d)
    # use2: qLD/qLDinv have no consumer (solve_m and the integrator solve
    # both run inside the kernel) — skip the XLA dense factor+inverse
    d = vm(lambda mm, dd: smooth.crb(mm, dd, factor=not use2))(m, d)
    k, P = _contact_envlast(m, bf, d, assemble_j=not use2)
    d = _writeback_position(m, d, k, P, lean=lean)
    d = vm(smooth.transmission)(m, d)
    d = vm(smooth.com_vel)(m, d)
    d = vm(smooth.rne)(m, d)
    d = vm(smooth.passive)(m, d)
    d = vm(smooth.fwd_actuation)(m, d)

    qacc_int = None
    k["qM_dense"] = jnp.moveaxis(d.qM, 0, -1)  # (nv, nv, E)
    if use2:
        # qfrc_smooth only — qacc_smooth comes back from the kernel
        def accel_frc(mm, dd):
            qfrc_smooth = (
                dd.qfrc_passive - dd.qfrc_bias + dd.qfrc_actuator
                + dd.qfrc_applied + smooth.xfrc_accumulate(mm, dd)
            )
            return dd.replace(qfrc_smooth=qfrc_smooth)

        d = vm(accel_frc)(m, d)
        # integrator_mh is a static decision on the model options; build
        # the batched system matrix only when an implicit update runs
        Mh = (
            jax.vmap(fwd.integrator_mh, in_axes=(m_axes, 0))(m, d)
            if _has_implicit(m) else None
        )
        sol = _solve_pallas2_envlast(m, k, d, Mh)
        d = d.replace(qacc_smooth=sol["qacc_smooth"].T)
        if "qacc_int" in sol:
            qacc_int = sol["qacc_int"].T
    elif _use_pallas(m, d, E):
        d = vm(fwd.fwd_acceleration)(m, d)
        sol = _solve_pallas_envlast(m, k, d)
    else:
        d = vm(fwd.fwd_acceleration)(m, d)
        sol = solve_lm(
            m, P, k, d.qacc_smooth.T, d.qacc_warmstart.T, d.qpos.dtype
        )
    qacc = sol["qacc"].T
    efc_force = sol["efc_force"].T
    d = d.replace(
        qacc=qacc,
        qacc_warmstart=qacc,
        qfrc_constraint=sol["qfrc_constraint"].T,
        efc_force=efc_force,
    )
    if m.ncon_max and m.pairs.ncon:
        cf, ct = _decode_contact_forces_batched(m, d, efc_force)
        d = d.replace(con_force_c=cf, con_torque_c=ct)
    return d, qacc_int


def _has_implicit(m: Model) -> bool:
    from mjlab_tpu.phys.model import (
        DSBL_EULERDAMP, INT_EULER, INT_IMPLICITFAST,
    )

    if m.opt.integrator == INT_IMPLICITFAST:
        return True
    return m.opt.integrator == INT_EULER and not (
        m.opt.disableflags & DSBL_EULERDAMP
    )


def _use_smooth_pallas(m: Model, bf: frozenset, d: Data, E: int) -> bool:
    """Select the fully env-last substep (smooth Pallas kernels + contact
    stack + fused solve, phys/smooth_pallas.py). Requires the pallas2
    solver path plus kernel coverage of the smooth stages."""
    import os

    from mjlab_tpu.phys.smooth_pallas import smooth_pallas_supported

    mode = os.environ.get("MJLAB_TPU_SMOOTH", "auto")
    if mode == "vmap":
        return False
    if not (
        jax.default_backend() != "cpu"
        or mode == "pallas"
        or os.environ.get("MJLAB_TPU_SOLVER_INTERPRET")
    ):
        return False
    return (
        _use_pallas2(m, d, E)
        and smooth_pallas_supported(m, bf, E, d.qpos.dtype)
    )


def _step_envlast(m: Model, bf: frozenset, d: Data) -> Data:
    """One physics step with EVERY stage env-last: the smooth Pallas
    kernels feed the env-last contact stack (lm/{collision,constraint})
    and the fused assemble+solve kernel; integration runs on planes. The
    only env-first<->env-last traffic left is the tiny qpos/qvel/ctrl
    transposes in and the lean writeback out — the vmapped smooth fusion
    soup and the geom/cdof boundary transposes of the round-3 hybrid
    substep are gone (round-4 trace: they were ~7 of 10.4 ms)."""
    import os

    from mjlab_tpu.phys.smooth_pallas import (
        collision_geoms, crb_packed, integrate_envlast, kin_com,
        qm_dense_cm, vel_smooth,
    )

    interp = bool(os.environ.get("MJLAB_TPU_SOLVER_INTERPRET"))
    E = d.qpos.shape[0]
    dtype = d.qpos.dtype
    nv, nb, nq, nu = m.nv, m.nbody, m.nq, m.nu
    P = Params(m, bf, E)

    qT = d.qpos.T
    vT = d.qvel.T
    ctrlT = d.ctrl.T

    mcT = mcqT = None
    if m.nmocap:
        mcT = jnp.moveaxis(d.mocap_pos, 0, -1)  # (nmocap, 3, E)
        mcqT = jnp.moveaxis(d.mocap_quat, 0, -1)  # (nmocap, 4, E)
    from mjlab_tpu.phys.smooth_pallas import dr_smooth_inputs

    dr = dr_smooth_inputs(m, bf, dtype)
    gxpos, gxmat, subcom, cdof, cinA, cinc, xipos, _, _ = kin_com(
        m, qT, mcT, mcqT, interp, bf=bf, dr=dr
    )

    # contact stack on planes straight from the kernel outputs;
    # non-collision geoms get zero placeholder planes (collision_lm
    # stacks the full geom table but only ever indexes pair geoms)
    zplane = jnp.zeros((1,), dtype)
    k = {
        "geom_xpos": [(zplane,) * 3] * m.ngeom,
        "geom_xmat": [(zplane,) * 9] * m.ngeom,
        "subtree_com": [
            tuple(subcom[b, c] for c in range(3)) for b in range(nb)
        ],
        "cdof": [tuple(cdof[i, c] for c in range(6)) for i in range(nv)],
    }
    for o, g in enumerate(collision_geoms(m)):
        k["geom_xpos"][g] = tuple(gxpos[o, c] for c in range(3))
        k["geom_xmat"][g] = tuple(gxmat[o, c] for c in range(9))
    k = collision_lm(m, P, k, dtype)
    q_planes = tuple(qT[i] for i in range(nq))
    v_planes = tuple(vT[i] for i in range(nv))
    k = make_constraint_lm(
        m, P, k, q_planes, v_planes, dtype, assemble_j=False
    )

    xfrcT = jnp.moveaxis(d.xfrc_applied, 0, -1)
    qfaT = d.qfrc_applied.T
    qfs, afrc, avel, mh_diag = vel_smooth(
        m, qT, vT, ctrlT, cdof, cinA, cinc, (subcom, xipos, xfrcT, qfaT),
        interp, bf=bf, dr=dr,
    )
    qM_pairs = crb_packed(m, cdof, cinA, cinc, interp, bf=bf, dr=dr)
    qM_cm = qm_dense_cm(m, qM_pairs)

    Mh_cm = None
    if _has_implicit(m):
        diag_rows = jnp.asarray(
            np.arange(nv, dtype=np.int32) * nv
            + np.arange(nv, dtype=np.int32)
        )
        Mh_cm = qM_cm.at[diag_rows].add(mh_diag)

    cdofT = cdof.reshape(nv * 6, E)  # (nv, 6, E) is already dof-major
    sol = _solve_pallas2_core(
        m, k, qM_cm, qfs, d.qacc_warmstart.T, vT, cdofT, Mh_cm
    )
    qacc = sol["qacc"]  # (nv, E)
    qacc_int = sol.get("qacc_int", qacc)

    qT_new, vT_new, bad = integrate_envlast(m, qT, vT, qacc_int)

    d = _writeback_position(m, d, k, P, lean=True)
    efc_force = sol["efc_force"].T
    d = d.replace(
        qpos=qT_new.T,
        qvel=vT_new.T,
        qacc=qacc.T,
        qacc_warmstart=jnp.where(bad[:, None], 0.0, qacc.T),
        qacc_smooth=sol["qacc_smooth"].T,
        qfrc_constraint=sol["qfrc_constraint"].T,
        efc_force=efc_force,
        actuator_force=afrc.T if nu else d.actuator_force,
        actuator_velocity=avel.T if nu else d.actuator_velocity,
        time=d.time + m.opt.timestep,
        ncheck_reset=d.ncheck_reset + bad.astype(jnp.int32),
        ncon_overflow=d.ncon_overflow + jnp.maximum(
            jnp.sum(d.con_found.astype(jnp.int32), axis=-1) - m.ncon_max, 0
        ),
    )
    if m.ncon_max and m.pairs.ncon:
        cf, ct = _decode_contact_forces_batched(m, d, efc_force)
        d = d.replace(con_force_c=cf, con_torque_c=ct)
    return d


def forward_hybrid(m: Model, bf: frozenset, d: Data, m_axes,
                   lean: bool = False) -> Data:
    """Batched mj_forward. d is env-first batched; m may carry DR-batched
    fields (axis 0) per `bf`/`m_axes`. lean skips the introspection-only
    writebacks (see _writeback_position)."""
    d, _ = _forward_hybrid_impl(m, bf, d, m_axes, lean)
    return d


def step_hybrid(m: Model, bf: frozenset, d: Data, m_axes,
                lean: bool = True) -> Data:
    """Batched mj_step with env-last hot stages. The decimation hot loop
    runs lean (no full packed-table/efc writeback); pass lean=False for
    parity tests that diff the whole Data surface. When the smooth Pallas
    kernels cover the model (round 4), the lean step runs FULLY env-last."""
    if lean and _use_smooth_pallas(m, bf, d, d.qpos.shape[0]):
        return _step_envlast(m, bf, d)
    d, qacc_int = _forward_hybrid_impl(m, bf, d, m_axes, lean)
    if qacc_int is None:
        return _batched_stage(fwd.integrate, m_axes)(m, d)
    return jax.vmap(fwd.integrate, in_axes=(m_axes, 0, 0))(m, d, qacc_int)


# ---------------------------------------------------------------------------
# env-layer kinematic refresh on the env-last kernel path
# ---------------------------------------------------------------------------
#
# The env calls a full-surface kinematic refresh once per CONTROL step
# (after masked resets, before observations — the reference calls
# mjwarp forward there, reference src/mjlab/envs/manager_based_rl_env.py
# reset path). The lean env-last substep intentionally skips the
# kinematic writebacks, so this refresh is what keeps
# xpos/xquat/geom/site frames, subtree_com, cdof, cinert, cvel and
# cdof_dot fresh for the manager/observation layer. The vmapped
# kinematics+com_pos+com_vel refresh was the largest remaining
# env-layer cost (~2-4 ms/control step at 4096 envs, PERF_NOTES.md
# round-4); this path reuses the kin_com Pallas kernel (already compiled
# for the substep) and expands the remaining fields in env-last XLA:
# everything is elementwise on (rows, E) planes plus two tiny static
# ancestor-structure matmuls for cvel/cdof_dot.


def _quat_mat_planes(q):
    """(n, 4, E) quats -> (n, 9, E) row-major rotation matrices."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
         2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
         2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
        axis=1,
    )


def _mat_mul_planes(a, b):
    """Row-major 3x3 products on (n, 9, E) planes (broadcasts)."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(
                sum(a[:, 3 * i + k] * b[:, 3 * k + j] for k in range(3))
            )
    return jnp.stack(out, axis=1)


def _rot_planes(R, v):
    """(n, 9, E) rotations applied to (n, 3, E) vectors."""
    return jnp.stack(
        [sum(R[:, 3 * i + k] * v[:, k] for k in range(3)) for i in range(3)],
        axis=1,
    )


def _cross_planes(a, b):
    """(n, 3, E) x (n, 3, E)."""
    return jnp.stack(
        [a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
         a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
         a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]],
        axis=1,
    )


def _mfld(m: Model, bf: frozenset, name: str):
    """Model field as env-last planes: (rows..., E) when DR-batched per
    bf, else the shared (rows..., 1) value (broadcasts against planes)."""
    v = getattr(m, name)
    if name in bf:
        return jnp.moveaxis(v, 0, -1)
    return jnp.asarray(v)[..., None]


def _cvel_structure(m: Model):
    """Static accumulation structure of mj_comVel: A (nbody, nv) sums
    ancestor-dof contributions into body cvel; B (nv, nv) sums the
    contributions accumulated BEFORE each dof (the velocity cdof_dot's
    motion_cross uses — free-joint translation dofs see none, rotation
    dofs see ancestors + their own translations; see smooth.com_vel)."""
    from mjlab_tpu.phys.model import JNT_BALL, JNT_FREE

    nb, nv = m.nbody, m.nv
    parent = np.asarray(m.body_parentid)
    jadr_ = np.asarray(m.body_jntadr)
    jnum_ = np.asarray(m.body_jntnum)
    jtype_ = np.asarray(m.jnt_type)
    vadr_ = np.asarray(m.jnt_dofadr)

    A = np.zeros((nb, nv), np.float32)
    B = np.zeros((nv, nv), np.float32)
    body_dofs: list[list[int]] = [[] for _ in range(nb)]

    for b in range(1, nb):
        anc = list(body_dofs[parent[b]])  # dofs accumulated at parent
        seen = list(anc)
        for k in range(int(jnum_[b])):
            j = int(jadr_[b] + k)
            jt = int(jtype_[j])
            va = int(vadr_[j])
            if jt == JNT_FREE:
                # translation dofs: cdof_dot = 0 (B rows stay zero)
                seen = seen + [va, va + 1, va + 2]
                for i in range(3, 6):
                    B[va + i, seen] = 1.0
                seen = seen + [va + 3, va + 4, va + 5]
            elif jt == JNT_BALL:
                for i in range(3):
                    B[va + i, seen] = 1.0
                seen = seen + [va, va + 1, va + 2]
            else:
                B[va, seen] = 1.0
                seen = seen + [va]
        body_dofs[b] = seen
        A[b, seen] = 1.0
    return A, B


def refresh_envlast(m: Model, bf: frozenset, d: Data) -> Data:
    """Full-surface kinematic refresh of every env, env-last.

    Writes the fields the manager/observation/sensor layer consumes:
    xpos/xquat/xmat/xipos/ximat, geom/site frames, subtree_com, cinert,
    cdof, cvel, cdof_dot. xanchor/xaxis are NOT refreshed (no consumer
    outside the physics step, which recomputes them internally).
    Numerically matches the vmapped kinematics+com_pos+com_vel refresh
    (tests/test_refresh_envlast.py)."""
    import os

    from mjlab_tpu.phys.smooth_pallas import dr_smooth_inputs, kin_com

    interp = bool(os.environ.get("MJLAB_TPU_SOLVER_INTERPRET"))
    E = d.qpos.shape[0]
    nb, nv, ng, ns = m.nbody, m.nv, m.ngeom, m.nsite

    qT = d.qpos.T
    vT = d.qvel.T
    mcT = mcqT = None
    if m.nmocap:
        mcT = jnp.moveaxis(d.mocap_pos, 0, -1)
        mcqT = jnp.moveaxis(d.mocap_quat, 0, -1)
    dr = dr_smooth_inputs(m, bf, d.qpos.dtype)
    _, _, subcom, cdof, cinA, cinc, xipos, xpos, xquat = kin_com(
        m, qT, mcT, mcqT, interp, bf=bf, dr=dr
    )

    xmat = _quat_mat_planes(xquat)  # (nb, 9, E)
    ximat = _mat_mul_planes(xmat, _quat_mat_planes(_mfld(m, bf, "body_iquat")))

    gb = np.asarray(m.geom_bodyid)
    gxmat = _mat_mul_planes(
        xmat[gb], _quat_mat_planes(_mfld(m, bf, "geom_quat"))
    )
    gxpos = xpos[gb] + _rot_planes(xmat[gb], _mfld(m, bf, "geom_pos"))
    if ns:
        sb = np.asarray(m.site_bodyid)
        sxmat = _mat_mul_planes(
            xmat[sb], _quat_mat_planes(jnp.asarray(m.site_quat)[..., None])
        )
        sxpos = xpos[sb] + _rot_planes(
            xmat[sb], jnp.asarray(m.site_pos)[..., None]
        )

    # cvel / cdof_dot: two static ancestor-structure contractions
    A, B = _cvel_structure(m)
    cd_v = cdof * vT[:, None, :]  # (nv, 6, E)
    cvel = jnp.einsum("bj,jce->bce", jnp.asarray(A), cd_v)
    vb = jnp.einsum("ij,jce->ice", jnp.asarray(B), cd_v)  # v before dof i
    cdof_dot = jnp.concatenate(
        [
            _cross_planes(vb[:, :3], cdof[:, :3]),
            _cross_planes(vb[:, 3:], cdof[:, :3])
            + _cross_planes(vb[:, :3], cdof[:, 3:]),
        ],
        axis=1,
    )

    # cinert 6x6 blocks from the kernel's (A sym6, c, mass) planes:
    # [[A, m skew(c)], [-m skew(c), m I]] (math.spatial_inertia)
    mass = _mfld(m, bf, "body_mass")  # (nb, E|1)
    c0, c1, c2 = cinc[:, 0], cinc[:, 1], cinc[:, 2]
    h0, h1, h2 = mass * c0, mass * c1, mass * c2
    z = jnp.zeros(jnp.broadcast_shapes(h0.shape, cinA[:, 0].shape),
                  d.qpos.dtype)
    mm = mass + z
    a00, a01, a02, a11, a12, a22 = (cinA[:, i] + z for i in range(6))
    cin36 = jnp.stack(
        [a00, a01, a02, z, -h2 + z, h1 + z,
         a01, a11, a12, h2 + z, z, -h0 + z,
         a02, a12, a22, -h1 + z, h0 + z, z,
         z, h2 + z, -h1 + z, mm, z, z,
         -h2 + z, z, h0 + z, z, mm, z,
         h1 + z, -h0 + z, z, z, z, mm],
        axis=1,
    )  # (nb, 36, E)

    def ef(x):  # (n, c, E) -> (E, n, c)
        return jnp.moveaxis(x, -1, 0)

    def ef9(x):  # (n, 9, E) -> (E, n, 3, 3)
        return jnp.moveaxis(x, -1, 0).reshape(E, x.shape[0], 3, 3)

    upd = dict(
        xpos=ef(xpos), xquat=ef(xquat), xmat=ef9(xmat),
        xipos=ef(xipos), ximat=ef9(ximat),
        geom_xpos=ef(gxpos) if ng else d.geom_xpos,
        geom_xmat=ef9(gxmat) if ng else d.geom_xmat,
        subtree_com=ef(subcom),
        cinert=ef(cin36).reshape(E, nb, 6, 6),
        cdof=ef(cdof), cvel=ef(cvel), cdof_dot=ef(cdof_dot),
    )
    if ns:
        upd.update(site_xpos=ef(sxpos), site_xmat=ef9(sxmat))
    return d.replace(**upd)
