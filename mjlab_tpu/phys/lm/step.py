"""Lane-major step orchestration: full mj_step / mj_forward semantics.

step_lm(m, bf, d) takes the standard env-first Data, transposes the small
input state to env-last planes, runs the whole substep lane-major, and
writes back the env-first fields consumed by managers/sensors. The big
internal arrays (full contact table, constraint Jacobian, mass matrix)
never materialize env-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.model import (
    DSBL_EULERDAMP, INT_EULER, INT_IMPLICITFAST,
    JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE, Model,
)
from mjlab_tpu.phys.data import Data
from mjlab_tpu.phys.lm.base import Params, quat_integrate
from mjlab_tpu.phys.lm.kinematics import kinematics_lm, com_pos_lm
from mjlab_tpu.phys.lm.smooth import (
    actuation_lm, chol_planes, chol_solve_planes, com_vel_lm, crb_lm,
    passive_lm, rne_lm, xfrc_lm,
)
from mjlab_tpu.phys.lm.collision import collision_lm
from mjlab_tpu.phys.lm.constraint import make_constraint_lm
from mjlab_tpu.phys.lm.solver import solve_lm


def _planes(x):
    """(E, n) -> tuple of n (E,) planes."""
    return tuple(x[:, i] for i in range(x.shape[1]))


def _vec_list(x, n, w):
    """(E, n, w) -> list of n w-tuples of (E,) planes."""
    return [tuple(x[:, i, j] for j in range(w)) for i in range(n)]


def _stackT(planes):
    """List/tuple of (E,) planes -> (E, n)."""
    return jnp.stack(planes, axis=1)


def _stack_vecs(vecs):
    """List of n w-tuples -> (E, n, w)."""
    return jnp.stack([jnp.stack(v, axis=1) for v in vecs], axis=1)


def _stack_mats(mats):
    """List of n 9-tuples (row-major) -> (E, n, 3, 3)."""
    return jnp.stack(
        [jnp.stack(mm, axis=1).reshape(mm[0].shape[0], 3, 3) for mm in mats],
        axis=1,
    )


def _qM_dense(Mu, nv, E, dtype):
    rows = []
    zero = jnp.zeros((E,), dtype)
    for i in range(nv):
        row = []
        for j in range(nv):
            a, b = (j, i) if i >= j else (i, j)
            v = Mu.get((a, b))
            row.append(v if v is not None else zero)
        rows.append(jnp.stack([jnp.broadcast_to(v, (E,)) for v in row]))
    return jnp.stack(rows)  # (nv, nv, E)


def _forward_core(m: Model, bf: frozenset, d: Data):
    if m.ntendon or m.na:
        # the lane-major engine predates tendons/activation dynamics;
        # fail loudly rather than silently diverge from phys/forward
        raise NotImplementedError(
            "lane-major engine does not support tendons or stateful "
            "actuators yet — use the vmapped engine (phys/forward.py)"
        )
    dtype = d.qpos.dtype
    E = d.qpos.shape[0]
    P = Params(m, bf, E)
    nq, nv, nu = m.nq, m.nv, m.nu

    q = _planes(d.qpos)
    qvel = _planes(d.qvel) if nv else ()
    ctrl = _planes(d.ctrl) if nu else ()
    mocap_pos = _vec_list(d.mocap_pos, m.nmocap, 3)
    mocap_quat = _vec_list(d.mocap_quat, m.nmocap, 4)
    xfrc = _vec_list(d.xfrc_applied, m.nbody, 6)

    k = kinematics_lm(m, P, q, mocap_pos, mocap_quat)
    k = com_pos_lm(m, P, k)
    k = crb_lm(m, P, k)
    k = collision_lm(m, P, k, dtype)
    k = make_constraint_lm(m, P, k, q, qvel, dtype)
    k = com_vel_lm(m, P, k, qvel)
    k = rne_lm(m, P, k, qvel)
    k = passive_lm(m, P, k, q, qvel)
    k = actuation_lm(m, P, k, q, qvel, ctrl)

    qfrc_applied = _planes(d.qfrc_applied)
    qfrc_x = xfrc_lm(m, P, k, xfrc)
    qfrc_smooth = [
        k["qfrc_passive"][i]
        - k["qfrc_bias"][i]
        + k["qfrc_actuator"][i]
        + qfrc_applied[i]
        + qfrc_x[i]
        for i in range(nv)
    ]
    # dense env-last Cholesky (solver's array form): the plane-dict factor
    # exploits branch sparsity but costs ~10x the jaxpr size, which was
    # the dominant compile-cost term of this engine
    from mjlab_tpu.phys.lm.solver import _chol_solve_envlast

    k["qM_dense"] = _qM_dense(k["qM"], nv, E, dtype)
    qfs = jnp.stack([jnp.broadcast_to(x, (E,)) for x in qfrc_smooth])
    a_smooth = _chol_solve_envlast(k["qM_dense"], qfs, nv)
    x_ws = d.qacc_warmstart.T  # (nv, E)
    sol = solve_lm(m, P, k, a_smooth, x_ws, dtype)

    k.update(
        qfrc_smooth=qfrc_smooth, qacc_smooth=a_smooth, sol=sol,
        q=q, qvel=qvel, P=P,
    )
    return k


def _write_back(m: Model, d: Data, k, qpos_new, qvel_new, qacc, ws, time_new):
    """Assemble the output Data (env-first) from lane-major results."""
    E = d.qpos.shape[0]
    dtype = d.qpos.dtype
    sol = k["sol"]

    def bc(x):
        return jnp.broadcast_to(x, (E,))

    new = dict(
        time=time_new,
        qpos=qpos_new,
        qvel=qvel_new,
        qacc=qacc.T,
        qacc_warmstart=ws.T,
        xpos=_stack_vecs([tuple(map(bc, v)) for v in k["xpos"]]),
        xquat=_stack_vecs([tuple(map(bc, v)) for v in k["xquat"]]),
        xmat=_stack_mats([tuple(map(bc, v)) for v in k["xmat"]]),
        xipos=_stack_vecs([tuple(map(bc, v)) for v in k["xipos"]]),
        ximat=_stack_mats([tuple(map(bc, v)) for v in k["ximat"]]),
        xanchor=_stack_vecs([tuple(map(bc, v)) for v in k["xanchor"]]),
        xaxis=_stack_vecs([tuple(map(bc, v)) for v in k["xaxis"]]),
        geom_xpos=_stack_vecs([tuple(map(bc, v)) for v in k["geom_xpos"]]),
        geom_xmat=_stack_mats([tuple(map(bc, v)) for v in k["geom_xmat"]]),
        site_xpos=(
            _stack_vecs([tuple(map(bc, v)) for v in k["site_xpos"]])
            if m.nsite else d.site_xpos
        ),
        site_xmat=(
            _stack_mats([tuple(map(bc, v)) for v in k["site_xmat"]])
            if m.nsite else d.site_xmat
        ),
        subtree_com=_stack_vecs([tuple(map(bc, v)) for v in k["subtree_com"]]),
        cvel=_stack_vecs([tuple(map(bc, v)) for v in k["cvel"]]),
        cdof=_stack_vecs([tuple(map(bc, v)) for v in k["cdof"]]),
        qfrc_bias=_stackT([bc(x) for x in k["qfrc_bias"]]),
        qfrc_passive=_stackT([bc(x) for x in k["qfrc_passive"]]),
        qfrc_actuator=_stackT([bc(x) for x in k["qfrc_actuator"]]),
        qfrc_smooth=_stackT([bc(x) for x in k["qfrc_smooth"]]),
        qacc_smooth=k["qacc_smooth"].T,
        qfrc_constraint=sol["qfrc_constraint"].T,
        actuator_force=(
            _stackT([bc(x) for x in k["actuator_force"]]) if m.nu else d.actuator_force
        ),
        actuator_velocity=(
            _stackT([bc(x) for x in k["actuator_velocity"]]) if m.nu else d.actuator_velocity
        ),
        cinert=_cinert_full(m, k, E, dtype),
    )

    # compacted contact outputs
    if m.pairs.ncon and m.ncon_max:
        K = m.ncon_max
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
        new.update(
            con_sel=k["con_sel"].T.astype(jnp.int32),
            con_sel_active=k["con_sel_active"].T,
            con_packed_c=jnp.moveaxis(cpk, -1, 0),
            con_force_c=jnp.moveaxis(sol["con_force"], -1, 0),
        )
    if m.pairs.ncon:
        new.update(
            condist=k["con_dist"].T,
            connormal=jnp.moveaxis(k["con_frame"][:, 0:3], -1, 0),
        )
    if m.nefc:
        new.update(efc_force=sol["efc_force"].T, efc_D=k["efc_D"].T,
                   efc_aref=k["efc_aref"].T)
    return d.replace(**new)


def _cinert_full(m: Model, k, E, dtype):
    """Reconstruct (E, nbody, 6, 6) spatial inertias from the blocks."""
    rows = []
    for b in range(m.nbody):
        ci = k["cinert"][b]
        A = ci["A"]
        cx, cy, cz = ci["c"]
        mb = ci["m"]
        hx, hy, hz = mb * cx, mb * cy, mb * cz
        zero = jnp.zeros((E,), dtype)

        def B(x):
            return jnp.broadcast_to(x, (E,))

        # skew(h)
        r = [
            [A[(0, 0)], A[(0, 1)], A[(0, 2)], zero, -hz, hy],
            [A[(0, 1)], A[(1, 1)], A[(1, 2)], hz, zero, -hx],
            [A[(0, 2)], A[(1, 2)], A[(2, 2)], -hy, hx, zero],
            [zero, hz, -hy, mb, zero, zero],
            [-hz, zero, hx, zero, mb, zero],
            [hy, -hx, zero, zero, zero, mb],
        ]
        rows.append(
            jnp.stack([jnp.stack([B(x) for x in rr], axis=1) for rr in r], axis=1)
        )
    return jnp.stack(rows, axis=1)  # (E, nbody, 6, 6)


def _actuator_vel_deriv_planes(m: Model, P: Params, ctrl, actuator_force):
    """Per-actuator dF/dv planes; zero where the force is saturated
    (mjd_smooth_vel semantics — see phys/forward._actuator_vel_deriv)."""
    out = []
    for u in range(m.nu):
        dfdv = None
        if int(m.actuator_biastype[u]) == 1:
            dfdv = P.plane("actuator_biasprm", u, 2)
        if int(m.actuator_gaintype[u]) == 1:
            t = P.plane("actuator_gainprm", u, 2) * ctrl[u]
            dfdv = t if dfdv is None else dfdv + t
        if dfdv is not None and int(m.actuator_forcelimited[u]):
            lo = P.plane("actuator_forcerange", u, 0)
            hi = P.plane("actuator_forcerange", u, 1)
            f = actuator_force[u]
            dfdv = jnp.where((f <= lo) | (f >= hi), 0.0, dfdv)
        out.append(dfdv)
    return out


def step_lm(m: Model, bf: frozenset, d: Data) -> Data:
    """One physics step, lane-major. Semantics match phys/forward.step."""
    dtype = d.qpos.dtype
    E = d.qpos.shape[0]
    nv = m.nv
    k = _forward_core(m, bf, d)
    P = k["P"]
    sol = k["sol"]
    h = m.opt.timestep

    qacc = sol["qacc"]  # (nv, E)
    qacc_pl = [qacc[i] for i in range(nv)]

    # implicit-in-damping velocity update, dense env-last (see the
    # Cholesky note in _forward_core)
    from mjlab_tpu.phys.lm.solver import _chol_solve_envlast

    M_dense = k["qM_dense"]  # (nv, nv, E)
    diag_add = [None] * nv
    use_implicit = True
    if m.opt.integrator == INT_EULER:
        if not (m.opt.disableflags & DSBL_EULERDAMP):
            for i in range(nv):
                diag_add[i] = h * P.plane("dof_damping", i)
        else:
            use_implicit = False
    elif m.opt.integrator == INT_IMPLICITFAST:
        for i in range(nv):
            diag_add[i] = h * P.plane("dof_damping", i)
        if m.nu:
            ctrl = _planes(d.ctrl)
            dfdv = _actuator_vel_deriv_planes(
                m, P, ctrl, k["actuator_force"]
            )
            for u in range(m.nu):
                if dfdv[u] is None:
                    continue
                j = int(m.actuator_trnid[u, 0])
                vadr = int(m.jnt_dofadr[j])
                gear = P.plane("actuator_gear", u, 0)
                diag_add[vadr] = diag_add[vadr] - h * dfdv[u] * gear * gear
    else:
        raise NotImplementedError(f"integrator {m.opt.integrator}")

    if use_implicit:
        add = jnp.stack(
            [jnp.broadcast_to(x, (E,)) for x in diag_add]
        )  # (nv, E)
        Mh_dense = M_dense + jnp.eye(nv, dtype=dtype)[:, :, None] * add[:, None, :]
        Ma = jnp.einsum("ije,je->ie", M_dense, qacc)
        qacc_int_arr = _chol_solve_envlast(Mh_dense, Ma, nv)
        qacc_int = [qacc_int_arr[i] for i in range(nv)]
    else:
        qacc_int = qacc_pl

    qvel_new = [k["qvel"][i] + h * qacc_int[i] for i in range(nv)]
    q = k["q"]
    qpos_new = list(q)
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        qadr = int(m.jnt_qposadr[j])
        vadr = int(m.jnt_dofadr[j])
        if jtype == JNT_FREE:
            for i in range(3):
                qpos_new[qadr + i] = q[qadr + i] + h * qvel_new[vadr + i]
            qq = quat_integrate(
                tuple(q[qadr + 3 + i] for i in range(4)),
                tuple(qvel_new[vadr + 3 + i] for i in range(3)),
                h,
            )
            for i in range(4):
                qpos_new[qadr + 3 + i] = qq[i]
        elif jtype == JNT_BALL:
            qq = quat_integrate(
                tuple(q[qadr + i] for i in range(4)),
                tuple(qvel_new[vadr + i] for i in range(3)),
                h,
            )
            for i in range(4):
                qpos_new[qadr + i] = qq[i]
        else:
            qpos_new[qadr] = q[qadr] + h * qvel_new[vadr]

    # mj_checkPos/Vel/Acc parity: diverged world -> qpos0, zero velocity
    MAXVAL = 1e10
    bad = jnp.zeros((E,), bool)
    for x in qpos_new:
        xb = jnp.broadcast_to(x, (E,))
        bad = bad | ~jnp.isfinite(xb) | (jnp.abs(xb) > MAXVAL)
    for i in range(nv):
        v = jnp.broadcast_to(qvel_new[i], (E,))
        a = jnp.broadcast_to(qacc_int[i], (E,))
        bad = bad | ~jnp.isfinite(v) | (jnp.abs(v) > MAXVAL)
        bad = bad | ~jnp.isfinite(a) | (jnp.abs(a) > MAXVAL)

    qpos0 = P("qpos0")  # (nq, Eb)
    qpos_arr = jnp.stack([jnp.broadcast_to(x, (E,)) for x in qpos_new])
    qpos_arr = jnp.where(bad, jnp.broadcast_to(qpos0, (m.nq, E)), qpos_arr)
    qvel_arr = jnp.stack([jnp.broadcast_to(x, (E,)) for x in qvel_new])
    qvel_arr = jnp.where(bad, 0.0, qvel_arr)
    ws = jnp.where(bad, 0.0, qacc)

    out = _write_back(
        m, d, k, qpos_arr.T, qvel_arr.T, qacc, ws, d.time + h
    )
    return out.replace(
        ncheck_reset=d.ncheck_reset + bad.astype(jnp.int32)
    )


def forward_lm(m: Model, bf: frozenset, d: Data) -> Data:
    """Forward dynamics without integration (mj_forward semantics)."""
    k = _forward_core(m, bf, d)
    sol = k["sol"]
    qacc = sol["qacc"]
    return _write_back(
        m, d, k, d.qpos, d.qvel, qacc, qacc, d.time
    )
