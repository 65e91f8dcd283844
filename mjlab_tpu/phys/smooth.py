"""Smooth (unconstrained) dynamics: mass matrix, bias forces, passive
forces, actuation and transmission. mj_crb / mj_rne / mj_passive /
mj_transmission / mj_fwdActuation semantics, dense and batch-friendly.

The mass matrix uses the Jacobian form of CRBA: with per-body spatial
inertias I_b (6x6, c-frame) and the dof->body ancestor mask W,
  M = sum_b (W_b * cdof)^T I_b (W_b * cdof)
which is a handful of small einsums — ideal for the MXU instead of the
sparse tree recursion MuJoCo uses on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys import math
from mjlab_tpu.phys.model import (
    DYN_FILTEREXACT,
    DYN_INTEGRATOR,
    JNT_BALL,
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
    Model,
    DSBL_GRAVITY,
    TRN_JOINT,
    TRN_TENDON,
)
from mjlab_tpu.phys.data import Data
from mjlab_tpu.phys import linalg

_ancestor_mask_cache: dict[int, np.ndarray] = {}


def ancestor_dof_mask(m: Model) -> np.ndarray:
    """W[b, i] = 1 if dof i is on the chain from world to body b. Host-side,
    cached by model structure identity."""
    key = id(m.body_parentid)
    if key in _ancestor_mask_cache:
        return _ancestor_mask_cache[key]
    W = np.zeros((m.nbody, m.nv), np.float64)
    for b in range(1, m.nbody):
        pid = int(m.body_parentid[b])
        W[b] = W[pid]
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        W[b, adr : adr + num] = 1.0
    _ancestor_mask_cache[key] = W
    return W


_crb_static_cache: dict[int, tuple] = {}


def _crb_static(m: Model):
    """Host-side static structure for CRBA: subtree membership matrix
    (nbody, nbody), per-dof body id, and the dof-level ancestor-pair mask
    U[i, j] = 1 iff dof i is on the chain from world to dof j's body."""
    key = id(m.body_parentid)
    if key in _crb_static_cache:
        return _crb_static_cache[key]
    S = np.zeros((m.nbody, m.nbody), np.float64)  # S[b, c]: c in subtree(b)
    for c in range(m.nbody - 1, -1, -1):
        S[c, c] = 1.0
        if c:
            S[int(m.body_parentid[c])] += S[c]
    dof_body = np.zeros(m.nv, np.int32)
    for b in range(m.nbody):
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        dof_body[adr : adr + num] = b
    W = ancestor_dof_mask(m)  # (nbody, nv)
    U = W[dof_body].T  # (nv_i, nv_j): i on chain to body(j)
    # keep i <= j only (dof order is topological): same-body dof pairs
    # appear in both orientations and would otherwise double-count
    U = np.triu(U)
    out = (S, dof_body, U)
    _crb_static_cache[key] = out
    return out


def crb(m: Model, d: Data, factor: bool = True) -> Data:
    """Dense joint-space inertia matrix qM and its Cholesky factor qLD.

    Classic composite-rigid-body form (mj_crb semantics): accumulate
    subtree spatial inertias I_c, then M[i, j] = cdof_i . (I_c(body_j)
    cdof_j) for ancestor pairs. O(nbody^2 + nv^2) tiny batched matmuls —
    ~100x less memory traffic than the per-body masked-Jacobian einsum.

    factor=False skips the qLD/qLDinv factorization (hybrid fast path:
    both consumers — solve_m and the integrator solve — run inside the
    fused Pallas kernel, so the XLA dense factor+inverse would be dead
    work; qLD/qLDinv then keep their previous values like the other
    lean-mode introspection fields)."""
    dtype = d.qpos.dtype
    S, dof_body, U = _crb_static(m)
    nb = m.nbody
    # composite (subtree) inertia per body: one (nbody, nbody) matmul
    Ic = jnp.einsum(
        "bc,ckl->bkl", jnp.asarray(S, dtype), d.cinert
    )  # (nbody, 6, 6)
    # f_j = I_c[body(j)] cdof_j : (nv, 6)
    Ic_dof = Ic[jnp.asarray(dof_body)]  # (nv, 6, 6)
    f = jnp.einsum("jkl,jl->jk", Ic_dof, d.cdof)
    full = d.cdof @ f.T  # (nv, nv): cdof_i . f_j
    Um = jnp.asarray(U, dtype)
    upper = full * Um  # valid where i is ancestor-or-self of j
    qM = upper + upper.T - jnp.diag(jnp.diagonal(upper))
    qM = qM + jnp.diag(m.dof_armature)
    if not factor:
        return d.replace(qM=qM)
    qLD = linalg.chol_factor_blocked(qM)
    qLDinv = linalg.tri_inv(qLD)
    return d.replace(qM=qM, qLD=qLD, qLDinv=qLDinv)


def solve_m(d: Data, x: jax.Array) -> jax.Array:
    """Solve M y = x using the cached inverted Cholesky factor (one
    refinement step against qM for f32 stability)."""
    return linalg.chol_solve_inv(d.qLDinv, x, d.qM)


def com_vel(m: Model, d: Data) -> Data:
    """Body spatial velocities (c-frame) and cdof time derivatives."""
    dtype = d.qpos.dtype
    cvel = [jnp.zeros(6, dtype)]
    cdof_dot = [None] * m.nv

    for b in range(1, m.nbody):
        pid = int(m.body_parentid[b])
        v = cvel[pid]
        jadr, jnum = int(m.body_jntadr[b]), int(m.body_jntnum[b])
        for k in range(jnum):
            j = jadr + k
            jtype = int(m.jnt_type[j])
            vadr = int(m.jnt_dofadr[j])
            ndof = {JNT_FREE: 6, JNT_BALL: 3, JNT_SLIDE: 1, JNT_HINGE: 1}[jtype]
            if jtype == JNT_FREE:
                # translation dofs: derivative zero (world-aligned)
                for i in range(3):
                    cdof_dot[vadr + i] = jnp.zeros(6, dtype)
                v = v + d.cdof[vadr : vadr + 3].T @ d.qvel[vadr : vadr + 3]
                # rotation dofs: derivative wrt velocity accumulated so far
                for i in range(3, 6):
                    cdof_dot[vadr + i] = math.motion_cross(v, d.cdof[vadr + i])
                v = v + d.cdof[vadr + 3 : vadr + 6].T @ d.qvel[vadr + 3 : vadr + 6]
            elif jtype == JNT_BALL:
                for i in range(3):
                    cdof_dot[vadr + i] = math.motion_cross(v, d.cdof[vadr + i])
                v = v + d.cdof[vadr : vadr + 3].T @ d.qvel[vadr : vadr + 3]
            else:
                cdof_dot[vadr] = math.motion_cross(v, d.cdof[vadr])
                v = v + d.cdof[vadr] * d.qvel[vadr]
        cvel.append(v)

    cdof_dot = [c if c is not None else jnp.zeros(6, dtype) for c in cdof_dot]
    return d.replace(
        cvel=jnp.stack(cvel),
        cdof_dot=jnp.stack(cdof_dot) if m.nv else jnp.zeros((0, 6), dtype),
    )


def rne(m: Model, d: Data) -> Data:
    """Bias force qfrc_bias = C(qpos, qvel) via recursive Newton-Euler
    (flg_acc=0: gravity in base acceleration, no qacc term)."""
    dtype = d.qpos.dtype
    gravity = jnp.where(
        m.opt.disableflags & DSBL_GRAVITY, jnp.zeros(3, dtype), m.opt.gravity
    )
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype), -gravity])

    cacc = [cacc0]
    for b in range(1, m.nbody):
        pid = int(m.body_parentid[b])
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        a = cacc[pid]
        if num:
            a = a + d.cdof_dot[adr : adr + num].T @ d.qvel[adr : adr + num]
        cacc.append(a)
    cacc = jnp.stack(cacc)

    Iv = jnp.einsum("bij,bj->bi", d.cinert, d.cvel)
    cfrc_body = jnp.einsum("bij,bj->bi", d.cinert, cacc) + math.force_cross(
        d.cvel, Iv
    )

    # backward accumulation
    cfrc = list(cfrc_body)
    for b in range(m.nbody - 1, 0, -1):
        pid = int(m.body_parentid[b])
        cfrc[pid] = cfrc[pid] + cfrc[b]

    qfrc_bias = jnp.zeros(m.nv, dtype)
    for b in range(1, m.nbody):
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        if num:
            qfrc_bias = qfrc_bias.at[adr : adr + num].set(
                d.cdof[adr : adr + num] @ cfrc[b]
            )
    return d.replace(qfrc_bias=qfrc_bias)


def tendon(m: Model, d: Data) -> Data:
    """Fixed-tendon lengths and velocities (mj_tendon semantics).

    The coefficient rows are static, so this is two tiny matvecs."""
    if not m.ntendon:
        return d
    dtype = d.qpos.dtype
    Lq = jnp.asarray(m.ten_Lq, dtype)
    Jt = jnp.asarray(m.ten_J, dtype)
    return d.replace(ten_length=Lq @ d.qpos, ten_velocity=Jt @ d.qvel)


def passive(m: Model, d: Data) -> Data:
    """Passive spring/damper forces (fluid forces unsupported)."""
    dtype = d.qpos.dtype
    qfrc = -m.dof_damping * d.qvel

    # tendon springs (deadband [lo, hi]) and dampers through the static
    # coefficient rows (mj_passive, engine_passive.c)
    if m.ntendon:
        Jt = jnp.asarray(m.ten_J, dtype)
        L = d.ten_length
        lo = m.tendon_lengthspring[:, 0]
        hi = m.tendon_lengthspring[:, 1]
        disp = jnp.where(L > hi, L - hi, jnp.where(L < lo, L - lo, 0.0))
        frc = -m.tendon_stiffness * disp - m.tendon_damping * d.ten_velocity
        qfrc = qfrc + Jt.T @ frc

    # joint springs
    if m.njnt:
        spring = jnp.zeros(m.nv, dtype)
        for j in range(m.njnt):
            jtype = int(m.jnt_type[j])
            qadr = int(m.jnt_qposadr[j])
            vadr = int(m.jnt_dofadr[j])
            k = m.jnt_stiffness[j]
            if jtype in (JNT_HINGE, JNT_SLIDE):
                spring = spring.at[vadr].set(
                    -k * (d.qpos[qadr] - m.qpos_spring[qadr])
                )
            elif jtype == JNT_FREE:
                spring = spring.at[vadr : vadr + 3].set(
                    -k * (d.qpos[qadr : qadr + 3] - m.qpos_spring[qadr : qadr + 3])
                )
                dif = math.quat_sub(
                    d.qpos[qadr + 3 : qadr + 7], m.qpos_spring[qadr + 3 : qadr + 7]
                )
                spring = spring.at[vadr + 3 : vadr + 6].set(-k * dif)
            elif jtype == JNT_BALL:
                dif = math.quat_sub(
                    d.qpos[qadr : qadr + 4], m.qpos_spring[qadr : qadr + 4]
                )
                spring = spring.at[vadr : vadr + 3].set(-k * dif)
        qfrc = qfrc + spring
    return d.replace(qfrc_passive=qfrc)


def _moment(m: Model) -> np.ndarray:
    """Static (nu, nv) selector: joint/tendon transmission moment pattern.

    trntype=JOINT on hinge/slide joints and trntype=TENDON (fixed tendons:
    the coefficient row is static) are supported."""
    sel = np.zeros((m.nu, m.nv), np.float64)
    for u in range(m.nu):
        trn = int(m.actuator_trntype[u])
        if trn == TRN_JOINT:
            j = int(m.actuator_trnid[u, 0])
            if int(m.jnt_type[j]) not in (JNT_HINGE, JNT_SLIDE):
                raise NotImplementedError("actuated free/ball joints unsupported")
            sel[u, int(m.jnt_dofadr[j])] = 1.0
        elif trn == TRN_TENDON:
            sel[u] = m.ten_J[int(m.actuator_trnid[u, 0])]
        else:
            raise NotImplementedError(
                "only joint/tendon transmissions supported"
            )
    return sel


def transmission(m: Model, d: Data) -> Data:
    """Actuator lengths and moment matrix (dense nu x nv)."""
    if m.nu == 0:
        return d
    sel = jnp.asarray(_moment(m), d.qpos.dtype)
    gear = m.actuator_gear[:, 0]
    moment = sel * gear[:, None]
    trnid = np.array([int(m.actuator_trnid[u, 0]) for u in range(m.nu)], np.int32)
    is_ten = m.actuator_trntype == TRN_TENDON  # static numpy
    qadr = np.array(
        [
            0 if is_ten[u] else int(m.jnt_qposadr[trnid[u]])
            for u in range(m.nu)
        ],
        np.int32,
    )
    length = d.qpos[qadr]
    if m.ntendon and is_ten.any():
        tid = np.where(is_ten, trnid, 0).astype(np.int32)
        length = jnp.where(jnp.asarray(is_ten), d.ten_length[tid], length)
    length = length * gear
    return d.replace(actuator_moment=moment, actuator_length=length)


def _clamped_ctrl(m: Model, d: Data) -> jax.Array:
    limited = jnp.asarray(m.actuator_ctrllimited.astype(bool))
    return jnp.where(
        limited,
        jnp.clip(d.ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]),
        d.ctrl,
    )


def actuation_input(m: Model, d: Data) -> tuple[jax.Array, jax.Array]:
    """(force input per actuator, act_dot per act slot).

    Activation dynamics per mj_fwdActuation (engine_forward.c): stateful
    actuators drive force from their activation state (or the NEXT state
    when actearly), with act_dot integrator: ctrl / filter(+exact):
    (ctrl - act)/tau."""
    ctrl = _clamped_ctrl(m, d)
    if not m.na:
        return ctrl, d.act_dot
    dyn = m.actuator_dyntype  # static numpy
    adr = np.maximum(m.actuator_actadr, 0)  # static; -1 (stateless) -> 0
    act_u = d.act[adr]
    tau = jnp.maximum(m.actuator_dynprm[:, 0], 1e-15)
    stateful = jnp.asarray(dyn > 0)
    adot_u = jnp.where(jnp.asarray(dyn == DYN_INTEGRATOR), ctrl, (ctrl - act_u) / tau)
    adot_u = jnp.where(stateful, adot_u, 0.0)
    h = m.opt.timestep
    nxt = act_u + h * adot_u
    fexact = jnp.asarray(dyn == DYN_FILTEREXACT)
    nxt = jnp.where(fexact, act_u - adot_u * tau * jnp.expm1(-h / tau), nxt)
    alim = jnp.asarray(m.actuator_actlimited.astype(bool))
    nxt = jnp.where(
        alim,
        jnp.clip(nxt, m.actuator_actrange[:, 0], m.actuator_actrange[:, 1]),
        nxt,
    )
    early = jnp.asarray(m.actuator_actearly.astype(bool))
    inp = jnp.where(stateful, jnp.where(early, nxt, act_u), ctrl)
    sf = np.nonzero(dyn > 0)[0]  # static scatter (actnum == 1 each)
    act_dot = (
        jnp.zeros(m.na, d.qpos.dtype)
        .at[m.actuator_actadr[sf]]
        .set(adot_u[sf])
    )
    return inp, act_dot


def fwd_actuation(m: Model, d: Data) -> Data:
    """Actuator forces: gain*input + bias, clamped, mapped through moments."""
    if m.nu == 0:
        return d.replace(qfrc_actuator=jnp.zeros(m.nv, d.qpos.dtype))
    ctrl, act_dot = actuation_input(m, d)
    velocity = d.actuator_moment @ d.qvel

    # gaintype: 0=fixed, 1=affine (gainprm[0] + [1]*len + [2]*vel)
    gaintype = m.actuator_gaintype
    gain_fixed = m.actuator_gainprm[:, 0]
    gain_affine = (
        m.actuator_gainprm[:, 0]
        + m.actuator_gainprm[:, 1] * d.actuator_length
        + m.actuator_gainprm[:, 2] * velocity
    )
    gain = jnp.where(jnp.asarray(gaintype == 1), gain_affine, gain_fixed)

    # biastype: 0=none, 1=affine
    bias_affine = (
        m.actuator_biasprm[:, 0]
        + m.actuator_biasprm[:, 1] * d.actuator_length
        + m.actuator_biasprm[:, 2] * velocity
    )
    bias = jnp.where(jnp.asarray(m.actuator_biastype == 1), bias_affine, 0.0)

    force = gain * ctrl + bias
    flimited = jnp.asarray(m.actuator_forcelimited.astype(bool))
    force = jnp.where(
        flimited,
        jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]),
        force,
    )
    qfrc = d.actuator_moment.T @ force
    return d.replace(
        actuator_velocity=velocity,
        actuator_force=force,
        qfrc_actuator=qfrc,
        act_dot=act_dot,
    )


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
    """Project xfrc_applied (world force/torque at body CoM) into qfrc."""
    dtype = d.qpos.dtype
    if m.nbody == 1:
        return jnp.zeros(m.nv, dtype)
    W = jnp.asarray(ancestor_dof_mask(m), dtype)  # (nbody, nv)
    O = d.subtree_com[m.body_rootid]  # (nbody, 3) c-frame origins
    torque = d.xfrc_applied[:, 3:]
    force = d.xfrc_applied[:, :3]
    # spatial force at body com -> re-expressed at c-frame origin
    offset = d.xipos - O
    ang = torque + jnp.cross(offset, force)
    s = jnp.concatenate([ang, force], axis=-1)  # (nbody, 6)
    # qfrc_i = sum_b W[b,i] cdof_i . s_b
    return jnp.einsum("bi,ik,bk->i", W, d.cdof, s)
