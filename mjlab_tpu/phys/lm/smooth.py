"""Lane-major smooth dynamics: CRB mass matrix, bias/passive forces,
actuation. Same semantics as phys/smooth.py (mj_crb / mj_rne / mj_passive /
mj_fwdActuation), expressed as scalar planes over the env lane axis.

The mass matrix is kept as a dict of upper-triangle planes {(i, j): (E,)}
restricted to ancestor dof pairs (MuJoCo's sparsity); its Cholesky factor
is a dense-lower dict of planes computed by an unrolled column algorithm.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.model import (
    DSBL_GRAVITY, JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE, Model,
)
from mjlab_tpu.phys.lm.base import (
    Params, motion_cross, force_cross, quat_sub, vadd, vcross, vdot, vscale,
    vsub, vwhere,
)
from mjlab_tpu.phys.smooth import _crb_static


def _spatial_mul(blk, s):
    """Composite-inertia block (A sym-6 dict, h=m*c vec3, m) @ motion s."""
    A, h, mb = blk["A"], blk["h"], blk["m"]
    w = s[:3]
    v = s[3:]
    ang = (
        A[(0, 0)] * w[0] + A[(0, 1)] * w[1] + A[(0, 2)] * w[2],
        A[(0, 1)] * w[0] + A[(1, 1)] * w[1] + A[(1, 2)] * w[2],
        A[(0, 2)] * w[0] + A[(1, 2)] * w[1] + A[(2, 2)] * w[2],
    )
    ang = vadd(ang, vcross(h, v))
    lin = vsub(vscale(v, mb), vcross(h, w))
    return ang + lin


def crb_lm(m: Model, P: Params, k: dict):
    """Composite-rigid-body mass matrix as ancestor-pair planes + factor."""
    nb, nv = m.nbody, m.nv
    S, dof_body, U = _crb_static(m)

    # per-body blocks with h = m*c
    blocks = []
    for b in range(nb):
        ci = k["cinert"][b]
        blocks.append(
            dict(A=dict(ci["A"]), h=vscale(ci["c"], ci["m"]), m=ci["m"])
        )

    # composite (subtree) accumulation, backward
    comp = [dict(A=dict(b_["A"]), h=b_["h"], m=b_["m"]) for b_ in blocks]
    for b in range(nb - 1, 0, -1):
        pid = int(m.body_parentid[b])
        for ij in comp[b]["A"]:
            comp[pid]["A"][ij] = comp[pid]["A"][ij] + comp[b]["A"][ij]
        comp[pid]["h"] = vadd(comp[pid]["h"], comp[b]["h"])
        comp[pid]["m"] = comp[pid]["m"] + comp[b]["m"]

    cdof = k["cdof"]
    f = [_spatial_mul(comp[int(dof_body[j])], cdof[j]) for j in range(nv)]

    Mu = {}
    for i in range(nv):
        for j in range(i, nv):
            if U[i, j]:
                Mu[(i, j)] = vdot(cdof[i], f[j])
    # armature on the diagonal
    for i in range(nv):
        Mu[(i, i)] = Mu[(i, i)] + P.plane("dof_armature", i)

    k.update(qM=Mu)
    return k


def chol_planes(Mu: dict, nv: int, ridge: float = 0.0):
    """Dense lower Cholesky of the plane-dict matrix (filling in zeros for
    non-ancestor pairs). Returns dict {(i, j): plane, i >= j}."""
    def getM(i, j):
        a, b = (j, i) if i >= j else (i, j)
        return Mu.get((a, b))

    L = {}
    for j in range(nv):
        for i in range(j, nv):
            s = getM(i, j)
            if s is None:
                s = 0.0
            acc = s
            for kk in range(j):
                Lik = L.get((i, kk))
                Ljk = L.get((j, kk))
                if Lik is None or Ljk is None:
                    continue
                acc = acc - Lik * Ljk
            if isinstance(acc, float):
                continue  # structurally zero below-diagonal entry
            if i == j:
                L[(j, j)] = jnp.sqrt(jnp.maximum(acc + ridge, 1e-12))
            else:
                L[(i, j)] = acc / L[(j, j)]
    return L


def chol_solve_planes(L: dict, x: list, nv: int):
    """Solve (L L^T) y = x for plane-list x (len nv)."""
    y = [None] * nv
    for i in range(nv):
        s = x[i]
        for j in range(i):
            Lij = L.get((i, j))
            if Lij is not None:
                s = s - Lij * y[j]
        y[i] = s / L[(i, i)]
    out = [None] * nv
    for i in reversed(range(nv)):
        s = y[i]
        for j in range(i + 1, nv):
            Lji = L.get((j, i))
            if Lji is not None:
                s = s - Lji * out[j]
        out[i] = s / L[(i, i)]
    return out


def mat_vec_planes(Mu: dict, x, nv: int):
    """Symmetric plane-dict matrix @ plane-list."""
    out = [None] * nv
    for i in range(nv):
        acc = None
        for j in range(nv):
            a, b = (j, i) if i >= j else (i, j)
            Mij = Mu.get((a, b))
            if Mij is None:
                continue
            t = Mij * x[j]
            acc = t if acc is None else acc + t
        out[i] = acc
    return out


def com_vel_lm(m: Model, P: Params, k: dict, qvel):
    """Body spatial velocities + cdof_dot planes."""
    zero = jnp.zeros_like(qvel[0])
    z6 = (zero,) * 6
    cvel = [z6]
    cdof_dot = [z6] * m.nv
    cdof = k["cdof"]

    for b in range(1, m.nbody):
        pid = int(m.body_parentid[b])
        v = cvel[pid]
        jadr, jnum = int(m.body_jntadr[b]), int(m.body_jntnum[b])
        for kk in range(jnum):
            j = jadr + kk
            jtype = int(m.jnt_type[j])
            vadr = int(m.jnt_dofadr[j])
            if jtype == JNT_FREE:
                for i in range(3):
                    v = tuple(
                        vi + ci * qvel[vadr + i]
                        for vi, ci in zip(v, cdof[vadr + i])
                    )
                for i in range(3, 6):
                    cdof_dot[vadr + i] = motion_cross(v, cdof[vadr + i])
                for i in range(3, 6):
                    v = tuple(
                        vi + ci * qvel[vadr + i]
                        for vi, ci in zip(v, cdof[vadr + i])
                    )
            elif jtype == JNT_BALL:
                for i in range(3):
                    cdof_dot[vadr + i] = motion_cross(v, cdof[vadr + i])
                for i in range(3):
                    v = tuple(
                        vi + ci * qvel[vadr + i]
                        for vi, ci in zip(v, cdof[vadr + i])
                    )
            else:
                cdof_dot[vadr] = motion_cross(v, cdof[vadr])
                v = tuple(vi + ci * qvel[vadr] for vi, ci in zip(v, cdof[vadr]))
        cvel.append(v)

    k.update(cvel=cvel, cdof_dot=cdof_dot)
    return k


def _cinert_mul(ci, s):
    """Single-body cinert block @ motion (blocks A, c, m)."""
    return _spatial_mul(dict(A=ci["A"], h=vscale(ci["c"], ci["m"]), m=ci["m"]), s)


def rne_lm(m: Model, P: Params, k: dict, qvel):
    """qfrc_bias via recursive Newton-Euler (flg_acc=0)."""
    zero = jnp.zeros_like(qvel[0]) if m.nv else None
    grav_off = bool(m.opt.disableflags & DSBL_GRAVITY)
    # gravity: m.opt.gravity is a traced (3,) array (never DR-batched)
    gax = m.opt.gravity
    if grav_off:
        cacc0 = (zero, zero, zero, zero, zero, zero)
    else:
        cacc0 = (
            zero, zero, zero,
            zero - gax[0], zero - gax[1], zero - gax[2],
        )

    cacc = [cacc0]
    cdof = k["cdof"]
    cdof_dot = k["cdof_dot"]
    for b in range(1, m.nbody):
        pid = int(m.body_parentid[b])
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        a = cacc[pid]
        for i in range(num):
            a = tuple(
                ai + ci * qvel[adr + i] for ai, ci in zip(a, cdof_dot[adr + i])
            )
        cacc.append(a)

    cfrc = []
    for b in range(m.nbody):
        ci = k["cinert"][b]
        Iv = _cinert_mul(ci, k["cvel"][b])
        fb = tuple(
            x + y
            for x, y in zip(_cinert_mul(ci, cacc[b]), force_cross(k["cvel"][b], Iv))
        )
        cfrc.append(fb)

    for b in range(m.nbody - 1, 0, -1):
        pid = int(m.body_parentid[b])
        cfrc[pid] = tuple(x + y for x, y in zip(cfrc[pid], cfrc[b]))

    qfrc_bias = [zero] * m.nv
    for b in range(1, m.nbody):
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        for i in range(num):
            qfrc_bias[adr + i] = vdot(cdof[adr + i], cfrc[b])

    k.update(qfrc_bias=qfrc_bias)
    return k


def passive_lm(m: Model, P: Params, k: dict, q, qvel):
    qfrc = [
        -P.plane("dof_damping", i) * qvel[i] for i in range(m.nv)
    ]
    qpos_spring = np.asarray(m.qpos_spring)
    jnt_stiffness_h = np.asarray(m.jnt_stiffness)
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        qadr = int(m.jnt_qposadr[j])
        vadr = int(m.jnt_dofadr[j])
        kstiff = P.plane("jnt_stiffness", j)
        # skip structurally-zero springs (static check on the shared value)
        if "jnt_stiffness" not in P.batched and float(jnt_stiffness_h[j]) == 0.0:
            continue
        if jtype in (JNT_HINGE, JNT_SLIDE):
            qfrc[vadr] = qfrc[vadr] - kstiff * (
                q[qadr] - P.plane("qpos_spring", qadr)
            )
        elif jtype == JNT_FREE:
            for i in range(3):
                qfrc[vadr + i] = qfrc[vadr + i] - kstiff * (
                    q[qadr + i] - P.plane("qpos_spring", qadr + i)
                )
            dif = quat_sub(
                tuple(q[qadr + 3 + i] for i in range(4)),
                tuple(P.plane("qpos_spring", qadr + 3 + i) for i in range(4)),
            )
            for i in range(3):
                qfrc[vadr + 3 + i] = qfrc[vadr + 3 + i] - kstiff * dif[i]
        elif jtype == JNT_BALL:
            dif = quat_sub(
                tuple(q[qadr + i] for i in range(4)),
                tuple(P.plane("qpos_spring", qadr + i) for i in range(4)),
            )
            for i in range(3):
                qfrc[vadr + i] = qfrc[vadr + i] - kstiff * dif[i]
    k.update(qfrc_passive=qfrc)
    return k


def actuation_lm(m: Model, P: Params, k: dict, q, qvel, ctrl):
    """Joint-transmission actuators (trntype JOINT, hinge/slide)."""
    zero = jnp.zeros_like(qvel[0])
    qfrc_actuator = [zero] * m.nv
    act_force = []
    act_vel = []
    for u in range(m.nu):
        j = int(m.actuator_trnid[u, 0])
        qadr = int(m.jnt_qposadr[j])
        vadr = int(m.jnt_dofadr[j])
        gear = P.plane("actuator_gear", u, 0)
        length = q[qadr] * gear
        vel = qvel[vadr] * gear
        c = ctrl[u]
        if int(m.actuator_ctrllimited[u]):
            c = jnp.clip(
                c,
                P.plane("actuator_ctrlrange", u, 0),
                P.plane("actuator_ctrlrange", u, 1),
            )
        if int(m.actuator_gaintype[u]) == 1:
            gain = (
                P.plane("actuator_gainprm", u, 0)
                + P.plane("actuator_gainprm", u, 1) * length
                + P.plane("actuator_gainprm", u, 2) * vel
            )
        else:
            gain = P.plane("actuator_gainprm", u, 0)
        if int(m.actuator_biastype[u]) == 1:
            bias = (
                P.plane("actuator_biasprm", u, 0)
                + P.plane("actuator_biasprm", u, 1) * length
                + P.plane("actuator_biasprm", u, 2) * vel
            )
        else:
            bias = 0.0
        force = gain * c + bias
        if int(m.actuator_forcelimited[u]):
            force = jnp.clip(
                force,
                P.plane("actuator_forcerange", u, 0),
                P.plane("actuator_forcerange", u, 1),
            )
        act_force.append(force)
        act_vel.append(vel)
        qfrc_actuator[vadr] = qfrc_actuator[vadr] + force * gear
    k.update(
        qfrc_actuator=qfrc_actuator,
        actuator_force=act_force,
        actuator_velocity=act_vel,
    )
    return k


def xfrc_lm(m: Model, P: Params, k: dict, xfrc):
    """Project xfrc_applied (list per body of 6 planes, [force, torque]
    mjData layout) into qfrc planes. xfrc[b] = (fx,fy,fz,tx,ty,tz)."""
    zero_found = False
    cdof = k["cdof"]
    out = [None] * m.nv
    from mjlab_tpu.phys.smooth import ancestor_dof_mask

    W = ancestor_dof_mask(m)  # (nbody, nv) static
    for b in range(1, m.nbody):
        f = xfrc[b][:3]
        t = xfrc[b][3:]
        O = k["subtree_com"][int(m.body_rootid[b])]
        offset = vsub(k["xipos"][b], O)
        ang = vadd(t, vcross(offset, f))
        s = ang + f  # spatial force [ang, lin] at c-frame origin
        for i in range(m.nv):
            if W[b, i]:
                contrib = vdot(cdof[i], s)
                out[i] = contrib if out[i] is None else out[i] + contrib
    zero = jnp.zeros_like(k["xpos"][0][0])
    return [o if o is not None else zero for o in out]
