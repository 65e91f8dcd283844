"""Lane-major smooth stages: kinematics, com quantities, CRB mass matrix,
velocity/bias/passive forces and joint actuation, all as scalar planes.

Same tree recursions as phys/kinematics.py and phys/smooth.py
(mj_kinematics / mj_comPos / mj_crb / mj_rne / mj_passive /
mj_fwdActuation semantics), but every body/joint quantity is a tuple of
env-plane arrays. The plane algebra is SHAPE-AGNOSTIC: a plane can be an
(E,) array (XLA env-last execution) or an (8, 128) VMEM tile (inside the
Pallas smooth kernels, phys/smooth_pallas.py) — the same code serves both.

History: this is the round-2 lane-major engine's stage code (deleted in
round 3 as dead weight when only its collision/constraint/solver parts
were wired into the hybrid engine), resurrected in round 4 as the bodies
of the fused Pallas smooth kernels. The round-2 blocker — XLA compile
blowup when all scalar-plane stages fuse into one program — does not
apply inside pallas_call boundaries (each kernel compiles separately
under Mosaic).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.model import (
    DSBL_GRAVITY, JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE, Model,
)
from mjlab_tpu.phys.lm.base import (
    Params, force_cross, mat_mul, motion_cross, quat_mul,
    quat_normalize, quat_rot, quat_sub, quat_to_mat, vadd, vcross, vdot,
    vscale, vsub,
)


def _p3(P: Params, name: str, i: int):
    return tuple(P.plane(name, i, k) for k in range(3))


def _p4(P: Params, name: str, i: int):
    return tuple(P.plane(name, i, k) for k in range(4))


def kinematics_lm(m: Model, P: Params, q, mocap_pos, mocap_quat,
                  geoms=None, sites=None):
    """q: tuple of nq (E,) planes. mocap_*: lists of vec3/quat tuples.

    geoms/sites: optional static id subsets to compute frames for (None =
    all); unselected entries are left None in the output lists. The Pallas
    smooth kernels pass only the collision geoms and no sites.

    Returns dict with per-body/joint/geom/site plane structures.
    """
    geoms = range(m.ngeom) if geoms is None else geoms
    sites = range(m.nsite) if sites is None else sites
    zero = jnp.zeros_like(q[0]) if m.nq else jnp.zeros((1,))
    one = jnp.ones_like(zero)

    xpos = [(zero, zero, zero)]
    xquat = [(one, zero, zero, zero)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    def q0(adr):
        return P.plane("qpos0", adr)

    for b in range(1, m.nbody):
        pid = int(m.body_parentid[b])
        jadr = int(m.body_jntadr[b])
        jnum = int(m.body_jntnum[b])

        if jnum == 1 and int(m.jnt_type[jadr]) == JNT_FREE:
            qadr = int(m.jnt_qposadr[jadr])
            pos = (q[qadr], q[qadr + 1], q[qadr + 2])
            quat = quat_normalize(
                (q[qadr + 3], q[qadr + 4], q[qadr + 5], q[qadr + 6])
            )
            xanchor[jadr] = pos
            xaxis[jadr] = _p3(P, "jnt_axis", jadr)
        else:
            pos = vadd(xpos[pid], quat_rot(_p3(P, "body_pos", b), xquat[pid]))
            quat = quat_mul(xquat[pid], _p4(P, "body_quat", b))
            for k in range(jnum):
                j = jadr + k
                jtype = int(m.jnt_type[j])
                qadr = int(m.jnt_qposadr[j])
                anchor = vadd(pos, quat_rot(_p3(P, "jnt_pos", j), quat))
                if jtype == JNT_SLIDE:
                    axis_w = quat_rot(_p3(P, "jnt_axis", j), quat)
                    pos = vadd(pos, vscale(axis_w, q[qadr] - q0(qadr)))
                elif jtype == JNT_HINGE:
                    angle = q[qadr] - q0(qadr)
                    half = 0.5 * angle
                    s, c = jnp.sin(half), jnp.cos(half)
                    ax = _p3(P, "jnt_axis", j)
                    qloc = (c, ax[0] * s, ax[1] * s, ax[2] * s)
                    quat = quat_mul(quat, qloc)
                    pos = vsub(anchor, quat_rot(_p3(P, "jnt_pos", j), quat))
                elif jtype == JNT_BALL:
                    qloc = quat_normalize(
                        (q[qadr], q[qadr + 1], q[qadr + 2], q[qadr + 3])
                    )
                    quat = quat_mul(quat, qloc)
                    pos = vsub(anchor, quat_rot(_p3(P, "jnt_pos", j), quat))
                else:  # pragma: no cover
                    raise NotImplementedError(jtype)
                xanchor[j] = anchor
                xaxis[j] = quat_rot(_p3(P, "jnt_axis", j), quat)
            quat = quat_normalize(quat)

        mid = int(m.body_mocapid[b])
        if mid >= 0:
            pos = mocap_pos[mid]
            quat = quat_normalize(mocap_quat[mid])
        xpos.append(pos)
        xquat.append(quat)

    xmat = [quat_to_mat(qq) for qq in xquat]
    xipos = [
        vadd(xpos[b], quat_rot(_p3(P, "body_ipos", b), xquat[b]))
        for b in range(m.nbody)
    ]
    ximat = [
        mat_mul(xmat[b], quat_to_mat(_p4(P, "body_iquat", b)))
        for b in range(m.nbody)
    ]

    geom_xpos = [None] * m.ngeom
    geom_xmat = [None] * m.ngeom
    for g in geoms:
        b = int(m.geom_bodyid[g])
        geom_xpos[g] = vadd(xpos[b], quat_rot(_p3(P, "geom_pos", g), xquat[b]))
        geom_xmat[g] = mat_mul(xmat[b], quat_to_mat(_p4(P, "geom_quat", g)))

    site_xpos = [None] * m.nsite
    site_xmat = [None] * m.nsite
    for s in sites:
        b = int(m.site_bodyid[s])
        site_xpos[s] = vadd(xpos[b], quat_rot(_p3(P, "site_pos", s), xquat[b]))
        site_xmat[s] = mat_mul(xmat[b], quat_to_mat(_p4(P, "site_quat", s)))

    for j in range(m.njnt):
        if xanchor[j] is None:
            xanchor[j] = (zero, zero, zero)
            xaxis[j] = (zero, zero, one)

    return dict(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        xanchor=xanchor, xaxis=xaxis,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


def com_pos_lm(m: Model, P: Params, k: dict):
    """Subtree CoMs, c-frame spatial inertias (as 21 unique planes per
    body), and cdof rows (6 planes per dof)."""
    nb = m.nbody
    mass = [P.plane("body_mass", b) for b in range(nb)]
    xipos = k["xipos"]

    sub_mom = [vscale(xipos[b], mass[b]) for b in range(nb)]
    sub_mass = list(mass)
    for b in range(nb - 1, 0, -1):
        pid = int(m.body_parentid[b])
        sub_mom[pid] = vadd(sub_mom[pid], sub_mom[b])
        sub_mass[pid] = sub_mass[pid] + sub_mass[b]
    subtree_com = [
        vscale(sub_mom[b], 1.0 / jnp.maximum(sub_mass[b], 1e-12))
        for b in range(nb)
    ]

    # world-aligned rotational inertia about CoM: R diag(I) R^T (symmetric,
    # 6 unique entries) ; then spatial inertia about the root subtree com.
    cinert = []  # per body: 6x6 as dict of blocks
    for b in range(nb):
        R = k["ximat"][b]
        I0 = P.plane("body_inertia", b, 0)
        I1 = P.plane("body_inertia", b, 1)
        I2 = P.plane("body_inertia", b, 2)
        # Iw = R diag(I) R^T
        # row i of R scaled: (R[i,0]I0, R[i,1]I1, R[i,2]I2)
        def RI(i):
            return (R[3 * i + 0] * I0, R[3 * i + 1] * I1, R[3 * i + 2] * I2)

        def Rrow(i):
            return (R[3 * i + 0], R[3 * i + 1], R[3 * i + 2])

        Iw = {}
        for i in range(3):
            for j in range(i, 3):
                Iw[(i, j)] = (
                    RI(i)[0] * Rrow(j)[0]
                    + RI(i)[1] * Rrow(j)[1]
                    + RI(i)[2] * Rrow(j)[2]
                )
        root = int(m.body_rootid[b])
        c = vsub(xipos[b], subtree_com[root])  # com offset from origin O
        mb = mass[b]
        # spatial inertia blocks (math.spatial_inertia):
        #   A = Iw - m cx cx (3x3 sym), B = m cx (3x3 skew), D = m I
        cx, cy, cz = c
        # -m * cx@cx  (cx = skew(c)): (cx@cx)[i,j] = c_i c_j - delta_ij |c|^2
        c2 = cx * cx + cy * cy + cz * cz
        cc = {
            (0, 0): cx * cx - c2, (0, 1): cx * cy, (0, 2): cx * cz,
            (1, 1): cy * cy - c2, (1, 2): cy * cz, (2, 2): cz * cz - c2,
        }
        A = {ij: Iw[ij] - mb * cc[ij] for ij in Iw}
        cinert.append(dict(A=A, c=c, m=mb))

    # cdof rows
    zero = jnp.zeros_like(k["xpos"][0][0])
    one = jnp.ones_like(zero)
    cdof = [None] * m.nv
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        b = int(m.jnt_bodyid[j])
        vadr = int(m.jnt_dofadr[j])
        O = subtree_com[int(m.body_rootid[b])]
        if jtype == JNT_FREE:
            cdof[vadr + 0] = (zero, zero, zero, one, zero, zero)
            cdof[vadr + 1] = (zero, zero, zero, zero, one, zero)
            cdof[vadr + 2] = (zero, zero, zero, zero, zero, one)
            offset = vsub(O, k["xpos"][b])
            R = k["xmat"][b]
            for i in range(3):
                ax = (R[i], R[3 + i], R[6 + i])  # column i = body axis i
                cdof[vadr + 3 + i] = ax + vcross(ax, offset)
        elif jtype == JNT_BALL:
            offset = vsub(O, k["xanchor"][j])
            R = k["xmat"][b]
            for i in range(3):
                ax = (R[i], R[3 + i], R[6 + i])
                cdof[vadr + i] = ax + vcross(ax, offset)
        elif jtype == JNT_SLIDE:
            ax = k["xaxis"][j]
            cdof[vadr] = (zero, zero, zero) + ax
        elif jtype == JNT_HINGE:
            ax = k["xaxis"][j]
            offset = vsub(O, k["xanchor"][j])
            cdof[vadr] = ax + vcross(ax, offset)

    k.update(subtree_com=subtree_com, cinert=cinert, cdof=cdof)
    return k


# -- smooth dynamics stages (from phys/smooth.py, plane form) ----------------


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
    """Composite-rigid-body mass matrix as ancestor-pair planes
    (mj_crb semantics, see phys/smooth.crb)."""
    from mjlab_tpu.phys.smooth import _crb_static

    nb, nv = m.nbody, m.nv
    S, dof_body, U = _crb_static(m)

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
    for i in range(nv):
        Mu[(i, i)] = Mu[(i, i)] + P.plane("dof_armature", i)

    k.update(qM=Mu)
    return k


def com_vel_lm(m: Model, P: Params, k: dict, qvel):
    """Body spatial velocities + cdof_dot planes (phys/smooth.com_vel)."""
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
    return _spatial_mul(
        dict(A=ci["A"], h=vscale(ci["c"], ci["m"]), m=ci["m"]), s
    )


def rne_lm(m: Model, P: Params, k: dict, qvel, gravity3):
    """qfrc_bias via recursive Newton-Euler, flg_acc=0 (phys/smooth.rne).

    gravity3: 3-tuple of gravity components — plain floats in the Pallas
    kernels (model opt is never DR-batched), planes in XLA execution."""
    zero = jnp.zeros_like(qvel[0]) if m.nv else None
    grav_off = bool(m.opt.disableflags & DSBL_GRAVITY)
    if grav_off:
        cacc0 = (zero, zero, zero, zero, zero, zero)
    else:
        cacc0 = (
            zero, zero, zero,
            zero - gravity3[0], zero - gravity3[1], zero - gravity3[2],
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
            for x, y in zip(
                _cinert_mul(ci, cacc[b]), force_cross(k["cvel"][b], Iv)
            )
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
    """Passive spring/damper forces (phys/smooth.passive, no tendons)."""
    qfrc = [-P.plane("dof_damping", i) * qvel[i] for i in range(m.nv)]
    hc = getattr(m, "host_consts", None) or {}
    jnt_stiffness_h = (
        hc["jnt_stiffness"] if "jnt_stiffness" in hc
        else np.asarray(m.jnt_stiffness)
    )
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
    """Joint-transmission actuators, trntype JOINT on hinge/slide
    (phys/smooth.fwd_actuation without activation states)."""
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


def actuator_vel_deriv_lm(m: Model, P: Params, ctrl, actuator_force):
    """Per-actuator dF/dv planes; zero where the force is saturated
    (mjd_smooth_vel semantics — see phys/forward._actuator_vel_deriv)."""
    out = []
    for u in range(m.nu):
        dfdv = None
        if int(m.actuator_biastype[u]) == 1:
            dfdv = P.plane("actuator_biasprm", u, 2)
        if int(m.actuator_gaintype[u]) == 1:
            c = ctrl[u]
            if int(m.actuator_ctrllimited[u]):
                c = jnp.clip(
                    c,
                    P.plane("actuator_ctrlrange", u, 0),
                    P.plane("actuator_ctrlrange", u, 1),
                )
            t = P.plane("actuator_gainprm", u, 2) * c
            dfdv = t if dfdv is None else dfdv + t
        if dfdv is not None and int(m.actuator_forcelimited[u]):
            lo = P.plane("actuator_forcerange", u, 0)
            hi = P.plane("actuator_forcerange", u, 1)
            f = actuator_force[u]
            dfdv = jnp.where((f <= lo) | (f >= hi), 0.0, dfdv)
        out.append(dfdv)
    return out


def xfrc_lm(m: Model, P: Params, k: dict, xfrc):
    """Project xfrc_applied (list per body of 6 planes, [force, torque]
    mjData layout) into qfrc planes. xfrc[b] = (fx,fy,fz,tx,ty,tz)."""
    from mjlab_tpu.phys.smooth import ancestor_dof_mask

    cdof = k["cdof"]
    out = [None] * m.nv
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
