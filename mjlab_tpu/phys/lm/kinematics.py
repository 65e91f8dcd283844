"""Lane-major forward kinematics + com-frame quantities.

Same tree recursion as phys/kinematics.py (mj_kinematics / mj_comPos
semantics), but every body/joint quantity is a tuple of (E,) planes — the
whole FK for a ~30-body robot compiles to a few fully-laned fused kernels
instead of thousands of (E, 3)-padded ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.model import JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE, Model
from mjlab_tpu.phys.lm.base import (
    Params, mat_mul, mat_tvec, mat_vec, quat_mul, quat_normalize, quat_rot,
    quat_to_mat, vadd, vcross, vscale, vsub,
)


def _p3(P: Params, name: str, i: int):
    return tuple(P.plane(name, i, k) for k in range(3))


def _p4(P: Params, name: str, i: int):
    return tuple(P.plane(name, i, k) for k in range(4))


def kinematics_lm(m: Model, P: Params, q, mocap_pos, mocap_quat):
    """q: tuple of nq (E,) planes. mocap_*: lists of vec3/quat tuples.

    Returns dict with per-body/joint/geom/site plane structures.
    """
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

    geom_xpos = []
    geom_xmat = []
    for g in range(m.ngeom):
        b = int(m.geom_bodyid[g])
        geom_xpos.append(vadd(xpos[b], quat_rot(_p3(P, "geom_pos", g), xquat[b])))
        geom_xmat.append(mat_mul(xmat[b], quat_to_mat(_p4(P, "geom_quat", g))))

    site_xpos = []
    site_xmat = []
    for s in range(m.nsite):
        b = int(m.site_bodyid[s])
        site_xpos.append(vadd(xpos[b], quat_rot(_p3(P, "site_pos", s), xquat[b])))
        site_xmat.append(mat_mul(xmat[b], quat_to_mat(_p4(P, "site_quat", s))))

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
