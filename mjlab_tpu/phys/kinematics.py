"""Forward kinematics and com-frame quantities (mj_kinematics / mj_comPos
semantics).

Written for a single world; batch with vmap. The body loop is a Python loop
over the static kinematic tree (nbody ~ 30 for the supported robots), which
XLA unrolls into straight-line fused code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.phys import math
from mjlab_tpu.phys.model import JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE, Model
from mjlab_tpu.phys.data import Data


def kinematics(m: Model, d: Data) -> Data:
    """Compute global positions/orientations of bodies, geoms, sites."""
    dtype = d.qpos.dtype
    qpos = d.qpos

    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for b in range(1, m.nbody):
        pid = int(m.body_parentid[b])
        jadr = int(m.body_jntadr[b])
        jnum = int(m.body_jntnum[b])

        if jnum == 1 and int(m.jnt_type[jadr]) == JNT_FREE:
            qadr = int(m.jnt_qposadr[jadr])
            pos = qpos[qadr : qadr + 3]
            quat = math.normalize_quat(qpos[qadr + 3 : qadr + 7])
            xanchor[jadr] = pos
            xaxis[jadr] = m.jnt_axis[jadr]  # axis is meaningless for free
        else:
            pos = xpos[pid] + math.rot_vec_quat(m.body_pos[b], xquat[pid])
            quat = math.mul_quat(xquat[pid], m.body_quat[b])
            for k in range(jnum):
                j = jadr + k
                jtype = int(m.jnt_type[j])
                qadr = int(m.jnt_qposadr[j])
                anchor = pos + math.rot_vec_quat(m.jnt_pos[j], quat)
                if jtype == JNT_SLIDE:
                    axis_w = math.rot_vec_quat(m.jnt_axis[j], quat)
                    pos = pos + axis_w * (qpos[qadr] - m.qpos0[qadr])
                elif jtype == JNT_HINGE:
                    angle = qpos[qadr] - m.qpos0[qadr]
                    qloc = math.axis_angle_to_quat(m.jnt_axis[j], angle)
                    quat = math.mul_quat(quat, qloc)
                    pos = anchor - math.rot_vec_quat(m.jnt_pos[j], quat)
                elif jtype == JNT_BALL:
                    qloc = math.normalize_quat(qpos[qadr : qadr + 4])
                    quat = math.mul_quat(quat, qloc)
                    pos = anchor - math.rot_vec_quat(m.jnt_pos[j], quat)
                else:  # pragma: no cover
                    raise NotImplementedError(jtype)
                xanchor[j] = anchor
                xaxis[j] = math.rot_vec_quat(m.jnt_axis[j], quat)
            quat = math.normalize_quat(quat)

        # mocap override
        mid = int(m.body_mocapid[b])
        if mid >= 0:
            pos = d.mocap_pos[mid]
            quat = math.normalize_quat(d.mocap_quat[mid])
        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = math.quat_to_mat(xquat)

    # fill unset anchors (world-less joints impossible; all set above)
    xanchor_arr = (
        jnp.stack([a if a is not None else jnp.zeros(3, dtype) for a in xanchor])
        if m.njnt
        else jnp.zeros((0, 3), dtype)
    )
    xaxis_arr = (
        jnp.stack([a if a is not None else jnp.zeros(3, dtype) for a in xaxis])
        if m.njnt
        else jnp.zeros((0, 3), dtype)
    )

    bq = xquat[m.geom_bodyid]
    geom_xpos = xpos[m.geom_bodyid] + math.rot_vec_quat(m.geom_pos, bq)
    geom_xmat = xmat[m.geom_bodyid] @ math.quat_to_mat(m.geom_quat)
    sq = xquat[m.site_bodyid] if m.nsite else xquat[:0]
    site_xpos = (
        xpos[m.site_bodyid] + math.rot_vec_quat(m.site_pos, sq)
        if m.nsite
        else jnp.zeros((0, 3), dtype)
    )
    site_xmat = (
        xmat[m.site_bodyid] @ math.quat_to_mat(m.site_quat)
        if m.nsite
        else jnp.zeros((0, 3, 3), dtype)
    )

    xipos = xpos + math.rot_vec_quat(m.body_ipos, xquat)
    ximat = xmat @ math.quat_to_mat(m.body_iquat)

    return d.replace(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        xanchor=xanchor_arr, xaxis=xaxis_arr,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


def com_pos(m: Model, d: Data) -> Data:
    """Subtree CoMs, com-frame spatial inertias and dof motion subspaces."""
    dtype = d.qpos.dtype

    # subtree com: backward accumulation
    mass = m.body_mass
    mom = d.xipos * mass[:, None]
    sub_mom = list(mom)
    sub_mass = list(mass)
    for b in range(m.nbody - 1, 0, -1):
        pid = int(m.body_parentid[b])
        sub_mom[pid] = sub_mom[pid] + sub_mom[b]
        sub_mass[pid] = sub_mass[pid] + sub_mass[b]
    sub_mom = jnp.stack(sub_mom)
    sub_mass = jnp.stack(sub_mass)
    subtree_com = sub_mom / jnp.maximum(sub_mass, 1e-12)[:, None]

    # spatial inertia of each body about its tree-root subtree com
    root_com = subtree_com[m.body_rootid]
    # I_c = R diag(a) R^T, component-wise: I_c[i, j] = sum_k a_k R_ik R_jk.
    # Written as explicit products — the batched (nbody, 3, 3) dot_general
    # lowers to lane-padded bf16 MXU passes plus layout-flip copies
    # (round-3 trace: ~1.7 ms/substep at 4096 envs across this stage).
    Ra = d.ximat * m.body_inertia[..., None, :]  # (..., nbody, 3, 3) R*a_k
    inertia_c = jnp.stack(
        [
            jnp.sum(Ra[..., i, :] * d.ximat[..., j, :], axis=-1)
            for i in range(3)
            for j in range(3)
        ],
        axis=-1,
    ).reshape(d.ximat.shape)
    cvec = d.xipos - root_com
    cinert = math.spatial_inertia(m.body_mass, inertia_c, cvec)

    # cdof: build rows in dof order and concatenate ONCE — scatter-free
    # (batched .at[row].set lowers to per-row dynamic-update-slices whose
    # copies dominated this stage on TPU). MuJoCo dof order follows joint
    # order, so appending per-joint row blocks reproduces vadr layout.
    rows = []
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        b = int(m.jnt_bodyid[j])
        O = subtree_com[int(m.body_rootid[b])]
        if jtype == JNT_FREE:
            eye = jnp.eye(3, dtype=dtype)
            rows.append(jnp.concatenate([jnp.zeros((3, 3), dtype), eye], axis=1))
            offset = O - d.xpos[b]
            ax = d.xmat[b].T  # (3 axes, 3)
            rows.append(jnp.concatenate([ax, jnp.cross(ax, offset)], axis=1))
        elif jtype == JNT_BALL:
            offset = O - d.xanchor[j]
            ax = d.xmat[b].T
            rows.append(jnp.concatenate([ax, jnp.cross(ax, offset)], axis=1))
        elif jtype == JNT_SLIDE:
            rows.append(
                jnp.concatenate([jnp.zeros(3, dtype), d.xaxis[j]])[None]
            )
        elif jtype == JNT_HINGE:
            ax = d.xaxis[j]
            offset = O - d.xanchor[j]
            rows.append(jnp.concatenate([ax, jnp.cross(ax, offset)])[None])
    cdof = (
        jnp.concatenate(rows, axis=0)
        if rows
        else jnp.zeros((m.nv, 6), dtype)
    )

    return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)
