"""Post-constraint body accelerations and interaction forces.

Batched (env-first) equivalent of MuJoCo's ``mj_rnePostConstraint``
(behavioral reference: mujoco engine_core_smooth.c; consumed by the C
sensor pipeline for accelerometer / force / torque / frame*acc sensors —
reference framework reads them via mjSENS_* sensordata slices,
/root/reference/src/mjlab/sensor/builtin_sensor.py:59-101).

Computes, for every env:
  cacc      (E, nbody, 6)  spatial acceleration of each body in the
                           c-frame (origin subtree_com[root], world axes,
                           [rot(3), lin(3)]), including gravity offset.
  cfrc_int  (E, nbody, 6)  interaction force body <- parent, c-frame.
  cfrc_ext  (E, nbody, 6)  external force on body (xfrc_applied +
                           contact forces), c-frame.

Limitations vs MuJoCo: contact torque for condim>3 (torsional/rolling)
is not included (the packed contact record stores the linear force only),
and equality connect/weld forces do not exist in this engine (joint
equalities act purely in joint space).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.data import Data
from mjlab_tpu.phys.model import DSBL_GRAVITY, Model
from mjlab_tpu.phys import math


def rne_postconstraint(m: Model, d: Data):
    """Returns (cacc, cfrc_int, cfrc_ext), each (E, nbody, 6)."""
    E = d.qpos.shape[0]
    dtype = d.qpos.dtype
    nbody = m.nbody
    rootid = np.asarray(m.body_rootid)

    # c-frame origin per body: subtree CoM of the body's kinematic root
    O_all = d.subtree_com[:, rootid]  # (E, nbody, 3)

    # ---- cfrc_ext: applied external forces --------------------------------
    # xfrc_applied: [force(3), torque(3)] at body CoM (xipos), world axes.
    force = d.xfrc_applied[..., :3]
    torque = d.xfrc_applied[..., 3:]
    ang = torque + jnp.cross(d.xipos - O_all, force)
    cfrc_ext = jnp.concatenate([ang, force], axis=-1)  # (E, nbody, 6)
    cfrc_ext = cfrc_ext.at[:, 0].set(0.0)

    # contact forces: world-frame force f at contact pos p acts +f on the
    # second geom's body and -f on the first (MuJoCo frame convention).
    if m.ncon_max and m.pairs.ncon:
        b1_tab = jnp.asarray(m.geom_bodyid[np.asarray(m.pairs.con_geom1)])
        b2_tab = jnp.asarray(m.geom_bodyid[np.asarray(m.pairs.con_geom2)])
        sel = d.con_sel  # (E, K) slot ids
        cb1 = b1_tab[sel]  # (E, K)
        cb2 = b2_tab[sel]
        pos = d.con_packed_c[..., 2:5]  # (E, K, 3)
        f = jnp.where(d.con_sel_active[..., None], d.con_force_c, 0.0)
        erow = jnp.arange(E)[:, None]

        def spatial_at(bids):
            O = jnp.take_along_axis(O_all, bids[..., None], axis=1)  # (E,K,3)
            t = jnp.cross(pos - O, f)
            return jnp.concatenate([t, f], axis=-1)  # (E, K, 6)

        cfrc_ext = cfrc_ext.at[erow, cb2].add(spatial_at(cb2))
        cfrc_ext = cfrc_ext.at[erow, cb1].add(-spatial_at(cb1))
        cfrc_ext = cfrc_ext.at[:, 0].set(0.0)

    # ---- cacc: forward pass ----------------------------------------------
    gravity = jnp.asarray(m.opt.gravity, dtype)
    if m.opt.disableflags & DSBL_GRAVITY:
        gravity = jnp.zeros(3, dtype)
    cacc0 = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros(3, dtype), -gravity]), (E, 6)
    )
    cacc = [cacc0]
    for b in range(1, nbody):
        pid = int(m.body_parentid[b])
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        a = cacc[pid]
        if num:
            sl = slice(adr, adr + num)
            a = a + jnp.einsum(
                "evk,ev->ek", d.cdof_dot[:, sl], d.qvel[:, sl]
            ) + jnp.einsum("evk,ev->ek", d.cdof[:, sl], d.qacc[:, sl])
        cacc.append(a)
    cacc = jnp.stack(cacc, axis=1)  # (E, nbody, 6)

    # ---- cfrc_int: body force balance + backward accumulation ------------
    Iv = jnp.einsum("ebij,ebj->ebi", d.cinert, d.cvel)
    cfrc_body = (
        jnp.einsum("ebij,ebj->ebi", d.cinert, cacc)
        + math.force_cross(d.cvel, Iv)
        - cfrc_ext
    )
    cfrc = [cfrc_body[:, b] for b in range(nbody)]
    for b in range(nbody - 1, 0, -1):
        pid = int(m.body_parentid[b])
        cfrc[pid] = cfrc[pid] + cfrc[b]
    cfrc_int = jnp.stack(cfrc, axis=1)
    return cacc, cfrc_int, cfrc_ext


def object_velocity(pos, O, cvel, mat=None):
    """6D velocity [rot, lin] of the point `pos` of a body whose c-frame
    spatial velocity is `cvel` referenced at origin `O`. If `mat` (3x3,
    batched) is given, the result is expressed in that local frame
    (mj_objectVelocity flg_local=1)."""
    ang = cvel[..., :3]
    lin = cvel[..., 3:] + jnp.cross(ang, pos - O)
    if mat is not None:
        ang = jnp.einsum("...ij,...j->...i", jnp.swapaxes(mat, -1, -2), ang)
        lin = jnp.einsum("...ij,...j->...i", jnp.swapaxes(mat, -1, -2), lin)
    return jnp.concatenate([ang, lin], axis=-1)


def object_acceleration(pos, O, cvel, cacc, mat=None):
    """6D acceleration [rot, lin] of the point `pos` (mj_objectAcceleration):
    translate cacc to the point, add the convective term ang_vel x lin_vel,
    optionally express in the local frame `mat`."""
    vel = object_velocity(pos, O, cvel, mat=None)  # world
    ang = cacc[..., :3]
    lin = cacc[..., 3:] + jnp.cross(ang, pos - O)
    # convective/centripetal correction
    lin = lin + jnp.cross(vel[..., :3], vel[..., 3:])
    if mat is not None:
        ang = jnp.einsum("...ij,...j->...i", jnp.swapaxes(mat, -1, -2), ang)
        lin = jnp.einsum("...ij,...j->...i", jnp.swapaxes(mat, -1, -2), lin)
    return jnp.concatenate([ang, lin], axis=-1)


def transform_force(frc, newpos, oldpos):
    """Translate a spatial force [torque, force] from reference point
    oldpos to newpos (mju_transformSpatial flg_force=1)."""
    t = frc[..., :3]
    f = frc[..., 3:]
    t_new = t - jnp.cross(newpos - oldpos, f)
    return jnp.concatenate([t_new, f], axis=-1)
