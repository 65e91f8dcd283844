"""Constraint assembly: efc rows for dof friction, joint limits and
contacts (pyramidal cone), with MuJoCo's solref/solimp semantics.

Static row layout (computed in put_model):
  [0, nv)                 dof friction rows (always allocated; active iff
                          dof_frictionloss > 0 — DR-friendly)
  [nv, nv+nlimit)         joint limit rows (one per limited hinge/slide)
  [nv+nlimit, nefc)       contact rows (2*(dim-1) per pyramidal contact)

All formulas verified numerically against mujoco.mj_forward row-by-row:
  imp(pos): sigmoid dmin..dmax over |pos|/width with midpoint/power
  b = 2/(dmax*timeconst); k = 1/(dmax^2 timeconst^2 dampratio^2)
  aref = -b*(J qvel) - k*imp*pos
  R = max((1-imp)/imp * diagApprox, 1e-10);  D = 1/R
  diagApprox: dof rows -> dof_invweight0; limit rows -> dof_invweight0;
  pyramidal contact rows (all rows of a contact identical) ->
      2*mu0^2*(1+mu0^2) * (body_invweight0[b1,0]+body_invweight0[b2,0]) / impratio
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.model import JNT_HINGE, JNT_SLIDE, Model
from mjlab_tpu.phys.data import Data
from mjlab_tpu.phys.smooth import ancestor_dof_mask

_MINVAL = 1e-10


def impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
    """Constraint impedance d(pos) in [dmin, dmax]."""
    dmin, dmax, width, mid, power = (
        solimp[..., 0], solimp[..., 1], solimp[..., 2],
        jnp.clip(solimp[..., 3], 0.0001, 0.9999),
        jnp.maximum(solimp[..., 4], 1.0),
    )
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
    # x <= mid: y = (1/mid^(p-1)) x^p ; else 1 - (1/(1-mid)^(p-1))(1-x)^p
    y_low = jnp.power(x, power) / jnp.power(mid, power - 1.0)
    y_high = 1.0 - jnp.power(1.0 - x, power) / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(x <= mid, y_low, y_high)
    imp = dmin + y * (dmax - dmin)
    return jnp.clip(imp, _MINVAL, 1.0 - _MINVAL)


def kb(solref: jax.Array, solimp: jax.Array):
    """Stiffness/damping from solref. Negative solref = direct (k,b)."""
    dmax = solimp[..., 1]
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    std = timeconst > 0
    b = jnp.where(std, 2.0 / jnp.maximum(dmax * timeconst, _MINVAL), -dampratio)
    k = jnp.where(
        std,
        1.0
        / jnp.maximum(
            dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL
        ),
        -timeconst,
    )
    return k, b


def _efc_kbid(solref, solimp, pos, diag_approx):
    """aref coefficients and D for a set of rows."""
    imp = impedance(solimp, pos)
    k, b = kb(solref, solimp)
    R = jnp.maximum((1.0 - imp) / imp * diag_approx, _MINVAL)
    D = 1.0 / R
    return imp, k, b, D


def make_constraint(m: Model, d: Data) -> Data:
    """Fill efc_J/D/aref/pos/frictionloss/active."""
    dtype = d.qpos.dtype
    nv, nefc = m.nv, m.nefc
    J = jnp.zeros((nefc, nv), dtype)
    D = jnp.zeros((nefc,), dtype)
    aref = jnp.zeros((nefc,), dtype)
    pos_out = jnp.zeros((nefc,), dtype)
    margin_out = jnp.zeros((nefc,), dtype)
    fl_out = jnp.zeros((nefc,), dtype)
    active = jnp.zeros((nefc,), bool)

    # ---- dof friction rows [0, nv) ----
    if nv:
        J = J.at[jnp.arange(nv), jnp.arange(nv)].set(1.0)
        zero = jnp.zeros(nv, dtype)
        imp, k, b, Df = _efc_kbid(m.dof_solref, m.dof_solimp, zero, m.dof_invweight0)
        aref = aref.at[:nv].set(-b * d.qvel)
        D = D.at[:nv].set(Df)
        fl_out = fl_out.at[:nv].set(m.dof_frictionloss)
        active = active.at[:nv].set(m.dof_frictionloss > 0)

    # ---- joint limit rows ----
    for i, j in enumerate(m.limit_jntid.tolist()):
        row = nv + i
        jtype = int(m.jnt_type[j])
        if jtype not in (JNT_HINGE, JNT_SLIDE):
            continue  # ball/free limits unsupported
        qadr = int(m.jnt_qposadr[j])
        vadr = int(m.jnt_dofadr[j])
        q = d.qpos[qadr]
        lo, hi = m.jnt_range[j, 0], m.jnt_range[j, 1]
        dist_lo = q - lo
        dist_hi = hi - q
        lower = dist_lo < dist_hi
        dist = jnp.minimum(dist_lo, dist_hi)
        side = jnp.where(lower, 1.0, -1.0).astype(dtype)
        margin = m.jnt_margin[j]
        pos = dist - margin
        imp, k, b, Dl = _efc_kbid(
            m.jnt_solref[j], m.jnt_solimp[j], pos, m.dof_invweight0[vadr]
        )
        vel = side * d.qvel[vadr]
        J = J.at[row, vadr].set(side)
        aref = aref.at[row].set(-b * vel - k * imp * pos)
        D = D.at[row].set(Dl)
        pos_out = pos_out.at[row].set(dist)
        margin_out = margin_out.at[row].set(margin)
        active = active.at[row].set(dist < margin)

    # ---- contact rows (pyramidal) ----
    pt = m.pairs
    if pt.ncon:
        W = jnp.asarray(ancestor_dof_mask(m), dtype)  # (nbody, nv)
        b1 = m.geom_bodyid[pt.con_geom1]
        b2 = m.geom_bodyid[pt.con_geom2]
        O = d.subtree_com[m.body_rootid]  # (nbody,3)

        cd_ang = d.cdof[:, :3]  # (nv,3)
        cd_lin = d.cdof[:, 3:]

        con = d.contact
        # translational point jacobian difference: (ncon, 3, nv)
        # jacp_i(body) = cd_lin_i + cd_ang_i x (p - O_body_root), masked by chain
        def point_jac(bids):
            # (ncon, nv, 3)
            r = con.pos[:, None, :] - O[bids][:, None, :]  # (ncon,1,3)
            jac = cd_lin[None] + jnp.cross(cd_ang[None], jnp.broadcast_to(r, (pt.ncon, nv, 3)))
            return jac * W[bids][:, :, None]

        jac2 = point_jac(b2)
        jac1 = point_jac(b1)
        jacd = jac2 - jac1  # (ncon, nv, 3)
        # contact-space translational rows: frame rows . jacd
        Jc = jnp.einsum("cfk,cvk->cfv", con.frame, jacd)  # (ncon, 3, nv)
        # rotational difference for torsion/rolling (condim > 3)
        need_rot = bool(np.any(pt.con_dim > 3))
        if need_rot:
            jacr = (cd_ang[None] * W[b2][:, :, None]) - (cd_ang[None] * W[b1][:, :, None])
            Jr = jnp.einsum("cfk,cvk->cfv", con.frame, jacr)  # (ncon, 3, nv)

        mu0 = con.friction[:, 0]
        invweight_t = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        diag_approx = (
            2.0 * mu0 * mu0 * (1.0 + mu0 * mu0) * invweight_t / m.opt.impratio
        )
        pos_c = con.dist - con.includemargin
        imp, k, b, Dc = _efc_kbid(con.solref, con.solimp, pos_c, diag_approx)
        act_c = con.dist < con.includemargin

        for c in range(pt.ncon):
            dim = int(pt.con_dim[c])
            adr = int(pt.con_efcadr[c])
            nrows = 2 * (dim - 1) if dim > 1 else 1
            if dim == 1:
                rowsJ = Jc[c, 0][None]
            else:
                rows = []
                for kdim in range(dim - 1):
                    axJ = Jc[c, 1 + kdim] if kdim < 2 else Jr[c, kdim - 2]
                    mu_k = con.friction[c, kdim]
                    rows.append(Jc[c, 0] + mu_k * axJ)
                    rows.append(Jc[c, 0] - mu_k * axJ)
                rowsJ = jnp.stack(rows)
            vel = rowsJ @ d.qvel
            sl = slice(adr, adr + nrows)
            J = J.at[sl].set(rowsJ)
            aref = aref.at[sl].set(-b[c] * vel - k[c] * imp[c] * pos_c[c])
            D = D.at[sl].set(Dc[c])
            pos_out = pos_out.at[sl].set(con.dist[c])
            margin_out = margin_out.at[sl].set(con.includemargin[c])
            active = active.at[sl].set(act_c[c])

    # inactive rows contribute nothing: zero their D and frictionloss
    D = jnp.where(active, D, 0.0)
    fl_out = jnp.where(active, fl_out, 0.0)
    return d.replace(
        efc_J=J, efc_D=D, efc_aref=aref, efc_pos=pos_out,
        efc_margin=margin_out, efc_frictionloss=fl_out, efc_active=active,
    )
