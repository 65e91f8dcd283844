"""Constraint assembly: efc rows for dof friction, joint limits and
contacts (pyramidal OR elliptic cone), with MuJoCo's solref/solimp
semantics.

Static row layout (computed in put_model):
  [0, nv)                 dof friction rows (always allocated; active iff
                          dof_frictionloss > 0 — DR-friendly)
  [nv, nv+nlimit)         joint limit rows (one per limited hinge/slide)
  [.., +nlimit_ten)       tendon limit rows (one per limited fixed tendon;
                          J = signed static coefficient row)
  [.., nefc)              contact rows per COMPACTED slot: 2*(condim-1)
                          pyramid rows, or condim direct rows (elliptic)

Contact compaction (TPU-native nconmax): the narrowphase evaluates every
candidate pair (cheap vectorized math), but constraint rows are only built
for the K deepest contacts per env, selected with top_k — the static-shape
analog of the reference's per-world nconmax allocation (reference
src/mjlab/sim/sim.py:84-93, default heuristic ~35). Every compacted slot
carries the uniform pyramidal 4-row layout [n±mu1*t1, n±mu2*t2]; condim-1
(frictionless) contacts use mu=0 with D/4 per row, which is cost- and
force-equivalent to MuJoCo's single normal row.

All formulas verified numerically against mujoco.mj_forward row-by-row:
  imp(pos): sigmoid dmin..dmax over |pos|/width with midpoint/power
  b = 2/(dmax*timeconst); k = 1/(dmax^2 timeconst^2 dampratio^2)
  aref = -b*(J qvel) - k*imp*pos
  R = max((1-imp)/imp * diagApprox, 1e-10);  D = 1/R
  diagApprox: dof/limit rows -> dof_invweight0; pyramidal contact rows ->
      2*mu0^2*(1+mu0^2) * (bw1_t + bw2_t) / impratio (all rows identical);
      frictionless contact rows -> (bw1_t + bw2_t)
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
    imp = impedance(solimp, pos)
    k, b = kb(solref, solimp)
    R = jnp.maximum((1.0 - imp) / imp * diag_approx, _MINVAL)
    D = 1.0 / R
    return imp, k, b, D



_contact_static_cache: dict[int, dict] = {}


def _contact_static_tables(m: Model) -> dict:
    """Per-slot static lookup tables for the gather-free compaction."""
    key = id(m.pairs)
    if key in _contact_static_cache:
        return _contact_static_cache[key]
    pt = m.pairs
    S = pt.ncon
    b1 = m.geom_bodyid[pt.con_geom1]
    b2 = m.geom_bodyid[pt.con_geom2]
    nbody = m.nbody
    r1 = np.zeros((S, nbody))
    r2 = np.zeros((S, nbody))
    r1[np.arange(S), m.body_rootid[b1]] = 1.0
    r2[np.arange(S), m.body_rootid[b2]] = 1.0
    cols = np.asarray(pt.con_dim, np.float64)[:, None]
    out = {
        "root1_onehot": r1,
        "root2_onehot": r2,
        "cols": cols,
        "b1": b1,
        "b2": b2,
    }
    _contact_static_cache[key] = out
    return out


def make_constraint(m: Model, d: Data) -> Data:
    """Fill structured efc blocks (+ contact selection).

    Row layout: [joint equality][dof friction][joint limits][contacts].
    Per-row arrays (D/aref/pos/margin/frictionloss/active) are built as
    per-class blocks and concatenated ONCE — no batched scatters. The
    Jacobian is stored structurally: efc_Jeq (dense, tiny), the friction
    block is the identity (implicit), efc_lim_side holds each limit row's
    single signed entry (its dof address is static), efc_Jc is the dense
    contact block. The solver exploits this structure directly."""
    dtype = d.qpos.dtype
    nv = m.nv
    neq = m.neq_jnt
    nlimit = m.nlimit
    zerov = jnp.zeros((0,), dtype)
    D_b, aref_b, pos_b, margin_b, fl_b, act_b = [], [], [], [], [], []

    # ---- joint equality rows [0, neq) (mjEQ_JOINT; bilateral soft) ----
    Jeq = jnp.zeros((neq, nv), dtype)
    if neq:
        q1 = d.qpos[m.eq_j1_qadr] - m.eq_q0_1
        has_j2 = jnp.asarray(m.eq_j2_qadr >= 0)
        q2 = jnp.where(
            has_j2, d.qpos[jnp.maximum(jnp.asarray(m.eq_j2_qadr), 0)] - m.eq_q0_2, 0.0
        )
        pc = m.eq_polycoef  # (neq, 5)
        powers = jnp.stack([jnp.ones_like(q2), q2, q2**2, q2**3, q2**4], -1)
        poly = jnp.sum(pc * powers, -1)
        dpoly = (
            pc[:, 1]
            + 2 * pc[:, 2] * q2
            + 3 * pc[:, 3] * q2 * q2
            + 4 * pc[:, 4] * q2 * q2 * q2
        )
        pos_eq = q1 - poly
        rows = jnp.arange(neq)
        Jeq = Jeq.at[rows, jnp.asarray(m.eq_j1_dofadr)].set(1.0)
        Jeq = Jeq.at[rows, jnp.maximum(jnp.asarray(m.eq_j2_dofadr), 0)].add(
            jnp.where(has_j2, -dpoly, 0.0)
        )
        iw = (
            m.dof_invweight0[jnp.asarray(m.eq_j1_dofadr)]
            + jnp.where(
                has_j2,
                m.dof_invweight0[jnp.maximum(jnp.asarray(m.eq_j2_dofadr), 0)],
                0.0,
            )
        )
        imp, k, b, De = _efc_kbid(m.eq_solref, m.eq_solimp, pos_eq, iw)
        vel = (
            d.qvel[jnp.asarray(m.eq_j1_dofadr)]
            - jnp.where(
                has_j2,
                dpoly * d.qvel[jnp.maximum(jnp.asarray(m.eq_j2_dofadr), 0)],
                0.0,
            )
        )
        D_b.append(De)
        aref_b.append(-b * vel - k * imp * pos_eq)
        pos_b.append(pos_eq)
        margin_b.append(jnp.zeros((neq,), dtype))
        fl_b.append(jnp.zeros((neq,), dtype))
        act_b.append(jnp.ones((neq,), bool))

    # ---- dof friction rows [neq, neq+nv) — J block = identity ----
    if nv:
        zero = jnp.zeros(nv, dtype)
        imp, k, b, Df = _efc_kbid(m.dof_solref, m.dof_solimp, zero, m.dof_invweight0)
        D_b.append(Df)
        aref_b.append(-b * d.qvel)
        pos_b.append(zero)
        margin_b.append(zero)
        fl_b.append(jnp.asarray(m.dof_frictionloss, dtype))
        act_b.append(jnp.asarray(m.dof_frictionloss > 0))

    # ---- joint limit rows — J block = one signed entry at static vadr ----
    lim_side_jnt = jnp.zeros((nlimit,), dtype)
    if nlimit:
        jids = m.limit_jntid  # static numpy
        ok = np.isin(m.jnt_type[jids], (JNT_HINGE, JNT_SLIDE))
        qadr = m.jnt_qposadr[jids]
        vadr = m.jnt_dofadr[jids]
        q = d.qpos[qadr]
        lo = m.jnt_range[jids, 0]
        hi = m.jnt_range[jids, 1]
        dist_lo = q - lo
        dist_hi = hi - q
        lower = dist_lo < dist_hi
        dist = jnp.minimum(dist_lo, dist_hi)
        side = jnp.where(lower, 1.0, -1.0).astype(dtype)
        margin = m.jnt_margin[jids]
        pos = dist - margin
        imp, k, b, Dl = _efc_kbid(
            m.jnt_solref[jids], m.jnt_solimp[jids], pos, m.dof_invweight0[vadr]
        )
        act_lim = (dist < margin) & jnp.asarray(ok)
        lim_side_jnt = jnp.where(act_lim, side, 0.0)
        vel = side * d.qvel[vadr]
        D_b.append(Dl)
        aref_b.append(-b * vel - k * imp * pos)
        pos_b.append(dist)
        margin_b.append(jnp.broadcast_to(jnp.asarray(margin, dtype), dist.shape))
        fl_b.append(jnp.zeros((nlimit,), dtype))
        act_b.append(act_lim)

    # ---- tendon limit rows — J block = signed static coefficient row ----
    lim_side_ten = jnp.zeros((m.nlimit_ten,), dtype)
    if m.nlimit_ten:
        tid = m.limit_tenid  # static numpy
        L = d.ten_length[tid]
        lo_t = m.tendon_range[tid, 0]
        hi_t = m.tendon_range[tid, 1]
        dist_lo = L - lo_t
        dist_hi = hi_t - L
        lower = dist_lo < dist_hi
        dist = jnp.minimum(dist_lo, dist_hi)
        side = jnp.where(lower, 1.0, -1.0).astype(dtype)
        margin = m.tendon_margin[tid]
        pos = dist - margin
        imp, k, b, Dt = _efc_kbid(
            m.tendon_solref_lim[tid],
            m.tendon_solimp_lim[tid],
            pos,
            m.tendon_invweight0[tid],
        )
        act_lim = dist < margin
        lim_side_ten = jnp.where(act_lim, side, 0.0)
        vel = side * d.ten_velocity[tid]
        D_b.append(Dt)
        aref_b.append(-b * vel - k * imp * pos)
        pos_b.append(dist)
        margin_b.append(jnp.broadcast_to(jnp.asarray(margin, dtype), dist.shape))
        fl_b.append(jnp.zeros((m.nlimit_ten,), dtype))
        act_b.append(act_lim)
    lim_side = jnp.concatenate([lim_side_jnt, lim_side_ten])

    # ---- contact rows: top-K compaction — dense block efc_Jc ----
    pt = m.pairs
    K = m.ncon_max
    R = m.rows_per_con
    KR = K * R
    Jc = jnp.zeros((KR, nv), dtype)
    if pt.ncon and K:
        con = d.contact
        # depth-sorted selection (most negative dist-margin first)
        score = con.dist - con.includemargin
        neg, sel = jax.lax.top_k(-score, K)  # (K,) slot indices
        sel_active = (-neg) < 0.0  # selected slot is in contact

        # gather-free compaction: XLA's batched gather runs at ~26 GB/s on
        # v5e (vs 340 GB/s stream). A one-hot selection matmul is ~2.5x
        # faster for the env-dependent packed record, and turns every
        # STATIC per-slot table lookup (body masks, roots, condim,
        # invweights) into a true 2D MXU matmul.
        S = pt.ncon
        oh = (sel[:, None] == jnp.arange(S)[None, :]).astype(dtype)  # (K, S)
        cpk = oh @ con.packed  # (K, 26)
        dist_k = cpk[..., 0]
        margin_k = cpk[..., 1]
        solref_k = cpk[..., 10:12]
        solimp_k = cpk[..., 12:17]

        W = ancestor_dof_mask(m)  # (nbody, nv) numpy
        b1_np = m.geom_bodyid[pt.con_geom1]  # (S,) static
        b2_np = m.geom_bodyid[pt.con_geom2]
        stat = _contact_static_tables(m)
        W1 = oh @ jnp.asarray(W[b1_np], dtype)  # (K, nv)
        W2 = oh @ jnp.asarray(W[b2_np], dtype)
        R1 = oh @ jnp.asarray(stat["root1_onehot"], dtype)  # (K, nbody)
        R2 = oh @ jnp.asarray(stat["root2_onehot"], dtype)
        O1 = R1 @ d.subtree_com  # (K, 3)
        O2 = R2 @ d.subtree_com
        dim_k = (oh @ jnp.asarray(stat["cols"], dtype))[..., 0]  # condim
        # invweight0 is a traced model field (static numpy slot indexing,
        # then one-hot select)
        iw_slot = (
            m.body_invweight0[stat["b1"], 0] + m.body_invweight0[stat["b2"], 0]
        )
        invweight_t = oh @ jnp.asarray(iw_slot, dtype)

        cd_ang = d.cdof[:, :3]  # (nv,3)
        cd_lin = d.cdof[:, 3:]
        pos_k = cpk[..., 2:5]  # (K,3)

        def point_jac(Wrows, Ob):
            r = pos_k[:, None, :] - Ob[:, None, :]
            jac = cd_lin[None] + jnp.cross(
                jnp.broadcast_to(cd_ang[None], (K, nv, 3)),
                jnp.broadcast_to(r, (K, nv, 3)),
            )
            return jac * Wrows[:, :, None]

        jacd = point_jac(W2, O2) - point_jac(W1, O1)  # (K, nv, 3)
        frame_k = cpk[..., 17:26].reshape(K, 3, 3)
        Jc3 = jnp.einsum("kfx,kvx->kfv", frame_k, jacd)  # (K, 3, nv)

        elliptic = int(m.opt.cone) != 0
        ndirs = (R - 1) if elliptic else R // 2
        frictionless = dim_k == 1
        mu = cpk[..., 5:10]  # (K, 5)
        # friction coefficient per direction, masked by the slot's condim:
        # dir i active iff condim > i+1 (t1,t2 need 3; torsion 4; rolls 6)
        dir_need = np.array([3, 3, 4, 6, 6], np.float32)[:ndirs]
        mu_dirs = jnp.where(
            (dim_k[:, None] >= dir_need[None, :]) & ~frictionless[:, None],
            mu[:, :ndirs],
            0.0,
        )  # (K, ndirs)

        # direction Jacobians: linear t1,t2 then angular n,t1,t2
        Jn, Jt1, Jt2 = Jc3[:, 0], Jc3[:, 1], Jc3[:, 2]
        dirJ = [Jt1, Jt2]
        if ndirs > 2:
            # angular relative jacobian rotated into the contact frame
            jaca = (
                jnp.broadcast_to(cd_ang[None], (K, nv, 3)) * W2[:, :, None]
                - jnp.broadcast_to(cd_ang[None], (K, nv, 3)) * W1[:, :, None]
            )
            Ja = jnp.einsum("kfx,kvx->kfv", frame_k, jaca)  # (K, 3, nv)
            dirJ += [Ja[:, 0], Ja[:, 1], Ja[:, 2]][: ndirs - 2]

        pos_c = dist_k - margin_k
        if elliptic:
            # elliptic rows: [normal, t1, t2, torsion, roll1, roll2][:R].
            # Formulas measured against mujoco mj_forward (cone=elliptic):
            #   D_i = D_n * impratio * (mu_i / mu_0)^2   (friction rows)
            #   aref_n = -b vel_n - k imp pos;  aref_i = -b vel_i
            #   efc_pos/margin are zero on friction rows
            rows_list = [Jn] + [dirJ[i] for i in range(ndirs)]
            rowsJ = jnp.stack(rows_list, axis=1)  # (K, R, nv)
            row_idx = np.arange(R)
            row_on = row_idx[None, :] < jnp.minimum(dim_k, R)[:, None]

            imp, kk, bb, Dn = _efc_kbid(
                solref_k, solimp_k, pos_c, invweight_t
            )
            mu0 = jnp.maximum(mu_dirs[:, 0], _MINVAL)
            ratio2 = jnp.square(mu_dirs / mu0[:, None])  # (K, ndirs)
            D_rows = jnp.concatenate(
                [Dn[:, None], Dn[:, None] * m.opt.impratio * ratio2], axis=1
            )  # (K, R)
            vel = jnp.einsum("krv,v->kr", rowsJ, d.qvel)  # (K, R)
            aref_c = -bb[:, None] * vel
            aref_c = aref_c.at[:, 0].add(-kk * imp * pos_c)
            pos_rows = jnp.concatenate(
                [dist_k[:, None], jnp.zeros((K, R - 1), dtype)], axis=1
            )
            margin_rows = jnp.concatenate(
                [margin_k[:, None], jnp.zeros((K, R - 1), dtype)], axis=1
            )
            D_flat = D_rows.reshape(-1)
        else:
            rows_list = []
            for i in range(ndirs):
                rows_list.append(Jn + mu_dirs[:, i, None] * dirJ[i])
                rows_list.append(Jn - mu_dirs[:, i, None] * dirJ[i])
            rowsJ = jnp.stack(rows_list, axis=1)  # (K, R, nv)

            # row activity: condim-1 slots use only the first 4 rows (mu=0,
            # normal split over 4 -> x4 R, numerically equal to one normal
            # row); condim>=3 slots use 2*(condim-1) rows.
            row_count = jnp.where(
                frictionless, 4, 2 * (jnp.maximum(dim_k, 3) - 1)
            )  # (K,)
            row_idx = np.arange(R)
            row_on = row_idx[None, :] < row_count[:, None]  # (K, R)

            mu1 = mu_dirs[:, 0]
            diag_pyr = (
                2.0 * mu1 * mu1 * (1.0 + mu1 * mu1) * invweight_t / m.opt.impratio
            )
            # frictionless: single-normal-row diagApprox over 4 rows (x4 R)
            diag_approx = jnp.where(frictionless, invweight_t * 4.0, diag_pyr)

            imp, kk, bb, Dc = _efc_kbid(solref_k, solimp_k, pos_c, diag_approx)
            vel = jnp.einsum("krv,v->kr", rowsJ, d.qvel)  # (K, R)
            aref_c = -bb[:, None] * vel - (kk * imp * pos_c)[:, None]
            pos_rows = jnp.broadcast_to(dist_k[:, None], (K, R))
            margin_rows = jnp.broadcast_to(margin_k[:, None], (K, R))
            D_flat = jnp.repeat(Dc, R)

        on = (sel_active[:, None] & row_on).reshape(-1)
        Jc = jnp.where(on[:, None], rowsJ.reshape(KR, nv), 0.0)
        D_b.append(jnp.where(on, D_flat, 0.0))
        aref_b.append(aref_c.reshape(-1))
        pos_b.append(pos_rows.reshape(-1))
        margin_b.append(margin_rows.reshape(-1))
        fl_b.append(jnp.zeros((KR,), dtype))
        act_b.append(on)
        d = d.replace(
            con_sel=sel,
            con_sel_active=sel_active,
            con_packed_c=jnp.concatenate([cpk, dim_k[:, None]], axis=-1),
        )
    elif KR:
        D_b.append(jnp.zeros((KR,), dtype))
        aref_b.append(jnp.zeros((KR,), dtype))
        pos_b.append(jnp.zeros((KR,), dtype))
        margin_b.append(jnp.zeros((KR,), dtype))
        fl_b.append(jnp.zeros((KR,), dtype))
        act_b.append(jnp.zeros((KR,), bool))

    def cat(blocks, fallback_dtype=dtype):
        return jnp.concatenate(blocks) if blocks else jnp.zeros((0,), fallback_dtype)

    D = cat(D_b)
    aref = cat(aref_b)
    pos_out = cat(pos_b)
    margin_out = cat(margin_b)
    fl_out = cat(fl_b)
    active = jnp.concatenate(act_b) if act_b else jnp.zeros((0,), bool)

    # inactive rows contribute nothing. aref/D/J blocks are zeroed so any
    # non-finite values in far-away (inactive) contact slots can never
    # poison the Newton solve through 0*NaN propagation.
    D = jnp.where(active, D, 0.0)
    fl_out = jnp.where(active, fl_out, 0.0)
    aref = jnp.where(active, aref, 0.0)
    return d.replace(
        efc_Jeq=Jeq, efc_lim_side=lim_side, efc_Jc=Jc,
        efc_D=D, efc_aref=aref, efc_pos=pos_out,
        efc_margin=margin_out, efc_frictionloss=fl_out, efc_active=active,
    )
