"""Lane-major constraint assembly. Mirrors phys/constraint.py semantics
(row layout [eq][dof friction][limits][contacts], same solref/solimp
formulas, same top-K contact compaction) with envs on the lane axis.

Row-major outputs:
    D, aref, fl          (nefc, E)
    Jeq                  (neq, nv, E)
    lim_side             (nlimit, E)
    Jc                   (K*R, nv, E)
plus compacted per-contact data for force decode / sensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.model import JNT_HINGE, JNT_SLIDE, Model
from mjlab_tpu.phys.lm.base import Params
from mjlab_tpu.phys.lm.collision import slot_params
from mjlab_tpu.phys.smooth import ancestor_dof_mask

_MINVAL = 1e-10


def _impedance(si, pos):
    """si: (..., 5, Eb); pos (..., E)."""
    dmin, dmax, width = si[..., 0, :], si[..., 1, :], si[..., 2, :]
    mid = jnp.clip(si[..., 3, :], 0.0001, 0.9999)
    power = jnp.maximum(si[..., 4, :], 1.0)
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
    y_low = jnp.power(x, power) / jnp.power(mid, power - 1.0)
    y_high = 1.0 - jnp.power(1.0 - x, power) / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(x <= mid, y_low, y_high)
    return jnp.clip(dmin + y * (dmax - dmin), _MINVAL, 1.0 - _MINVAL)


def _kb(sr, si):
    dmax = si[..., 1, :]
    timeconst, dampratio = sr[..., 0, :], sr[..., 1, :]
    std = timeconst > 0
    b = jnp.where(std, 2.0 / jnp.maximum(dmax * timeconst, _MINVAL), -dampratio)
    k = jnp.where(
        std,
        1.0 / jnp.maximum(
            dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL
        ),
        -timeconst,
    )
    return k, b


def _efc_kbid(sr, si, pos, diag_approx):
    imp = _impedance(si, pos)
    k, b = _kb(sr, si)
    R = jnp.maximum((1.0 - imp) / imp * diag_approx, _MINVAL)
    return imp, k, b, 1.0 / R


def sel_rows(arr, sel, S):
    """Select rows of env-last arr (S, ..., E) per env: sel (K, E) int32.

    Implemented as a fused one-hot contraction over S (TPU gathers with
    per-lane indices are slow; the one-hot never materializes — XLA fuses
    the compare into the reduction loop)."""
    K = sel.shape[0]
    oh = (sel[:, None, :] == jnp.arange(S, dtype=sel.dtype)[None, :, None])
    ohf = oh.astype(arr.dtype)
    if arr.ndim == 2:  # (S, E)
        return jnp.einsum("kse,se->ke", ohf, arr)
    if arr.ndim == 3:  # (S, F, E)
        if arr.shape[-1] == 1:
            return jnp.einsum("kse,sf->kfe", ohf, arr[..., 0])
        return jnp.einsum("kse,sfe->kfe", ohf, arr)
    raise ValueError(arr.shape)


def sel_static(table, sel):
    """Select from a STATIC numpy table (S,) or (S, F) with sel (K, E)."""
    t = jnp.asarray(table)
    return t[sel] if t.ndim == 1 else t[sel]  # XLA constant-gather


def make_constraint_lm(m: Model, P: Params, k: dict, q, qvel, dtype,
                       assemble_j: bool = True):
    """Env-last constraint row assembly.

    assemble_j=False (pyramidal cone only) skips materializing the dense
    contact Jacobian block (jacd/rowsJ: ~140 MB of HBM round trips per
    substep at 4096 envs — half the r3 trace's constraint cost) and
    instead stores the compact per-slot tensors the fused Pallas
    assemble+solve kernel (phys/solver_pallas2.py) rebuilds J from in
    VMEM: con_W1/W2 (ancestor dof masks), con_O1/O2 (root COMs),
    con_mu_dirs, con_on (row activity), con_Dc/con_bb/con_kimp (row
    stiffness and aref coefficients). The contact slices of efc_D/aref
    are left zero in this mode — the kernel owns them."""
    nv = m.nv
    neq = m.neq_jnt
    nlimit = m.nlimit
    E = P.E
    zero = jnp.zeros((E,), dtype)

    D_b, aref_b, fl_b = [], [], []
    pos_b, margin_b, act_b = [], [], []

    # ---- joint equality rows ----
    Jeq = jnp.zeros((neq, nv, E), dtype)
    if neq:
        rows_D, rows_aref, rows_pos = [], [], []
        Jeq_list = []
        for e in range(neq):
            q1adr = int(m.eq_j1_qadr[e])
            j2 = int(m.eq_j2_qadr[e])
            d1 = int(m.eq_j1_dofadr[e])
            pc = [P.plane("eq_polycoef", e, i) for i in range(5)]
            q10 = P.plane("eq_q0_1", e)
            q1v = q[q1adr] - q10
            if j2 >= 0:
                d2 = int(m.eq_j2_dofadr[e])
                q20 = P.plane("eq_q0_2", e)
                q2v = q[j2] - q20
                poly = pc[0] + q2v * (pc[1] + q2v * (pc[2] + q2v * (pc[3] + q2v * pc[4])))
                dpoly = pc[1] + q2v * (2 * pc[2] + q2v * (3 * pc[3] + 4 * pc[4] * q2v))
                pos_eq = q1v - poly
                vel = qvel[d1] - dpoly * qvel[d2]
                iw = P.plane("dof_invweight0", d1) + P.plane("dof_invweight0", d2)
            else:
                pos_eq = q1v - pc[0]
                dpoly = None
                vel = qvel[d1]
                iw = P.plane("dof_invweight0", d1)
            sr = jnp.stack([P.plane("eq_solref", e, i) for i in range(2)], -2)
            si = jnp.stack([P.plane("eq_solimp", e, i) for i in range(5)], -2)
            imp, kk, bb, De = _efc_kbid(sr, si, pos_eq, iw)
            rows_D.append(jnp.broadcast_to(De, (E,)))
            rows_aref.append(jnp.broadcast_to(-bb * vel - kk * imp * pos_eq, (E,)))
            rows_pos.append(jnp.broadcast_to(pos_eq, (E,)))
            row = jnp.zeros((nv, E), dtype)
            row = row.at[d1].set(1.0)
            if j2 >= 0:
                row = row.at[int(m.eq_j2_dofadr[e])].add(
                    jnp.broadcast_to(-dpoly, (E,))
                )
            Jeq_list.append(row)
        Jeq = jnp.stack(Jeq_list)
        D_b.append(jnp.stack(rows_D))
        aref_b.append(jnp.stack(rows_aref))
        fl_b.append(jnp.zeros((neq, E), dtype))
        pos_b.append(jnp.stack(rows_pos))
        margin_b.append(jnp.zeros((neq, E), dtype))
        act_b.append(jnp.ones((neq, E), bool))

    # ---- dof friction rows ----
    sr_dof = P("dof_solref")  # (nv, 2, Eb)
    si_dof = P("dof_solimp")
    iw_dof = P("dof_invweight0")  # (nv, Eb)
    imp, kk, bb, Df = _efc_kbid(
        sr_dof, si_dof, jnp.zeros((nv, 1), dtype), iw_dof
    )
    qvel_s = jnp.stack(qvel) if nv else jnp.zeros((0, E), dtype)
    fl_dof = jnp.broadcast_to(P("dof_frictionloss"), (nv, E)).astype(dtype)
    # D/aref are NOT masked by frictionloss (the clip to +-fl already
    # zeroes forces at fl == 0) — matches phys/constraint.py exactly so
    # the hybrid step's Newton iterates are identical to the vmapped ones
    D_b.append(jnp.broadcast_to(Df, (nv, E)))
    aref_b.append(jnp.broadcast_to(-bb, (nv, E)) * qvel_s)
    fl_b.append(fl_dof)
    pos_b.append(jnp.zeros((nv, E), dtype))
    margin_b.append(jnp.zeros((nv, E), dtype))
    act_b.append(fl_dof > 0)

    # ---- joint limit rows ----
    lim_side = jnp.zeros((nlimit, E), dtype)
    if nlimit:
        jids = m.limit_jntid
        ok = np.isin(m.jnt_type[jids], (JNT_HINGE, JNT_SLIDE))
        qadr = m.jnt_qposadr[jids]
        vadr = m.jnt_dofadr[jids]
        qsel = jnp.stack([q[int(a)] for a in qadr])  # (nlimit, E)
        vsel = jnp.stack([qvel[int(a)] for a in vadr])
        rng = P("jnt_range")[jids]  # (nlimit, 2, Eb)
        lo, hi = rng[:, 0], rng[:, 1]
        dist_lo = qsel - lo
        dist_hi = hi - qsel
        lower = dist_lo < dist_hi
        dist = jnp.minimum(dist_lo, dist_hi)
        side = jnp.where(lower, 1.0, -1.0).astype(dtype)
        margin = P("jnt_margin")[jids]  # (nlimit, Eb)
        pos = dist - margin
        iw_lim = P("dof_invweight0")[vadr]
        imp, kk, bb, Dl = _efc_kbid(P("jnt_solref")[jids], P("jnt_solimp")[jids], pos, iw_lim)
        act_lim = (dist < margin) & jnp.asarray(ok)[:, None]
        lim_side = jnp.where(act_lim, side, 0.0)
        vel = side * vsel
        D_b.append(jnp.where(act_lim, Dl, 0.0))
        aref_b.append(jnp.where(act_lim, -bb * vel - kk * imp * pos, 0.0))
        fl_b.append(jnp.zeros((nlimit, E), dtype))
        pos_b.append(jnp.broadcast_to(dist, (nlimit, E)))
        margin_b.append(jnp.broadcast_to(margin, (nlimit, E)).astype(dtype))
        act_b.append(act_lim)

    # ---- contact rows (top-K compaction) ----
    pt = m.pairs
    K = m.ncon_max
    R = m.rows_per_con
    KR = K * R
    S = pt.ncon
    Jc = jnp.zeros((KR, nv, E), dtype)
    out = {}
    if S and K:
        f5, sr_s, si_s, inclm = slot_params(m, P, dtype)  # (S, *, Eb), (S, Eb)
        dist = k["con_dist"]  # (S, E)
        score = dist - inclm
        neg, selT = jax.lax.top_k(-(score.T), K)  # (E, K)
        sel = selT.T.astype(jnp.int32)  # (K, E)
        sel_active = (-neg.T) < 0.0  # (K, E)

        # compact env-dependent slot data (one fused one-hot contraction)
        feat = jnp.concatenate(
            [dist[:, None, :], k["con_pos"], k["con_frame"]], axis=1
        )  # (S, 13, E)
        featk = sel_rows(feat, sel, S)  # (K, 13, E)
        dist_k = featk[:, 0]
        pos_k = featk[:, 1:4]  # (K, 3, E)
        frame_k = featk[:, 4:13]  # (K, 9, E) rows [n, t1, t2]

        # slot parameter tables (per-field Eb may be 1 or E under partial
        # DR).
        if max(f5.shape[-1], sr_s.shape[-1], si_s.shape[-1], inclm.shape[-1]) == 1:
            ptab = jnp.concatenate(
                [f5[..., 0], sr_s[..., 0], si_s[..., 0], inclm], axis=1
            )  # (S, 13) static
            pk = sel_rows(ptab[:, :, None], sel, S)  # (K, 13, E)
        else:
            def bE(x, w):
                return jnp.broadcast_to(x, (S, w, E))

            ptab = jnp.concatenate(
                [bE(f5, 5), bE(sr_s, 2), bE(si_s, 5), bE(inclm[:, None, :], 1)],
                axis=1,
            )
            pk = sel_rows(ptab, sel, S)
        mu_k = pk[:, 0:5]  # (K, 5, E)
        solref_k = pk[:, 5:7]
        solimp_k = pk[:, 7:12]
        margin_k = pk[:, 12]

        # Static per-slot ids (body1/body2/root/condim): contract the sel
        # one-hot against STATIC indicator tables. Products and partial
        # sums stay in {0, 1} (condim: small exact ints), so the result is
        # exact under ANY matmul precision — float-coding the ids through
        # the value contraction above would silently round for nbody > 256
        # if XLA lowers the einsum to a bf16 MXU pass (advisor r2 finding).
        nb = m.nbody
        b1_np = m.geom_bodyid[pt.con_geom1]
        b2_np = m.geom_bodyid[pt.con_geom2]
        root_np = m.body_rootid
        ohf = (
            sel[:, None, :] == jnp.arange(S, dtype=sel.dtype)[None, :, None]
        ).astype(dtype)  # (K, S, E)
        ohb1 = jnp.einsum("kse,sb->kbe", ohf, jnp.asarray(np.eye(nb)[b1_np], dtype))
        ohb2 = jnp.einsum("kse,sb->kbe", ohf, jnp.asarray(np.eye(nb)[b2_np], dtype))
        dim_k = jnp.einsum(
            "kse,s->ke", ohf, jnp.asarray(pt.con_dim, dtype)
        )  # (K, E) condim in {1,3,4,6}: exact at any precision
        W = jnp.asarray(ancestor_dof_mask(m), dtype)  # (nbody, nv)
        # kernel mode stores the fused-solver layouts DIRECTLY (dof/
        # component major) so the launcher's moveaxis copies disappear —
        # the transpose fuses into the producing einsum's output layout
        kernel_mode = not assemble_j
        wspec = "kbe,bv->vke" if kernel_mode else "kbe,bv->kve"
        W1 = jnp.einsum(wspec, ohb1, W)  # (K, nv, E) / (nv, K, E)
        W2 = jnp.einsum(wspec, ohb2, W)
        ohr1 = jnp.einsum(
            "kse,sr->kre", ohf,
            jnp.asarray(np.eye(nb)[root_np[b1_np]], dtype),
        )
        ohr2 = jnp.einsum(
            "kse,sr->kre", ohf,
            jnp.asarray(np.eye(nb)[root_np[b2_np]], dtype),
        )
        subtree = jnp.stack(
            [jnp.stack(c) for c in
             [[k["subtree_com"][b][i] for b in range(nb)] for i in range(3)]],
        )  # (3, nbody, E)
        subtree = jnp.moveaxis(subtree, 0, 1)  # (nbody, 3, E)
        subtree = jnp.broadcast_to(subtree, (nb, 3, E))
        ospec = "kre,rxe->xke" if kernel_mode else "kre,rxe->kxe"
        O1 = jnp.einsum(ospec, ohr1, subtree)  # (K, 3, E) / (3, K, E)
        O2 = jnp.einsum(ospec, ohr2, subtree)

        iw_body = P("body_invweight0")[..., 0, :]  # (nbody, Eb)
        if iw_body.shape[-1] == 1:
            iw_slot1 = jnp.einsum("kbe,b->ke", ohb1, iw_body[:, 0])
            iw_slot2 = jnp.einsum("kbe,b->ke", ohb2, iw_body[:, 0])
        else:
            iw_slot1 = jnp.einsum("kbe,be->ke", ohb1, iw_body)
            iw_slot2 = jnp.einsum("kbe,be->ke", ohb2, iw_body)
        invweight_t = iw_slot1 + iw_slot2  # (K, E)

        elliptic = int(m.opt.cone) != 0
        if assemble_j:
            # point Jacobians
            cd = k["cdof"]  # list of 6-plane tuples
            cd_ang = jnp.stack([jnp.stack(c[:3]) for c in cd])  # (nv, 3, E)
            cd_lin = jnp.stack([jnp.stack(c[3:]) for c in cd])
            cd_ang = jnp.broadcast_to(cd_ang, (nv, 3, E))
            cd_lin = jnp.broadcast_to(cd_lin, (nv, 3, E))

            def point_jac(Wr, Ob):
                r = pos_k - Ob  # (K, 3, E)
                # cross(cd_ang, r): (K, nv, 3, E)
                a = cd_ang[None]
                rx = r[:, None]
                cx = jnp.stack(
                    [
                        a[:, :, 1] * rx[:, :, 2] - a[:, :, 2] * rx[:, :, 1],
                        a[:, :, 2] * rx[:, :, 0] - a[:, :, 0] * rx[:, :, 2],
                        a[:, :, 0] * rx[:, :, 1] - a[:, :, 1] * rx[:, :, 0],
                    ],
                    axis=2,
                )
                return (cd_lin[None] + cx) * Wr[:, :, None]

            jacd = point_jac(W2, O2) - point_jac(W1, O1)  # (K, nv, 3, E)
            fr = frame_k.reshape(K, 3, 3, E)
            Jc3 = jnp.einsum("kfxe,kvxe->kfve", fr, jacd)  # (K, 3, nv, E)

        ndirs = (R - 1) if elliptic else R // 2
        frictionless = dim_k == 1
        dir_need = np.array([3, 3, 4, 6, 6], np.float32)[:ndirs]
        mu_dirs = jnp.where(
            (dim_k[:, None] >= jnp.asarray(dir_need)[None, :, None])
            & ~frictionless[:, None],
            mu_k[:, :ndirs],
            0.0,
        )  # (K, ndirs, E)

        if assemble_j:
            Jn, Jt1, Jt2 = Jc3[:, 0], Jc3[:, 1], Jc3[:, 2]
            dirJ = [Jt1, Jt2]
            if ndirs > 2:
                jaca = cd_ang[None] * (W2 - W1)[:, :, None]  # (K, nv, 3, E)
                Ja = jnp.einsum("kfxe,kvxe->kfve", fr, jaca)
                dirJ += [Ja[:, 0], Ja[:, 1], Ja[:, 2]][: ndirs - 2]

        pos_c = dist_k - margin_k  # (K, E)
        qv = jnp.stack(qvel)  # (nv, E)
        if elliptic:
            # elliptic rows [normal, t1, t2, torsion, roll1, roll2][:R]
            # (mirrors phys/constraint.py:339-367, env-last):
            #   D_i = D_n * impratio * (mu_i / mu_0)^2    (friction rows)
            #   aref_n = -b vel_n - k imp pos; aref_i = -b vel_i
            #   efc_pos/margin zero on friction rows
            row_on = (
                jnp.arange(R, dtype=dtype)[None, :, None]
                < jnp.minimum(dim_k, float(R))[:, None, :]
            )
            imp, kk, bb, Dn = _efc_kbid(solref_k, solimp_k, pos_c, invweight_t)
            mu0 = jnp.maximum(mu_dirs[:, 0], 1e-10)
            ratio2 = jnp.square(mu_dirs / mu0[:, None])  # (K, ndirs, E)
            zR1 = jnp.zeros((K, R - 1, E), dtype)
            pos_rows = jnp.concatenate([dist_k[:, None], zR1], axis=1)
            margin_rows = jnp.concatenate(
                [jnp.broadcast_to(margin_k, (K, E))[:, None], zR1], axis=1
            )
            if assemble_j:
                rows_list = [Jn] + [dirJ[i] for i in range(ndirs)]
                rowsJ = jnp.stack(rows_list, axis=1)  # (K, R, nv, E)
                D_rows = jnp.concatenate(
                    [Dn[:, None], Dn[:, None] * m.opt.impratio * ratio2],
                    axis=1,
                )  # (K, R, E)
                vel = jnp.einsum("krve,ve->kre", rowsJ, qv)
                aref_c = -bb[:, None] * vel
                aref_c = aref_c.at[:, 0].add(-kk * imp * pos_c)
        else:
            row_count = jnp.where(
                frictionless, 4.0, 2.0 * (jnp.maximum(dim_k, 3.0) - 1.0)
            )
            row_on = (
                jnp.arange(R, dtype=dtype)[None, :, None]
                < row_count[:, None, :]
            )  # (K, R, E) bool

            mu1 = mu_dirs[:, 0]
            diag_pyr = (
                2.0 * mu1 * mu1 * (1.0 + mu1 * mu1) * invweight_t
                / m.opt.impratio
            )
            diag_approx = jnp.where(frictionless, invweight_t * 4.0, diag_pyr)

            imp, kk, bb, Dc = _efc_kbid(solref_k, solimp_k, pos_c, diag_approx)
            pos_rows = jnp.broadcast_to(dist_k[:, None], (K, R, E))
            margin_rows = jnp.broadcast_to(margin_k[:, None], (K, R, E))
            if assemble_j:
                rows_list = []
                for i in range(ndirs):
                    rows_list.append(Jn + mu_dirs[:, i, None] * dirJ[i])
                    rows_list.append(Jn - mu_dirs[:, i, None] * dirJ[i])
                rowsJ = jnp.stack(rows_list, axis=1)  # (K, R, nv, E)
                vel = jnp.einsum("krve,ve->kre", rowsJ, qv)  # (K, R, E)
                aref_c = -bb[:, None] * vel - (kk * imp * pos_c)[:, None]
                D_rows = jnp.broadcast_to(Dc[:, None], (K, R, E))

        if not assemble_j:
            # kernel mode: compact tensors for the fused assemble+solve
            # kernel; efc contact slices stay zero (the kernel owns them).
            # con_on is emitted r-major (row r of every slot contiguous,
            # the kernel's row layout) straight from the broadcasted
            # comparison — no materialized transpose
            on_rm = (
                sel_active[None] & jnp.moveaxis(row_on, 0, 1)
            ).reshape(R * K, E)
            # canonical k-major activity for the efc_active rows
            on = (sel_active[:, None] & row_on).reshape(KR, E)
            if elliptic:
                # elliptic kernel extras: per-friction-row D (dir-major,
                # the cm() layout) and the whitened cone coefficient
                # mu~ = mu_slide / sqrt(impratio) (lm/solver._ell_scaled_lm)
                Dck = jnp.where(sel_active, Dn, 0.0)
                Dfri = Dck[:, None] * m.opt.impratio * ratio2  # (K,nd,E)
                mut = mu_k[:, 0] / jnp.sqrt(
                    jnp.maximum(m.opt.impratio, 1e-12)
                )
                out.update(
                    con_Dfri=Dfri, con_mut=jnp.where(sel_active, mut, 0.0),
                    con_Dc=Dck,
                    con_bb=bb, con_kimp=kk * imp * pos_c,
                )
            else:
                out.update(
                    con_mu_dirs=mu_dirs,
                    con_Dc=jnp.where(sel_active, Dc, 0.0),
                    con_bb=bb, con_kimp=kk * imp * pos_c,
                )
            out.update(
                con_W1=W1, con_W2=W2, con_O1=O1, con_O2=O2, con_on=on_rm,
            )
            zKR = jnp.zeros((KR, E), dtype)
            D_b.append(zKR)
            aref_b.append(zKR)
            fl_b.append(zKR)
            pos_b.append(pos_rows.reshape(KR, E))
            margin_b.append(margin_rows.reshape(KR, E))
            act_b.append(on)
        else:
            on = (sel_active[:, None] & row_on).reshape(KR, E)
            Jc = jnp.where(on[:, None, :], rowsJ.reshape(KR, nv, E), 0.0)
            D_b.append(jnp.where(on, D_rows.reshape(KR, E), 0.0))
            aref_b.append(jnp.where(on, aref_c.reshape(KR, E), 0.0))
            fl_b.append(jnp.zeros((KR, E), dtype))
            pos_b.append(pos_rows.reshape(KR, E))
            margin_b.append(margin_rows.reshape(KR, E))
            act_b.append(on)

        out.update(
            con_sel=sel, con_sel_active=sel_active,
            con_dist_k=dist_k, con_pos_k=pos_k, con_frame_k=frame_k,
            con_mu_k=mu_k, con_dim_k=dim_k,
            con_solref_k=solref_k, con_solimp_k=solimp_k,
            con_margin_k=margin_k,
        )
    elif KR:
        D_b.append(jnp.zeros((KR, E), dtype))
        aref_b.append(jnp.zeros((KR, E), dtype))
        fl_b.append(jnp.zeros((KR, E), dtype))
        pos_b.append(jnp.zeros((KR, E), dtype))
        margin_b.append(jnp.zeros((KR, E), dtype))
        act_b.append(jnp.zeros((KR, E), bool))

    D = jnp.concatenate(D_b, axis=0) if D_b else jnp.zeros((0, E), dtype)
    aref = jnp.concatenate(aref_b, axis=0) if aref_b else jnp.zeros((0, E), dtype)
    fl = jnp.concatenate(fl_b, axis=0) if fl_b else jnp.zeros((0, E), dtype)
    pos_r = jnp.concatenate(pos_b, axis=0) if pos_b else jnp.zeros((0, E), dtype)
    margin_r = (
        jnp.concatenate(margin_b, axis=0) if margin_b else jnp.zeros((0, E), dtype)
    )
    act = jnp.concatenate(act_b, axis=0) if act_b else jnp.zeros((0, E), bool)

    k.update(efc_D=D, efc_aref=aref, efc_fl=fl, efc_Jeq=Jeq,
             efc_lim_side=lim_side, efc_Jc=Jc,
             efc_pos=pos_r, efc_margin=margin_r, efc_active=act, **out)
    return k
