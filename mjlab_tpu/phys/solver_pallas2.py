"""Fused Pallas TPU kernel: contact-Jacobian ASSEMBLY + Newton solve.

Round-3 trace (PERF_NOTES.md): at 4096 envs the env-last constraint
assembly (lm/constraint.py) cost 8.0 ms/substep — more than the Newton
solve itself (3.2 ms) — almost all of it materializing the (K, nv, 3, E)
point-Jacobian and (K, R, nv, E) pyramid rows through HBM plus ~15
under-fused XLA ops around them. This kernel rebuilds the contact block
IN VMEM from the compact per-slot tensors (positions, frames, ancestor
dof masks, friction dirs) and runs the entire Newton solve on it:

    per 128-env block (f32):
      W1, W2     (K, nv, 128)   1.25 MB   ancestor dof masks
      geo        (K, ~21, 128)  0.4  MB   pos/frame/O1/O2/mu/D/bb/kimp
      Mc         (nv*nv, 128)   0.63 MB   mass matrix, column-major
      J scratch  (nv, RK+neq, 128) 2.6 MB rebuilt rows (r-major)
      H, L       (nv*nv, 128)   1.25 MB   Newton scratch

Row layout inside the kernel: [equality, dof-friction, joint limits,
contacts r-major]. Contacts are r-major (row r of every slot contiguous)
so the per-direction row writes are contiguous VMEM stores; the launcher
reorders the contact force block back to the Data k-major convention.

The friction/limit rows never materialize as dense J rows: friction is
the identity block (diag adds), limit rows are one signed entry at a
static dof address (unrolled scatter) — so the Hessian/matvec reductions
run over RK+neq rows instead of nefc (204 -> 146 on G1).

Numerics match phys/lm/solver.solve_lm (same Newton, same safeguarded
bisection line search); parity gated by tests/test_pallas2_solver.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12
LANES = 128


def _make_kernel(nv, K, R, ndirs, neq, nlim, lim_dofs, iterations,
                 ls_iterations, tolerance, do_int, cone=0):
    RK = R * K
    ND = RK + neq  # dense rows (contacts r-major, then equality)
    NC = neq + nv + nlim  # non-contact rows in canonical efc order
    elliptic = cone != 0

    def kernel(Mc_ref, qfs_ref, ws_ref, qvel_ref, Mh_ref,
               Dnc_ref, arefnc_ref, flnc_ref, side_ref, Jeq_ref,
               cdof_ref, posk_ref, O1_ref, O2_ref, frame_ref, mu_ref,
               mut_ref, Dc_ref, bb_ref, kimp_ref, on_ref, W1_ref, W2_ref,
               x_out, fnc_out, fcon_out, qfrc_out, asm_out, qint_out,
               H_scr):
        # ---------- phase A: rebuild dense rows as VALUES ----------
        # contact rows r-major: Jv[i][r*K:(r+1)*K], then neq eq rows.
        # The dense block lives as compiler-managed VALUES (Jv list and
        # the stacked Jall), NOT a scratch ref: every consumer then uses
        # value slicing/reduction, which Mosaic lowers as plain vector
        # ops — strided 3D-ref reads (J_scr[:, a:b, :] row chunks,
        # middle-slice row reads) lower to an unsupported gather.
        on = on_ref[:]                     # (RK, 128) activity mask
        Jv = [None] * nv
        for i in range(nv):
            w1 = W1_ref[i * K:(i + 1) * K, :]  # (K, 128)
            w2 = W2_ref[i * K:(i + 1) * K, :]
            # jac_side_c = (cd_lin + cd_ang x (pos - O))_c * W
            jd = []
            for c in range(3):
                c1, c2 = (c + 1) % 3, (c + 2) % 3
                a1 = cdof_ref[i * 6 + c1:i * 6 + c1 + 1, :]  # (1, 128)
                a2 = cdof_ref[i * 6 + c2:i * 6 + c2 + 1, :]
                lin = cdof_ref[i * 6 + 3 + c:i * 6 + 4 + c, :]
                r2_1 = posk_ref[c1 * K:(c1 + 1) * K, :] - O2_ref[c1 * K:(c1 + 1) * K, :]
                r2_2 = posk_ref[c2 * K:(c2 + 1) * K, :] - O2_ref[c2 * K:(c2 + 1) * K, :]
                r1_1 = posk_ref[c1 * K:(c1 + 1) * K, :] - O1_ref[c1 * K:(c1 + 1) * K, :]
                r1_2 = posk_ref[c2 * K:(c2 + 1) * K, :] - O1_ref[c2 * K:(c2 + 1) * K, :]
                j2 = lin + a1 * r2_2 - a2 * r2_1
                j1 = lin + a1 * r1_2 - a2 * r1_1
                jd.append(j2 * w2 - j1 * w1)  # (K, 128)
            # rotate into the contact frame: rows [n, t1, t2]
            f3 = []
            for f in range(3):
                acc = frame_ref[(f * 3 + 0) * K:(f * 3 + 1) * K, :] * jd[0]
                acc += frame_ref[(f * 3 + 1) * K:(f * 3 + 2) * K, :] * jd[1]
                acc += frame_ref[(f * 3 + 2) * K:(f * 3 + 3) * K, :] * jd[2]
                f3.append(acc)
            if elliptic:
                # rows [normal, t1, t2, torsion, roll1, roll2][:R] — the
                # friction rows are the raw frame-rotated point/angular
                # jacobian rows (lm/constraint.py elliptic rowsJ)
                rows = [f3[0], f3[1], f3[2]][: 1 + min(ndirs, 2)]
                if ndirs > 2:
                    ja = [
                        cdof_ref[i * 6 + c:i * 6 + c + 1, :] * (w2 - w1)
                        for c in range(3)
                    ]
                    for f in range(ndirs - 2):
                        acc = frame_ref[(f * 3 + 0) * K:(f * 3 + 1) * K, :] * ja[0]
                        acc += frame_ref[(f * 3 + 1) * K:(f * 3 + 2) * K, :] * ja[1]
                        acc += frame_ref[(f * 3 + 2) * K:(f * 3 + 3) * K, :] * ja[2]
                        rows.append(acc)
                pieces = [
                    on[r * K:(r + 1) * K, :] * rows[r] for r in range(R)
                ]
            else:
                pieces = [None] * R
                for j in range(ndirs):
                    mu_j = mu_ref[j * K:(j + 1) * K, :]
                    rp = 2 * j
                    rm = 2 * j + 1
                    pieces[rp] = (
                        on[rp * K:(rp + 1) * K, :] * (f3[0] + mu_j * f3[1 + j])
                    )
                    pieces[rm] = (
                        on[rm * K:(rm + 1) * K, :] * (f3[0] - mu_j * f3[1 + j])
                    )
            for e in range(neq):
                pieces.append(Jeq_ref[e * nv + i:e * nv + i + 1, :])
            Jv[i] = jnp.concatenate(pieces, axis=0)  # (ND, 128)
        Jall = jnp.stack(Jv, axis=0)  # (nv, ND, 128) value

        # dense-row D: pyramidal contacts share the slot Dc; elliptic
        # friction rows carry Dn*impratio*(mu_i/mu_0)^2 (mu_ref = Dfri);
        # equality uses Dnc[0:neq]
        Dc = Dc_ref[:]  # (K, 128), inactive slots pre-zeroed
        dparts = []
        for r in range(R):
            if elliptic and r > 0:
                Dr = mu_ref[(r - 1) * K:r * K, :]
            else:
                Dr = Dc
            dparts.append(on[r * K:(r + 1) * K, :] * Dr)
        if neq:
            dparts.append(Dnc_ref[0:neq, :])
        Dd = jnp.concatenate(dparts, axis=0)  # (ND, 128)

        # contact aref = -bb * (J qvel) [- kimp on the position rows:
        # all R pyramid rows, only the normal row for elliptic]
        qv = qvel_ref[:]  # (nv, 128)
        velc = jnp.sum(Jall[:, 0:RK, :] * qv[:, None, :], axis=0)
        bb = bb_ref[:]
        kimp = kimp_ref[:]
        aparts = []
        for r in range(R):
            sl = slice(r * K, (r + 1) * K)
            a = -bb * velc[sl, :]
            if not (elliptic and r > 0):
                a = a - kimp
            aparts.append(on[sl, :] * a)
        if neq:
            aparts.append(arefnc_ref[0:neq, :])
        arefd = jnp.concatenate(aparts, axis=0)  # (ND, 128)

        # ---------- phase B: Newton solve ----------
        D_fr = Dnc_ref[neq:neq + nv, :]
        aref_fr = arefnc_ref[neq:neq + nv, :]
        fl_fr = flnc_ref[neq:neq + nv, :]
        D_lim = Dnc_ref[neq + nv:NC, :]
        aref_lim = arefnc_ref[neq + nv:NC, :]
        side = side_ref[:]  # (nlim, 128) signed, 0 when inactive

        # limit rows nearly always cover a contiguous dof range (every
        # actuated hinge/slide): slice instead of per-row gather/scatter
        lim_contig = nlim > 0 and lim_dofs == tuple(
            range(lim_dofs[0], lim_dofs[0] + nlim)
        )
        lim_lo = lim_dofs[0] if nlim else 0

        def Mv(vec):
            acc = Mc_ref[0:nv, :] * vec[0:1, :]
            for j in range(1, nv):
                acc += Mc_ref[j * nv:(j + 1) * nv, :] * vec[j:j + 1, :]
            return acc

        def Jd_mul(vec):  # dense rows: (nv,128) -> (ND,128)
            return jnp.sum(Jall * vec[:, None, :], axis=0)

        def lim_mul(vec):  # (nv,128) -> (nlim,128)
            if nlim == 0:
                return jnp.zeros((0, LANES), jnp.float32)
            if lim_contig:
                return side * vec[lim_lo:lim_lo + nlim, :]
            return side * jnp.concatenate(
                [vec[a:a + 1, :] for a in lim_dofs], axis=0
            )

        def lim_scatter(f_lim):  # (nlim,128) -> (nv,128) at lim_dofs
            sf = side * f_lim
            if lim_contig:
                pads = []
                if lim_lo:
                    pads.append(jnp.zeros((lim_lo, LANES), jnp.float32))
                pads.append(sf)
                tail = nv - lim_lo - nlim
                if tail:
                    pads.append(jnp.zeros((tail, LANES), jnp.float32))
                return jnp.concatenate(pads, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (nv, LANES), 0)
            out = jnp.zeros((nv, LANES), jnp.float32)
            for li, a in enumerate(lim_dofs):
                out = jnp.where(rows == a, out + sf[li:li + 1, :], out)
            return out

        def JT_all(f_fr, f_lim, f_d):  # -> (nv,128)
            out = f_fr + jnp.sum(Jall * f_d[None, :, :], axis=1)
            if nlim:
                out = out + lim_scatter(f_lim)
            return out

        _EPSQ = _EPS * _EPS
        if elliptic:
            mut = mut_ref[:]            # (K, 128) whitened cone mu
            mu_pos = mut > 1e-9
            c1 = 1.0 + mut * mut

            def csl(x, r):
                return x[r * K:(r + 1) * K, :]

            def ell_z(jar_d):
                """3-zone cone state from the contact slice of the dense
                jar (r-major). Mirrors lm/solver._ell_scaled_lm."""
                sD = [jnp.sqrt(csl(Dd, r)) for r in range(R)]
                x = [csl(jar_d, r) * sD[r] for r in range(R)]
                xn = x[0]
                tt = x[1] * x[1]
                for r in range(2, R):
                    tt = tt + x[r] * x[r]
                T = jnp.sqrt(jnp.maximum(tt, _EPSQ))
                w = mut * xn + T
                # select_n over i1 vectors is unsupported by Mosaic:
                # express the zone masks with boolean algebra instead
                bottom = (mu_pos & (w <= 0)) | ((~mu_pos) & (xn < 0))
                top = (~bottom) & (
                    (mu_pos & (xn >= mut * T)) | ((~mu_pos) & (xn >= 0))
                )
                mid = (~bottom) & (~top)
                return dict(sD=sD, x=x, xn=xn, tt=tt, T=T, w=w,
                            bottom=bottom, mid=mid)

            def ell_force(z, jar_d):
                """(RK, 128) contact force rows (r-major), -grad s."""
                rows = []
                for r in range(R):
                    fq = -csl(Dd, r) * csl(jar_d, r)
                    if r == 0:
                        fm = z["sD"][0] * (mut * z["w"] / c1 - z["xn"])
                    else:
                        fm = -z["sD"][r] * z["x"][r] * (
                            1.0 - z["w"] / (c1 * z["T"])
                        )
                    rows.append(
                        jnp.where(z["bottom"], fq,
                                  jnp.where(z["mid"], fm, 0.0))
                    )
                return jnp.concatenate(rows, axis=0)

        def forces(jar_fr, jar_lim, jar_d):
            # friction rows: Huber clip
            fq_fr = -D_fr * jar_fr
            f_fr = jnp.clip(fq_fr, -fl_fr, fl_fr)
            q_fr = ((jnp.abs(fq_fr) <= fl_fr) & (D_fr > 0)).astype(jnp.float32)
            # limit rows: one-sided
            fq_l = -D_lim * jar_lim
            f_lim = jnp.where(jar_lim < 0, fq_l, 0.0)
            q_lim = ((jar_lim < 0) & (D_lim > 0)).astype(jnp.float32)
            if elliptic:
                # dense rows: 3-zone cone contacts + bilateral equality
                z = ell_z(jar_d)
                f_con = ell_force(z, jar_d)
                if neq:
                    f_eq = -Dd[RK:ND, :] * jar_d[RK:ND, :]
                    f_d = jnp.concatenate([f_con, f_eq], axis=0)
                else:
                    f_d = f_con
                return f_fr, f_lim, f_d, q_fr, q_lim, None, z
            # dense rows: contacts one-sided, equality bilateral
            fq_d = -Dd * jar_d
            f_d = jnp.where(jar_d < 0, fq_d, 0.0)
            q_d = ((jar_d < 0) & (Dd > 0)).astype(jnp.float32)
            if neq:
                iseq = (
                    jax.lax.broadcasted_iota(jnp.int32, (ND, LANES), 0) >= RK
                )
                f_d = jnp.where(iseq, fq_d, f_d)
                q_d = jnp.where(iseq & (Dd > 0), 1.0, q_d)
            return f_fr, f_lim, f_d, q_fr, q_lim, q_d, None

        def cost_rows(jar_fr, jar_lim, jar_d):
            qc_fr = 0.5 * D_fr * jar_fr * jar_fr
            lin = fl_fr * jnp.abs(jar_fr) - 0.5 * fl_fr * fl_fr / jnp.maximum(D_fr, _EPS)
            c_fr = jnp.where(jnp.abs(D_fr * jar_fr) <= fl_fr, qc_fr, lin)
            c_lim = jnp.where(jar_lim < 0, 0.5 * D_lim * jar_lim * jar_lim, 0.0)
            if elliptic:
                z = ell_z(jar_d)
                norm2 = z["xn"] * z["xn"] + z["tt"]
                s_mid = 0.5 * (norm2 - z["w"] * z["w"] / c1)
                per = jnp.where(
                    z["bottom"], 0.5 * norm2,
                    jnp.where(z["mid"], s_mid, 0.0),
                )
                c_d = jnp.sum(per, axis=0, keepdims=True)
                if neq:
                    je = jar_d[RK:ND, :]
                    c_d = c_d + jnp.sum(
                        0.5 * Dd[RK:ND, :] * je * je, axis=0, keepdims=True
                    )
                return (
                    jnp.sum(c_fr, axis=0, keepdims=True)
                    + jnp.sum(c_lim, axis=0, keepdims=True)
                    + c_d
                )
            qc_d = 0.5 * Dd * jar_d * jar_d
            c_d = jnp.where(jar_d < 0, qc_d, 0.0)
            if neq:
                iseq = (
                    jax.lax.broadcasted_iota(jnp.int32, (ND, LANES), 0) >= RK
                )
                c_d = jnp.where(iseq, qc_d, c_d)
            return (
                jnp.sum(c_fr, axis=0, keepdims=True)
                + jnp.sum(c_lim, axis=0, keepdims=True)
                + jnp.sum(c_d, axis=0, keepdims=True)
            )

        def jar_of(x):
            return x - aref_fr, lim_mul(x) - aref_lim, Jd_mul(x) - arefd

        def total_cost(x, jars):
            dx = x - a_smooth
            smooth = 0.5 * jnp.sum(dx * Mv(dx), axis=0, keepdims=True)
            return smooth + cost_rows(*jars)

        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (nv, LANES), 0)

        def chol_solve(col, g):
            """Solve A x = g with A SPD given by `col(j)` -> full column j
            as an (nv, 128) tile. Jacobi-equilibrated Cholesky; factor
            columns (zeros above the diagonal) are kept as VALUES so every
            factor/substitution step is a full-column vector op — strided
            3D-ref reads (row reads, multi-dim middle slices) lower to an
            unsupported gather on TPU, so no factor scratch ref is used."""
            cols = [col(j) for j in range(nv)]
            diag = jnp.concatenate(
                [cols[j][j:j + 1, :] for j in range(nv)], axis=0
            )
            scale = jax.lax.rsqrt(jnp.maximum(diag, _EPS))
            g = g * scale
            ridge = 1e-6
            L = [None] * nv
            for j in range(nv):
                s = cols[j] * (scale * scale[j:j + 1, :])
                s = s + jnp.where(rows_iota == j, ridge, 0.0)
                for k in range(j):
                    s = s - L[k] * L[k][j:j + 1, :]
                dcol = jnp.sqrt(jnp.maximum(s[j:j + 1, :], ridge))
                L[j] = jnp.where(rows_iota >= j, s / dcol, 0.0)
            # forward: y = L^-1 g, column-oriented residual updates
            r = g
            ys = [None] * nv
            for j in range(nv):
                yj = r[j:j + 1, :] / L[j][j:j + 1, :]
                r = r - L[j] * yj
                ys[j] = yj
            # backward: x = L^-T y, inner-product form over columns:
            # column k is zero above the diagonal and xacc is zero at
            # rows <= k, so sum(L[k] * xacc) = sum_{k'>k} L[k',k] x[k'].
            y = jnp.concatenate(ys, axis=0)
            xacc = jnp.zeros((nv, LANES), jnp.float32)
            for k in reversed(range(nv)):
                s = jnp.sum(L[k] * xacc, axis=0, keepdims=True)
                xk = (y[k:k + 1, :] - s) / L[k][k:k + 1, :]
                xacc = jnp.where(rows_iota == k, xk, xacc)
            return xacc * scale

        def mc_col(j):
            return Mc_ref[j * nv:(j + 1) * nv, :]

        def h_col(j):
            return H_scr[j, :, :]

        def mh_col(j):
            return Mh_ref[j * nv:(j + 1) * nv, :]

        # unconstrained acceleration: M a_smooth = qfrc_smooth (the XLA
        # path's smooth.solve_m — folded in so crb can skip qLD/qLDinv)
        a_smooth = chol_solve(mc_col, qfs_ref[:])
        asm_out[:] = a_smooth

        x_ws = ws_ref[:]
        jars_ws = jar_of(x_ws)
        jars_sm = jar_of(a_smooth)
        c_ws = total_cost(x_ws, jars_ws)
        c_sm = total_cost(a_smooth, jars_sm)
        take = c_ws < c_sm
        x0 = jnp.where(take, x_ws, a_smooth)
        jar0 = tuple(
            jnp.where(take, a, b) for a, b in zip(jars_ws, jars_sm)
        )
        cost0 = jnp.where(take, c_ws, c_sm)

        def newton_body(carry):
            it, x, jar_fr, jar_lim, jar_d, cost_x, done = carry
            f_fr, f_lim, f_d, q_fr, q_lim, q_d, z_h = forces(
                jar_fr, jar_lim, jar_d
            )
            grad = Mv(x - a_smooth) - JT_all(f_fr, f_lim, f_d)
            Dq_fr = D_fr * q_fr                       # (nv, 128) diag
            Dq_lim = D_lim * q_lim if nlim else None  # (nlim, 128)
            # H diagonal additions (friction + limit rows; Dq_lim is
            # pre-zeroed on inactive rows so no side sign is needed)
            diagv = Dq_fr
            if nlim:
                if lim_contig:
                    parts = []
                    if lim_lo:
                        parts.append(jnp.zeros((lim_lo, LANES), jnp.float32))
                    parts.append(Dq_lim)
                    tail = nv - lim_lo - nlim
                    if tail:
                        parts.append(jnp.zeros((tail, LANES), jnp.float32))
                    diagv = diagv + jnp.concatenate(parts, axis=0)
                else:
                    for li, a in enumerate(lim_dofs):
                        diagv = jnp.where(
                            rows_iota == a, diagv + Dq_lim[li:li + 1, :],
                            diagv,
                        )
            if elliptic:
                # H = M + diag(fr) + limit scatter + Jc^T B Jc + Jeq^T D Jeq
                # with B the per-contact (R, R) cone Hessian blocks
                # (lm/solver._ell_hess_lm), each entry a (K, 128) plane
                that = [None] + [z_h["x"][r] / z_h["T"] for r in range(1, R)]
                gradw = [mut] + that[1:]
                wT = z_h["w"] / z_h["T"]
                B = [[None] * R for _ in range(R)]
                for r in range(R):
                    for s in range(r, R):
                        tr = that[r] if r >= 1 else 0.0
                        ts = that[s] if s >= 1 else 0.0
                        delta = 1.0 if r == s else 0.0
                        pt = 1.0 if (r == s and r >= 1) else 0.0
                        bm = delta - (
                            gradw[r] * gradw[s] + wT * (pt - tr * ts)
                        ) / c1
                        bm = z_h["sD"][r] * bm * z_h["sD"][s]
                        bbot = csl(Dd, r) if r == s else 0.0
                        val = jnp.where(
                            z_h["bottom"], bbot,
                            jnp.where(z_h["mid"], bm, 0.0),
                        )
                        B[r][s] = val
                        B[s][r] = val
                Dq_eq = Dd[RK:ND, :] if neq else None
                for j in range(nv):
                    Jj = [Jv[j][r * K:(r + 1) * K, :] for r in range(R)]
                    BJ = []
                    for r in range(R):
                        acc = B[r][0] * Jj[0]
                        for s in range(1, R):
                            acc = acc + B[r][s] * Jj[s]
                        BJ.append(acc)
                    # column j over all i at once: (nv, K, 128) reductions
                    colH = jnp.sum(
                        Jall[:, 0:K, :] * BJ[0][None, :, :], axis=1
                    )
                    for r in range(1, R):
                        colH = colH + jnp.sum(
                            Jall[:, r * K:(r + 1) * K, :]
                            * BJ[r][None, :, :],
                            axis=1,
                        )
                    if neq:
                        colH = colH + jnp.sum(
                            Jall[:, RK:ND, :]
                            * (Dq_eq * Jv[j][RK:ND, :])[None, :, :],
                            axis=1,
                        )
                    colH = colH + mc_col(j)
                    colH = colH + jnp.where(rows_iota == j, diagv, 0.0)
                    H_scr[j, :, :] = colH
            else:
                Dq_d = Dd * q_d                       # (ND, 128)
                # H = M + diag(fr/limits) + Jd^T Dq_d Jd, built a full
                # column at a time with row-chunked reductions
                for j in range(nv):
                    JDj = Jv[j] * Dq_d
                    colH = mc_col(j) + jnp.where(rows_iota == j, diagv, 0.0)
                    colH = colH + jnp.sum(
                        Jall * JDj[None, :, :], axis=1
                    )
                    H_scr[j, :, :] = colH
            dx = -chol_solve(h_col, grad)

            v_fr = dx
            v_lim = lim_mul(dx)
            v_d = Jd_mul(dx)
            q1 = jnp.sum(dx * Mv(x - a_smooth), axis=0, keepdims=True)
            q2 = jnp.sum(dx * Mv(dx), axis=0, keepdims=True)

            def dphi(a, need_h=True):
                jf = jar_fr + a * v_fr
                jl = jar_lim + a * v_lim
                jd2 = jar_d + a * v_d
                ff, fll, fd, qf, ql, qd, za = forces(jf, jl, jd2)
                d1 = q1 + a * q2 - (
                    jnp.sum(v_fr * ff, axis=0, keepdims=True)
                    + jnp.sum(v_lim * fll, axis=0, keepdims=True)
                    + jnp.sum(v_d * fd, axis=0, keepdims=True)
                )
                if not need_h:  # bracketing probes use the slope only
                    return d1, None
                d2 = q2 + (
                    jnp.sum(D_fr * qf * v_fr * v_fr, axis=0, keepdims=True)
                    + jnp.sum(D_lim * ql * v_lim * v_lim, axis=0, keepdims=True)
                )
                if elliptic:
                    # cone curvature (lm/solver._ell_curv_lm)
                    vt = [csl(v_d, r) * za["sD"][r] for r in range(R)]
                    quad = vt[0] * vt[0]
                    vtt2 = vt[1] * vt[1]
                    for r in range(2, R):
                        vtt2 = vtt2 + vt[r] * vt[r]
                    quad = quad + vtt2
                    tv = (za["x"][1] / za["T"]) * vt[1]
                    for r in range(2, R):
                        tv = tv + (za["x"][r] / za["T"]) * vt[r]
                    gw = mut * vt[0] + tv
                    wTa = za["w"] / za["T"]
                    mid_term = quad - (
                        gw * gw + wTa * (vtt2 - tv * tv)
                    ) / c1
                    per = jnp.where(
                        za["bottom"], quad,
                        jnp.where(za["mid"], jnp.maximum(mid_term, 0.0), 0.0),
                    )
                    d2 = d2 + jnp.sum(per, axis=0, keepdims=True)
                    if neq:
                        ve = v_d[RK:ND, :]
                        d2 = d2 + jnp.sum(
                            Dd[RK:ND, :] * ve * ve, axis=0, keepdims=True
                        )
                else:
                    d2 = d2 + jnp.sum(
                        Dd * qd * v_d * v_d, axis=0, keepdims=True
                    )
                return d1, d2

            hi = jnp.ones_like(q1)
            for _ in range(12):
                g_hi, _ = dphi(hi, need_h=False)
                hi = jnp.where(g_hi < 0, hi * 2.0, hi)
            lo = jnp.zeros_like(q1)
            a = jnp.minimum(hi, 1.0)
            for _ in range(ls_iterations):
                g, h = dphi(a)
                lo = jnp.where(g < 0, a, lo)
                hi = jnp.where(g < 0, hi, a)
                a_newton = a - g / jnp.maximum(h, _EPS)
                inside = (a_newton > lo) & (a_newton < hi)
                a = jnp.where(inside, a_newton, 0.5 * (lo + hi))
            alpha = jnp.maximum(a, 0.0)

            step = jnp.where(done > 0.5, 0.0, alpha)
            x_new = x + step * dx
            jf_new = jar_fr + step * v_fr
            jl_new = jar_lim + step * v_lim
            jd_new = jar_d + step * v_d
            cost_new = total_cost(x_new, (jf_new, jl_new, jd_new))
            ok = jnp.isfinite(cost_new) & (cost_new < cost_x)
            x = jnp.where(ok, x_new, x)
            jar_fr = jnp.where(ok, jf_new, jar_fr)
            jar_lim = jnp.where(ok, jl_new, jar_lim)
            jar_d = jnp.where(ok, jd_new, jar_d)
            cost_x = jnp.where(ok, cost_new, cost_x)
            gnorm2 = jnp.sum(grad * grad, axis=0, keepdims=True)
            tol2 = (tolerance * nv) ** 2
            done = jnp.maximum(
                done, jnp.where((gnorm2 < tol2) | ~ok, 1.0, 0.0)
            )
            return it + 1, x, jar_fr, jar_lim, jar_d, cost_x, done

        done0 = jnp.zeros_like(cost0)
        carry = (jnp.zeros((), jnp.int32), x0, *jar0, cost0, done0)
        _, x, jar_fr, jar_lim, jar_d, _, _ = jax.lax.while_loop(
            lambda c: (c[0] < iterations) & (jnp.min(c[6]) < 0.5),
            newton_body,
            carry,
        )

        f_fr, f_lim, f_d, _, _, _, _ = forces(jar_fr, jar_lim, jar_d)
        x_out[:] = x
        # canonical non-contact force rows: [eq, friction, limits]
        if neq:
            fnc_out[0:neq, :] = f_d[RK:ND, :]
        fnc_out[neq:neq + nv, :] = f_fr
        if nlim:
            fnc_out[neq + nv:NC, :] = f_lim
        fcon_out[:] = f_d[0:RK, :]  # r-major; launcher reorders to k-major
        qfrc_out[:] = JT_all(f_fr, f_lim, f_d)
        # integrator implicit velocity update: Mh a' = M a (folded in so
        # integrate() skips its own XLA dense factorization)
        if do_int:
            qint_out[:] = chol_solve(mh_col, Mv(x))
        else:
            qint_out[:] = x

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "nv", "K", "R", "ndirs", "neq", "nlim", "lim_dofs",
        "iterations", "ls_iterations", "tolerance", "do_int", "cone",
        "interpret",
    ),
)
def newton_assemble_solve(
    Mc, qfrc_smooth, x_ws, qvel, Mh,
    Dnc, arefnc, flnc, side, Jeq,
    cdof, pos_k, O1, O2, frame_k, mu_dirs, mut, Dc, bb, kimp, on_rm,
    W1, W2,
    *, nv, K, R, ndirs, neq, nlim, lim_dofs,
    iterations, ls_iterations, tolerance, do_int, cone=0, interpret=False,
):
    """Fused assembly+solve. All inputs env-LAST f32, E % 128 == 0:

    Mc (nv*nv, E) column-major mass; qfrc_smooth/x_ws/qvel (nv, E);
    Mh (nv*nv, E) integrator system matrix (column-major; any dummy when
    do_int=False); Dnc/arefnc/flnc (neq+nv+nlim, E) non-contact rows
    (canonical order); side (nlim, E); Jeq (neq*nv, E); cdof (nv*6, E);
    pos_k/O1/O2 (3*K, E) component-major; frame_k (9*K, E) row-major
    [n, t1, t2]; mu_dirs (ndirs*K, E) — pyramid friction coefficients per
    direction (cone=0) or the friction-row D values Dn*impratio*ratio^2
    (cone=1, dir-major); mut (K, E) whitened cone mu (cone=1; dummy row
    otherwise); Dc/bb/kimp (K, E); on_rm (R*K, E) r-major row activity;
    W1/W2 (nv*K, E) dof-major.

    cone=1 solves the elliptic friction cone: contact rows are the raw
    frame rows [n, t1, t2, torsion, roll1, roll2][:R] with the 3-zone
    cone cost/force/Hessian of lm/solver (reference manipulation cfg runs
    cone="elliptic", /root/reference/src/mjlab/sim/sim.py:139-149).

    Returns (x (nv,E), f_noncon (neq+nv+nlim, E), f_con_rmajor (R*K, E),
    qfrc_constraint (nv, E), a_smooth (nv, E), qacc_int (nv, E))."""
    E = Mc.shape[-1]
    assert E % LANES == 0, f"E must be a multiple of {LANES}, got {E}"
    grid = E // LANES
    RK = R * K
    NC = neq + nv + nlim

    kernel = _make_kernel(
        nv, K, R, ndirs, neq, nlim, lim_dofs,
        iterations, ls_iterations, tolerance, do_int, cone,
    )

    def bs(rows):
        return pl.BlockSpec((rows, LANES), lambda b: (0, b),
                            memory_space=pltpu.VMEM)

    def nz(rows, E_):
        # zero-row operands are not supported; pad to one dummy row
        return max(rows, 1)

    pad = lambda x, rows: (  # noqa: E731
        x if rows else jnp.zeros((1, E), jnp.float32)
    )

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            bs(nv * nv), bs(nv), bs(nv), bs(nv),
            bs(nv * nv if do_int else 1),
            bs(nz(NC, E)), bs(nz(NC, E)), bs(nz(NC, E)),
            bs(nz(nlim, E)), bs(nz(neq * nv, E)),
            bs(nv * 6), bs(3 * K), bs(3 * K), bs(3 * K), bs(9 * K),
            bs(nz(ndirs * K, E)), bs(K if cone else 1),
            bs(K), bs(K), bs(K), bs(RK),
            bs(nv * K), bs(nv * K),
        ],
        out_specs=[bs(nv), bs(nz(NC, E)), bs(RK), bs(nv), bs(nv), bs(nv)],
        out_shape=[
            jax.ShapeDtypeStruct((nv, E), jnp.float32),
            jax.ShapeDtypeStruct((max(NC, 1), E), jnp.float32),
            jax.ShapeDtypeStruct((RK, E), jnp.float32),
            jax.ShapeDtypeStruct((nv, E), jnp.float32),
            jax.ShapeDtypeStruct((nv, E), jnp.float32),
            jax.ShapeDtypeStruct((nv, E), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nv, nv, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        Mc, qfrc_smooth, x_ws, qvel,
        Mh if do_int else jnp.zeros((1, E), jnp.float32),
        pad(Dnc, NC), pad(arefnc, NC), pad(flnc, NC),
        pad(side, nlim), pad(Jeq, neq),
        cdof, pos_k, O1, O2, frame_k,
        pad(mu_dirs, ndirs), pad(mut, 1 if cone else 0),
        Dc, bb, kimp, on_rm,
        W1, W2,
    )
    x, fnc, fcon, qfrc, a_smooth, qacc_int = out
    return x, fnc[:NC], fcon, qfrc, a_smooth, qacc_int
