"""Primal Newton constraint solver (MuJoCo Newton semantics, dense, batched).

Minimizes over x = qacc:
    0.5 (x - qacc_smooth)^T M (x - qacc_smooth) + sum_i s_i(J_i x - aref_i)
with per-row cost s_i:
  one-sided rows (limits, pyramidal contact directions):
      0.5 D jar^2 if jar < 0 else 0
  dof-friction rows (Huber):
      0.5 D jar^2            if |D jar| <= fl
      fl |jar| - fl^2/(2D)   otherwise

Each Newton iteration builds the exact Hessian H = M + J_a^T D J_a over the
active set, factors it (batched dense Cholesky -> MXU-friendly), and does an
exact line search on the piecewise-quadratic 1-D restriction via safeguarded
Newton/bisection. Iteration counts are static (opt.iterations /
opt.ls_iterations) so the whole solve compiles to straight-line XLA.

Replaces the reference's mjwarp Newton solver with ls_parallel
(reference src/mjlab/sim/sim.py:140); here every env IS a lane of the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.phys.model import (
    EFC_CONTACT,
    EFC_EQUALITY,
    EFC_FRICTION_DOF,
    EFC_LIMIT_JOINT,
    EFC_LIMIT_TENDON,
    Model,
)
from mjlab_tpu.phys.data import Data
from mjlab_tpu.phys import linalg as _linalg

_EPS = 1e-12


def _chol_solve_unrolled(H, g):
    """Solve H x = g for SPD H via fully unrolled column Cholesky +
    substitutions, vectorized over any leading batch dims by vmap.

    XLA's lax.linalg.cholesky/triangular_solve lower to a pathological
    kernel sequence for large batches of tiny matrices on TPU (~10x slower
    than this, measured on v5e); here each column step is a handful of
    fused vector ops over the env batch and nv is a static Python int, so
    the whole solve compiles to straight-line elementwise XLA.
    """
    n = H.shape[-1]
    # Jacobi equilibration: solve (SHS) y = Sg, x = Sy with S =
    # 1/sqrt(diag H). The scaled matrix has unit diagonal, which buys f32
    # several orders of magnitude of conditioning headroom; with it a
    # relative ridge + pivot floor keep the factor bounded even for
    # contact Hessians near rank deficiency. The Newton fixed point
    # (grad -> 0) is unchanged by any of this.
    diag0 = jnp.diagonal(H, axis1=-2, axis2=-1)  # (..., n)
    scale = 1.0 / jnp.sqrt(jnp.maximum(diag0, _EPS))
    H = H * scale[..., :, None] * scale[..., None, :]
    g = g * scale
    ridge = 1e-6 if H.dtype == jnp.float32 else 1e-14
    pivot_floor = jnp.asarray(max(ridge, _EPS), H.dtype)
    # cols[j] = L[j:, j], length n-j
    cols = []
    for j in range(n):
        s = H[..., j:, j]
        s = s.at[..., 0].add(ridge)
        for k in range(j):
            s = s - cols[k][..., j - k :] * cols[k][..., j - k, None]
        d = jnp.sqrt(jnp.maximum(s[..., 0], pivot_floor))
        cols.append(s / d[..., None])
    # forward substitution L y = g
    y = []
    for j in range(n):
        s = g[..., j]
        for k in range(j):
            s = s - cols[k][..., j - k] * y[k]
        y.append(s / cols[j][..., 0])
    # back substitution L^T x = y
    x = [None] * n
    for j in reversed(range(n)):
        s = y[j]
        for k in range(j + 1, n):
            s = s - cols[j][..., k - j] * x[k]
        x[j] = s / cols[j][..., 0]
    return jnp.stack(x, axis=-1) * scale


def _row_forces(m: Model, jar, D, fl, is_friction, is_eq):
    """Per-row dual force g and active-quadratic mask.

    Returns (force, quad_mask): force = -s'(jar); quad_mask = rows in the
    quadratic zone (contribute D to the Hessian). Row classes:
    equality (bilateral, always quadratic), dof friction (Huber),
    one-sided (limits, pyramidal contact rows).
    """
    f_quad = -D * jar
    # one-sided: force only when jar < 0
    one_sided = jnp.where(jar < 0, f_quad, 0.0)
    os_quad = jar < 0
    # friction rows: clamp to [-fl, fl]
    fr = jnp.clip(f_quad, -fl, fl)
    fr_quad = jnp.abs(f_quad) <= fl
    force = jnp.where(is_friction, fr, jnp.where(is_eq, f_quad, one_sided))
    quad = jnp.where(is_friction, fr_quad, os_quad | is_eq) & (D > 0)
    return force, quad


def _cost(m: Model, jar, D, fl, is_friction, is_eq):
    quad_cost = 0.5 * D * jar * jar
    safe_D = jnp.maximum(D, _EPS)
    lin_cost = fl * jnp.abs(jar) - 0.5 * fl * fl / safe_D
    fr_cost = jnp.where(jnp.abs(D * jar) <= fl, quad_cost, lin_cost)
    os_cost = jnp.where(jar < 0, quad_cost, 0.0)
    return jnp.sum(
        jnp.where(is_friction, fr_cost, jnp.where(is_eq, quad_cost, os_cost))
    )


# ---------------------------------------------------------------------------
# Elliptic friction cone (m.opt.cone == 1)
#
# Contact block rows are [normal, t1, t2, torsion, roll1, roll2][:R] with the
# impratio/mu^2-scaled D from constraint.py. In the D^{1/2}-whitened
# coordinates x~ = jar * sqrt(D) the force cone becomes CIRCULAR with
# coefficient mu~ = mu_0/sqrt(impratio), so the cone projection (and hence
# the convex cost s, its gradient = -force, and Hessian) has closed form
# with three zones:
#   bottom (mu~ x~_n + T <= 0, T = |x~_t|): fully quadratic, f = -D jar
#   top    (x~_n >= mu~ T): separated, f = 0
#   middle: s = (|x~|^2 - w^2/(1+mu~^2))/2, w = mu~ x~_n + T  (on-cone slide)
# Same optimum as MuJoCo's elliptic Newton solver (same convex program);
# validated against mujoco.mj_forward qacc/efc_force in
# tests/test_phys_elliptic.py.
# ---------------------------------------------------------------------------


def _ell_scaled(jar_c, D_c, mu0, impratio):
    sD = jnp.sqrt(D_c)  # (K, R); zero rows beyond the slot's condim
    x = jar_c * sD
    xn = x[:, 0]
    t = x[:, 1:]
    T = jnp.sqrt(jnp.maximum(jnp.sum(t * t, -1), _EPS * _EPS))
    mu_t = mu0 / jnp.sqrt(jnp.maximum(impratio, _EPS))  # (K,)
    mu_pos = mu_t > 1e-9
    w = mu_t * xn + T
    bottom = jnp.where(mu_pos, w <= 0, xn < 0)
    top = (~bottom) & jnp.where(mu_pos, xn >= mu_t * T, xn >= 0)
    mid = (~bottom) & (~top)
    return dict(
        sD=sD, x=x, xn=xn, t=t, T=T, mu=mu_t, w=w,
        bottom=bottom, top=top, mid=mid, c1=1.0 + mu_t * mu_t,
    )


def _ell_force(z, jar_c, D_c):
    """(K, R) contact force rows = -grad s."""
    f_quad = -D_c * jar_c
    c1 = z["c1"]
    fn_mid = z["sD"][:, 0] * (z["mu"] * z["w"] / c1 - z["xn"])
    ft_mid = -z["sD"][:, 1:] * z["t"] * (
        1.0 - z["w"] / (c1 * z["T"])
    )[:, None]
    f_mid = jnp.concatenate([fn_mid[:, None], ft_mid], axis=1)
    zero = jnp.zeros_like(jar_c)
    return jnp.where(
        z["bottom"][:, None], f_quad, jnp.where(z["mid"][:, None], f_mid, zero)
    )


def _ell_cost(z):
    """Scalar cost contribution of the contact block."""
    norm2 = z["xn"] * z["xn"] + jnp.sum(z["t"] * z["t"], -1)
    s_bot = 0.5 * norm2
    s_mid = 0.5 * (norm2 - z["w"] * z["w"] / z["c1"])
    return jnp.sum(
        jnp.where(z["bottom"], s_bot, jnp.where(z["mid"], s_mid, 0.0))
    )


def _ell_curv(z, v_c, D_c):
    """sum_k v^T (hess s) v for the line search second derivative."""
    vt = v_c * z["sD"]
    vn = vt[:, 0]
    vtt = vt[:, 1:]
    that = z["t"] / z["T"][:, None]
    tv = jnp.sum(that * vtt, -1)
    quad = jnp.sum(vt * vt, -1)
    gw = z["mu"] * vn + tv
    mid_term = quad - (
        gw * gw + (z["w"] / z["T"]) * (jnp.sum(vtt * vtt, -1) - tv * tv)
    ) / z["c1"]
    per_con = jnp.where(
        z["bottom"], quad, jnp.where(z["mid"], jnp.maximum(mid_term, 0.0), 0.0)
    )
    return jnp.sum(per_con)


def _ell_hess_blocks(z, D_c):
    """(K, R, R) Hessian blocks of s for the Newton H assembly."""
    K, R = D_c.shape
    sD = z["sD"]
    eye = jnp.eye(R, dtype=D_c.dtype)
    that = z["t"] / z["T"][:, None]  # (K, R-1)
    gradw = jnp.concatenate([z["mu"][:, None], that], axis=1)  # (K, R)
    # projector onto the friction rows
    P_t = jnp.zeros((R, R), D_c.dtype).at[1:, 1:].set(
        jnp.eye(R - 1, dtype=D_c.dtype)
    )
    that_full = jnp.concatenate(
        [jnp.zeros((K, 1), D_c.dtype), that], axis=1
    )  # (K, R)
    B_mid = (
        eye[None]
        - (
            gradw[:, :, None] * gradw[:, None, :]
            + (z["w"] / z["T"])[:, None, None]
            * (P_t[None] - that_full[:, :, None] * that_full[:, None, :])
        )
        / z["c1"][:, None, None]
    )
    B_mid = sD[:, :, None] * B_mid * sD[:, None, :]
    B_bot = eye[None] * D_c[:, :, None]
    zero = jnp.zeros((K, R, R), D_c.dtype)
    return jnp.where(
        z["bottom"][:, None, None],
        B_bot,
        jnp.where(z["mid"][:, None, None], B_mid, zero),
    )


def _solve_impl(m: Model, d: Data) -> Data:
    """Newton solve for constrained qacc. Single world; vmap for batching."""
    dtype = d.qpos.dtype
    nv = m.nv
    M = d.qM
    a_smooth = d.qacc_smooth

    if m.nefc == 0:
        return d.replace(
            qacc=a_smooth,
            qfrc_constraint=jnp.zeros(nv, dtype),
            qacc_warmstart=a_smooth,
        )

    D = d.efc_D
    aref = d.efc_aref
    fl = d.efc_frictionloss
    is_friction = jnp.asarray(m.efc_type == EFC_FRICTION_DOF)
    is_eq = jnp.asarray(m.efc_type == EFC_EQUALITY)

    # structured Jacobian blocks (constraint.py row layout
    # [eq][friction=I][limits: one signed entry][contacts: dense]).
    # Exploiting the structure keeps every J pass O(contacts) instead of
    # O(nefc): friction rows cost nothing, limit rows are a static gather.
    import numpy as _np

    neq = m.neq_jnt
    nlimit = m.nlimit + m.nlimit_ten  # joint + tendon limit rows
    Jeq = d.efc_Jeq
    side = d.efc_lim_side
    Jc = d.efc_Jc
    lim_vadr = _np.asarray(m.jnt_dofadr[m.limit_jntid], _np.int32)
    # static limit-row pattern: one-hot joint rows (+ tendon coef rows)
    from mjlab_tpu.phys.model import limit_rows_static

    Pj = jnp.asarray(limit_rows_static(m), dtype)
    # joint-only limit blocks keep the cheaper gather/diagonal forms
    lim_dense = bool(m.nlimit_ten)
    s_fr = slice(neq, neq + nv)
    s_lim = slice(neq + nv, neq + nv + nlimit)
    s_con = slice(neq + nv + nlimit, m.nefc)

    def Jmul(x):
        parts = []
        if neq:
            parts.append(Jeq @ x)
        parts.append(x)
        if nlimit:
            parts.append(side * (Pj @ x) if lim_dense else side * x[lim_vadr])
        if Jc.shape[0]:
            parts.append(Jc @ x)
        return jnp.concatenate(parts)

    def JTmul(f):
        out = f[s_fr]
        if neq:
            out = out + Jeq.T @ f[:neq]
        if nlimit:
            out = out + (side * f[s_lim]) @ Pj
        if Jc.shape[0]:
            out = out + Jc.T @ f[s_con]
        return out

    K = m.ncon_max
    R = m.rows_per_con
    elliptic = bool(int(m.opt.cone) != 0 and K and m.pairs.ncon)
    nc_end = s_con.start  # rows before the contact block
    if elliptic:
        D_c = D[s_con].reshape(K, R)
        mu0_k = d.con_packed_c[:, 5]  # slide friction per compacted slot

        def ell_z(jar):
            return _ell_scaled(
                jar[s_con].reshape(K, R), D_c, mu0_k, m.opt.impratio
            )

    def row_forces(jar):
        """(force, quad, z): full force rows; quad valid on non-contact
        rows only under elliptic (contacts get block Hessians via z)."""
        f, q = _row_forces(m, jar, D, fl, is_friction, is_eq)
        if not elliptic:
            return f, q, None
        z = ell_z(jar)
        fc = _ell_force(z, jar[s_con].reshape(K, R), D_c)
        return jnp.concatenate([f[:nc_end], fc.reshape(-1)]), q, z

    def cost_rows_fn(jar):
        if not elliptic:
            return _cost(m, jar, D, fl, is_friction, is_eq)
        base = _cost(
            m, jar[:nc_end], D[:nc_end], fl[:nc_end],
            is_friction[:nc_end], is_eq[:nc_end],
        )
        return base + _ell_cost(ell_z(jar))

    def cost_from_jar(x, jar):
        dx = x - a_smooth
        return 0.5 * dx @ (M @ dx) + cost_rows_fn(jar)

    def total_cost(x):
        return cost_from_jar(x, Jmul(x) - aref)

    # init: better of warmstart and qacc_smooth
    x_ws = d.qacc_warmstart
    jar_ws = Jmul(x_ws) - aref
    jar_sm = Jmul(a_smooth) - aref
    cost_ws = cost_from_jar(x_ws, jar_ws)
    cost_sm = cost_from_jar(a_smooth, jar_sm)
    ws_better = cost_ws < cost_sm
    x0 = jnp.where(ws_better, x_ws, a_smooth)
    jar0 = jnp.where(ws_better, jar_ws, jar_sm)
    cost0 = jnp.where(ws_better, cost_ws, cost_sm)

    # static row classes for the line-search breakpoint set: one-sided rows
    # (limits + contact pyramids) contribute 1 breakpoint, dof-friction
    # rows 2, equality rows none — sorting only those beats sorting 2*nefc
    # padded slots.
    _os_idx = _np.nonzero(
        (m.efc_type == EFC_LIMIT_JOINT)
        | (m.efc_type == EFC_LIMIT_TENDON)
        | (m.efc_type == EFC_CONTACT)
    )[0]
    _fr_idx = _np.nonzero(m.efc_type == EFC_FRICTION_DOF)[0]

    def exact_linesearch(jar, v, q1, q2):
        """Closed-form minimizer of the piecewise-quadratic restriction
        phi(a) = cost(x + a dx).

        phi'(a) is continuous piecewise-linear and non-decreasing. Every
        constraint row contributes at most 2 breakpoints where its zone
        (inactive / quadratic / saturated) changes; between breakpoints
        phi'(a) = (P0 + cumC) + a (Q0 + cumS). We anchor activity at a=0,
        sort the positive breakpoints, prefix-sum the slope/intercept
        deltas, locate the sign change, and solve the linear equation —
        exact to float precision in O(R log R) with ~10 fused kernels
        instead of the reference solver's ls_iterations sequential
        bisection steps (mjwarp ls_parallel analog, but closed-form).
        """
        inf = jnp.asarray(jnp.inf, dtype)
        safe_v = jnp.where(jnp.abs(v) > _EPS, v, 1.0)
        has_v = jnp.abs(v) > _EPS
        sgn = jnp.sign(safe_v)

        # activity at a = 0+ (right limit) -> anchor P0/Q0. One-sided rows
        # exactly at the boundary (jar == 0) count as active iff moving
        # into the active zone (v < 0), so their (masked-out) a=0
        # breakpoint is not lost.
        f0, quad0 = _row_forces(m, jar, D, fl, is_friction, is_eq)
        boundary = (~is_friction) & (~is_eq) & (jar == 0) & (v < 0) & (D > 0)
        quad0 = quad0 | boundary
        # saturated friction rows at a=0 contribute a constant +-fl |v|
        c0 = -v * f0
        P0 = q1 + jnp.sum(jnp.where(quad0, D * v * jar, c0))
        # rows constant in a (v ~ 0) keep their a=0 contribution in P0
        Q0 = q2 + jnp.sum(jnp.where(quad0 & has_v, D * v * v, 0.0))

        # breakpoint set, gathered per static row class
        dvj = D * v * jar
        dvv = D * v * v
        # one-sided rows: single breakpoint at -jar/v, delta = -sgn * (quad terms)
        a_os = (-jar / safe_v)[_os_idx]
        dc_os = (-sgn * dvj)[_os_idx]
        ds_os = (-sgn * dvv)[_os_idx]
        v_os = has_v[_os_idx]
        # friction rows: quad zone between the two band crossings
        Df, flf = D[_fr_idx], fl[_fr_idx]
        jarf, vf = jar[_fr_idx], safe_v[_fr_idx]
        band = flf / jnp.maximum(Df, _EPS)
        b1 = (-band - jarf) / vf
        b2 = (band - jarf) / vf
        a_lo = jnp.minimum(b1, b2)
        a_hi = jnp.maximum(b1, b2)
        absv = jnp.abs(v)[_fr_idx]
        dvjf, dvvf = dvj[_fr_idx], dvv[_fr_idx]
        dc_lo = dvjf + absv * flf
        ds_lo = dvvf
        dc_hi = absv * flf - dvjf
        ds_hi = -dvvf
        # friction rows with D ~ 0 never leave the quadratic zone
        v_fr = has_v[_fr_idx] & (Df > _EPS)

        ak = jnp.concatenate([a_os, a_lo, a_hi])
        dck = jnp.concatenate([dc_os, dc_lo, dc_hi])
        dsk = jnp.concatenate([ds_os, ds_lo, ds_hi])
        valid = jnp.concatenate([v_os, v_fr, v_fr]) & (ak > 0)
        ak = jnp.where(valid, ak, inf)
        dck = jnp.where(valid, dck, 0.0)
        dsk = jnp.where(valid, dsk, 0.0)

        ak, dck, dsk = jax.lax.sort([ak, dck, dsk], num_keys=1)
        C = jnp.cumsum(dck)
        S = jnp.cumsum(dsk)
        # phi' just before breakpoint k uses the exclusive prefix sums
        Cx = jnp.concatenate([jnp.zeros(1, dtype), C[:-1]])
        Sx = jnp.concatenate([jnp.zeros(1, dtype), S[:-1]])
        finite = jnp.isfinite(ak)
        g_at = (P0 + Cx) + jnp.where(finite, ak, 0.0) * (Q0 + Sx)
        crossed = (g_at >= 0) & finite

        any_cross = jnp.any(crossed)
        k = jnp.argmax(crossed)  # first breakpoint with phi' >= 0
        # zero lies in the segment ENDING at breakpoint k
        num = P0 + jnp.where(any_cross, Cx[k], C[-1])
        den = Q0 + jnp.where(any_cross, Sx[k], S[-1])
        # invariant: phi' slope >= q2 at every a (M is SPD), so clamping den
        # from below by q2/2 only guards float bookkeeping noise. When the
        # Newton step itself vanished (q2 ~ 0, solve converged) take no
        # step — otherwise alpha = -eps_noise/1e-12 explodes.
        alpha = -num / jnp.maximum(den, jnp.maximum(0.5 * q2, _EPS))
        alpha = jnp.where((P0 >= 0) | (q2 <= _EPS), 0.0, alpha)
        return jnp.maximum(alpha, 0.0)

    def bisect_linesearch(jar, v, q1, q2):
        """MuJoCo's safeguarded Newton-bisection on phi'(a) (the reference
        solver's ls_iterations loop; mjwarp ls_parallel analog). phi' is
        piecewise-linear nondecreasing; each eval is a handful of fused
        row ops — no sort, no breakpoint gathers. Used by default: the
        sort-based exact search costs ~0.4 ms/iteration at 4096 envs on
        TPU (see exact_linesearch for the closed form)."""

        def dphi(a):
            jar_a = jar + a * v
            force_a, quad_a, z_a = row_forces(jar_a)
            d1 = q1 + a * q2 - v @ force_a
            if elliptic:
                d2 = q2 + jnp.sum(
                    jnp.where(quad_a[:nc_end], D[:nc_end], 0.0)
                    * v[:nc_end] * v[:nc_end]
                ) + _ell_curv(z_a, v[s_con].reshape(K, R), D_c)
            else:
                d2 = q2 + jnp.sum(jnp.where(quad_a, D, 0.0) * v * v)
            return d1, d2

        g0, _ = dphi(jnp.zeros((), dtype))
        # expand upper bracket until phi' >= 0
        hi = jnp.ones((), dtype)
        for _ in range(12):
            g_hi, _ = dphi(hi)
            hi = jnp.where(g_hi < 0, hi * 2.0, hi)
        lo = jnp.zeros((), dtype)
        a = jnp.minimum(hi, jnp.ones((), dtype))
        for _ in range(max(int(m.opt.ls_iterations), 8)):
            g, h = dphi(a)
            lo = jnp.where(g < 0, a, lo)
            hi = jnp.where(g < 0, hi, a)
            a_newton = a - g / jnp.maximum(h, _EPS)
            inside = (a_newton > lo) & (a_newton < hi)
            a = jnp.where(inside, a_newton, 0.5 * (lo + hi))
        # no descent (phi'(0) >= 0) or vanished step -> no move
        a = jnp.where((g0 >= 0) | (q2 <= _EPS), 0.0, a)
        return jnp.maximum(a, 0.0)

    import os as _os

    _ls_mode = _os.environ.get("MJLAB_TPU_LINESEARCH", "bisect")
    # the sort-based exact search relies on phi' being piecewise-LINEAR,
    # which the elliptic middle zone breaks — always bisect there
    linesearch = (
        exact_linesearch
        if (_ls_mode == "exact" and not elliptic)
        else bisect_linesearch
    )

    def newton_iter(carry):
        # jar = J x - aref is carried across iterations and updated
        # incrementally (jar += alpha * J dx), saving two J-sized matvec
        # passes per iteration — J dominates the solver's memory traffic.
        i, x, jar, cost_x, done = carry
        force, quad, z_h = row_forces(jar)
        grad = M @ (x - a_smooth) - JTmul(force)
        Dq = jnp.where(quad, D, 0.0)
        # H = M + J^T Dq J by block: friction/limit rows only touch the
        # diagonal; equality rows are tiny; contacts are the dense part.
        diag = Dq[s_fr]
        if nlimit and not lim_dense:
            diag = diag + Dq[s_lim] @ Pj  # side^2 == 1
        H = M + jnp.diag(diag)
        if nlimit and lim_dense:
            # tendon rows are dense: full P^T diag(Dq) P (inactive rows
            # have D == 0, so no side masking needed)
            H = H + (Pj.T * Dq[s_lim]) @ Pj
        if Jc.shape[0]:
            if elliptic:
                B = _ell_hess_blocks(z_h, D_c)  # (K, R, R)
                Jb = Jc.reshape(K, R, nv)
                H = H + jnp.einsum(
                    "kri,krj->ij", Jb, jnp.einsum("krs,ksj->krj", B, Jb)
                )
            else:
                H = H + (Jc.T * Dq[s_con]) @ Jc
        if neq:
            H = H + (Jeq.T * Dq[:neq]) @ Jeq
        # the fused one-shot factor+solve: inside the vmapped while body
        # XLA fuses this whole chain into a few kernels — measured faster
        # there than the blocked/matmul variant (which wins OUTSIDE the
        # loop, see linalg.py)
        dx = -_chol_solve_unrolled(H, grad)

        v = Jmul(dx)  # (nefc,)
        q1 = dx @ (M @ (x - a_smooth))  # phi'(0) smooth part
        q2 = dx @ (M @ dx)  # smooth curvature
        alpha = linesearch(jar, v, q1, q2)
        # exact line search on a descent direction gives monotone decrease;
        # the acceptance check below additionally rejects any step whose
        # f32 linear solve went bad (non-finite or ascent). Converged
        # worlds freeze (MuJoCo's gradient-tolerance exit, masked instead
        # of early-exited to stay static-shape). Cost is carried so the
        # guard needs ONE evaluation per iteration.
        step = jnp.where(done, 0.0, alpha)
        x_new = x + step * dx
        jar_new = jar + step * v
        cost_new = cost_from_jar(x_new, jar_new)
        ok = jnp.isfinite(cost_new) & (cost_new < cost_x)
        x = jnp.where(ok, x_new, x)
        jar = jnp.where(ok, jar_new, jar)
        cost_x = jnp.where(ok, cost_new, cost_x)
        done = done | (jnp.linalg.norm(grad) < m.opt.tolerance * nv) | ~ok
        return (i + 1, x, jar, cost_x, done)

    # while_loop instead of a fixed-length scan: under vmap this batches to
    # "iterate until EVERY world converged or iterations exhausted" — with
    # warmstarting, steady-state batches converge in 2-4 iterations, so the
    # average step runs a fraction of opt.iterations (the reference's
    # mjwarp solver has the same data-dependent exit).
    done0 = jnp.zeros((), bool)
    i0 = jnp.zeros((), jnp.int32)
    _, x, _, _, _ = jax.lax.while_loop(
        lambda c: (c[0] < m.opt.iterations) & ~c[4],
        newton_iter,
        (i0, x0, jar0, cost0, done0),
    )

    jar = Jmul(x) - aref
    force, _, _ = row_forces(jar)
    qfrc_constraint = JTmul(force)

    # decode per-contact world forces for the compacted slots
    # (mj_contactForce equivalent): rows [n+u_i d_i, n-u_i d_i, ...]
    # -> f_normal = sum(rows), f_i = u_i (r_{2i} - r_{2i+1}). Stored
    # COMPACTED (K, 3): expanding to the full slot table is a scatter
    # consumers rarely need — see decode_con_force / the contact
    # sensor's one-hot expansion.
    con_force_c = d.con_force_c
    con_torque_c = d.con_torque_c
    K = m.ncon_max
    R = m.rows_per_con
    if K and m.pairs.ncon:
        base = m.neq_jnt + m.nv + m.nlimit + m.nlimit_ten
        rows = force[base : base + R * K].reshape(K, R)
        con_force_c, con_torque_c = _contact_force_torque(
            m, rows, d.con_packed_c, d.con_sel_active
        )

    return d.replace(
        qacc=x,
        efc_force=force,
        qfrc_constraint=qfrc_constraint,
        qacc_warmstart=x,
        con_force_c=con_force_c,
        con_torque_c=con_torque_c,
    )


# ---------------------------------------------------------------------------
# Batched dispatch: vmap(solve) routes to the fused Pallas TPU kernel when
# the batch shape and backend allow; anything else (CPU CI, odd batch
# sizes, f64 parity runs) falls back to vmapping the pure implementation.
# Call sites never change — jax.vmap(solve, ...) IS the dispatcher.
# ---------------------------------------------------------------------------

import jax.custom_batching as _custom_batching


def decode_con_force(m: Model, d: Data) -> jnp.ndarray:
    """Expand the compacted contact forces to the full slot table
    (ncon, 3) — a scatter; call only where full-slot layout is needed
    (debug/viewer paths). Batched over leading dims."""
    sel = d.con_sel
    if d.qpos.ndim == 1:
        return (
            jnp.zeros((m.pairs.ncon, 3), d.qpos.dtype).at[sel].set(d.con_force_c)
        )
    E = d.qpos.shape[0]
    e_idx = jnp.arange(E)[:, None]
    return (
        jnp.zeros((E, m.pairs.ncon, 3), d.qpos.dtype)
        .at[e_idx, sel]
        .set(d.con_force_c)
    )


def _contact_force_torque(m: Model, rows, cpk, sel_active):
    """mj_contactForce decode for the compacted slots, any condim/cone.

    rows: (..., K, R) solved contact efc forces (pyramid edge forces, or
    direct per-dim components under the elliptic cone); cpk: (..., K, 27)
    packed records. Returns world (force, torque) about the contact point,
    each (..., K, 3); torque is nonzero only for condim>3 components."""
    R = m.rows_per_con
    mu = cpk[..., 5:10]
    frame_rows = cpk[..., 17:26]
    frame = frame_rows.reshape(frame_rows.shape[:-1] + (3, 3))
    dim_k = cpk[..., 26]

    if int(m.opt.cone) != 0:
        # elliptic: rows ARE the contact-frame components [fn, t1, t2,
        # torsion, roll1, roll2][:R]
        def row_or_zero(i):
            if i < R:
                return rows[..., i]
            return jnp.zeros_like(dim_k)

        fc = jnp.stack([row_or_zero(0), row_or_zero(1), row_or_zero(2)], -1)
        fw = jnp.einsum("...kf,...kfx->...kx", fc, frame)
        force = jnp.where(sel_active[..., None], fw, 0.0)
        if R > 3:
            tc = jnp.stack([row_or_zero(3), row_or_zero(4), row_or_zero(5)], -1)
            tw = jnp.einsum("...kf,...kfx->...kx", tc, frame)
            torque = jnp.where(sel_active[..., None], tw, 0.0)
        else:
            torque = jnp.zeros_like(force)
        return force, torque

    def comp(i, dim_req):
        # friction component i (1-based) <- rows 2(i-1), 2(i-1)+1,
        # present when R >= 2i
        if R < 2 * i:
            return jnp.zeros_like(dim_k)
        c = jnp.where(dim_k >= dim_req, mu[..., i - 1], 0.0)
        return c * (rows[..., 2 * (i - 1)] - rows[..., 2 * (i - 1) + 1])

    fn = jnp.sum(rows, axis=-1)
    fc = jnp.stack([fn, comp(1, 3), comp(2, 3)], axis=-1)
    fw = jnp.einsum("...kf,...kfx->...kx", fc, frame)
    # where (not multiply): inactive far slots may hold non-finite data
    force = jnp.where(sel_active[..., None], fw, 0.0)

    if R > 4:
        tc = jnp.stack([comp(3, 4), comp(4, 6), comp(5, 6)], axis=-1)
        tw = jnp.einsum("...kf,...kfx->...kx", tc, frame)
        torque = jnp.where(sel_active[..., None], tw, 0.0)
    else:
        torque = jnp.zeros_like(force)
    return force, torque


def _decode_contact_forces_batched(m: Model, d: Data, force):
    """Batched mj_contactForce decode (mirrors the tail of _solve_impl),
    compacted (E, K, 3) force and torque."""
    K = m.ncon_max
    R = m.rows_per_con
    if not (K and m.pairs.ncon):
        return d.con_force_c, d.con_torque_c
    E = force.shape[0]
    base = m.neq_jnt + m.nv + m.nlimit + m.nlimit_ten
    rows = force[:, base : base + R * K].reshape(E, K, R)
    return _contact_force_torque(m, rows, d.con_packed_c, d.con_sel_active)


def _assemble_dense_J(m: Model, d: Data):
    """Materialize the full (E, nefc, nv) Jacobian from the structured
    blocks — only used by the experimental Pallas path."""
    import numpy as _np

    E = d.qpos.shape[0]
    from mjlab_tpu.phys.model import limit_rows_static

    nv, nlimit = m.nv, m.nlimit + m.nlimit_ten
    dtype = d.qpos.dtype
    parts = []
    if m.neq_jnt:
        parts.append(d.efc_Jeq)
    parts.append(jnp.broadcast_to(jnp.eye(nv, dtype=dtype), (E, nv, nv)))
    if nlimit:
        P = limit_rows_static(m)
        parts.append(d.efc_lim_side[..., None] * jnp.asarray(P, dtype))
    if d.efc_Jc.shape[1]:
        parts.append(d.efc_Jc)
    return jnp.concatenate(parts, axis=1)


def _solve_batched_pallas(m: Model, d: Data) -> Data:
    from mjlab_tpu.phys.solver_pallas import newton_solve_pallas

    os_mask = tuple(
        bool(b)
        for b in (m.efc_type == EFC_LIMIT_JOINT)
        | (m.efc_type == EFC_LIMIT_TENDON)
        | (m.efc_type == EFC_CONTACT)
    )
    fr_mask = tuple(bool(b) for b in m.efc_type == EFC_FRICTION_DOF)
    eq_mask = tuple(bool(b) for b in m.efc_type == EFC_EQUALITY)
    efc_J = _assemble_dense_J(m, d)
    x, force = newton_solve_pallas(
        efc_J, d.efc_D, d.efc_aref, d.efc_frictionloss,
        d.qM, d.qacc_smooth, d.qacc_warmstart,
        nv=m.nv, nefc=m.nefc,
        os_mask=os_mask, fr_mask=fr_mask, eq_mask=eq_mask,
        iterations=m.opt.iterations,
        ls_iterations=max(m.opt.ls_iterations, 8),
        tolerance=float(m.opt.tolerance),
    )
    qfrc_constraint = jnp.einsum("eri,er->ei", efc_J, force)
    con_force_c, con_torque_c = _decode_contact_forces_batched(m, d, force)
    return d.replace(
        qacc=x,
        efc_force=force,
        qfrc_constraint=qfrc_constraint,
        qacc_warmstart=x,
        con_force_c=con_force_c,
        con_torque_c=con_torque_c,
    )


@_custom_batching.custom_vmap
def solve(m: Model, d: Data) -> Data:
    return _solve_impl(m, d)


@solve.def_vmap
def _solve_vmap_rule(axis_size, in_batched, m, d):
    import os as _os

    m_batched, d_batched = in_batched
    mode = _os.environ.get("MJLAB_TPU_SOLVER", "auto")  # auto|pure|pallas
    use_pallas = (
        mode != "pure"
        and (jax.default_backend() == "tpu" or mode == "pallas")
        and axis_size % 128 == 0
        and d.qpos.dtype == jnp.float32
        and m.nefc > 0
        and int(m.opt.cone) == 0  # pallas kernel implements pyramid only
        and all(jax.tree_util.tree_leaves(d_batched))
    )
    if use_pallas:
        out = _solve_batched_pallas(m, d)
    else:
        m_axes = jax.tree_util.tree_map(lambda b: 0 if b else None, m_batched)
        d_axes = jax.tree_util.tree_map(lambda b: 0 if b else None, d_batched)
        out = jax.vmap(_solve_impl, in_axes=(m_axes, d_axes))(m, d)
    out_batched = jax.tree_util.tree_map(lambda _: True, out)
    return out, out_batched
