"""Lane-major Newton constraint solver. Numerics mirror phys/solver.py
(_solve_impl with the safeguarded Newton-bisection line search); every
array is env-last so the Cholesky columns, row forces and line-search
scalars are full-lane vector ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.model import (
    EFC_CONTACT, EFC_EQUALITY, EFC_FRICTION_DOF, EFC_LIMIT_JOINT, Model,
)
from mjlab_tpu.phys.lm.base import Params

_EPS = 1e-12


# ---------------------------------------------------------------------------
# Elliptic friction cone, env-LAST (mirrors phys/solver.py _ell_* exactly;
# every per-contact scalar is a (K, E) plane, per-row arrays are (K, R, E)).
# ---------------------------------------------------------------------------


def _ell_scaled_lm(jar_c, D_c, mu0, impratio):
    sD = jnp.sqrt(D_c)  # (K, R, E)
    x = jar_c * sD
    xn = x[:, 0]  # (K, E)
    t = x[:, 1:]  # (K, R-1, E)
    T = jnp.sqrt(jnp.maximum(jnp.sum(t * t, axis=1), _EPS * _EPS))
    mu_t = mu0 / jnp.sqrt(jnp.maximum(impratio, _EPS))  # (K, E)
    mu_pos = mu_t > 1e-9
    w = mu_t * xn + T
    bottom = jnp.where(mu_pos, w <= 0, xn < 0)
    top = (~bottom) & jnp.where(mu_pos, xn >= mu_t * T, xn >= 0)
    mid = (~bottom) & (~top)
    return dict(
        sD=sD, x=x, xn=xn, t=t, T=T, mu=mu_t, w=w,
        bottom=bottom, top=top, mid=mid, c1=1.0 + mu_t * mu_t,
    )


def _ell_force_lm(z, jar_c, D_c):
    """(K, R, E) contact force rows = -grad s."""
    f_quad = -D_c * jar_c
    c1 = z["c1"]
    fn_mid = z["sD"][:, 0] * (z["mu"] * z["w"] / c1 - z["xn"])  # (K, E)
    ft_mid = -z["sD"][:, 1:] * z["t"] * (
        1.0 - z["w"] / (c1 * z["T"])
    )[:, None]
    f_mid = jnp.concatenate([fn_mid[:, None], ft_mid], axis=1)
    zero = jnp.zeros_like(jar_c)
    return jnp.where(
        z["bottom"][:, None], f_quad, jnp.where(z["mid"][:, None], f_mid, zero)
    )


def _ell_cost_lm(z):
    """(E,) cost contribution of the contact block."""
    norm2 = z["xn"] * z["xn"] + jnp.sum(z["t"] * z["t"], axis=1)
    s_bot = 0.5 * norm2
    s_mid = 0.5 * (norm2 - z["w"] * z["w"] / z["c1"])
    return jnp.sum(
        jnp.where(z["bottom"], s_bot, jnp.where(z["mid"], s_mid, 0.0)),
        axis=0,
    )


def _ell_curv_lm(z, v_c, D_c):
    """(E,) sum_k v^T (hess s) v for the line-search second derivative."""
    vt = v_c * z["sD"]  # (K, R, E)
    vn = vt[:, 0]
    vtt = vt[:, 1:]
    that = z["t"] / z["T"][:, None]
    tv = jnp.sum(that * vtt, axis=1)  # (K, E)
    quad = jnp.sum(vt * vt, axis=1)
    gw = z["mu"] * vn + tv
    mid_term = quad - (
        gw * gw + (z["w"] / z["T"]) * (jnp.sum(vtt * vtt, axis=1) - tv * tv)
    ) / z["c1"]
    per_con = jnp.where(
        z["bottom"], quad, jnp.where(z["mid"], jnp.maximum(mid_term, 0.0), 0.0)
    )
    return jnp.sum(per_con, axis=0)


def _ell_hess_lm(z, D_c):
    """(K, R, R, E) Hessian blocks of s for the Newton H assembly."""
    K, R, E = D_c.shape
    dtype = D_c.dtype
    sD = z["sD"]
    eye = jnp.eye(R, dtype=dtype)
    that = z["t"] / z["T"][:, None]  # (K, R-1, E)
    gradw = jnp.concatenate([z["mu"][:, None], that], axis=1)  # (K, R, E)
    P_t = jnp.zeros((R, R), dtype).at[1:, 1:].set(jnp.eye(R - 1, dtype=dtype))
    that_full = jnp.concatenate(
        [jnp.zeros((K, 1, E), dtype), that], axis=1
    )  # (K, R, E)
    B_mid = (
        eye[None, :, :, None]
        - (
            gradw[:, :, None] * gradw[:, None, :]
            + (z["w"] / z["T"])[:, None, None]
            * (P_t[None, :, :, None] - that_full[:, :, None] * that_full[:, None, :])
        )
        / z["c1"][:, None, None]
    )
    B_mid = sD[:, :, None] * B_mid * sD[:, None, :]
    B_bot = eye[None, :, :, None] * D_c[:, :, None, :]
    zero = jnp.zeros((K, R, R, E), dtype)
    return jnp.where(
        z["bottom"][:, None, None],
        B_bot,
        jnp.where(z["mid"][:, None, None], B_mid, zero),
    )


def _chol_solve_envlast(H, g, nv):
    """Solve H x = g, H (nv, nv, E) SPD, g (nv, E). Jacobi-equilibrated
    unrolled column Cholesky (mirrors solver._chol_solve_unrolled)."""
    diag0 = jnp.stack([H[j, j] for j in range(nv)])  # (nv, E)
    scale = jax.lax.rsqrt(jnp.maximum(diag0, _EPS))
    ridge = 1e-6 if H.dtype == jnp.float32 else 1e-14
    pivot_floor = jnp.asarray(max(ridge, _EPS), H.dtype)
    cols = []
    for j in range(nv):
        s = H[j:, j] * (scale[j:] * scale[j])  # (nv-j, E)
        s = s.at[0].add(ridge)
        for k in range(j):
            s = s - cols[k][j - k :] * cols[k][j - k]
        d = jnp.sqrt(jnp.maximum(s[0], pivot_floor))
        cols.append(s / d)
    gs = g * scale
    y = []
    for j in range(nv):
        s = gs[j]
        for k in range(j):
            s = s - cols[k][j - k] * y[k]
        y.append(s / cols[j][0])
    x = [None] * nv
    for j in reversed(range(nv)):
        s = y[j]
        for k in range(j + 1, nv):
            s = s - cols[j][k - j] * x[k]
        x[j] = s / cols[j][0]
    return jnp.stack(x) * scale


def solve_lm(m: Model, P: Params, k: dict, a_smooth, x_ws, dtype):
    """Newton solve. a_smooth/x_ws: (nv, E). Returns dict with qacc (nv,E),
    efc_force (nefc, E), qfrc_constraint (nv, E). Handles both friction
    cones: pyramidal rows are independent one-sided quadratics; elliptic
    contacts get the 3-zone cone cost with per-contact (R, R) Hessian
    blocks (phys/solver.py:120-230 semantics, env-last)."""
    nv = m.nv
    E = P.E

    if m.nefc == 0:
        return dict(
            qacc=a_smooth,
            qfrc_constraint=jnp.zeros((nv, E), dtype),
            efc_force=jnp.zeros((0, E), dtype),
        )

    D = k["efc_D"]  # (nefc, E)
    aref = k["efc_aref"]
    fl = k["efc_fl"]
    Jeq = k["efc_Jeq"]  # (neq, nv, E)
    side = k["efc_lim_side"]  # (nlimit, E)
    Jc = k["efc_Jc"]  # (KR, nv, E)
    M = k["qM_dense"]  # (nv, nv, E)

    neq = m.neq_jnt
    nlimit = m.nlimit
    lim_vadr = [int(a) for a in m.jnt_dofadr[m.limit_jntid]]
    s_fr = slice(neq, neq + nv)
    s_lim = slice(neq + nv, neq + nv + nlimit)
    s_con = slice(neq + nv + nlimit, m.nefc)

    is_fr = jnp.asarray(
        (m.efc_type == EFC_FRICTION_DOF).astype(np.float32)
    )[:, None]
    is_eq = jnp.asarray((m.efc_type == EFC_EQUALITY).astype(np.float32))[:, None]
    is_os = jnp.asarray(
        ((m.efc_type == EFC_LIMIT_JOINT) | (m.efc_type == EFC_CONTACT)).astype(
            np.float32
        )
    )[:, None]

    def Mv(x):  # (nv, E)
        return jnp.einsum("ije,je->ie", M, x)

    def Jmul(x):
        parts = []
        if neq:
            parts.append(jnp.einsum("rve,ve->re", Jeq, x))
        parts.append(x)
        if nlimit:
            parts.append(side * jnp.stack([x[a] for a in lim_vadr]))
        if Jc.shape[0]:
            parts.append(jnp.einsum("rve,ve->re", Jc, x))
        return jnp.concatenate(parts, axis=0)

    def JTmul(f):
        out = f[s_fr]
        if neq:
            out = out + jnp.einsum("rve,re->ve", Jeq, f[:neq])
        if nlimit:
            sf = side * f[s_lim]  # (nlimit, E)
            add = jnp.zeros((nv, E), dtype)
            for i, a in enumerate(lim_vadr):
                add = add.at[a].add(sf[i])
            out = out + add
        if Jc.shape[0]:
            out = out + jnp.einsum("rve,re->ve", Jc, f[s_con])
        return out

    K = m.ncon_max
    R = m.rows_per_con
    elliptic = bool(int(m.opt.cone) != 0 and K and m.pairs.ncon)
    nc_end = s_con.start
    if elliptic:
        D_c = D[s_con].reshape(K, R, E)
        mu0_k = k["con_mu_k"][:, 0]  # (K, E) slide friction

        def ell_z(jar):
            return _ell_scaled_lm(
                jar[s_con].reshape(K, R, E), D_c, mu0_k, m.opt.impratio
            )

    def _base_forces(jar):
        f_quad = -D * jar
        one_sided = jnp.where(jar < 0, f_quad, 0.0)
        frf = jnp.clip(f_quad, -fl, fl)
        force = is_fr * frf + is_eq * f_quad + is_os * one_sided
        quad_os = (jar < 0).astype(dtype)
        quad_fr = (jnp.abs(f_quad) <= fl).astype(dtype)
        quad = (is_fr * quad_fr + is_eq + is_os * quad_os) * (D > 0)
        return force, quad

    def row_forces(jar):
        f, q = _base_forces(jar)
        if not elliptic:
            return f, q, None
        z = ell_z(jar)
        fc = _ell_force_lm(z, jar[s_con].reshape(K, R, E), D_c)
        return jnp.concatenate([f[:nc_end], fc.reshape(-1, E)]), q, z

    def cost_rows(jar):
        quad_cost = 0.5 * D * jar * jar
        lin_cost = fl * jnp.abs(jar) - 0.5 * fl * fl / jnp.maximum(D, _EPS)
        fr_cost = jnp.where(jnp.abs(D * jar) <= fl, quad_cost, lin_cost)
        os_cost = jnp.where(jar < 0, quad_cost, 0.0)
        per_row = is_fr * fr_cost + is_eq * quad_cost + is_os * os_cost
        if not elliptic:
            return jnp.sum(per_row, axis=0)
        return jnp.sum(per_row[:nc_end], axis=0) + _ell_cost_lm(ell_z(jar))

    def cost_from_jar(x, jar):
        dx = x - a_smooth
        return 0.5 * jnp.sum(dx * Mv(dx), axis=0) + cost_rows(jar)

    jar_ws = Jmul(x_ws) - aref
    jar_sm = Jmul(a_smooth) - aref
    c_ws = cost_from_jar(x_ws, jar_ws)
    c_sm = cost_from_jar(a_smooth, jar_sm)
    take = c_ws < c_sm
    x0 = jnp.where(take, x_ws, a_smooth)
    jar0 = jnp.where(take, jar_ws, jar_sm)
    cost0 = jnp.where(take, c_ws, c_sm)

    ls_iters = max(int(m.opt.ls_iterations), 8)
    tol = float(m.opt.tolerance)

    def newton_iter(carry):
        i, x, jar, cost_x, done = carry
        force, quad, z_h = row_forces(jar)
        grad = Mv(x - a_smooth) - JTmul(force)
        Dq = quad * D  # (nefc, E)
        diag = Dq[s_fr]  # (nv, E)
        if nlimit:
            add = jnp.zeros((nv, E), dtype)
            for ii, a in enumerate(lim_vadr):
                add = add.at[a].add(Dq[s_lim][ii])
            diag = diag + add
        H = M + jnp.eye(nv, dtype=dtype)[:, :, None] * diag[None]
        if Jc.shape[0]:
            if elliptic:
                B = _ell_hess_lm(z_h, D_c)  # (K, R, R, E)
                Jb = Jc.reshape(K, R, nv, E)
                BJ = jnp.einsum("krse,ksve->krve", B, Jb)
                H = H + jnp.einsum("krve,krwe->vwe", Jb, BJ)
            else:
                H = H + jnp.einsum("rve,re,rwe->vwe", Jc, Dq[s_con], Jc)
        if neq:
            H = H + jnp.einsum("rve,re,rwe->vwe", Jeq, Dq[:neq], Jeq)
        dx = -_chol_solve_envlast(H, grad, nv)

        v = Jmul(dx)
        q1 = jnp.sum(dx * Mv(x - a_smooth), axis=0)
        q2 = jnp.sum(dx * Mv(dx), axis=0)

        def dphi(a):  # a (E,)
            jar_a = jar + a * v
            f_a, quad_a, z_a = row_forces(jar_a)
            d1 = q1 + a * q2 - jnp.sum(v * f_a, axis=0)
            if elliptic:
                d2 = q2 + jnp.sum(
                    (D * quad_a * v * v)[:nc_end], axis=0
                ) + _ell_curv_lm(z_a, v[s_con].reshape(K, R, E), D_c)
            else:
                d2 = q2 + jnp.sum(D * quad_a * v * v, axis=0)
            return d1, d2

        g0, _ = dphi(jnp.zeros((E,), dtype))
        hi = jnp.ones((E,), dtype)
        for _ in range(12):
            g_hi, _ = dphi(hi)
            hi = jnp.where(g_hi < 0, hi * 2.0, hi)
        lo = jnp.zeros((E,), dtype)
        a = jnp.minimum(hi, 1.0)
        for _ in range(ls_iters):
            g, h = dphi(a)
            lo = jnp.where(g < 0, a, lo)
            hi = jnp.where(g < 0, hi, a)
            a_newton = a - g / jnp.maximum(h, _EPS)
            inside = (a_newton > lo) & (a_newton < hi)
            a = jnp.where(inside, a_newton, 0.5 * (lo + hi))
        a = jnp.where((g0 >= 0) | (q2 <= _EPS), 0.0, a)
        alpha = jnp.maximum(a, 0.0)

        step = jnp.where(done, 0.0, alpha)
        x_new = x + step * dx
        jar_new = jar + step * v
        cost_new = cost_from_jar(x_new, jar_new)
        ok = jnp.isfinite(cost_new) & (cost_new < cost_x)
        x = jnp.where(ok, x_new, x)
        jar = jnp.where(ok, jar_new, jar)
        cost_x = jnp.where(ok, cost_new, cost_x)
        gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=0))
        done = done | (gnorm < tol * nv) | ~ok
        return (i + 1, x, jar, cost_x, done)

    done0 = jnp.zeros((E,), bool)
    i0 = jnp.zeros((), jnp.int32)
    _, x, _, _, _ = jax.lax.while_loop(
        lambda c: (c[0] < m.opt.iterations) & ~jnp.all(c[4]),
        newton_iter,
        (i0, x0, jar0, cost0, done0),
    )

    jar = Jmul(x) - aref
    force, _, _ = row_forces(jar)
    qfrc_constraint = JTmul(force)

    # (world-frame contact force/torque decode happens once, env-first, in
    # hybrid.forward_hybrid via solver._decode_contact_forces_batched)
    return dict(
        qacc=x,
        efc_force=force,
        qfrc_constraint=qfrc_constraint,
    )
