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
    efc_force (nefc, E), qfrc_constraint (nv, E), con_force (K, 3, E)."""
    nv = m.nv
    E = P.E

    if m.nefc == 0:
        return dict(
            qacc=a_smooth,
            qfrc_constraint=jnp.zeros((nv, E), dtype),
            efc_force=jnp.zeros((0, E), dtype),
            con_force=jnp.zeros((m.ncon_max, 3, E), dtype),
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

    def row_forces(jar):
        f_quad = -D * jar
        one_sided = jnp.where(jar < 0, f_quad, 0.0)
        frf = jnp.clip(f_quad, -fl, fl)
        force = is_fr * frf + is_eq * f_quad + is_os * one_sided
        quad_os = (jar < 0).astype(dtype)
        quad_fr = (jnp.abs(f_quad) <= fl).astype(dtype)
        quad = (is_fr * quad_fr + is_eq + is_os * quad_os) * (D > 0)
        return force, quad

    def cost_rows(jar):
        quad_cost = 0.5 * D * jar * jar
        lin_cost = fl * jnp.abs(jar) - 0.5 * fl * fl / jnp.maximum(D, _EPS)
        fr_cost = jnp.where(jnp.abs(D * jar) <= fl, quad_cost, lin_cost)
        os_cost = jnp.where(jar < 0, quad_cost, 0.0)
        return jnp.sum(
            is_fr * fr_cost + is_eq * quad_cost + is_os * os_cost, axis=0
        )

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
        force, quad = row_forces(jar)
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
            H = H + jnp.einsum("rve,re,rwe->vwe", Jc, Dq[s_con], Jc)
        if neq:
            H = H + jnp.einsum("rve,re,rwe->vwe", Jeq, Dq[:neq], Jeq)
        dx = -_chol_solve_envlast(H, grad, nv)

        v = Jmul(dx)
        q1 = jnp.sum(dx * Mv(x - a_smooth), axis=0)
        q2 = jnp.sum(dx * Mv(dx), axis=0)

        def dphi(a):  # a (E,)
            jar_a = jar + a * v
            f_a, quad_a = row_forces(jar_a)
            d1 = q1 + a * q2 - jnp.sum(v * f_a, axis=0)
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
    force, _ = row_forces(jar)
    qfrc_constraint = JTmul(force)

    # per-contact world force decode (compacted slots), env-last
    K = m.ncon_max
    R = m.rows_per_con
    con_force = jnp.zeros((K, 3, E), dtype)
    if K and m.pairs.ncon:
        rows = force[s_con].reshape(K, R, E)
        mu = k["con_mu_k"]  # (K, 5, E)
        fr9 = k["con_frame_k"]  # (K, 9, E)
        dim_k = k["con_dim_k"]  # (K, E)
        mu1 = jnp.where(dim_k == 1, 0.0, mu[:, 0])
        mu2 = jnp.where(dim_k == 1, 0.0, mu[:, 1])
        fn = jnp.sum(rows, axis=1)  # (K, E)
        ft1 = mu1 * (rows[:, 0] - rows[:, 1])
        ft2 = mu2 * (rows[:, 2] - rows[:, 3])
        fc = jnp.stack([fn, ft1, ft2], axis=1)  # (K, 3, E) contact frame
        frm = fr9.reshape(K, 3, 3, E)
        fw = jnp.einsum("kfe,kfxe->kxe", fc, frm)
        con_force = jnp.where(k["con_sel_active"][:, None], fw, 0.0)

    return dict(
        qacc=x,
        efc_force=force,
        qfrc_constraint=qfrc_constraint,
        con_force=con_force,
    )
