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

from mjlab_tpu.phys.model import EFC_FRICTION_DOF, Model
from mjlab_tpu.phys.data import Data

_EPS = 1e-12


def _row_forces(m: Model, jar, D, fl, is_friction):
    """Per-row dual force g and active-quadratic mask.

    Returns (force, quad_mask): force = -s'(jar); quad_mask = rows in the
    quadratic zone (contribute D to the Hessian).
    """
    f_quad = -D * jar
    # one-sided: force only when jar < 0
    one_sided = jnp.where(jar < 0, f_quad, 0.0)
    os_quad = jar < 0
    # friction rows: clamp to [-fl, fl]
    fr = jnp.clip(f_quad, -fl, fl)
    fr_quad = jnp.abs(f_quad) <= fl
    force = jnp.where(is_friction, fr, one_sided)
    quad = jnp.where(is_friction, fr_quad, os_quad) & (D > 0)
    return force, quad


def _cost(m: Model, jar, D, fl, is_friction):
    quad_cost = 0.5 * D * jar * jar
    safe_D = jnp.maximum(D, _EPS)
    lin_cost = fl * jnp.abs(jar) - 0.5 * fl * fl / safe_D
    fr_cost = jnp.where(jnp.abs(D * jar) <= fl, quad_cost, lin_cost)
    os_cost = jnp.where(jar < 0, quad_cost, 0.0)
    return jnp.sum(jnp.where(is_friction, fr_cost, os_cost))


def solve(m: Model, d: Data) -> Data:
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

    J = d.efc_J
    D = d.efc_D
    aref = d.efc_aref
    fl = d.efc_frictionloss
    is_friction = jnp.asarray(m.efc_type == EFC_FRICTION_DOF)

    def total_cost(x):
        jar = J @ x - aref
        dx = x - a_smooth
        return 0.5 * dx @ (M @ dx) + _cost(m, jar, D, fl, is_friction)

    # init: better of warmstart and qacc_smooth
    x_ws = d.qacc_warmstart
    x0 = jnp.where(total_cost(x_ws) < total_cost(a_smooth), x_ws, a_smooth)

    def newton_iter(x, _):
        jar = J @ x - aref
        force, quad = _row_forces(m, jar, D, fl, is_friction)
        grad = M @ (x - a_smooth) - J.T @ force
        Dq = jnp.where(quad, D, 0.0)
        H = M + (J.T * Dq) @ J
        # robust cholesky: tiny ridge for degenerate cases
        L = jnp.linalg.cholesky(H + _EPS * jnp.eye(nv, dtype=dtype))
        dx = -jax.scipy.linalg.cho_solve((L, True), grad)

        # ---- exact line search on phi(a) = cost(x + a dx) ----
        v = J @ dx  # (nefc,)
        mdx = M @ dx
        q1 = dx @ (M @ (x - a_smooth))  # phi'(0) smooth part
        q2 = dx @ mdx  # smooth curvature

        def dphi(a):
            jar_a = jar + a * v
            f_a, quad_a = _row_forces(m, jar_a, D, fl, is_friction)
            d1 = q1 + a * q2 - jnp.sum(v * f_a)
            d2 = q2 + jnp.sum(jnp.where(quad_a, D, 0.0) * v * v)
            return d1, d2

        # bracket: expand hi until dphi(hi) > 0
        def expand(carry, _):
            hi = carry
            g_hi, _ = dphi(hi)
            hi = jnp.where(g_hi < 0, hi * 2.0, hi)
            return hi, None

        hi0 = jnp.asarray(1.0, dtype)
        hi, _ = jax.lax.scan(expand, hi0, None, length=12)
        lo = jnp.asarray(0.0, dtype)

        def ls_iter(carry, _):
            lo, hi, a = carry
            g, h = dphi(a)
            lo = jnp.where(g < 0, a, lo)
            hi = jnp.where(g < 0, hi, a)
            a_newton = a - g / jnp.maximum(h, _EPS)
            inside = (a_newton > lo) & (a_newton < hi)
            a_next = jnp.where(inside, a_newton, 0.5 * (lo + hi))
            return (lo, hi, a_next), None

        a0 = jnp.minimum(hi, 1.0)
        (lo, hi, alpha), _ = jax.lax.scan(
            ls_iter, (lo, hi, a0), None, length=max(m.opt.ls_iterations, 8)
        )
        # never take a non-descent step
        alpha = jnp.maximum(alpha, 0.0)
        x_new = x + alpha * dx
        improved = total_cost(x_new) < total_cost(x)
        x = jnp.where(improved, x_new, x)
        return x, None

    x, _ = jax.lax.scan(newton_iter, x0, None, length=m.opt.iterations)

    jar = J @ x - aref
    force, _ = _row_forces(m, jar, D, fl, is_friction)
    qfrc_constraint = J.T @ force

    # decode per-contact world forces for the compacted slots
    # (mj_contactForce equivalent): rows [n+u1 t1, n-u1 t1, n+u2 t2, n-u2 t2]
    # -> f = [sum(rows), u1 (r0-r1), u2 (r2-r3)] in the contact frame.
    con_force = d.con_force
    K = m.ncon_max
    if K and m.pairs.ncon:
        base = m.nv + m.nlimit
        rows = force[base : base + 4 * K].reshape(K, 4)
        sel = d.con_sel
        mu = d.contact.friction[sel]
        dim_k = jnp.asarray(m.pairs.con_dim)[sel]
        mu1 = jnp.where(dim_k == 1, 0.0, mu[:, 0])
        mu2 = jnp.where(dim_k == 1, 0.0, mu[:, 1])
        fn = jnp.sum(rows, axis=-1)
        ft1 = mu1 * (rows[:, 0] - rows[:, 1])
        ft2 = mu2 * (rows[:, 2] - rows[:, 3])
        fc = jnp.stack([fn, ft1, ft2], axis=-1)  # (K, 3) contact frame
        frame = d.contact.frame[sel]  # (K, 3, 3) rows [n, t1, t2]
        fw = jnp.einsum("kf,kfx->kx", fc, frame)
        fw = fw * d.con_sel_active[:, None]
        con_force = jnp.zeros_like(d.con_force).at[sel].set(fw)

    return d.replace(
        qacc=x,
        efc_force=force,
        qfrc_constraint=qfrc_constraint,
        qacc_warmstart=x,
        con_force=con_force,
    )
