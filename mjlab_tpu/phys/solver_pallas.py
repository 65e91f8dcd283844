"""Fused Pallas TPU kernel for the batched Newton constraint solve.

The pure-JAX solver (solver.py) vmaps a single-world solve; at large env
batches its cost is dominated by HBM traffic over the constraint Jacobian
(padded (E, nefc, nv) layout reads ~4x its logical bytes) and by many
small unfused kernels per Newton iteration. This kernel runs the ENTIRE
solve — gradient, exact Hessian, unrolled Cholesky, safeguarded
line search, Newton loop with batched early exit — in one Pallas program
per 128-env block, with the env batch on the VPU lane dimension and all
per-block operands resident in VMEM (~6 MB/block):

    Jt      (nv, nefc, 128)    3.6 MB   constraint Jacobian, env-last
    Mc      (nv*nv, 128)       0.6 MB   mass matrix, column-major
    rows    (nefc, 128)        0.1 MB   D, aref, frictionloss
    H, L    (nv*nv, 128)       1.3 MB   scratch, column-major

Matrices live column-major (entry (i, j) at row j*nv+i) so every Cholesky
column access is a contiguous sublane slice.

Numerics follow solver.py exactly except the line search, which uses the
reference's safeguarded Newton-bisection (opt.ls_iterations) instead of
the sort-based closed form — sorting across sublanes is not VPU-friendly.
Trajectory parity vs CPU MuJoCo is unchanged at test tolerances.
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


def _make_kernel(nv, nefc, iterations, ls_iterations, tolerance):
    def row_forces(jar, D, fl, osm, frm, eqm):
        f_quad = -D * jar
        one_sided = jnp.where(jar < 0, f_quad, 0.0)
        fr = jnp.clip(f_quad, -fl, fl)
        force = frm * fr + eqm * f_quad + osm * one_sided
        quad_os = (jar < 0).astype(jnp.float32)
        quad_fr = (jnp.abs(f_quad) <= fl).astype(jnp.float32)
        quad = (frm * quad_fr + eqm + osm * quad_os) * (D > 0)
        return force, quad

    def cost_rows(jar, D, fl, osm, frm, eqm):
        quad_cost = 0.5 * D * jar * jar
        lin_cost = fl * jnp.abs(jar) - 0.5 * fl * fl / jnp.maximum(D, _EPS)
        fr_cost = jnp.where(jnp.abs(D * jar) <= fl, quad_cost, lin_cost)
        os_cost = jnp.where(jar < 0, quad_cost, 0.0)
        return jnp.sum(
            frm * fr_cost + eqm * quad_cost + osm * os_cost,
            axis=0, keepdims=True,
        )

    def kernel(Jt_ref, D_ref, aref_ref, fl_ref, Mc_ref, asm_ref, ws_ref,
               osm_ref, frm_ref, eqm_ref, x_out, f_out, H_scr, L_scr):
        D = D_ref[:]            # (R, 128)
        aref = aref_ref[:]
        fl = fl_ref[:]
        a_smooth = asm_ref[:]   # (V, 128)
        osm = osm_ref[:]        # (R, 1) row-class masks
        frm = frm_ref[:]
        eqm = eqm_ref[:]

        def rf(jar):
            return row_forces(jar, D, fl, osm, frm, eqm)

        def Mv(vec):            # (V,128) -> (V,128): M @ vec
            acc = Mc_ref[0:nv, :] * vec[0:1, :]
            for j in range(1, nv):
                acc += Mc_ref[j * nv : (j + 1) * nv, :] * vec[j : j + 1, :]
            return acc

        def Jv(vec):            # (V,128) -> (R,128): J @ vec
            acc = Jt_ref[0] * vec[0:1, :]
            for i in range(1, nv):
                acc += Jt_ref[i] * vec[i : i + 1, :]
            return acc

        def JTf(rows):          # (R,128) -> (V,128): J^T @ rows
            outs = [
                jnp.sum(Jt_ref[i] * rows, axis=0, keepdims=True)
                for i in range(nv)
            ]
            return jnp.concatenate(outs, axis=0)

        def total_cost(x, jar):
            dx = x - a_smooth
            smooth = 0.5 * jnp.sum(dx * Mv(dx), axis=0, keepdims=True)
            return smooth + cost_rows(jar, D, fl, osm, frm, eqm)

        # init: better of warmstart and qacc_smooth
        x_ws = ws_ref[:]
        jar_ws = Jv(x_ws) - aref
        jar_sm = Jv(a_smooth) - aref
        c_ws = total_cost(x_ws, jar_ws)
        c_sm = total_cost(a_smooth, jar_sm)
        take_ws = c_ws < c_sm
        x0 = jnp.where(take_ws, x_ws, a_smooth)
        jar0 = jnp.where(take_ws, jar_ws, jar_sm)
        cost0 = jnp.where(take_ws, c_ws, c_sm)

        def chol_solve(g):
            """H dx = g via Jacobi-equilibrated unrolled Cholesky over the
            column-major H_scr/L_scr scratch. Mirrors
            solver._chol_solve_unrolled."""
            diag = jnp.concatenate(
                [H_scr[j * nv + j : j * nv + j + 1, :] for j in range(nv)],
                axis=0,
            )  # (V,128)
            scale = jax.lax.rsqrt(jnp.maximum(diag, _EPS))
            g = g * scale
            ridge = 1e-6
            for j in range(nv):
                # column j, rows j..nv (contiguous in column-major)
                s = H_scr[j * nv + j : (j + 1) * nv, :] * (
                    scale[j:, :] * scale[j : j + 1, :]
                )
                # add ridge to the diagonal entry (row 0 of this column)
                row0 = (
                    jax.lax.broadcasted_iota(jnp.int32, (nv - j, LANES), 0) == 0
                )
                s = s + jnp.where(row0, ridge, 0.0)
                for k in range(j):
                    s = s - (
                        L_scr[k * nv + j : (k + 1) * nv, :]
                        * L_scr[k * nv + j : k * nv + j + 1, :]
                    )
                dcol = jnp.sqrt(jnp.maximum(s[0:1, :], ridge))
                L_scr[j * nv + j : (j + 1) * nv, :] = s / dcol
            # forward substitution L y = g
            y = [None] * nv
            for j in range(nv):
                s = g[j : j + 1, :]
                for k in range(j):
                    s = s - L_scr[k * nv + j : k * nv + j + 1, :] * y[k]
                y[j] = s / L_scr[j * nv + j : j * nv + j + 1, :]
            # back substitution L^T x = y
            out = [None] * nv
            for j in reversed(range(nv)):
                s = y[j]
                for k in range(j + 1, nv):
                    s = s - L_scr[j * nv + k : j * nv + k + 1, :] * out[k]
                out[j] = s / L_scr[j * nv + j : j * nv + j + 1, :]
            return jnp.concatenate(out, axis=0) * scale

        def newton_body(carry):
            it, x, jar, cost_x, done = carry
            force, quad = rf(jar)
            grad = Mv(x - a_smooth) - JTf(force)
            Dq = D * quad
            # H = M + Jt^T diag(Dq) Jt, column-major, symmetric fill
            for i in range(nv):
                JDi = Jt_ref[i] * Dq
                for j in range(i, nv):
                    h = (
                        jnp.sum(JDi * Jt_ref[j], axis=0, keepdims=True)
                        + Mc_ref[j * nv + i : j * nv + i + 1, :]
                    )
                    H_scr[j * nv + i : j * nv + i + 1, :] = h
                    if j != i:
                        H_scr[i * nv + j : i * nv + j + 1, :] = h
            dx = -chol_solve(grad)

            v = Jv(dx)
            q1 = jnp.sum(dx * Mv(x - a_smooth), axis=0, keepdims=True)
            q2 = jnp.sum(dx * Mv(dx), axis=0, keepdims=True)

            def dphi(a):  # a (1,128)
                jar_a = jar + a * v
                f_a, quad_a = rf(jar_a)
                d1 = q1 + a * q2 - jnp.sum(v * f_a, axis=0, keepdims=True)
                d2 = q2 + jnp.sum(D * quad_a * v * v, axis=0, keepdims=True)
                return d1, d2

            # safeguarded Newton-bisection line search
            hi = jnp.ones_like(q1)
            for _ in range(12):
                g_hi, _ = dphi(hi)
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

            # done carried as f32 (0/1): Mosaic's while-loop layout
            # legalization chokes on carried i1 vectors.
            step = jnp.where(done > 0.5, 0.0, alpha)
            x_new = x + step * dx
            jar_new = jar + step * v
            cost_new = total_cost(x_new, jar_new)
            ok = jnp.isfinite(cost_new) & (cost_new < cost_x)
            x = jnp.where(ok, x_new, x)
            jar = jnp.where(ok, jar_new, jar)
            cost_x = jnp.where(ok, cost_new, cost_x)
            gnorm2 = jnp.sum(grad * grad, axis=0, keepdims=True)
            tol2 = (tolerance * nv) ** 2
            done = jnp.maximum(
                done, jnp.where((gnorm2 < tol2) | ~ok, 1.0, 0.0)
            )
            return it + 1, x, jar, cost_x, done

        done0 = jnp.zeros_like(cost0)
        carry = (jnp.zeros((), jnp.int32), x0, jar0, cost0, done0)
        _, x, jar, _, _ = jax.lax.while_loop(
            lambda c: (c[0] < iterations) & (jnp.min(c[4]) < 0.5),
            newton_body,
            carry,
        )

        force, _ = rf(jar)
        x_out[:] = x
        f_out[:] = force

    return kernel


def _newton_call(
    Jt, Dt, at, ft, Mc, as_t, ws_t,
    *, nv, nefc, os_mask, fr_mask, eq_mask,
    iterations, ls_iterations, tolerance,
):
    """Env-LAST kernel launch: Jt (nv, nefc, E), Dt/at/ft (nefc, E),
    Mc (nv*nv, E) column-major, as_t/ws_t (nv, E). Returns env-last
    (x (nv, E), force (nefc, E))."""
    E = Jt.shape[-1]
    assert E % LANES == 0, f"pallas solver needs E % {LANES} == 0, got {E}"
    grid = E // LANES

    kernel = _make_kernel(nv, nefc, iterations, ls_iterations, tolerance)
    osm = jnp.asarray(np.asarray(os_mask, np.float32).reshape(nefc, 1))
    frm = jnp.asarray(np.asarray(fr_mask, np.float32).reshape(nefc, 1))
    eqm = jnp.asarray(np.asarray(eq_mask, np.float32).reshape(nefc, 1))

    def bs(shape):
        idx = lambda b: tuple([0] * (len(shape) - 1) + [b])
        return pl.BlockSpec(shape[:-1] + (LANES,), idx, memory_space=pltpu.VMEM)

    mask_spec = pl.BlockSpec(
        (nefc, 1), lambda b: (0, 0), memory_space=pltpu.VMEM
    )

    x_t, f_t = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            bs((nv, nefc, E)),
            bs((nefc, E)),
            bs((nefc, E)),
            bs((nefc, E)),
            bs((nv * nv, E)),
            bs((nv, E)),
            bs((nv, E)),
            mask_spec,
            mask_spec,
            mask_spec,
        ],
        out_specs=[bs((nv, E)), bs((nefc, E))],
        out_shape=[
            jax.ShapeDtypeStruct((nv, E), jnp.float32),
            jax.ShapeDtypeStruct((nefc, E), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nv * nv, LANES), jnp.float32),
            pltpu.VMEM((nv * nv, LANES), jnp.float32),
        ],
    )(Jt, Dt, at, ft, Mc, as_t, ws_t, osm, frm, eqm)
    return x_t, f_t


@functools.partial(
    jax.jit,
    static_argnames=(
        "nv", "nefc", "os_mask", "fr_mask", "eq_mask",
        "iterations", "ls_iterations", "tolerance",
    ),
)
def newton_solve_pallas(
    J, D, aref, fl, M, a_smooth, x_ws,
    *, nv, nefc, os_mask, fr_mask, eq_mask,
    iterations, ls_iterations, tolerance,
):
    """Batched Newton solve. Inputs are env-FIRST f32:
    J (E, nefc, nv), D/aref/fl (E, nefc), M (E, nv, nv),
    a_smooth/x_ws (E, nv). E must be a multiple of 128.
    Returns (qacc (E, nv), efc_force (E, nefc))."""
    Jt = jnp.transpose(J, (2, 1, 0))                    # (nv, nefc, E)
    # column-major mass matrix: row j*nv+i = M[i, j]
    Mc = jnp.transpose(M, (2, 1, 0)).reshape(nv * nv, J.shape[0])
    x_t, f_t = _newton_call(
        Jt, D.T, aref.T, fl.T, Mc, a_smooth.T, x_ws.T,
        nv=nv, nefc=nefc, os_mask=os_mask, fr_mask=fr_mask,
        eq_mask=eq_mask, iterations=iterations,
        ls_iterations=ls_iterations, tolerance=tolerance,
    )
    return x_t.T, f_t.T


@functools.partial(
    jax.jit,
    static_argnames=(
        "nv", "nefc", "os_mask", "fr_mask", "eq_mask",
        "iterations", "ls_iterations", "tolerance",
    ),
)
def newton_solve_pallas_envlast(
    Jt, D, aref, fl, M, a_smooth, x_ws,
    *, nv, nefc, os_mask, fr_mask, eq_mask,
    iterations, ls_iterations, tolerance,
):
    """Env-LAST batched Newton solve (hybrid-step fast path — no boundary
    transposes): Jt (nv, nefc, E), D/aref/fl (nefc, E), M (nv, nv, E),
    a_smooth/x_ws (nv, E). Returns env-last (x (nv, E), force (nefc, E))."""
    E = Jt.shape[-1]
    # column-major: row j*nv+i = M[i, j] -> transpose the two nv axes
    Mc = jnp.swapaxes(M, 0, 1).reshape(nv * nv, E)
    return _newton_call(
        Jt, D, aref, fl, Mc, a_smooth, x_ws,
        nv=nv, nefc=nefc, os_mask=os_mask, fr_mask=fr_mask,
        eq_mask=eq_mask, iterations=iterations,
        ls_iterations=ls_iterations, tolerance=tolerance,
    )
