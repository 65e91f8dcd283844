"""Batched small-matrix Cholesky for TPU.

XLA lowers ``jnp.linalg.cholesky`` / ``solve_triangular`` on TPU to
LAPACK-style custom calls that serialize over the batch — at 4096 envs a
35x35 factor+solve costs ~15 ms (traced), dwarfing the actual physics. The
matrices here are tiny and the batch is huge, so fully unrolled columnwise
routines (n static) compile to straight-line fused vector ops over the env
batch instead: measured >20x faster than the custom calls on v5e.

Used for the mass matrix (smooth.crb / solve_m), the implicit integrator
(M + h*B factors, forward._euler_qacc/_implicitfast_qacc) and the Newton
Hessian (solver.py keeps its fused factor+solve variant).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def chol_factor(H: jnp.ndarray, ridge: float | None = None) -> jnp.ndarray:
    """Batched Cholesky H = L L^T for SPD H (..., n, n), n static.

    Jacobi-equilibrated internally (unit-diagonal working matrix) for f32
    headroom; the returned L is the factor of the ORIGINAL H. A relative
    ridge keeps near-singular contact-era matrices factorable.
    """
    n = H.shape[-1]
    if ridge is None:
        ridge = 1e-6 if H.dtype == jnp.float32 else 1e-14
    diag0 = jnp.diagonal(H, axis1=-2, axis2=-1)
    scale = 1.0 / jnp.sqrt(jnp.maximum(diag0, _EPS))
    Hs = H * scale[..., :, None] * scale[..., None, :]
    pivot_floor = jnp.asarray(max(ridge, _EPS), H.dtype)
    cols = []
    for j in range(n):
        s = Hs[..., j:, j]
        s = s.at[..., 0].add(ridge)
        for k in range(j):
            s = s - cols[k][..., j - k :] * cols[k][..., j - k, None]
        d = jnp.sqrt(jnp.maximum(s[..., 0], pivot_floor))
        cols.append(s / d[..., None])
    # unscale: L = S^-1 Ls  (S diagonal => still lower triangular)
    zeros = jnp.zeros_like(diag0[..., 0])
    full_cols = []
    for j in range(n):
        col = cols[j] / scale[..., j:]
        if j:
            pad = jnp.broadcast_to(zeros[..., None], col.shape[:-1] + (j,))
            col = jnp.concatenate([pad, col], axis=-1)
        full_cols.append(col)
    return jnp.stack(full_cols, axis=-1)


def chol_solve(L: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = g with L from chol_factor. Running-residual
    substitutions: O(n) vector ops over the batch, no scalar gathers."""
    n = L.shape[-1]
    # forward: L y = g
    r = g
    y = []
    for j in range(n):
        yj = r[..., 0] / L[..., j, j]
        y.append(yj)
        if j < n - 1:
            r = r[..., 1:] - yj[..., None] * L[..., j + 1 :, j]
    # backward: L^T x = y. rb[i] tracks sum_{k>=j} L[k, i] x_k for i < j.
    x = [None] * n
    rb = None
    for j in reversed(range(n)):
        s = y[j] if rb is None else y[j] - rb[..., -1]
        xj = s / L[..., j, j]
        x[j] = xj
        if j:
            contrib = xj[..., None] * L[..., j, :j]
            rb = contrib if rb is None else rb[..., :-1] + contrib
    return jnp.stack(x, axis=-1)
