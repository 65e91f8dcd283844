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


# ---------------------------------------------------------------------------
# Blocked variants: the fully unrolled column algorithms above compile to
# long chains of (batch, 1)-shaped dependent micro-fusions whose per-op
# latency (~kernel launch + DMA) dominates at large batch — traced at
# ~1 ms each on v5e. The blocked forms below do the same math with a
# log/block-depth critical path of batched matmuls, which XLA executes as
# a handful of large fusions.
# ---------------------------------------------------------------------------

_BLOCK = 8


def tri_inv(L: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a batched lower-triangular L (..., n, n) by
    divide-and-conquer:
        inv([[A, 0], [B, C]]) = [[A^-1, 0], [-C^-1 B A^-1, C^-1]]
    Leaf blocks (n <= 8) use unrolled forward substitution; everything
    else is batched matmuls with O(log n) sequential depth."""
    n = L.shape[-1]
    if n <= _BLOCK:
        # unrolled: columns of the inverse by forward substitution
        cols = []
        for j in range(n):
            # e_j column
            x = [None] * n
            for i in range(n):
                if i < j:
                    x[i] = jnp.zeros_like(L[..., 0, 0])
                    continue
                s_ = (
                    jnp.ones_like(L[..., 0, 0])
                    if i == j
                    else jnp.zeros_like(L[..., 0, 0])
                )
                for k in range(j, i):
                    s_ = s_ - L[..., i, k] * x[k]
                x[i] = s_ / L[..., i, i]
            cols.append(jnp.stack(x, axis=-1))
        return jnp.stack(cols, axis=-1)
    k = (n // 2 + _BLOCK - 1) // _BLOCK * _BLOCK  # split on a block boundary
    A = L[..., :k, :k]
    B = L[..., k:, :k]
    C = L[..., k:, k:]
    Ai = tri_inv(A)
    Ci = tri_inv(C)
    X = -(Ci @ (B @ Ai))
    top = jnp.concatenate(
        [Ai, jnp.zeros(L.shape[:-2] + (k, n - k), L.dtype)], axis=-1
    )
    bot = jnp.concatenate([X, Ci], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol_factor_blocked(H: jnp.ndarray, ridge: float | None = None) -> jnp.ndarray:
    """Batched blocked right-looking Cholesky (block 8): diagonal blocks
    factor with the unrolled column algorithm, panels solve against the
    inverted diagonal block (matmul), trailing submatrix takes one
    rank-_BLOCK batched matmul update. Equilibrated like chol_factor;
    returns the factor of the ORIGINAL H."""
    n = H.shape[-1]
    if n <= _BLOCK:
        return chol_factor(H, ridge)
    if ridge is None:
        ridge = 1e-6 if H.dtype == jnp.float32 else 1e-14
    diag0 = jnp.diagonal(H, axis1=-2, axis2=-1)
    scale = 1.0 / jnp.sqrt(jnp.maximum(diag0, _EPS))
    A = H * scale[..., :, None] * scale[..., None, :]
    eye = jnp.eye(n, dtype=H.dtype)
    A = A + ridge * eye
    nb = (n + _BLOCK - 1) // _BLOCK
    col_blocks = []  # block-column strips of L, each (..., n - j0, bs)
    trailing = A  # (..., n - j0, n - j0) active submatrix
    for jb in range(nb):
        j0 = jb * _BLOCK
        bs = min(_BLOCK, n - j0)
        Ajj = trailing[..., :bs, :bs]
        Ljj = chol_factor(Ajj, ridge=0.0)
        strip_rest = trailing[..., bs:, :bs]  # (..., r, bs)
        Ljj_inv_t = jnp.swapaxes(tri_inv(Ljj), -1, -2)  # upper
        panel = strip_rest @ Ljj_inv_t  # (..., r, bs)
        strip = jnp.concatenate([Ljj, panel], axis=-2)
        col_blocks.append(strip)
        if bs < trailing.shape[-1]:
            T = trailing[..., bs:, bs:]
            trailing = T - panel @ jnp.swapaxes(panel, -1, -2)
        else:
            trailing = None
    # assemble dense lower L from strips
    rows = []
    for jb, strip in enumerate(col_blocks):
        j0 = jb * _BLOCK
        bs = strip.shape[-1]
        pad_left = jnp.zeros(H.shape[:-2] + (strip.shape[-2], j0), H.dtype)
        rows.append(jnp.concatenate([pad_left, strip], axis=-1))
    # rows[jb] covers matrix rows j0.. ; stack by rows: build row-block list
    out_rows = []
    for ib in range(nb):
        i0 = ib * _BLOCK
        bs_i = min(_BLOCK, n - i0)
        segs = []
        for jb in range(ib + 1):
            strip = col_blocks[jb]
            j0 = jb * _BLOCK
            off = i0 - j0
            segs.append(strip[..., off : off + bs_i, :])
        row = jnp.concatenate(segs, axis=-1)  # (..., bs_i, (ib+1)*_BLOCK-ish)
        width = sum(sg.shape[-1] for sg in segs)
        pad = jnp.zeros(H.shape[:-2] + (bs_i, n - width), H.dtype)
        out_rows.append(jnp.concatenate([row, pad], axis=-1))
    Ls = jnp.concatenate(out_rows, axis=-2)
    # unscale: L = S^-1 Ls
    return Ls / scale[..., :, None]


def chol_solve_inv(
    Linv: jnp.ndarray, g: jnp.ndarray, H: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Solve (L L^T) x = g given Linv = L^-1: two batched matvecs.

    Unlike triangular substitution, the explicit-inverse product loses
    ~cond(H) ulps in f32 — enough to destabilize the implicit integrator
    on stiff humanoid mass matrices (observed as training blow-ups on
    TPU). Passing H enables ONE iterative-refinement step (two extra
    matvecs), which restores backward-stable accuracy."""

    def solve2(r):
        y = jnp.einsum("...ij,...j->...i", Linv, r)
        return jnp.einsum("...ji,...j->...i", Linv, y)

    x = solve2(g)
    if H is not None:
        r = g - jnp.einsum("...ij,...j->...i", H, x)
        x = x + solve2(r)
    return x
