"""Micro test of newton_solve_pallas on synthetic shapes: compile time,
correctness vs the pure solver on a random convex QP, and runtime."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.solver_pallas import newton_solve_pallas

NV = int(os.environ.get("NV", 12))
NEFC = int(os.environ.get("NEFC", 32))
E = int(os.environ.get("E", 128))
ITERS = int(os.environ.get("ITERS", 10))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    J = rng.normal(size=(E, NEFC, NV)).astype(np.float32) * 0.3
    D = np.abs(rng.normal(size=(E, NEFC))).astype(np.float32) + 0.5
    aref = rng.normal(size=(E, NEFC)).astype(np.float32)
    fl = np.zeros((E, NEFC), np.float32)
    A = rng.normal(size=(NV, NV)).astype(np.float32)
    M = (A @ A.T + NV * np.eye(NV, dtype=np.float32))[None].repeat(E, 0)
    a_smooth = rng.normal(size=(E, NV)).astype(np.float32)
    x_ws = np.zeros((E, NV), np.float32)

    # first third of rows one-sided (contact-like), middle friction, rest eq
    n1, n2 = NEFC // 3, 2 * NEFC // 3
    osm = tuple(i < n1 for i in range(NEFC))
    frm = tuple(n1 <= i < n2 for i in range(NEFC))
    eqm = tuple(i >= n2 for i in range(NEFC))
    fl[:, n1:n2] = 1.0

    t0 = time.perf_counter()
    x, f = newton_solve_pallas(
        jnp.asarray(J), jnp.asarray(D), jnp.asarray(aref), jnp.asarray(fl),
        jnp.asarray(M), jnp.asarray(a_smooth), jnp.asarray(x_ws),
        nv=NV, nefc=NEFC, os_mask=osm, fr_mask=frm, eq_mask=eqm,
        iterations=ITERS, ls_iterations=12, tolerance=1e-8,
    )
    jax.block_until_ready(x)
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(10):
        x, f = newton_solve_pallas(
            jnp.asarray(J), jnp.asarray(D), jnp.asarray(aref), jnp.asarray(fl),
            jnp.asarray(M), jnp.asarray(a_smooth), jnp.asarray(x_ws),
            nv=NV, nefc=NEFC, os_mask=osm, fr_mask=frm, eq_mask=eqm,
            iterations=ITERS, ls_iterations=12, tolerance=1e-8,
        )
        jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / 10
    print(f"run: {dt * 1e3:.2f} ms for E={E} nv={NV} nefc={NEFC}", flush=True)

    # correctness: gradient of the dual cost at solution ~ 0
    xn = np.asarray(x)
    jar = np.einsum("erv,ev->er", J, xn) - aref
    f_quad = -D * jar
    force = np.where(np.asarray(osm)[None], np.where(jar < 0, f_quad, 0.0), 0.0)
    force += np.where(np.asarray(frm)[None], np.clip(f_quad, -fl, fl), 0.0)
    force += np.where(np.asarray(eqm)[None], f_quad, 0.0)
    grad = np.einsum("evw,ew->ev", M, xn - a_smooth) - np.einsum(
        "erv,er->ev", J, force
    )
    g = np.abs(grad).max()
    print(f"max |grad| at solution: {g:.3e}", flush=True)
    print("PASS" if g < 2e-2 * np.abs(M).max() else "FAIL", flush=True)


if __name__ == "__main__":
    main()
