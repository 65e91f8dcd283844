"""Microbenchmark: per-fusion fixed overhead on this TPU backend.

Times jitted programs consisting of N *deliberately unfusable* stages
(each stage ends in a reduction-broadcast that XLA cannot fuse through
cheaply) at various widths, to estimate per-kernel fixed cost vs
bandwidth cost. Also times a scan of K dependent trivial steps.
"""

import time
import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    # this backend's block_until_ready does not force completion; a host
    # fetch does. Fetch one element.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(f, *args, reps=5, inner=10):
    """Time `inner` chained calls per rep to amortize the ~26ms host RPC."""
    out = f(*args)
    _force(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = args[0]
        rest = args[1:]
        for _ in range(inner):
            out = f(out, *rest)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def chain_elemwise(n_ops, shape):
    """n_ops dependent elementwise ops — XLA fuses into ~1 kernel."""

    @jax.jit
    def f(x):
        for i in range(n_ops):
            x = x * 1.000001 + 0.000001
        return x

    x = jnp.ones(shape, jnp.float32)
    return timeit(f, x)


def chain_unfusable(n_ops, shape):
    """n_ops stages, each with a full reduction => separate fusions."""

    @jax.jit
    def f(x):
        for i in range(n_ops):
            s = jnp.sum(x) * 1e-9
            x = x + s
        return x

    x = jnp.ones(shape, jnp.float32)
    return timeit(f, x)


def matmul_flops(n):
    @jax.jit
    def f(a, b):
        return a @ b

    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    t = timeit(f, a, b)
    return t, 2 * n**3 / t / 1e12


def bandwidth(nbytes):
    n = nbytes // 4

    @jax.jit
    def f(x):
        return x * 1.5

    x = jnp.ones((n,), jnp.float32)
    t = timeit(f, x)
    return t, 2 * nbytes / t / 1e9


def main():
    print("== sanity ==")
    t, tf = matmul_flops(4096)
    print(f"matmul 4096 bf16: {t*1e3:.3f} ms, {tf:.1f} TFLOP/s")
    t, bw = bandwidth(256 * 1024 * 1024)
    print(f"stream 256MB: {t*1e3:.3f} ms, {bw:.1f} GB/s (r+w)")

    print("\n== dispatch overhead (empty-ish jit) ==")
    @jax.jit
    def tiny(x):
        return x + 1.0
    x = jnp.ones((8,), jnp.float32)
    print(f"tiny jit call: {timeit(tiny, x)*1e3:.3f} ms")

    print("\n== fused elementwise chains ==")
    for shape in [(4096,), (4096, 32), (4096, 1024)]:
        for n_ops in [10, 100]:
            t = chain_elemwise(n_ops, shape)
            print(f"fused   {str(shape):13s} x{n_ops:4d} ops: {t*1e3:8.3f} ms")

    print("\n== unfusable stage chains (per-kernel overhead probe) ==")
    for shape in [(4096,), (4096, 32), (4096, 1024)]:
        for n_ops in [10, 50]:
            t = chain_unfusable(n_ops, shape)
            print(
                f"unfused {str(shape):13s} x{n_ops:4d} stages: {t*1e3:8.3f} ms"
                f"  ({t/n_ops*1e6:7.1f} us/stage)"
            )

    print("\n== scan of dependent trivial steps ==")
    for shape in [(4096,), (4096, 32)]:
        @jax.jit
        def f(x):
            def body(x, _):
                return x * 1.000001 + jnp.sum(x) * 1e-12, None
            x, _ = jax.lax.scan(body, x, None, length=100)
            return x
        x = jnp.ones(shape, jnp.float32)
        t = timeit(f, x)
        print(f"scan100 {str(shape):13s}: {t*1e3:8.3f} ms ({t/100*1e6:7.1f} us/iter)")


if __name__ == "__main__":
    main()
