"""Measure effective HBM traffic cost of env-first vs env-last layouts.

Each test scans N iterations of a minimal read+write over the array inside
ONE jit (so dispatch overhead amortizes), fetch-forced. If the padding
theory holds, (4096, 30, 3) should cost ~40x more per pass than
(30, 3, 4096).
"""

import time
import jax
import jax.numpy as jnp
import numpy as np

N = 200


def timeit_scan(shape, reps=3):
    @jax.jit
    def f(x):
        def body(x, _):
            # rotate + offset: forces a real read+write per iteration,
            # cannot be strength-reduced across iterations
            return jnp.roll(x, 1, axis=-1) * 1.0000001, None

        x, _ = jax.lax.scan(body, x, None, length=N)
        return x

    x = jnp.ones(shape, jnp.float32)
    out = f(x)
    np.asarray(jax.device_get(out.ravel()[0]))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(x)
        np.asarray(jax.device_get(out.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    per_pass = (best - 0.0266) / N  # subtract measured RPC floor
    nbytes = np.prod(shape) * 4
    eff_bw = 2 * nbytes / per_pass / 1e9
    print(
        f"{str(shape):20s}: {per_pass*1e6:9.1f} us/pass  "
        f"logical {nbytes/1e6:7.2f} MB  eff-bw {eff_bw:8.1f} GB/s"
    )


def main():
    E = 4096
    print("== env-first (batch-major) ==")
    timeit_scan((E, 30, 3))
    timeit_scan((E, 533, 26))
    timeit_scan((E, 140, 35))
    timeit_scan((E, 35, 35))
    timeit_scan((E, 90))
    print("== env-last (lane=env) ==")
    timeit_scan((30, 3, E))
    timeit_scan((533, 26, E))
    timeit_scan((140, 35, E))
    timeit_scan((35, 35, E))
    timeit_scan((90, E))
    print("== env-last flattened rank-2 ==")
    timeit_scan((90, E))
    timeit_scan((533 * 26, E))
    timeit_scan((140 * 35, E))


if __name__ == "__main__":
    main()
