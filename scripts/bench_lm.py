"""Benchmark the lane-major engine vs the vmapped engine on TPU (f32).

Times N physics substeps of the raw engine (no managers) on the live G1
velocity model at BENCH_NUM_ENVS envs, fetch-forced, scanned inside one
jit so the tunnel RPC floor amortizes.

Usage: python scripts/bench_lm.py [lm|vmap|both]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
import mjlab_tpu.phys.forward as fwd

E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
K = int(os.environ.get("BENCH_REPS", 50))
FLOOR = float(os.environ.get("BENCH_RPC_FLOOR", 0.0266))


def scan_bench(name, step_fn, d0):
    @jax.jit
    def run(d):
        def body(dd, _):
            return step_fn(dd), None

        dd, _ = jax.lax.scan(body, d, None, length=K)
        return dd

    t0 = time.perf_counter()
    d1 = run(d0)
    np.asarray(jax.device_get(d1.qpos.ravel()[0]))
    t_compile = time.perf_counter() - t0
    print(f"{name}: first call (compile+run) {t_compile:.1f}s", flush=True)

    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        d1 = run(d0)
        np.asarray(jax.device_get(d1.qpos.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    per = (best - FLOOR) / K
    print(
        f"{name}: {per * 1e3:.3f} ms/substep -> "
        f"{E / (4 * per):,.0f} env-steps/s (decimation 4, physics only)",
        flush=True,
    )
    return d1


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    m = env.sim.model
    maxes = env.sim.model_axes
    d = env._state.data

    # settle so contacts exist
    stepf = jax.jit(jax.vmap(fwd.step, in_axes=(maxes, 0)))
    for _ in range(3):
        d = stepf(m, d)
    np.asarray(jax.device_get(d.qpos.ravel()[0]))

    if which in ("vmap", "both"):
        vstep = jax.vmap(fwd.step, in_axes=(maxes, 0))
        scan_bench("vmap", lambda dd: vstep(m, dd), d)
    if which in ("lm", "both"):
        from mjlab_tpu.phys.lm import step_lm

        bf = env.sim._batched_fields
        print("batched fields:", sorted(bf), flush=True)
        scan_bench("lm", lambda dd: step_lm(m, bf, dd), d)
    if which in ("hybrid", "both"):
        from mjlab_tpu.phys.hybrid import hybrid_supported, step_hybrid

        if not hybrid_supported(m):
            print("hybrid: model unsupported, skipping", flush=True)
        else:
            bf = env.sim._batched_fields
            scan_bench("hybrid", lambda dd: step_hybrid(m, bf, dd, maxes), d)


if __name__ == "__main__":
    main()
