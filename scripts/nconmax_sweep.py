"""Sweep SimulationCfg.nconmax on the G1 velocity task: SPS + overflow.

K (the compacted contact capacity) drives the Newton Hessian row count and
the compaction cost; the reference default 35 is ~3x the flat-terrain
active-contact count (PERF_NOTES round 1). Data.ncon_overflow counts
contacts dropped by top-K compaction, so a K is safe iff its overflow
stays 0 under benchmark traffic (random actions, real resets).

Usage: python scripts/nconmax_sweep.py [K ...]   (default: 35 16 12)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.utils.device import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv


def run(K: int, num_envs: int, chunk: int, reps: int):
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = num_envs
    cfg.sim.nconmax = K
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    A = env.action_manager.total_action_dim

    def rollout(carry):
        state, rng = carry

        def body(c, _):
            s, r = c
            r, k = jax.random.split(r)
            action = 0.5 * jax.random.normal(k, (num_envs, A))
            s, *_ = env._traced_step(s, action)
            return (s, r), None

        carry, _ = jax.lax.scan(body, carry, None, length=chunk)
        return carry

    roll = jax.jit(rollout, donate_argnums=0)
    carry = (env._state, jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    carry = roll(carry)
    np.asarray(jax.device_get(carry[0].data.qpos.ravel()[:1]))
    compile_s = time.perf_counter() - t0
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = roll(carry)
        np.asarray(jax.device_get(carry[0].data.qpos.ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    sps = num_envs * chunk / best
    over = int(np.asarray(jax.device_get(carry[0].data.ncon_overflow)).sum())
    auto = int(np.asarray(jax.device_get(carry[0].data.ncheck_reset)).sum())
    print(
        f"K={K:3d}  sps={sps:10,.0f}  overflow={over}  auto_resets={auto}"
        f"  (compile {compile_s:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [35, 16, 12]
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    chunk = int(os.environ.get("BENCH_CHUNK", 25))
    reps = int(os.environ.get("BENCH_REPS", 3))
    os.environ.setdefault("MJLAB_QUIET", "1")
    for K in ks:
        run(K, num_envs, chunk, reps)
