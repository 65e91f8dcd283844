"""Throughput benchmark: G1 velocity task env-steps/s.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol mirrors the reference benchmark (reference
scripts/benchmarks/measure_throughput.py:54-121): full env step (physics x
decimation + managers + obs) at 4096 envs, warmup then timed steps.
vs_baseline is against the BASELINE.md target of 1M env-steps/s per host.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    warmup = int(os.environ.get("BENCH_WARMUP", 10))
    steps = int(os.environ.get("BENCH_STEPS", 50))

    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv

    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = num_envs
    env = ManagerBasedRlEnv(cfg)
    env.reset()

    A = env.action_manager.total_action_dim
    rng = jax.random.PRNGKey(0)
    action = 0.1 * jax.random.normal(rng, (num_envs, A))

    # warmup (includes compile)
    for _ in range(warmup):
        obs, *_ = env.step(action)
    jax.block_until_ready(obs["policy"])

    t0 = time.perf_counter()
    for _ in range(steps):
        obs, *_ = env.step(action)
    jax.block_until_ready(obs["policy"])
    dt = time.perf_counter() - t0

    env_sps = num_envs * steps / dt
    target = 1_000_000.0  # BASELINE.md single-host target
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_g1_velocity",
                "value": round(env_sps, 1),
                "unit": f"env-steps/s @ {num_envs} envs (1 control step = 4 physics steps)",
                "vs_baseline": round(env_sps / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
