"""Throughput benchmark: G1 velocity task env-steps/s.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol mirrors the reference benchmark (reference
scripts/benchmarks/measure_throughput.py:54-121): full env step (physics x
decimation + managers + obs + masked resets) at 4096 envs, warmup then timed
steps. The measured unit is a scanned rollout inside ONE jitted program —
exactly how the PPO runner executes it — so per-dispatch RPC latency of the
host<->TPU link doesn't pollute the number (the reference's CUDA-graph
replay has the same property).
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
    warmup = int(os.environ.get("BENCH_WARMUP", 1))
    chunk = int(os.environ.get("BENCH_CHUNK", 25))
    reps = int(os.environ.get("BENCH_REPS", 3))

    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv

    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = num_envs
    env = ManagerBasedRlEnv(cfg)
    env.reset()

    A = env.action_manager.total_action_dim
    rng = jax.random.PRNGKey(0)
    action = 0.1 * jax.random.normal(rng, (num_envs, A))

    def rollout(state, action):
        def body(s, _):
            s, obs, rew, term, trunc, logs = env._traced_step(s, action)
            return s, None
        s, _ = jax.lax.scan(body, state, None, length=chunk)
        return s

    roll = jax.jit(rollout, donate_argnums=0)

    state = env._state
    for _ in range(warmup):
        state = roll(state, action)
    jax.block_until_ready(state.data.qpos)

    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        state = roll(state, action)
        jax.block_until_ready(state.data.qpos)
        best = min(best, time.perf_counter() - t0)

    env_sps = num_envs * chunk / best
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
