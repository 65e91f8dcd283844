"""Throughput benchmark: env-steps/s on the reference's canonical tasks.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
for the primary metric (G1 velocity, the BASELINE.md target task), with a
"tasks" field carrying the other canonical numbers (reference protocol
measures Go1-velocity-flat, G1-tracking-flat and Yam-lift-cube —
reference scripts/benchmarks/measure_throughput.py:68-74).

Protocol mirrors the reference benchmark (measure_throughput.py:54-121):
full env step (physics x decimation + managers + obs + masked resets) at
4096 envs with RANDOM actions resampled every control step — episodes
terminate and reset mid-benchmark exactly as in training. Physics-only
SPS and manager overhead are reported on stderr (the protocol's second
number). The measured unit is a scanned rollout inside ONE jitted
program — exactly how the PPO runner executes it — so per-dispatch RPC
latency of the host<->TPU link doesn't pollute the number (the
reference's CUDA-graph replay has the same property).

BENCH_TASKS=primary limits the run to the G1-velocity metric (fast path
for iteration); default runs all four.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from mjlab_tpu.utils.device import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax.numpy as jnp
import numpy as np

PRIMARY = ("g1_velocity", "Mjlab-Velocity-Flat-Unitree-G1")
SECONDARY = [
    ("go1_velocity", "Mjlab-Velocity-Flat-Unitree-Go1"),
    ("g1_tracking", "Mjlab-Tracking-Flat-Unitree-G1"),
    ("yam_lift_cube", "Mjlab-Lift-Cube-Yam"),
]


def _time_best(fn, state, reps):
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        state = fn(state)
        # host fetch forces completion through the tunnel
        # (block_until_ready does not, see PERF_NOTES.md)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(state)[0].ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    return best, state


def _ensure_bench_motion() -> str:
    """Synthesize the G1 test motion once per machine and cache it.

    The reference benchmark wires a motion artifact into the tracking env
    before measuring (reference scripts/benchmarks/measure_throughput.py:
    128-135 fetches it from wandb); offline, the in-repo synthesizer is
    the equivalent artifact source."""
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "mjlab_tpu_bench_motion.npz")
    if not os.path.exists(path):
        from mjlab_tpu.tasks.tracking.scripts.make_test_motion import (
            make_g1_test_motion,
        )

        make_g1_test_motion(path, seconds=8.0, fps=50.0)
    return path


def bench_task(task_id: str, num_envs: int, warmup: int, chunk: int,
               reps: int, physics_split: bool):
    """Returns (env_sps, phys_sps or None, decimation, engine)."""
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv

    def build_and_warm():
        cfg = tasks.load_env_cfg(task_id)
        cfg.scene.num_envs = num_envs
        if "Tracking" in task_id:
            cfg.commands["motion"].motion_file = _ensure_bench_motion()
        env = ManagerBasedRlEnv(cfg)
        env.reset()
        A = env.action_manager.total_action_dim

        # full env rollout: fresh random action every control step -> real
        # termination/reset/event traffic (reference measure_throughput
        # semantics, not a settled fixed-action loop)
        def rollout(carry):
            state, rng = carry

            def body(c, _):
                s, r = c
                r, k = jax.random.split(r)
                action = 0.5 * jax.random.normal(k, (num_envs, A))
                s, obs, rew, term, trunc, logs = env._traced_step(s, action)
                return (s, r), None

            carry, _ = jax.lax.scan(body, carry, None, length=chunk)
            return carry

        roll = jax.jit(rollout, donate_argnums=0)
        carry = (env._state, jax.random.PRNGKey(0))
        for _ in range(warmup):
            carry = roll(carry)
        np.asarray(jax.device_get(carry[0].data.qpos.ravel()[:1]))
        return env, roll, carry

    fallback = False
    try:
        env, roll, carry = build_and_warm()
    except Exception as e:  # noqa: BLE001
        # never lose the benchmark to a fast-path compile failure: fall
        # back to the reference vmapped engine and report that number —
        # but TAG the result so a fast-path regression can't silently
        # masquerade as the real number (VERDICT r3 weak #6)
        if os.environ.get("MJLAB_TPU_ENGINE", "auto") == "vmap":
            raise
        print(f"[bench] {task_id}: engine fallback to vmap: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        fallback = True
        os.environ["MJLAB_TPU_ENGINE"] = "vmap"
        try:
            env, roll, carry = build_and_warm()
        finally:
            os.environ["MJLAB_TPU_ENGINE"] = "auto"

    engine = env.sim.engine() if not fallback else "vmap (fallback)"
    print(f"[bench] {task_id}: engine = {engine}", file=sys.stderr)

    best, carry = _time_best(roll, carry, reps)
    env_sps = num_envs * chunk / best

    n_auto = int(np.asarray(jax.device_get(carry[0].data.ncheck_reset)).sum())
    n_over = int(np.asarray(jax.device_get(carry[0].data.ncon_overflow)).sum())
    print(f"[bench] {task_id}: mj_check auto-resets: {n_auto} | "
          f"contact-slot overflow: {n_over}", file=sys.stderr)

    phys_sps = None
    pbest = None
    if physics_split:
        # physics-only SPS (reference measure_physics_sps): raw substeps,
        # no managers, same decimation accounting; uses the SAME engine as
        # the env rollout above (sim.step_fn selects vmap/hybrid)
        m = env.sim.model
        dec = env.cfg.decimation
        step_phys = env.sim.step_fn()

        def phys_roll(d):
            def body(dd, _):
                return step_phys(m, dd), None

            d, _ = jax.lax.scan(body, d, None, length=chunk * dec)
            return d

        proll = jax.jit(phys_roll, donate_argnums=0)
        d = carry[0].data
        d = proll(d)
        np.asarray(jax.device_get(d.qpos.ravel()[:1]))
        pbest, d = _time_best(proll, d, reps)
        phys_sps = num_envs * chunk / pbest
        print(
            f"[bench] {task_id}: physics-only: {phys_sps:,.0f} env-steps/s"
            f" | full env: {env_sps:,.0f} | manager overhead "
            f"{100 * (1 - pbest / best):.1f}%",
            file=sys.stderr,
        )
    else:
        print(f"[bench] {task_id}: full env: {env_sps:,.0f} env-steps/s",
              file=sys.stderr)
    return env_sps, phys_sps, env.cfg.decimation, engine


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    warmup = int(os.environ.get("BENCH_WARMUP", 1))
    chunk = int(os.environ.get("BENCH_CHUNK", 25))
    reps = int(os.environ.get("BENCH_REPS", 3))
    which = os.environ.get("BENCH_TASKS", "all")

    key, task_id = PRIMARY
    env_sps, phys_sps, dec, engine = bench_task(
        task_id, num_envs, warmup, chunk, reps, physics_split=True
    )

    tasks_out = {}
    engines_out = {key: engine}
    if which != "primary":
        for key2, tid in SECONDARY:
            try:
                sps2, _, _, eng2 = bench_task(
                    tid, num_envs, warmup, chunk, reps, physics_split=False
                )
                tasks_out[key2] = round(sps2, 1)
                engines_out[key2] = eng2
            except Exception as e:  # noqa: BLE001
                print(f"[bench] {tid} FAILED: {type(e).__name__}: {e}",
                      file=sys.stderr)
                tasks_out[key2] = None

    target = 1_000_000.0  # BASELINE.md single-host target
    out = {
        "metric": "env_steps_per_s_g1_velocity",
        "value": round(env_sps, 1),
        "unit": f"env-steps/s @ {num_envs} envs (1 control step = "
                f"{dec} physics steps)",
        "vs_baseline": round(env_sps / target, 4),
        "engine": engine,
    }
    if tasks_out:
        out["tasks"] = tasks_out
        out["engines"] = engines_out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
