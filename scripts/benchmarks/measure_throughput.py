"""Throughput benchmark harness
(reference scripts/benchmarks/measure_throughput.py:54-121).

Measures, per task: physics-only SPS (bare physics substeps, reported in
env-step units), full env SPS (managers + obs + masked resets), and the
manager overhead %. Both are scanned rollouts inside one jitted program —
the jax analog of the reference's CUDA-graph-replay timing with
torch.cuda.synchronize() bracketing.
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp


@dataclass
class BenchmarkResult:
    task: str
    num_envs: int
    decimation: int
    physics_sps: float
    env_sps: float
    overhead_pct: float

    def __str__(self):
        return (
            f"{self.task} (dec={self.decimation}):\n"
            f"  Physics SPS: {self.physics_sps:,.0f}\n"
            f"  Env SPS:     {self.env_sps:,.0f}\n"
            f"  Overhead:    {self.overhead_pct:.1f}%"
        )

    def to_dict(self):
        return asdict(self)


@dataclass
class ThroughputConfig:
    num_envs: int = 4096
    num_steps: int = 100
    warmup_steps: int = 1
    tasks: list = field(
        default_factory=lambda: [
            "Mjlab-Velocity-Flat-Unitree-Go1",
            "Mjlab-Tracking-Flat-Unitree-G1",
            "Mjlab-Lift-Cube-Yam",
        ]
    )
    output_dir: Path | None = None


def measure_physics_sps(env, num_steps: int, warmup: int) -> float:
    from mjlab_tpu.phys import forward as F

    dec = env.cfg.decimation
    m = env.ctx.model
    step_v = jax.vmap(F.step, in_axes=(env.sim.model_axes, 0))

    def roll(d):
        d, _ = jax.lax.scan(
            lambda x, _: (step_v(m, x), None), d, None, length=num_steps * dec
        )
        return d

    roll = jax.jit(roll)
    d = env.ctx.data
    for _ in range(warmup):
        d = roll(d)
    jax.block_until_ready(d.qpos)
    t0 = time.perf_counter()
    d = roll(d)
    jax.block_until_ready(d.qpos)
    elapsed = time.perf_counter() - t0
    return num_steps * env.num_envs / elapsed


def measure_env_sps(env, num_steps: int, warmup: int) -> float:
    A = env.action_manager.total_action_dim
    action = jnp.zeros((env.num_envs, A), jnp.float32)

    def roll(state):
        def body(s, _):
            s, *_ = env._traced_step(s, action)
            return s, None

        s, _ = jax.lax.scan(body, state, None, length=num_steps)
        return s

    roll = jax.jit(roll, donate_argnums=0)
    state = env._state
    for _ in range(warmup):
        state = roll(state)
    jax.block_until_ready(state.data.qpos)
    t0 = time.perf_counter()
    state = roll(state)
    jax.block_until_ready(state.data.qpos)
    elapsed = time.perf_counter() - t0
    return num_steps * env.num_envs / elapsed


def benchmark_task(task: str, cfg: ThroughputConfig) -> BenchmarkResult:
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv

    print(f"\nBenchmarking {task}...", flush=True)
    env_cfg = tasks.load_env_cfg(task)
    env_cfg.scene.num_envs = cfg.num_envs
    env = ManagerBasedRlEnv(env_cfg)
    env.reset()

    env_sps = measure_env_sps(env, cfg.num_steps, cfg.warmup_steps)
    physics_sps = measure_physics_sps(env, cfg.num_steps, cfg.warmup_steps)
    overhead = (
        (physics_sps - env_sps) / physics_sps * 100 if physics_sps else 0.0
    )
    result = BenchmarkResult(
        task=task,
        num_envs=cfg.num_envs,
        decimation=env_cfg.decimation,
        physics_sps=physics_sps,
        env_sps=env_sps,
        overhead_pct=overhead,
    )
    print(result, flush=True)
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--num-steps", type=int, default=100)
    p.add_argument("--tasks", nargs="*", default=None)
    p.add_argument("--output-dir", default=None)
    a = p.parse_args()
    cfg = ThroughputConfig(num_envs=a.num_envs, num_steps=a.num_steps)
    if a.tasks:
        cfg.tasks = a.tasks
    results = [benchmark_task(t, cfg) for t in cfg.tasks]
    if a.output_dir:
        out = Path(a.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "throughput.json", "w") as f:
            json.dump([r.to_dict() for r in results], f, indent=2)


if __name__ == "__main__":
    main()
