"""Per-stage device cost with dispatch overhead amortized: run each stage
chained 20x inside ONE jitted scan, so per-iteration time is true device
cost. Chaining feeds each iteration's output to the next (no CSE)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.phys import forward as fwd
from mjlab_tpu.phys import smooth
from mjlab_tpu.phys.kinematics import com_pos, kinematics
from mjlab_tpu.phys.collision import collision
from mjlab_tpu.phys.constraint import make_constraint
from mjlab_tpu.phys.solver import solve

E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
N = int(os.environ.get("PROF_CHAIN", 20))


def main():
    print("backend:", jax.default_backend(), "envs:", E, flush=True)
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    state = env._state
    m = env.sim.model
    maxes = env.sim.model_axes
    d0 = state.data

    def perturb(d):
        # tiny qpos jitter so chained iterations can't be CSE'd/constant
        return d.replace(qpos=d.qpos + 1e-9)

    def chain(fn):
        bf = lambda d: jax.vmap(fn, in_axes=(maxes, 0))(m, d)

        @jax.jit
        def run(d):
            def body(d, _):
                return perturb(bf(d)), None

            d, _ = jax.lax.scan(body, d, None, length=N)
            return d

        return run

    stages = [
        ("kinematics", kinematics),
        ("com_pos", com_pos),
        ("crb", smooth.crb),
        ("collision", collision),
        ("transmission", smooth.transmission),
        ("make_constraint", make_constraint),
        ("com_vel", smooth.com_vel),
        ("rne", smooth.rne),
        ("passive", smooth.passive),
        ("fwd_actuation", smooth.fwd_actuation),
        ("fwd_acceleration", fwd.fwd_acceleration),
        ("solve", solve),
        ("FULL step", fwd.step),
    ]
    base = None
    for name, fn in stages:
        run = chain(fn)
        d = run(d0)
        jax.block_until_ready(d.qpos)
        t0 = time.perf_counter()
        d = run(d0)
        jax.block_until_ready(d.qpos)
        dt = (time.perf_counter() - t0) / N * 1e3
        if name == "kinematics":
            pass
        print(f"{name:18s} {dt:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
