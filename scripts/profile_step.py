"""Per-component timing of the physics step on the current backend at
BENCH_NUM_ENVS envs (G1 velocity model). Each stage jitted separately."""

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


def timeit(name, f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:20s} {dt * 1e3:8.2f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), "envs:", E, flush=True)
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    state = env._state
    m = env.sim.model
    d = state.data

    maxes = env.sim.model_axes

    def stage(fn):
        return jax.jit(lambda d: jax.vmap(fn, in_axes=(maxes, 0))(m, d))

    d = timeit("kinematics", stage(kinematics), d)
    d = timeit("com_pos", stage(com_pos), d)
    d = timeit("crb", stage(smooth.crb), d)
    d = timeit("collision", stage(collision), d)
    d = timeit("transmission", stage(smooth.transmission), d)
    d = timeit("make_constraint", stage(make_constraint), d)
    d = timeit("com_vel", stage(smooth.com_vel), d)
    d = timeit("rne", stage(smooth.rne), d)
    d = timeit("passive", stage(smooth.passive), d)
    d = timeit("fwd_actuation", stage(smooth.fwd_actuation), d)
    d = timeit("fwd_acceleration", stage(fwd.fwd_acceleration), d)
    d = timeit("solve", jax.jit(lambda d: jax.vmap(solve, in_axes=(maxes, 0))(m, d)), d)
    # full fused step for reference
    def full(d):
        return jax.vmap(fwd.step, in_axes=(maxes, 0))(m, d)
    try:
        timeit("FULL mj_step", jax.jit(full), state.data)
    except Exception as e:
        print("full step failed:", e)
    # full control step (managers + physics x decimation)
    A = env.action_manager.total_action_dim
    action = jnp.zeros((E, A), jnp.float32)
    step = jax.jit(env._traced_step)
    out = step(state, action)
    jax.block_until_ready(out[0].data.qpos)
    t0 = time.perf_counter()
    for _ in range(3):
        out = step(state, action)
    jax.block_until_ready(out[0].data.qpos)
    print(f"{'FULL control step':20s} {(time.perf_counter() - t0) / 3 * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
