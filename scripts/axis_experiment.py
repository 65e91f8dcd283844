"""Measure env-first (in_axes=0) vs env-last (in_axes=-1) vmap layouts for
representative physics stages. Timing forced by host scalar fetch."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.phys.kinematics import com_pos, kinematics
from mjlab_tpu.phys import smooth
from mjlab_tpu.phys.collision import collision
from mjlab_tpu.phys.constraint import make_constraint

E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
N = 20


def main():
    print("backend:", jax.default_backend(), "envs:", E, flush=True)
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    m = env.sim.model
    maxes = env.sim.model_axes
    d0 = env._state.data

    def compose(md, dd):
        dd = kinematics(md, dd)
        dd = com_pos(md, dd)
        dd = smooth.crb(md, dd)
        dd = collision(md, dd)
        dd = smooth.transmission(md, dd)
        dd = make_constraint(md, dd)
        dd = smooth.com_vel(md, dd)
        dd = smooth.rne(md, dd)
        dd = smooth.passive(md, dd)
        return dd

    def run_first(d):
        def body(d, _):
            d2 = jax.vmap(compose, in_axes=(maxes, 0))(m, d.replace(qpos=d.qpos + 1e-9))
            return d2, None
        d, _ = jax.lax.scan(body, d, None, length=N)
        return d

    maxes_last = jax.tree_util.tree_map(
        lambda a: -1 if a == 0 else None, maxes, is_leaf=lambda x: x is None
    )

    def run_last(d):
        def body(d, _):
            d2 = jax.vmap(compose, in_axes=(maxes_last, -1), out_axes=-1)(
                m_last, d.replace(qpos=d.qpos + 1e-9)
            )
            return d2, None
        d, _ = jax.lax.scan(body, d, None, length=N)
        return d

    def timeit(name, fn, d):
        f = jax.jit(fn)
        out = f(d)
        _ = np.asarray(out.qpos.ravel()[0:4])
        t0 = time.perf_counter()
        out = f(d)
        _ = np.asarray(out.qpos.ravel()[0:4])
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"{name:12s} {dt:8.3f} ms/iter", flush=True)

    timeit("env-first", run_first, d0)
    d_last = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x, 0, -1) if hasattr(x, "ndim") and x.ndim else x, d0
    )
    # model batched fields to env-last
    m_last = m
    if any(jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda a: a == 0, maxes, is_leaf=lambda x: x is None))):
        def mv(field_axis, leaf):
            if field_axis == 0:
                return jnp.moveaxis(leaf, 0, -1)
            return leaf
        m_last = jax.tree_util.tree_map(mv, maxes, m, is_leaf=lambda x: x is None)
    timeit("env-last", run_last, d_last)


if __name__ == "__main__":
    main()
