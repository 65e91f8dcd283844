"""Per-stage device timing of the physics substep on the live G1 env.

Each stage is scanned K times inside one jit on the same input (output
kept live through a scalar accumulator), fetch-forced; per-stage time =
(total - RPC floor) / K. More robust than trace-name guessing.
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
from mjlab_tpu.phys import smooth, forward as fwd
from mjlab_tpu.phys.kinematics import kinematics, com_pos
from mjlab_tpu.phys.collision import collision
from mjlab_tpu.phys.constraint import make_constraint
from mjlab_tpu.phys.solver import solve

E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
K = int(os.environ.get("PROF_REPS", 20))
FLOOR = 0.0266


def main():
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    m = env.sim.model
    maxes = env.sim.model_axes
    d = env._state.data

    # settle: run a few steps so contacts exist
    stepf = jax.jit(jax.vmap(fwd.step, in_axes=(maxes, 0)))
    for _ in range(3):
        d = stepf(m, d)
    np.asarray(jax.device_get(d.qpos.ravel()[0]))

    # prepared data: all stages up to solve filled
    prep = jax.jit(
        lambda m, d: jax.vmap(
            lambda mm, dd: fwd.fwd_acceleration(
                mm,
                smooth.fwd_actuation(
                    mm,
                    smooth.passive(
                        mm,
                        smooth.rne(
                            mm,
                            smooth.com_vel(
                                mm,
                                make_constraint(
                                    mm,
                                    smooth.transmission(
                                        mm,
                                        collision(
                                            mm,
                                            smooth.crb(mm, com_pos(mm, kinematics(mm, dd))),
                                        ),
                                    ),
                                ),
                            ),
                        ),
                    ),
                ),
            ),
            in_axes=(maxes, 0),
        )(m, d)
    )
    dp = prep(m, d)
    np.asarray(jax.device_get(dp.qpos.ravel()[0]))

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
        ("full_step", fwd.step),
    ]

    for name, fn in stages:
        vf = jax.vmap(fn, in_axes=(maxes, 0))

        @jax.jit
        def run(m, d):
            def body(carry, _):
                acc, = carry
                out = vf(m, d)
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = acc + jnp.sum(leaf[0].astype(jnp.float32)) * 1e-20
                return (acc,), None

            (acc,), _ = jax.lax.scan(body, (jnp.zeros(()),), None, length=K)
            return acc

        acc = run(m, dp)
        np.asarray(jax.device_get(acc))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            acc = run(m, dp)
            np.asarray(jax.device_get(acc))
            best = min(best, time.perf_counter() - t0)
        per = (best - FLOOR) / K
        print(f"{name:18s}: {per*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
