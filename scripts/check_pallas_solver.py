"""TPU validation: Pallas Newton solver vs pure-JAX vmapped solver.

Builds the G1 velocity env at 128 envs, steps it a few times with random
actions to reach a contact-rich state, then compares qacc/efc_force from
the fused Pallas solve against the pure-JAX path on the same (Model, Data).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.phys import solver


def main():
    E = 128
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    print("backend:", jax.default_backend())

    A = env.action_manager.total_action_dim
    rng = jax.random.PRNGKey(0)
    state = env._state
    step = jax.jit(env._traced_step)
    for i in range(5):
        rng, k = jax.random.split(rng)
        action = 0.3 * jax.random.normal(k, (E, A))
        out = step(state, action)
        state = out[0]
    jax.block_until_ready(state.data.qpos)

    m = env.sim.model
    d = state.data
    m_axes = env.sim._model_axes if hasattr(env.sim, "_model_axes") else None

    # pure path (force fallback branch)
    pure = jax.jit(
        lambda d: jax.vmap(solver._solve_impl, in_axes=(None, 0))(m, d)
    )(d)
    # dispatcher path (uses pallas on TPU at E=128)
    disp = jax.jit(lambda d: jax.vmap(solver.solve, in_axes=(None, 0))(m, d))(d)

    for name in ("qacc", "efc_force", "qfrc_constraint"):
        a = np.asarray(getattr(pure, name))
        b = np.asarray(getattr(disp, name))
        err = np.max(np.abs(a - b))
        scale = max(np.max(np.abs(a)), 1e-6)
        print(f"{name}: max abs err {err:.3e} (rel {err / scale:.3e})")
    ok = np.allclose(
        np.asarray(pure.qacc), np.asarray(disp.qacc), atol=5e-3, rtol=5e-3
    )
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
