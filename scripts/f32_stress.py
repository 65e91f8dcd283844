"""f32 solver stress: long aggressive-random-action G1 rollout counting
mj_check auto-resets (the silent divergence VERDICT flags). Done = zero
resets over the whole run.

Usage: [JAX_PLATFORMS=cpu] python scripts/f32_stress.py [envs] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv

E = int(sys.argv[1]) if len(sys.argv) > 1 else 64
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000


def main():
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    A = env.action_manager.total_action_dim
    step = jax.jit(env._traced_step)
    state = env._state
    rng = jax.random.PRNGKey(0)

    # scan CHUNK control steps per dispatch so the host loop isn't the
    # bottleneck
    CHUNK = 50

    def chunk(carry, _):
        state, rng = carry
        rng, k = jax.random.split(rng)
        action = jnp.clip(jax.random.normal(k, (E, A)) * 1.5, -3, 3)
        state, obs, rew, term, trunc, _ = step(state, action)
        return (state, rng), None

    @jax.jit
    def run_chunk(state, rng):
        (state, rng), _ = jax.lax.scan(chunk, (state, rng), None, length=CHUNK)
        return state, rng

    for i in range(STEPS // CHUNK):
        state, rng = run_chunk(state, rng)
        n_reset = int(np.asarray(jax.device_get(state.data.ncheck_reset)).sum())
        qv = float(np.abs(np.asarray(state.data.qvel)).max())
        print(
            f"step {(i + 1) * CHUNK:6d}: check_resets={n_reset} "
            f"max|qvel|={qv:9.2f}",
            flush=True,
        )
        if not np.isfinite(qv):
            print("NON-FINITE STATE LEAKED THROUGH", flush=True)
    print(f"done: total auto-resets {n_reset} over {STEPS} steps x {E} envs")
    sys.exit(0 if n_reset == 0 else 1)


if __name__ == "__main__":
    main()
