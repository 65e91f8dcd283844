"""f32 physics stability: long random-action rollout stays finite.

Catches precision regressions in the f32 compute path (e.g. the
explicit-triangular-inverse solves without iterative refinement made
TPU training blow up after ~300 control steps while all f64 parity
tests stayed green)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_g1_random_rollout_stays_finite():
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv

    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = 8
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    A = env.action_manager.total_action_dim
    rng = jax.random.PRNGKey(0)
    step = jax.jit(env._traced_step)
    state = env._state
    for i in range(60):
        rng, k = jax.random.split(rng)
        action = jnp.clip(jax.random.normal(k, (8, A)), -3, 3)
        state, obs, rew, term, trunc, _ = step(state, action)
    qpos = np.asarray(state.data.qpos)
    qvel = np.asarray(state.data.qvel)
    # no silent mj_check re-seeds either (the round-1 f32 divergence was
    # root-caused to the implicitfast actuator derivative ignoring force
    # saturation; scripts/f32_stress.py runs the long-horizon version)
    assert int(np.asarray(state.data.ncheck_reset).sum()) == 0
    assert np.isfinite(qpos).all(), "qpos went non-finite under f32"
    assert np.isfinite(qvel).all(), "qvel went non-finite under f32"
    assert np.isfinite(np.asarray(obs["policy"])).all()
    # random flailing shouldn't reach absurd speeds either
    assert np.abs(qvel).max() < 1e3, np.abs(qvel).max()
    env.close()
