"""Full ManagerBasedRlEnv construction + stepping smoke test
(reference tests/smoke_test.py:12-23, CPU). Marked slow: first compile of
the full control step takes minutes on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_g1_velocity_env_smoke():
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv

    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = 2
    env = ManagerBasedRlEnv(cfg)
    assert env.action_manager.total_action_dim == 29
    assert env.observation_manager.group_obs_dim("policy") == 99

    obs, _ = env.reset()
    assert obs["policy"].shape == (2, 99)

    A = env.action_manager.total_action_dim
    action = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, A))
    for _ in range(2):
        obs, rew, term, trunc, extras = env.step(action)
    assert bool(jnp.isfinite(obs["policy"]).all())
    assert bool(jnp.isfinite(rew).all())
    # robot should still be near standing height after 2 control steps
    z = np.asarray(env.ctx.data.qpos[:, 2])
    assert (z > 0.5).all(), z
    env.close()


def test_task_registry():
    import mjlab_tpu.tasks as tasks

    names = tasks.list_tasks()
    assert "Mjlab-Velocity-Flat-Unitree-G1" in names
    assert "Mjlab-Velocity-Flat-Unitree-Go1" in names
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1", play=True)
    # play overrides applied
    assert cfg.episode_length_s > 1e6
    assert cfg.observations["policy"].enable_corruption is False
    # registry returns fresh instances
    cfg2 = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1", play=True)
    assert cfg is not cfg2
