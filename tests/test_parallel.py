"""Multi-device env sharding (SURVEY §4.6 gap: the reference has NO
distributed tests; here the 8-virtual-CPU-device mesh from conftest
exercises the real sharding path end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mjlab_tpu.parallel import make_env_mesh, shard_env_state


def test_mesh_spans_all_devices():
    mesh = make_env_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("data",)


@pytest.mark.slow
def test_env_step_sharded_over_mesh():
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv

    n = len(jax.devices())
    num_envs = 2 * n
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = num_envs
    env = ManagerBasedRlEnv(cfg)
    env.reset()

    mesh = make_env_mesh()
    state = shard_env_state(env._state, mesh, num_envs)
    # env-batched leaves sharded along data, rest replicated
    qpos_sh = state.data.qpos.sharding
    assert qpos_sh.spec == P("data")

    A = env.action_manager.total_action_dim
    action = jax.device_put(
        jnp.zeros((num_envs, A), jnp.float32), NamedSharding(mesh, P("data"))
    )
    out = jax.jit(env._traced_step)(state, action)
    obs = out[1]["policy"]
    jax.block_until_ready(obs)
    # outputs stay sharded along data — no resharding inserted
    assert obs.sharding.spec == P("data")
    assert bool(jnp.isfinite(obs).all())
    env.close()


@pytest.mark.slow
def test_learner_sharding_equivalence():
    """Gradient-collective equivalence (SURVEY §5.8 / BASELINE 4-host row):
    one fused PPO learn_iteration must produce the same updated parameters
    whether the learner is (a) on a single device, (b) replicated over the
    8-device mesh (XLA psum gradient reduction — the reference's NCCL
    all-reduce analog), or (c) ZeRO-1-sharded over the mesh (all-gather
    params / reduce-scatter grads). Identical seeds, identical env batch."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    from mini_env import make_pendulum_env

    from mjlab_tpu.parallel import shard_train_state
    from mjlab_tpu.rl.config import (
        RslRlOnPolicyRunnerCfg, RslRlPpoActorCriticCfg, RslRlPpoAlgorithmCfg,
    )
    from mjlab_tpu.rl.runner import OnPolicyRunner
    from mjlab_tpu.rl.vecenv_wrapper import RslRlVecEnvWrapper

    n = len(jax.devices())
    env = make_pendulum_env(num_envs=2 * n)
    agent = RslRlOnPolicyRunnerCfg(
        seed=3,
        num_steps_per_env=4,
        logger="stdout",
        policy=RslRlPpoActorCriticCfg(
            actor_hidden_dims=(16, 16), critic_hidden_dims=(16, 16)
        ),
        algorithm=RslRlPpoAlgorithmCfg(
            num_learning_epochs=2, num_mini_batches=2
        ),
    )
    runner = OnPolicyRunner(RslRlVecEnvWrapper(env), agent, log_dir=None)
    learn = jax.jit(runner.ppo.learn_iteration)

    def one_iter(mode):
        env.seed(0)
        obs, _ = env.reset()
        env_state = env._state
        ppo_state = runner.ppo.init_state(jax.random.PRNGKey(agent.seed))
        if mode != "single":
            mesh = make_env_mesh()
            env_state = shard_env_state(env_state, mesh, env.num_envs)
            obs = shard_env_state(obs, mesh, env.num_envs)
            ppo_state = shard_train_state(ppo_state, mesh, mode=mode)
        (ppo2, _, _), _ = learn((ppo_state, env_state, obs))
        return jax.device_get(ppo2.params)

    p_single = one_iter("single")
    p_rep = one_iter("replicated")
    p_sh = one_iter("sharded")

    flat_s, _ = jax.tree_util.tree_flatten(p_single)
    flat_r, _ = jax.tree_util.tree_flatten(p_rep)
    flat_z, _ = jax.tree_util.tree_flatten(p_sh)
    for a, b, c in zip(flat_s, flat_r, flat_z):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
        np.testing.assert_allclose(a, c, rtol=0, atol=1e-5)
