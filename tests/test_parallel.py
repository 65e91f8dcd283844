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


def test_sharded_event_gating_matches_unsharded():
    """Interval-event timers and masked resets must behave IDENTICALLY
    when the env state is sharded along the data mesh axis: same rng,
    same actions -> same per-env event state, episode counters and qpos
    on sharded and unsharded runs (VERDICT r3 #10: sharded event gating
    had no direct test)."""
    from mini_env import make_pendulum_cfg
    from mjlab_tpu.envs import ManagerBasedRlEnv
    from mjlab_tpu.envs.mdp import events
    from mjlab_tpu.managers.manager_term_config import EventTermCfg

    n = len(jax.devices())
    num_envs = 2 * n
    cfg = make_pendulum_cfg(num_envs=num_envs)
    # short episodes + an interval push so resets AND interval events
    # both fire inside the comparison window
    cfg.episode_length_s = 0.05  # 5 control steps at dt=0.01
    cfg.events = {
        "kick": EventTermCfg(
            mode="interval",
            func=events.reset_joints_by_offset,
            interval_range_s=(0.02, 0.04),
            params={"velocity_range": (-0.5, 0.5)},
        ),
    }
    env = ManagerBasedRlEnv(cfg)
    env.seed(123)
    env.reset()
    base_state = env._state

    A = env.action_manager.total_action_dim
    action = jnp.full((num_envs, A), 0.3, jnp.float32)
    step = jax.jit(env._traced_step)

    def run(state, steps=12):
        outs = []
        for _ in range(steps):
            state, obs, rew, term, trunc, logs = step(state, action)
            outs.append((np.asarray(state.data.qpos).copy(),
                         np.asarray(state.episode_length).copy(),
                         np.asarray(rew).copy()))
        return state, outs

    _, ref = run(base_state)

    mesh = make_env_mesh()
    sharded = shard_env_state(base_state, mesh, num_envs)
    s_out, got = run(sharded)
    # event timer state stayed sharded/replicated consistently and
    # every per-env observable matches the single-placement run
    for (q_a, el_a, r_a), (q_b, el_b, r_b) in zip(ref, got):
        np.testing.assert_allclose(q_a, q_b, atol=1e-6)
        np.testing.assert_array_equal(el_a, el_b)
        np.testing.assert_allclose(r_a, r_b, atol=1e-6)
    env.close()


@pytest.mark.slow
def test_zero1_production_width_reset_heavy_no_recompile():
    """VERDICT r4 weak #6 scale-up: ZeRO-1 learner at the production
    512-256-128 policy width, 16 envs/device on the 8-device CPU mesh,
    episodes short enough that reset traffic crosses shard boundaries
    every iteration — and NO retrace/recompile across 4 warm iterations
    (the round-4 weak-typed-std and dropped-out-sharding bugs both
    manifested as exactly that)."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    from mini_env import make_pendulum_cfg
    from jax.sharding import NamedSharding, PartitionSpec

    from mjlab_tpu.envs import ManagerBasedRlEnv
    from mjlab_tpu.parallel import (
        env_sharding_tree, shard_train_state, train_sharding_tree,
    )
    from mjlab_tpu.rl.config import (
        RslRlOnPolicyRunnerCfg, RslRlPpoActorCriticCfg, RslRlPpoAlgorithmCfg,
    )
    from mjlab_tpu.rl.runner import OnPolicyRunner
    from mjlab_tpu.rl.vecenv_wrapper import RslRlVecEnvWrapper

    n = len(jax.devices())
    num_envs = 16 * n
    cfg = make_pendulum_cfg(num_envs=num_envs)
    cfg.episode_length_s = 0.04  # 4 control steps: reset-heavy rollouts
    env = ManagerBasedRlEnv(cfg)
    agent = RslRlOnPolicyRunnerCfg(
        seed=7,
        num_steps_per_env=6,
        logger="stdout",
        policy=RslRlPpoActorCriticCfg(
            actor_hidden_dims=(512, 256, 128),
            critic_hidden_dims=(512, 256, 128),
        ),
        algorithm=RslRlPpoAlgorithmCfg(
            num_learning_epochs=1, num_mini_batches=2
        ),
    )
    runner = OnPolicyRunner(RslRlVecEnvWrapper(env), agent, log_dir=None)
    env.seed(0)
    obs, _ = env.reset()
    mesh = make_env_mesh()
    env_state = shard_env_state(env._state, mesh, num_envs)
    obs = shard_env_state(obs, mesh, num_envs)
    ppo_state = shard_train_state(
        runner.ppo.init_state(jax.random.PRNGKey(7)), mesh, mode="sharded"
    )
    out_shardings = (
        (
            train_sharding_tree(ppo_state, mesh, mode="sharded"),
            env_sharding_tree(env_state, mesh, num_envs),
            env_sharding_tree(obs, mesh, num_envs),
        ),
        NamedSharding(mesh, PartitionSpec()),
    )
    learn = jax.jit(
        runner.ppo.learn_iteration, out_shardings=out_shardings
    )
    carry = (ppo_state, env_state, obs)
    lengths = []
    for _ in range(4):
        carry, metrics = learn(carry)
        jax.block_until_ready(carry[0].params)
        lengths.append(float(metrics["Episode/length"]))
    # ONE compiled executable served all 4 iterations
    assert learn._cache_size() == 1, (
        f"learn_iteration retraced: cache={learn._cache_size()}"
    )
    # resets actually happened inside the measured iterations
    assert max(lengths) > 0
    # params stayed ZeRO-1 sharded and finite at production width
    p0 = jax.tree_util.tree_leaves(carry[0].params)[0]
    assert np.isfinite(np.asarray(jax.device_get(p0))).all()
    env.close()
