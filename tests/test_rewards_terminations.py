"""Reward/termination term semantics on the mini env (reference
tests/test_rewards.py, test_terminations.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjlab_tpu.envs import mdp
from tests.mini_env import E, make_pendulum_env


@pytest.fixture(scope="module")
def env():
    e = make_pendulum_env()
    yield e
    e.close()


@pytest.mark.slow
def test_is_alive_and_terminated(env):
    step = jax.jit(env._traced_step)
    state, *_ = step(env._state, jnp.zeros((E, 1), jnp.float32))
    env.ctx.load(state)
    # terminated is a trace-scoped attribute: recompute eagerly
    env.termination_manager.compute()
    alive = np.asarray(mdp.is_alive(env))
    np.testing.assert_allclose(alive, 1.0)
    dead = np.asarray(mdp.is_terminated(env))
    np.testing.assert_allclose(dead, 0.0)


@pytest.mark.slow
def test_action_rate_l2(env):
    step = jax.jit(env._traced_step)
    state = env._state
    state, *_ = step(state, jnp.full((E, 1), 0.2, jnp.float32))
    state, *_ = step(state, jnp.full((E, 1), 0.7, jnp.float32))
    env.ctx.load(state)
    rate = np.asarray(mdp.action_rate_l2(env))
    np.testing.assert_allclose(rate, (0.7 - 0.2) ** 2, atol=1e-6)


@pytest.mark.slow
def test_joint_vel_and_torque_penalties_nonnegative(env):
    step = jax.jit(env._traced_step)
    state, *_ = step(env._state, jnp.full((E, 1), 1.0, jnp.float32))
    env.ctx.load(state)
    assert (np.asarray(mdp.joint_vel_l2(env)) >= 0).all()
    assert (np.asarray(mdp.joint_torques_l2(env)) >= 0).all()


@pytest.mark.slow
def test_time_out_termination(env):
    # episode_length_s is huge in the mini env: no timeout after one step
    step = jax.jit(env._traced_step)
    state, *_ = step(env._state, jnp.zeros((E, 1), jnp.float32))
    env.ctx.load(state)
    t = np.asarray(mdp.time_out(env))
    assert not t.any()


@pytest.mark.slow
def test_joint_pos_limits_penalty():
    # soft limit at 0.9 * (+-3 rad) = +-2.7; drive the joint past it
    env2 = make_pendulum_env(soft_joint_pos_limit_factor=0.9)
    step = jax.jit(env2._traced_step)
    state = env2._state
    for _ in range(120):
        state, *_ = step(state, jnp.full((E, 1), 3.0, jnp.float32))
    env2.ctx.load(state)
    q = np.asarray(env2.ctx.data.qpos)[:, 0]
    pen = np.asarray(mdp.joint_pos_limits(env2))
    assert (q > 2.7).any(), f"joint never passed the soft limit: q={q}"
    assert (pen[q > 2.7] > 0).all()
    assert (pen >= 0).all()
