"""Observation pipeline at the env level: scale -> delay -> history
(reference tests/test_observation_delay.py, test_observation_history.py).
A minimal pendulum env with deterministic dynamics makes the expected
values computable by hand."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from tests.mini_env import E, make_pendulum_env


def _env(history_length=0, delay=0):
    return make_pendulum_env(history_length=history_length, delay=delay)


def _rollout(env, n):
    """Step with a constant position command; return per-step (raw joint
    pos, obs vector)."""
    step = jax.jit(env._traced_step)
    state = env._state
    action = jnp.full((E, 1), 0.5, jnp.float32)
    out = []
    for _ in range(n):
        state, obs, *_ = step(state, action)
        raw = np.asarray(state.data.qpos)[:, 0]  # single hinge
        out.append((raw.copy(), np.asarray(obs["policy"]).copy()))
    env._state = state
    return out


@pytest.mark.slow
def test_scale_applied():
    env = _env()
    steps = _rollout(env, 3)
    for raw, obs in steps:
        np.testing.assert_allclose(obs[:, 0], 2.0 * raw, atol=1e-5)
    env.close()


@pytest.mark.slow
def test_history_stacking_order():
    H = 3
    env = _env(history_length=H)
    assert env.observation_manager.group_obs_dim("policy") == H
    steps = _rollout(env, 5)
    raws = [r for r, _ in steps]
    obs_last = steps[-1][1]
    # oldest -> newest flattening (chronological window)
    want = 2.0 * np.stack([raws[-3], raws[-2], raws[-1]], axis=1)
    np.testing.assert_allclose(obs_last, want, atol=1e-5)
    env.close()


@pytest.mark.slow
def test_fixed_delay():
    D = 2
    env = _env(delay=D)
    steps = _rollout(env, 6)
    raws = [r for r, _ in steps]
    obs_last = steps[-1][1]
    # obs lags the raw signal by exactly D control steps
    np.testing.assert_allclose(obs_last[:, 0], 2.0 * raws[-1 - D], atol=1e-5)
    env.close()
