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
def test_group_history_override():
    """Group-level history_length replaces per-term history settings
    (reference observation_manager.py:254-256): the term sets none, the
    group sets 3 -> every term in the group gets a 3-frame window."""
    H = 3
    env = make_pendulum_env(history_length=0, group_history_length=H)
    assert env.observation_manager.group_obs_dim("policy") == H
    steps = _rollout(env, 5)
    raws = [r for r, _ in steps]
    obs_last = steps[-1][1]
    want = 2.0 * np.stack([raws[-3], raws[-2], raws[-1]], axis=1)
    np.testing.assert_allclose(obs_last, want, atol=1e-5)
    env.close()


@pytest.mark.slow
def test_group_history_unflattened():
    """group flatten_history_dim=False REPLACES the term's flatten flag
    (True by default): the group obs keeps the (E, T, ...) window shape
    and concatenation happens on the last axis."""
    H = 3
    env = make_pendulum_env(
        history_length=0,
        group_history_length=H,
        group_flatten_history_dim=False,
    )
    step = jax.jit(env._traced_step)
    state = env._state
    action = jnp.full((E, 1), 0.5, jnp.float32)
    raws = []
    for _ in range(4):
        state, obs, *_ = step(state, action)
        raws.append(np.asarray(state.data.qpos)[:, 0].copy())
    o = np.asarray(obs["policy"])
    assert o.shape == (E, H, 1)
    want = 2.0 * np.stack(raws[-3:], axis=1)[..., None]
    np.testing.assert_allclose(o, want, atol=1e-5)
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


@pytest.mark.slow
def test_additive_bias_persists_within_episode_resamples_on_reset():
    """NoiseModelWithAdditiveBias at the ENV level (reference
    utils/noise/noise_model.py:36-84): the per-episode bias is constant
    across steps, differs across envs, and only MASKED envs get a new
    bias on reset."""
    import jax
    from mjlab_tpu.utils.noise import NoiseModelWithAdditiveBiasCfg
    from mjlab_tpu.utils.noise import UniformNoiseCfg
    from tests.mini_env import make_pendulum_cfg
    from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv

    E4 = 4
    cfg = make_pendulum_cfg(num_envs=E4)
    pol = cfg.observations["policy"]
    term = pol.terms["joint_pos"]
    term.noise = NoiseModelWithAdditiveBiasCfg(
        noise_cfg=None,
        bias_noise_cfg=UniformNoiseCfg(n_min=-0.5, n_max=0.5),
    )
    pol.enable_corruption = True
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    step = jax.jit(env._traced_step)
    state = env._state
    action = jnp.zeros((E4, 1), jnp.float32)

    def obs_minus_raw(state, obs):
        raw = 2.0 * np.asarray(state.data.qpos)[:, :1]  # scale=2.0
        return np.asarray(obs["policy"])[:, :1] - raw

    state, obs, *_ = step(state, action)
    b1 = obs_minus_raw(state, obs)
    state, obs, *_ = step(state, action)
    b2 = obs_minus_raw(state, obs)
    # bias constant across steps, nonzero, and env-distinct
    np.testing.assert_allclose(b1, b2, atol=1e-5)
    assert np.abs(b1).max() > 1e-3
    assert np.unique(np.round(b1, 5)).size > 1

    # masked reset: only envs 0..1 get a fresh bias
    mask = jnp.arange(E4) < 2
    env.ctx.load(state)
    env.observation_manager.reset(mask)
    state = env.ctx.freeze()
    state, obs, *_ = step(state, action)
    b3 = obs_minus_raw(state, obs)
    np.testing.assert_allclose(b3[2:], b1[2:], atol=1e-5)
    assert np.abs(b3[:2] - b1[:2]).max() > 1e-4
    env.close()
