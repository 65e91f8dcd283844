"""Encoder bias semantics (reference tests/test_encoder_bias.py): biased
joint-position observations read q + bias, and the position action path
compensates by subtracting the bias from the commanded target."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.mini_env import E, make_pendulum_env


@pytest.mark.slow
def test_bias_shifts_observation_and_action_compensates():
    env = make_pendulum_env()
    robot = env.scene["robot"]
    st = env.ctx.entity_states["robot"]
    bias = jnp.array([[0.1], [-0.2]], jnp.float32)
    env.ctx.entity_states["robot"] = st.replace(encoder_bias=bias)
    env._state = env.ctx.freeze()

    step = jax.jit(env._traced_step)
    state = env._state
    action = jnp.full((E, 1), 0.5, jnp.float32)
    state, obs, *_ = step(state, action)

    # biased observation = true q + bias
    raw = np.asarray(state.data.qpos)[:, 0]
    np.testing.assert_allclose(
        np.asarray(obs["policy"])[:, 0],
        2.0 * (raw + np.asarray(bias)[:, 0]),
        atol=1e-5,
    )
    # the position action compensates: ctrl = target - bias
    ctrl = np.asarray(state.data.ctrl)[:, 0]
    np.testing.assert_allclose(
        ctrl, 0.5 - np.asarray(bias)[:, 0], atol=1e-5
    )
    env.close()
