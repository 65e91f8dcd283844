"""Action manager semantics (reference tests/test_action_manager.py):
scale/offset processing, prev/prev_prev buffers, rate-reward inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.mini_env import E, make_pendulum_env


@pytest.mark.slow
def test_scale_offset_and_action_buffers():
    env = make_pendulum_env(action_scale=0.5, action_offset=0.1)
    am = env.action_manager
    assert am.total_action_dim == 1
    step = jax.jit(env._traced_step)
    state = env._state

    a1 = jnp.full((E, 1), 0.8, jnp.float32)
    state, *_ = step(state, a1)
    a2 = jnp.full((E, 1), -0.4, jnp.float32)
    state, *_ = step(state, a2)

    st = state.action_state
    np.testing.assert_allclose(np.asarray(st.action), -0.4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.prev_action), 0.8, atol=1e-6)

    # processed target = raw * scale + offset lands in the ctrl vector
    ctrl = np.asarray(state.data.ctrl)
    np.testing.assert_allclose(ctrl, -0.4 * 0.5 + 0.1, atol=1e-6)
    env.close()


@pytest.mark.slow
def test_reset_clears_action_buffers():
    env = make_pendulum_env()
    step = jax.jit(env._traced_step)
    state = env._state
    a = jnp.full((E, 1), 0.7, jnp.float32)
    state, *_ = step(state, a)
    env._state = state
    env.reset()
    st = env._state.action_state
    np.testing.assert_allclose(np.asarray(st.action), 0.0)
    np.testing.assert_allclose(np.asarray(st.prev_action), 0.0)
    env.close()
