"""Manager edge cases called out by the reference's deeper suite:
observation compute with update_history=False (no double buffer push,
reference observation_manager.py:154-167) and event reset-mode
min_step_count_between_reset gating under masked resets (reference
event_manager.py:147-173)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.mini_env import E, make_pendulum_env


@pytest.mark.slow
def test_update_history_false_does_not_advance_buffers():
    env = make_pendulum_env(history_length=3, delay=1)
    step = jax.jit(env._traced_step)
    state = env._state
    for _ in range(5):
        state, obs, *_ = step(state, jnp.full((E, 1), 0.5, jnp.float32))
    env._state = state
    env.ctx.load(state)

    before = jax.device_get(env.ctx.obs_state)
    obs1 = env.observation_manager.compute(update_history=False)
    mid = jax.device_get(env.ctx.obs_state)
    obs2 = env.observation_manager.compute(update_history=False)

    # identical output and untouched delay/history state
    np.testing.assert_array_equal(
        np.asarray(obs1["policy"]), np.asarray(obs2["policy"])
    )
    for va, vb in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(mid)
    ):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    # with update_history=True the buffers DO advance
    env.observation_manager.compute(update_history=True)
    after = jax.device_get(env.ctx.obs_state)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
        )
    )
    assert changed


@pytest.mark.slow
def test_event_min_step_gating_masked():
    from mjlab_tpu.managers.manager_term_config import EventTermCfg

    calls = []

    def spy_event(env, mask, **kw):
        calls.append(np.asarray(mask).copy())

    env = make_pendulum_env()
    from mjlab_tpu.managers.event_manager import EventManager

    import types

    events_cfg = types.SimpleNamespace(
        gated=EventTermCfg(
            func=spy_event, mode="reset", min_step_count_between_reset=10
        ),
        free=EventTermCfg(func=spy_event, mode="reset"),
    )
    em = EventManager(events_cfg, env)
    env.ctx.event_state = em.init_state(E, jax.random.PRNGKey(0))
    env.ctx.common_step = jnp.asarray(0, jnp.int32)

    m_all = jnp.ones((E,), bool)
    m_half = jnp.array([True, True] + [False] * (E - 2))

    # t=0: both fire for the full mask... gated term requires step-last>=10
    # with last initialized such that the first reset passes
    em.apply_reset(m_all)
    # t=5: gated must be suppressed, free fires
    env.ctx.common_step = jnp.asarray(5, jnp.int32)
    em.apply_reset(m_half)
    # t=15: gated fires again for the masked envs
    env.ctx.common_step = jnp.asarray(15, jnp.int32)
    em.apply_reset(m_half)

    gated_masks = calls[0::2]
    free_masks = calls[1::2]
    assert gated_masks[0].all(), "first reset applies to every env"
    assert not gated_masks[1].any(), "reset 5 steps later must be gated"
    np.testing.assert_array_equal(gated_masks[2], np.asarray(m_half))
    np.testing.assert_array_equal(free_masks[1], np.asarray(m_half))
    np.testing.assert_array_equal(free_masks[2], np.asarray(m_half))
