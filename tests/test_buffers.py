"""CircularBuffer / DelayBuffer semantics (reference tests:
test_circular_buffer.py, test_delay_buffer.py — backfill, LIFO lags,
per-env reset)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.utils.buffers import (
    circular_buffer_append,
    circular_buffer_get,
    circular_buffer_init,
    circular_buffer_reset,
    circular_buffer_window,
    delay_buffer_init,
    delay_buffer_push,
    delay_buffer_reset,
    delay_buffer_set_lags,
)


def test_backfill_on_first_append():
    s = circular_buffer_init(4, 2, (3,))
    v = jnp.arange(6.0).reshape(2, 3)
    s = circular_buffer_append(s, v)
    win = circular_buffer_window(s)
    # every history slot backfilled with the first value
    np.testing.assert_array_equal(np.asarray(win), np.tile(v[:, None], (1, 4, 1)))


def test_lifo_lag_indexing():
    s = circular_buffer_init(3, 1, (1,))
    for t in range(5):
        s = circular_buffer_append(s, jnp.full((1, 1), float(t)))
    assert float(circular_buffer_get(s, 0)[0, 0]) == 4.0
    assert float(circular_buffer_get(s, 1)[0, 0]) == 3.0
    assert float(circular_buffer_get(s, 2)[0, 0]) == 2.0
    # lag beyond capacity clamps
    assert float(circular_buffer_get(s, 10)[0, 0]) == 2.0


def test_per_env_reset_backfills_next():
    s = circular_buffer_init(3, 2, (1,))
    for t in range(3):
        s = circular_buffer_append(s, jnp.full((2, 1), float(t)))
    s = circular_buffer_reset(s, jnp.array([True, False]))
    s = circular_buffer_append(s, jnp.full((2, 1), 9.0))
    win = np.asarray(circular_buffer_window(s))
    # env 0 backfilled with 9; env 1 keeps history
    np.testing.assert_array_equal(win[0, :, 0], [9, 9, 9])
    np.testing.assert_array_equal(win[1, :, 0], [1, 2, 9])


def test_delay_zero_lag_passthrough():
    rng = jax.random.PRNGKey(0)
    s = delay_buffer_init(max_lag=0, batch=2, shape=(2,))
    for t in range(3):
        s, out = delay_buffer_push(s, jnp.full((2, 2), float(t)), rng)
        np.testing.assert_array_equal(np.asarray(out), np.full((2, 2), float(t)))


def test_delay_fixed_lag():
    rng = jax.random.PRNGKey(0)
    s = delay_buffer_init(max_lag=2, batch=1, shape=(1,), min_lag=2)
    outs = []
    for t in range(5):
        s, out = delay_buffer_push(s, jnp.full((1, 1), float(t)), rng)
        outs.append(float(out[0, 0]))
    # lag clamps to available history, then locks to 2
    assert outs == [0.0, 0.0, 0.0, 1.0, 2.0]


def test_delay_stochastic_within_range():
    rng = jax.random.PRNGKey(1)
    s = delay_buffer_init(max_lag=3, batch=64, shape=(1,), min_lag=1)
    for t in range(10):
        rng, k = jax.random.split(rng)
        s, out = delay_buffer_push(s, jnp.full((64, 1), float(t)), k)
    lag = np.asarray(s.lag)
    assert lag.min() >= 1 and lag.max() <= 3
    assert len(np.unique(lag)) > 1  # actually stochastic


def test_delay_set_lags():
    s = delay_buffer_init(max_lag=5, batch=2, shape=(1,))
    s = delay_buffer_set_lags(s, 2, 4)
    rng = jax.random.PRNGKey(0)
    s = delay_buffer_reset(s, jnp.array([True, True]), rng)
    lag = np.asarray(s.lag)
    assert lag.min() >= 2 and lag.max() <= 4


def test_delay_update_period_multirate():
    """update_period=3: lags may change only on due pushes; between due
    pushes the lag is frozen (reference delay_buffer.py:247-303)."""
    from mjlab_tpu.utils.buffers import delay_buffer_init, delay_buffer_push

    B = 32
    rng = jax.random.PRNGKey(0)
    st = delay_buffer_init(
        max_lag=4, batch=B, shape=(1,), min_lag=0, update_period=3,
        per_env_phase=False, rng=rng,
    )
    lags = [np.asarray(st.lag).copy()]
    for t in range(12):
        rng, k = jax.random.split(rng)
        st, _ = delay_buffer_push(st, jnp.full((B, 1), float(t)), k)
        lags.append(np.asarray(st.lag).copy())
    # with phase 0 everywhere, pushes 0,3,6,9 are due; others frozen
    for t in range(12):
        changed = (lags[t + 1] != lags[t]).any()
        if t % 3 != 0:
            assert not changed, f"lag changed on non-due push {t}"
    # due pushes do resample for a 32-env batch (w.h.p. some env changes)
    assert any((lags[t + 1] != lags[t]).any() for t in (0, 3, 6, 9))


def test_delay_per_env_phase_staggering():
    """per_env_phase=True staggers WHICH push each env resamples on: the
    phases cover the period and the change-step pattern follows them."""
    from mjlab_tpu.utils.buffers import delay_buffer_init, delay_buffer_push

    B, P = 64, 4
    rng = jax.random.PRNGKey(1)
    st = delay_buffer_init(
        max_lag=6, batch=B, shape=(1,), min_lag=0, update_period=P,
        per_env_phase=True, rng=rng,
    )
    phase = np.asarray(st.phase)
    assert set(np.unique(phase)) == set(range(P)), phase
    prev = np.asarray(st.lag).copy()
    for t in range(8):
        rng, k = jax.random.split(rng)
        st, _ = delay_buffer_push(st, jnp.full((B, 1), float(t)), k)
        cur = np.asarray(st.lag).copy()
        changed = cur != prev
        due = (t + phase) % P == 0
        assert not changed[~due].any(), f"non-due env resampled at push {t}"
        prev = cur


def test_delay_hold_prob_one_freezes_lags():
    from mjlab_tpu.utils.buffers import delay_buffer_init, delay_buffer_push

    B = 32
    rng = jax.random.PRNGKey(2)
    st = delay_buffer_init(
        max_lag=5, batch=B, shape=(1,), min_lag=0, hold_prob=1.0, rng=rng,
    )
    lag0 = np.asarray(st.lag).copy()
    for t in range(10):
        rng, k = jax.random.split(rng)
        st, _ = delay_buffer_push(st, jnp.full((B, 1), float(t)), k)
        np.testing.assert_array_equal(np.asarray(st.lag), lag0)


def test_delay_lag_clamps_to_backfilled_history():
    """A fresh buffer with max lag returns the FIRST pushed frame (the
    backfill), never stale zeros (reference delay clamp semantics)."""
    from mjlab_tpu.utils.buffers import delay_buffer_init, delay_buffer_push

    B = 8
    rng = jax.random.PRNGKey(3)
    st = delay_buffer_init(
        max_lag=4, batch=B, shape=(1,), min_lag=4, rng=rng,
    )
    rng, k = jax.random.split(rng)
    st, out = delay_buffer_push(st, jnp.full((B, 1), 7.5), k)
    np.testing.assert_allclose(np.asarray(out), 7.5)
