"""Batched functional ring buffers: observation history and stochastic delay.

Pure-pytree equivalents of the reference's CircularBuffer / DelayBuffer
(reference src/mjlab/utils/buffers/circular_buffer.py:82 and
delay_buffer.py:12): fixed-shape jnp storage, masked per-env reset with
first-append backfill, LIFO lag indexing, per-env stochastic lags with hold
probability, multi-rate update periods and per-env phase staggering.

State lives in a small pytree; all ops are jit/vmap-free batched (leading
dim = num_envs) so they run inside the one compiled env step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.utils.struct import Static, pytree


@pytree
class CircularBufferState:
    buf: jax.Array  # (T, B, ...) time-major ring storage
    ptr: jax.Array  # () int32: next write slot (monotonic mod T)
    num_pushes: jax.Array  # (B,) int32: pushes since last reset, per env


def circular_buffer_init(max_len: int, batch: int, shape: tuple, dtype=jnp.float32):
    return CircularBufferState(
        buf=jnp.zeros((max_len, batch) + tuple(shape), dtype),
        ptr=jnp.zeros((), jnp.int32),
        num_pushes=jnp.zeros((batch,), jnp.int32),
    )


def circular_buffer_reset(state: CircularBufferState, mask: jax.Array):
    """Reset envs where mask is True (their history is invalidated)."""
    return state.replace(
        num_pushes=jnp.where(mask, 0, state.num_pushes),
    )


def circular_buffer_append(state: CircularBufferState, value: jax.Array):
    """Append a batch frame. Envs with num_pushes==0 are backfilled: every
    slot gets the new value, so reads before the window fills return the
    oldest real frame (reference circular_buffer.py:190-215)."""
    T = state.buf.shape[0]
    slot = state.ptr % T
    first = state.num_pushes == 0  # (B,)
    bcast = first.reshape((-1,) + (1,) * (value.ndim - 1))
    buf = state.buf.at[slot].set(value)
    # backfill: where first, fill ALL slots with value
    buf = jnp.where(bcast[None], value[None], buf)
    return state.replace(
        buf=buf,
        ptr=state.ptr + 1,
        num_pushes=state.num_pushes + 1,
    )


def circular_buffer_get(state: CircularBufferState, lag: jax.Array):
    """LIFO indexing: lag 0 = newest frame, lag k = k pushes ago.

    lag: () or (B,) int. Lags are clamped to the valid history per env.
    """
    T = state.buf.shape[0]
    B = state.buf.shape[1]
    lag = jnp.broadcast_to(jnp.asarray(lag, jnp.int32), (B,))
    valid = jnp.maximum(state.num_pushes - 1, 0)
    lag = jnp.minimum(jnp.minimum(lag, valid), T - 1)
    newest = (state.ptr - 1) % T
    idx = (newest - lag) % T  # (B,)
    return state.buf[idx, jnp.arange(B)]


def circular_buffer_window(state: CircularBufferState):
    """Full history, batch-first and chronological (oldest..newest):
    (B, T, ...) — matches reference circular_buffer.py:162-175."""
    T = state.buf.shape[0]
    newest = (state.ptr - 1) % T
    # chronological lags: T-1 .. 0
    lags = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    idx = (newest - lags) % T  # (T,)
    out = state.buf[idx]  # (T, B, ...)
    return jnp.swapaxes(out, 0, 1)


@pytree
class DelayBufferState:
    hist: CircularBufferState
    lag: jax.Array  # (B,) int32 current per-env lag
    min_lag: jax.Array  # () or (B,)
    max_lag: jax.Array
    step: jax.Array  # (B,) int32 local step counter for update_period
    phase: jax.Array  # (B,) int32 per-env phase offset
    # static config
    update_period: Static[int]  # resample every N pushes (0 = every push)
    hold_prob: Static[float]  # probability of keeping previous lag


def delay_buffer_init(
    max_lag: int,
    batch: int,
    shape: tuple,
    dtype=jnp.float32,
    min_lag: int = 0,
    update_period: int = 0,
    hold_prob: float = 0.0,
    per_env_phase: bool = False,
    rng: jax.Array | None = None,
):
    hist = circular_buffer_init(max_lag + 1, batch, shape, dtype)
    if per_env_phase and update_period > 1:
        assert rng is not None
        phase = jax.random.randint(rng, (batch,), 0, update_period, jnp.int32)
    else:
        phase = jnp.zeros((batch,), jnp.int32)
    return DelayBufferState(
        hist=hist,
        lag=jnp.full((batch,), min_lag, jnp.int32),
        min_lag=jnp.asarray(min_lag, jnp.int32),
        max_lag=jnp.asarray(max_lag, jnp.int32),
        step=jnp.zeros((batch,), jnp.int32),
        phase=phase,
        update_period=int(update_period),
        hold_prob=float(hold_prob),
    )


def delay_buffer_set_lags(state: DelayBufferState, min_lag, max_lag):
    """Update per-env lag ranges (for DR events, reference
    delay_buffer.py:180)."""
    return state.replace(
        min_lag=jnp.broadcast_to(jnp.asarray(min_lag, jnp.int32), state.lag.shape),
        max_lag=jnp.broadcast_to(jnp.asarray(max_lag, jnp.int32), state.lag.shape),
    )


def delay_buffer_reset(state: DelayBufferState, mask: jax.Array, rng: jax.Array):
    """Reset masked envs: clear history, resample their lag."""
    hist = circular_buffer_reset(state.hist, mask)
    k1, k2 = jax.random.split(rng)
    B = state.lag.shape[0]
    lo = jnp.broadcast_to(state.min_lag, (B,))
    hi = jnp.broadcast_to(state.max_lag, (B,))
    u = jax.random.uniform(k1, (B,))
    new_lag = (lo + (u * (hi - lo + 1).astype(u.dtype)).astype(jnp.int32)).astype(
        jnp.int32
    )
    new_lag = jnp.clip(new_lag, lo, hi)
    return state.replace(
        hist=hist,
        lag=jnp.where(mask, new_lag, state.lag),
        step=jnp.where(mask, 0, state.step),
    )


def delay_buffer_push(state: DelayBufferState, value: jax.Array, rng: jax.Array):
    """Push a frame and return (new_state, delayed_value).

    Lag resampling happens every update_period pushes (phase-staggered per
    env), with hold_prob chance of keeping the previous lag. Lags clamp to
    the available history (reference delay_buffer.py:242-303)."""
    hist = circular_buffer_append(state.hist, value)
    B = state.lag.shape[0]
    k1, k2 = jax.random.split(rng)

    if state.update_period > 1:
        due = ((state.step + state.phase) % state.update_period) == 0
    else:
        due = jnp.ones((B,), bool)
    lo = jnp.broadcast_to(state.min_lag, (B,))
    hi = jnp.broadcast_to(state.max_lag, (B,))
    u = jax.random.uniform(k1, (B,))
    cand = (lo + (u * (hi - lo + 1).astype(u.dtype)).astype(jnp.int32)).astype(
        jnp.int32
    )
    cand = jnp.clip(cand, lo, hi)
    hold = jax.random.uniform(k2, (B,)) < state.hold_prob
    new_lag = jnp.where(due & ~hold, cand, state.lag)

    state = state.replace(hist=hist, lag=new_lag, step=state.step + 1)
    return state, circular_buffer_get(hist, new_lag)
