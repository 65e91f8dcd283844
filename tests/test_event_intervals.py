"""Interval-event timers, global-time mode and reset min-step gating
(reference src/mjlab/managers/event_manager.py:124-173), exercised
eagerly on a stub env so the firing masks are concrete (VERDICT r3 #10:
these behaviors previously had no direct tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.event_manager import EventManager
from mjlab_tpu.managers.manager_term_config import EventTermCfg

E = 8
DT = 0.05


class _Ctx:
    pass


class _Env:
    def __init__(self, num_envs=E, seed=0):
        self.num_envs = num_envs
        self.common_step_counter = 0
        ctx = _Ctx()
        ctx.rng = jax.random.PRNGKey(seed)

        def next_key():
            ctx.rng, k = jax.random.split(ctx.rng)
            return k

        ctx.next_key = next_key
        self.ctx = ctx


def _recording_term(log):
    def f(env, mask):
        log.append(np.asarray(mask).copy())

    return f


def _make(env, cfgs):
    mgr = EventManager(cfgs, env)
    env.ctx.event_state = mgr.init_state(env.num_envs, jax.random.PRNGKey(7))
    return mgr


def test_interval_per_env_timers_fire_independently():
    env = _Env()
    log = []
    mgr = _make(env, {
        "push": EventTermCfg(
            mode="interval", func=_recording_term(log),
            interval_range_s=(0.1, 0.3),
        ),
    })
    for _ in range(60):
        mgr.apply_interval(DT)
    fired = np.stack(log)  # (steps, E)
    counts = fired.sum(axis=0)
    # every env fired several times (60 steps * dt=3s, interval <= 0.3s)
    assert (counts >= 8).all(), counts
    # PER-ENV timers: firing steps differ across envs (never all in
    # lockstep over the whole run)
    assert not all(
        (row.all() or (~row).all()) for row in fired
    ), "per-env interval event fired in global lockstep"
    # inter-fire gaps stay within the sampled range [lo, hi] in steps
    lo_steps = int(np.floor(0.1 / DT))
    hi_steps = int(np.ceil(0.3 / DT))
    for e in range(E):
        steps = np.nonzero(fired[:, e])[0]
        gaps = np.diff(steps)
        assert (gaps >= lo_steps).all() and (gaps <= hi_steps).all(), (
            e, gaps,
        )


def test_interval_global_time_fires_lockstep():
    env = _Env()
    log = []
    mgr = _make(env, {
        "global_push": EventTermCfg(
            mode="interval", func=_recording_term(log),
            interval_range_s=(0.1, 0.3), is_global_time=True,
        ),
    })
    for _ in range(60):
        mgr.apply_interval(DT)
    fired = np.stack(log)
    # ONE shared timer: at every step the mask is all-true or all-false
    assert all((row.all() or (~row).all()) for row in fired)
    steps = np.nonzero(fired[:, 0])[0]
    assert len(steps) >= 8
    gaps = np.diff(steps)
    assert (gaps >= 2).all() and (gaps <= 6).all(), gaps


def test_reset_min_step_gating():
    env = _Env()
    log = []
    mgr = _make(env, {
        "dr": EventTermCfg(
            mode="reset", func=_recording_term(log),
            min_step_count_between_reset=5,
        ),
    })
    full = jnp.ones((E,), bool)
    half = jnp.arange(E) < E // 2

    env.common_step_counter = 0
    mgr.apply_reset(full)  # first ever: fires (last_reset seeded -1e9)
    assert log[-1].all()

    env.common_step_counter = 3
    mgr.apply_reset(full)  # 3 < 5 steps since last fire: gated off
    assert (~log[-1]).all()

    env.common_step_counter = 5
    mgr.apply_reset(half)  # 5 >= 5: fires, but only for the reset mask
    np.testing.assert_array_equal(log[-1], np.asarray(half))

    env.common_step_counter = 8
    mgr.apply_reset(full)
    # envs 0..3 fired at step 5 (8-5=3 < 5: gated); envs 4..7 last fired
    # at step 0 (8 >= 5: fire) — per-env gating, not global
    np.testing.assert_array_equal(log[-1], ~np.asarray(half))


def test_reset_without_gating_always_fires():
    env = _Env()
    log = []
    mgr = _make(env, {
        "plain": EventTermCfg(mode="reset", func=_recording_term(log)),
    })
    mask = jnp.arange(E) % 2 == 0
    for step in (0, 1, 2):
        env.common_step_counter = step
        mgr.apply_reset(mask)
        np.testing.assert_array_equal(log[-1], np.asarray(mask))
