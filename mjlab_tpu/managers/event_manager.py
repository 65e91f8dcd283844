"""Event manager: startup / reset / interval modes with per-env interval
timers, min-step reset gating and domain-randomization field collection
(reference src/mjlab/managers/event_manager.py:18-220).

Term functions take (env, env_mask, **params) and apply their effect ONLY
where env_mask is True (everything masked, no dynamic shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, _cfg_items
from mjlab_tpu.managers.manager_term_config import EventTermCfg


class EventManager(ManagerBase):
    def _prepare_terms(self) -> None:
        self._modes: dict[str, list[tuple[str, EventTermCfg]]] = {
            "startup": [],
            "reset": [],
            "interval": [],
        }
        for name, term_cfg in _cfg_items(self.cfg):
            if not isinstance(term_cfg, EventTermCfg):
                continue
            self._resolve_common_term_cfg(name, term_cfg)
            if term_cfg.mode not in self._modes:
                raise ValueError(f"unknown event mode {term_cfg.mode}")
            self._modes[term_cfg.mode].append((name, term_cfg))

    @property
    def active_terms(self) -> dict[str, list[str]]:
        return {m: [n for n, _ in ts] for m, ts in self._modes.items()}

    @property
    def domain_randomization_fields(self) -> list[str]:
        """Model fields named by DR terms; the env expands these with a
        leading env axis before compiling the step."""
        fields = []
        for terms in self._modes.values():
            for _, cfg in terms:
                if cfg.domain_randomization and "field" in cfg.params:
                    fields.append(cfg.params["field"])
        return fields

    def init_state(self, num_envs: int, rng) -> dict:
        state: dict = {"interval_left": {}, "last_reset_step": {}}
        for name, cfg in self._modes["interval"]:
            lo, hi = cfg.interval_range_s
            if cfg.is_global_time:
                rng, k = jax.random.split(rng)
                state["interval_left"][name] = jax.random.uniform(
                    k, (), minval=lo, maxval=hi
                )
            else:
                rng, k = jax.random.split(rng)
                state["interval_left"][name] = jax.random.uniform(
                    k, (num_envs,), minval=lo, maxval=hi
                )
        for name, cfg in self._modes["reset"]:
            if cfg.min_step_count_between_reset > 0:
                state["last_reset_step"][name] = jnp.full(
                    (num_envs,), -(10**9), jnp.int32
                )
        return state

    def apply_startup(self) -> None:
        """Eager (pre-jit) startup events over all envs."""
        all_mask = jnp.ones((self.num_envs,), bool)
        for name, cfg in self._modes["startup"]:
            cfg.func(self._env, all_mask, **cfg.params)

    def apply_interval(self, dt: float) -> None:
        ctx = self._env.ctx
        state = dict(ctx.event_state)
        left = dict(state["interval_left"])
        for name, cfg in self._modes["interval"]:
            lo, hi = cfg.interval_range_s
            t = left[name] - dt
            due = t <= 0.0
            resample = jax.random.uniform(
                ctx.next_key(), t.shape, minval=lo, maxval=hi
            )
            left[name] = jnp.where(due, resample, t)
            if cfg.is_global_time:
                mask = jnp.broadcast_to(due, (self.num_envs,))
            else:
                mask = due
            cfg.func(self._env, mask, **cfg.params)
        state["interval_left"] = left
        ctx.event_state = state

    def apply_reset(self, env_mask) -> None:
        ctx = self._env.ctx
        state = dict(ctx.event_state)
        last = dict(state["last_reset_step"])
        step = self._env.common_step_counter
        for name, cfg in self._modes["reset"]:
            mask = env_mask
            if cfg.min_step_count_between_reset > 0:
                ok = (step - last[name]) >= cfg.min_step_count_between_reset
                mask = env_mask & ok
                last[name] = jnp.where(mask, step, last[name])
            cfg.func(self._env, mask, **cfg.params)
        state["last_reset_step"] = last
        ctx.event_state = state

    def reset(self, env_mask, ctx=None) -> dict:
        return {}
