"""Reward manager: weighted sum of term values x dt, with NaN scrubbing and
time-normalized episode sums (reference src/mjlab/managers/reward_manager.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import (
    ManagerBase,
    ManagerTermBase,
    _cfg_items,
)
from mjlab_tpu.managers.manager_term_config import RewardTermCfg


class RewardManager(ManagerBase):
    def _prepare_terms(self) -> None:
        self._term_names: list[str] = []
        self._term_cfgs: list[RewardTermCfg] = []
        for name, term_cfg in _cfg_items(self.cfg):
            if not isinstance(term_cfg, RewardTermCfg):
                continue
            self._resolve_common_term_cfg(name, term_cfg)
            if isinstance(term_cfg.func, ManagerTermBase):
                term_cfg.func._state_slot = ("reward_state", name)
            self._term_names.append(name)
            self._term_cfgs.append(term_cfg)

    @property
    def active_terms(self) -> list[str]:
        return list(self._term_names)

    def get_term_cfg(self, name: str) -> RewardTermCfg:
        return self._term_cfgs[self._term_names.index(name)]

    def init_state(self, num_envs: int) -> dict:
        terms = {}
        for name, cfg in zip(self._term_names, self._term_cfgs):
            if isinstance(cfg.func, ManagerTermBase):
                st = cfg.func.init_state(num_envs)
                if st is not None:
                    terms[name] = st
        return {
            "episode_sums": {
                n: jnp.zeros((num_envs,), jnp.float32) for n in self._term_names
            },
            # curriculum-adjustable weights (traced; reference jump
            # curriculums.py progressive_stability_requirement). Terms with
            # static weight 0.0 are python-skipped in compute() and cannot
            # be re-weighted at runtime.
            "weights": {
                n: jnp.asarray(cfg.weight, jnp.float32)
                for n, cfg in zip(self._term_names, self._term_cfgs)
            },
            "terms": terms,
        }

    def compute(self, dt: float):
        ctx = self._env.ctx
        total = jnp.zeros((self.num_envs,), jnp.float32)
        sums = dict(ctx.reward_state["episode_sums"])
        weights = ctx.reward_state["weights"]
        step_values = {}
        for name, cfg in zip(self._term_names, self._term_cfgs):
            if cfg.weight == 0.0:
                step_values[name] = jnp.zeros((self.num_envs,), jnp.float32)
                continue
            value = cfg.func(self._env, **cfg.params) * (weights[name] * dt)
            # scrub nan/inf (reference reward_manager.py:86-87) and clamp
            # finite-but-diverged magnitudes so a single exploding env
            # cannot poison the return statistics
            value = jnp.nan_to_num(value, nan=0.0, posinf=0.0, neginf=0.0)
            value = jnp.clip(value, -1e6, 1e6)
            total = total + value
            sums[name] = sums[name] + value
            step_values[name] = value
        st = dict(ctx.reward_state)
        st["episode_sums"] = sums
        ctx.reward_state = st
        ctx.reward_step_values = step_values  # for UIs / debugging
        return total

    def set_weight(self, name: str, value) -> None:
        """Curriculum hook: runtime (traced) reward weight update."""
        st = dict(self._env.ctx.reward_state)
        w = dict(st["weights"])
        w[name] = jnp.asarray(value, jnp.float32)
        st["weights"] = w
        self._env.ctx.reward_state = st

    def reset(self, env_mask, ctx=None) -> dict:
        """Returns Episode_Reward/<term> logs: mean over reset envs of the
        time-normalized episode sum (reference reward_manager.py:61-75)."""
        ctx = self._env.ctx
        logs = {}
        for name, cfg in zip(self._term_names, self._term_cfgs):
            if isinstance(cfg.func, ManagerTermBase):
                term_logs = cfg.func.reset(env_mask, ctx)
                if term_logs:
                    logs.update(term_logs)
        sums = dict(ctx.reward_state["episode_sums"])
        n_reset = jnp.maximum(jnp.sum(env_mask), 1)
        max_len_s = self._env.max_episode_length_s
        for name in self._term_names:
            val = jnp.sum(jnp.where(env_mask, sums[name], 0.0)) / n_reset
            logs[f"Episode_Reward/{name}"] = val / max_len_s
            sums[name] = jnp.where(env_mask, 0.0, sums[name])
        st = dict(ctx.reward_state)
        st["episode_sums"] = sums
        ctx.reward_state = st
        return logs
