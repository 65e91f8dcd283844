"""Reward manager: weighted sum of term values x dt, with NaN scrubbing and
time-normalized episode sums (reference src/mjlab/managers/reward_manager.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, _cfg_items
from mjlab_tpu.managers.manager_term_config import RewardTermCfg


class RewardManager(ManagerBase):
    def _prepare_terms(self) -> None:
        self._term_names: list[str] = []
        self._term_cfgs: list[RewardTermCfg] = []
        for name, term_cfg in _cfg_items(self.cfg):
            if not isinstance(term_cfg, RewardTermCfg):
                continue
            self._resolve_common_term_cfg(name, term_cfg)
            self._term_names.append(name)
            self._term_cfgs.append(term_cfg)

    @property
    def active_terms(self) -> list[str]:
        return list(self._term_names)

    def get_term_cfg(self, name: str) -> RewardTermCfg:
        return self._term_cfgs[self._term_names.index(name)]

    def init_state(self, num_envs: int) -> dict:
        return {
            "episode_sums": {
                n: jnp.zeros((num_envs,), jnp.float32) for n in self._term_names
            }
        }

    def compute(self, dt: float):
        ctx = self._env.ctx
        total = jnp.zeros((self.num_envs,), jnp.float32)
        sums = dict(ctx.reward_state["episode_sums"])
        step_values = {}
        for name, cfg in zip(self._term_names, self._term_cfgs):
            if cfg.weight == 0.0:
                step_values[name] = jnp.zeros((self.num_envs,), jnp.float32)
                continue
            value = cfg.func(self._env, **cfg.params) * (cfg.weight * dt)
            value = jnp.nan_to_num(value, nan=0.0, posinf=0.0, neginf=0.0)
            total = total + value
            sums[name] = sums[name] + value
            step_values[name] = value
        ctx.reward_state = {"episode_sums": sums}
        ctx.reward_step_values = step_values  # for UIs / debugging
        return total

    def reset(self, env_mask, ctx=None) -> dict:
        """Returns Episode_Reward/<term> logs: mean over reset envs of the
        time-normalized episode sum (reference reward_manager.py:61-75)."""
        ctx = self._env.ctx
        sums = dict(ctx.reward_state["episode_sums"])
        logs = {}
        n_reset = jnp.maximum(jnp.sum(env_mask), 1)
        max_len_s = self._env.max_episode_length_s
        for name in self._term_names:
            val = jnp.sum(jnp.where(env_mask, sums[name], 0.0)) / n_reset
            logs[f"Episode_Reward/{name}"] = val / max_len_s
            sums[name] = jnp.where(env_mask, 0.0, sums[name])
        ctx.reward_state = {"episode_sums": sums}
        return logs
