"""Termination manager: terminated vs truncated split on time_out flag
(reference src/mjlab/managers/termination_manager.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, _cfg_items
from mjlab_tpu.managers.manager_term_config import TerminationTermCfg


class TerminationManager(ManagerBase):
    def _prepare_terms(self) -> None:
        self._term_names: list[str] = []
        self._term_cfgs: list[TerminationTermCfg] = []
        for name, term_cfg in _cfg_items(self.cfg):
            if not isinstance(term_cfg, TerminationTermCfg):
                continue
            self._resolve_common_term_cfg(name, term_cfg)
            self._term_names.append(name)
            self._term_cfgs.append(term_cfg)

    @property
    def active_terms(self) -> list[str]:
        return list(self._term_names)

    def init_state(self, num_envs: int) -> dict:
        # terminated/truncated are normally written by compute(); seed
        # them so construction-time resets (which run BEFORE the first
        # step, e.g. the tracking command's adaptive-sampling read of
        # .terminated) see an all-false batch instead of AttributeError
        self.terminated = jnp.zeros((num_envs,), bool)
        self.truncated = jnp.zeros((num_envs,), bool)
        return {
            "episode_counts": {
                n: jnp.zeros((num_envs,), jnp.float32) for n in self._term_names
            }
        }

    def compute(self):
        ctx = self._env.ctx
        E = self.num_envs
        terminated = jnp.zeros((E,), bool)
        truncated = jnp.zeros((E,), bool)
        counts = dict(ctx.termination_state["episode_counts"])
        self._term_values = {}
        for name, cfg in zip(self._term_names, self._term_cfgs):
            value = cfg.func(self._env, **cfg.params).astype(bool)
            self._term_values[name] = value
            if cfg.time_out:
                truncated = truncated | value
            else:
                terminated = terminated | value
        # count only NEW firings this step for logging
        for name in self._term_names:
            counts[name] = counts[name] + self._term_values[name].astype(
                jnp.float32
            )
        ctx.termination_state = {"episode_counts": counts}
        self.terminated = terminated
        self.truncated = truncated
        return terminated, truncated

    @property
    def dones(self):
        return self.terminated | self.truncated

    def get_term(self, name: str):
        return self._term_values[name]

    def reset(self, env_mask, ctx=None) -> dict:
        ctx = self._env.ctx
        counts = dict(ctx.termination_state["episode_counts"])
        logs = {}
        n_reset = jnp.maximum(jnp.sum(env_mask), 1)
        for name in self._term_names:
            logs[f"Episode_Termination/{name}"] = (
                jnp.sum(jnp.where(env_mask, counts[name], 0.0)) / n_reset
            )
            counts[name] = jnp.where(env_mask, 0.0, counts[name])
        ctx.termination_state = {"episode_counts": counts}
        return logs
