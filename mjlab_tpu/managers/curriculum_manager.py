"""Curriculum manager (reference src/mjlab/managers/curriculum_manager.py).

Curriculum terms run at reset time on the masked envs and return a scalar
state value logged under Curriculum/<term>. Term state lives in
ctx.curriculum_state[name].
"""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, _cfg_items
from mjlab_tpu.managers.manager_term_config import CurriculumTermCfg


class CurriculumManager(ManagerBase):
    def _prepare_terms(self) -> None:
        self._term_names: list[str] = []
        self._term_cfgs: list[CurriculumTermCfg] = []
        for name, term_cfg in _cfg_items(self.cfg):
            if not isinstance(term_cfg, CurriculumTermCfg):
                continue
            self._resolve_common_term_cfg(name, term_cfg)
            self._term_names.append(name)
            self._term_cfgs.append(term_cfg)

    @property
    def active_terms(self) -> list[str]:
        return list(self._term_names)

    def init_state(self, num_envs: int) -> dict:
        return {n: {} for n in self._term_names}

    def compute(self, env_mask) -> dict:
        """Run curriculum terms for resetting envs; returns Curriculum/ logs."""
        logs = {}
        for name, cfg in zip(self._term_names, self._term_cfgs):
            value = cfg.func(self._env, env_mask, **cfg.params)
            if value is not None:
                logs[f"Curriculum/{name}"] = jnp.asarray(value, jnp.float32)
        return logs

    def reset(self, env_mask, ctx=None) -> dict:
        return {}


class NullCurriculumManager:
    def __init__(self, env):
        self._env = env
        self.active_terms = []

    def init_state(self, num_envs):
        return {}

    def compute(self, env_mask):
        return {}

    def reset(self, env_mask, ctx=None):
        return {}
