"""Manager base classes (reference src/mjlab/managers/manager_base.py)."""

from __future__ import annotations

import inspect
from typing import TYPE_CHECKING

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

if TYPE_CHECKING:
    from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv


def _cfg_items(cfg):
    """Iterate (name, value) over dict-style or dataclass-attribute cfgs."""
    if cfg is None:
        return []
    if isinstance(cfg, dict):
        return list(cfg.items())
    return list(vars(cfg).items())


class ManagerTermBase:
    """Class-based term: configured once, called like the term function.

    Stateful terms (reference terms with reset_idx, e.g. jump
    rewards.py:20,220) keep per-env TRACED state: define ``init_state`` and
    read/write ``self.state`` — the owning manager binds it to a slot in
    the env context, so term state lives inside EnvState like everything
    else (pure, maskable, no recompiles)."""

    def __init__(self, cfg, env: "ManagerBasedRlEnv"):
        self.cfg = cfg
        self._env = env
        self._state_slot: tuple[str, str] | None = None

    def init_state(self, num_envs: int):
        """Optional per-env traced state pytree; None = stateless."""
        return None

    @property
    def state(self):
        assert self._state_slot is not None, "term has no bound state slot"
        slot, name = self._state_slot
        return getattr(self._env.ctx, slot)["terms"][name]

    @state.setter
    def state(self, value):
        assert self._state_slot is not None, "term has no bound state slot"
        slot, name = self._state_slot
        s = dict(getattr(self._env.ctx, slot))
        terms = dict(s.get("terms", {}))
        terms[name] = value
        s["terms"] = terms
        setattr(self._env.ctx, slot, s)

    def reset(self, env_mask, ctx=None):
        """Masked per-env reset of any internal state. Returns optional log
        dict."""
        return {}

    def __call__(self, env, **kwargs):
        raise NotImplementedError


class ManagerBase:
    def __init__(self, cfg, env: "ManagerBasedRlEnv"):
        self.cfg = cfg
        self._env = env
        self._prepare_terms()

    @property
    def num_envs(self) -> int:
        return self._env.num_envs

    @property
    def device(self):
        return self._env.device

    def _prepare_terms(self) -> None:
        raise NotImplementedError

    def _resolve_common_term_cfg(self, name: str, term_cfg) -> None:
        """Resolve SceneEntityCfg params and instantiate class terms
        (reference manager_base.py:86-92)."""
        for key, value in term_cfg.params.items():
            if isinstance(value, SceneEntityCfg):
                value.resolve(self._env.scene)
        if inspect.isclass(term_cfg.func):
            term_cfg.func = term_cfg.func(cfg=term_cfg, env=self._env)

    def reset(self, env_mask, ctx=None) -> dict:
        return {}
