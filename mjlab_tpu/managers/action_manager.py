"""Action manager (reference src/mjlab/managers/action_manager.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, _cfg_items
from mjlab_tpu.utils.struct import pytree


@pytree
class ActionState:
    action: jax.Array  # (E, A)
    prev_action: jax.Array
    prev_prev_action: jax.Array


class ActionTerm:
    """Base action term: processes its slice of the action vector."""

    def __init__(self, cfg, env):
        self.cfg = cfg
        self._env = env
        self._asset = env.scene[cfg.asset_name]

    @property
    def action_dim(self) -> int:
        raise NotImplementedError

    def process_actions(self, actions: jax.Array) -> None:
        """Cache processed actions (trace-time state on self/ctx)."""
        raise NotImplementedError

    def apply_actions(self) -> None:
        """Write targets into the entity (called per physics substep)."""
        raise NotImplementedError

    def reset(self, env_mask) -> None:
        pass


class ActionManager(ManagerBase):
    def _prepare_terms(self) -> None:
        self._terms: dict[str, ActionTerm] = {}
        for name, term_cfg in _cfg_items(self.cfg):
            if term_cfg is None:
                continue
            if not hasattr(term_cfg, "class_type"):
                continue
            term = term_cfg.class_type(term_cfg, self._env)
            self._terms[name] = term

    @property
    def total_action_dim(self) -> int:
        return sum(t.action_dim for t in self._terms.values())

    @property
    def active_terms(self) -> list[str]:
        return list(self._terms)

    def get_term(self, name: str) -> ActionTerm:
        return self._terms[name]

    def init_state(self, num_envs: int) -> ActionState:
        A = self.total_action_dim
        z = jnp.zeros((num_envs, A), jnp.float32)
        return ActionState(action=z, prev_action=z, prev_prev_action=z)

    @property
    def action(self) -> jax.Array:
        return self._env.ctx.action_state.action

    @property
    def prev_action(self) -> jax.Array:
        return self._env.ctx.action_state.prev_action

    @property
    def prev_prev_action(self) -> jax.Array:
        return self._env.ctx.action_state.prev_prev_action

    def process_action(self, action: jax.Array) -> None:
        st = self._env.ctx.action_state
        self._env.ctx.action_state = ActionState(
            action=action,
            prev_action=st.action,
            prev_prev_action=st.prev_action,
        )
        idx = 0
        for term in self._terms.values():
            term.process_actions(action[:, idx : idx + term.action_dim])
            idx += term.action_dim

    def apply_action(self) -> None:
        for term in self._terms.values():
            term.apply_actions()

    def reset(self, env_mask, ctx=None) -> dict:
        st = self._env.ctx.action_state
        m = env_mask[:, None]
        self._env.ctx.action_state = ActionState(
            action=jnp.where(m, 0.0, st.action),
            prev_action=jnp.where(m, 0.0, st.prev_action),
            prev_prev_action=jnp.where(m, 0.0, st.prev_prev_action),
        )
        for term in self._terms.values():
            term.reset(env_mask)
        return {}
