"""Command manager: command terms with time-based resampling and metrics
(reference src/mjlab/managers/command_manager.py:19-197).

CommandTerm state (the command itself, time_left, metrics) is a dict pytree
in ctx.command_state[name]; terms implement pure masked update rules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, _cfg_items, ManagerTermBase


class CommandTerm(ManagerTermBase):
    """Base command term. Subclasses implement:
    - init_state(num_envs, rng) -> dict (must contain 'time_left')
    - _resample(state, mask, rng) -> state
    - _update_command(state) -> state
    - _update_metrics(state) -> state (fills state['metrics'][...])
    - command(state) -> jax.Array
    """

    def __init__(self, cfg, env):
        super().__init__(cfg, env)

    @property
    def name(self) -> str:
        return self._name

    @property
    def state(self) -> dict:
        return self._env.ctx.command_state[self._name]

    @state.setter
    def state(self, v: dict):
        self._env.ctx.command_state[self._name] = v

    @property
    def command(self) -> jax.Array:
        return self._get_command(self.state)

    def _get_command(self, state):
        raise NotImplementedError

    def init_state(self, num_envs: int, rng) -> dict:
        raise NotImplementedError

    def _resample(self, state, mask, rng) -> dict:
        raise NotImplementedError

    def _update_command(self, state) -> dict:
        return state

    def _update_metrics(self, state) -> dict:
        return state

    def compute(self, dt: float) -> None:
        """Per-control-step update: metrics, time-based resample, command
        post-processing (reference command_manager.py:53-67)."""
        state = dict(self.state)
        state = self._update_metrics(state)
        time_left = state["time_left"] - dt
        due = time_left <= 0.0
        lo, hi = self.cfg.resampling_time_range
        new_t = jax.random.uniform(
            self._env.ctx.next_key(), time_left.shape, minval=lo, maxval=hi
        )
        state["time_left"] = jnp.where(due, new_t, time_left)
        state = self._resample(state, due, self._env.ctx.next_key())
        state = self._update_command(state)
        self.state = state

    def reset(self, env_mask, ctx=None) -> dict:
        state = dict(self.state)
        lo, hi = self.cfg.resampling_time_range
        new_t = jax.random.uniform(
            self._env.ctx.next_key(),
            state["time_left"].shape,
            minval=lo,
            maxval=hi,
        )
        state["time_left"] = jnp.where(env_mask, new_t, state["time_left"])
        state = self._resample(state, env_mask, self._env.ctx.next_key())
        state = self._update_command(state)
        logs = {}
        n = jnp.maximum(jnp.sum(env_mask), 1)
        for mname, mval in state.get("metrics", {}).items():
            logs[f"Metrics/{self._name}/{mname}"] = (
                jnp.sum(jnp.where(env_mask, mval, 0.0)) / n
            )
            state["metrics"][mname] = jnp.where(env_mask, 0.0, mval)
        self.state = state
        return logs


class CommandManager(ManagerBase):
    def _prepare_terms(self) -> None:
        self._terms: dict[str, CommandTerm] = {}
        for name, term_cfg in _cfg_items(self.cfg):
            if term_cfg is None or not hasattr(term_cfg, "class_type"):
                continue
            term = term_cfg.class_type(term_cfg, self._env)
            term._name = name
            self._terms[name] = term

    @property
    def active_terms(self) -> list[str]:
        return list(self._terms)

    def get_command(self, name: str) -> jax.Array:
        return self._terms[name].command

    def get_term(self, name: str) -> CommandTerm:
        return self._terms[name]

    def init_state(self, num_envs: int, rng) -> dict:
        out = {}
        for name, term in self._terms.items():
            rng, k = jax.random.split(rng)
            out[name] = term.init_state(num_envs, k)
        return out

    def compute(self, dt: float) -> None:
        for term in self._terms.values():
            term.compute(dt)

    def reset(self, env_mask, ctx=None) -> dict:
        logs = {}
        for term in self._terms.values():
            logs.update(term.reset(env_mask))
        return logs


class NullCommandManager:
    """Stand-in when cfg.commands is None (reference
    command_manager.py:162)."""

    def __init__(self, env):
        self._env = env
        self.active_terms = []

    def init_state(self, num_envs, rng):
        return {}

    def get_command(self, name):
        return None

    def get_term(self, name):
        return None

    def compute(self, dt):
        pass

    def reset(self, env_mask, ctx=None):
        return {}
