"""Delayed actuator: wraps any base actuator, delaying selected command
targets through per-env stochastic DelayBuffers ticking at PHYSICS rate.

Equivalent of reference src/mjlab/actuator/delayed_actuator.py: delay_target
selects which of {position, velocity, effort} are delayed; lags are sampled
in [min_lag, max_lag] physics steps with hold_prob / update_period /
per_env_phase semantics from the shared DelayBuffer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal

import jax
import jax.numpy as jnp

from mjlab_tpu.actuator.actuator import Actuator, ActuatorCfg, ActuatorCmd
from mjlab_tpu.utils.buffers import (
    DelayBufferState,
    delay_buffer_init,
    delay_buffer_push,
    delay_buffer_reset,
    delay_buffer_set_lags,
)
from mjlab_tpu.utils.struct import pytree

DelayTarget = Literal["position", "velocity", "effort"]


@pytree
class DelayedState:
    base: object  # wrapped actuator's state
    buffers: dict  # target -> DelayBufferState
    rng: jax.Array


@dataclass(kw_only=True)
class DelayedActuatorCfg(ActuatorCfg):
    base_cfg: ActuatorCfg = None
    delay_target: DelayTarget | tuple[DelayTarget, ...] = "position"
    min_lag: int = 0
    max_lag: int = 0
    hold_prob: float = 0.0
    update_period: int = 0
    per_env_phase: bool = False

    def __post_init__(self):
        if self.base_cfg is None:
            raise ValueError("DelayedActuatorCfg requires base_cfg")
        # inherit joint selection from base if unset
        if not self.joint_names_expr:
            self.joint_names_expr = self.base_cfg.joint_names_expr

    def build(self, entity, joint_ids, joint_names):
        base = self.base_cfg.build(entity, joint_ids, joint_names)
        return DelayedActuator(self, base, entity, joint_ids, joint_names)


class DelayedActuator(Actuator):
    def __init__(self, cfg, base: Actuator, entity, joint_ids, joint_names):
        super().__init__(entity, joint_ids, joint_names)
        self.cfg = cfg
        self.base = base
        self.is_passthrough = False  # we intercept compute
        targets = cfg.delay_target
        self.targets = (targets,) if isinstance(targets, str) else tuple(targets)

    def edit_spec(self, spec, joint_names):
        self.base.edit_spec(spec, joint_names)
        self._mjs_actuators = self.base._mjs_actuators

    def initialize(self, num_envs: int, rng) -> DelayedState:
        keys = jax.random.split(rng, len(self.targets) + 2)
        buffers = {}
        J = len(self.joint_names)
        for i, t in enumerate(self.targets):
            buffers[t] = delay_buffer_init(
                max_lag=self.cfg.max_lag,
                batch=num_envs,
                shape=(J,),
                min_lag=self.cfg.min_lag,
                update_period=self.cfg.update_period,
                hold_prob=self.cfg.hold_prob,
                per_env_phase=self.cfg.per_env_phase,
                rng=keys[i],
            )
        return DelayedState(
            base=self.base.initialize(num_envs, keys[-2]),
            buffers=buffers,
            rng=keys[-1],
        )

    def compute(self, state: DelayedState, cmd: ActuatorCmd):
        rng, *keys = jax.random.split(state.rng, len(self.targets) + 1)
        buffers = dict(state.buffers)
        values = {
            "position": cmd.position_target,
            "velocity": cmd.velocity_target,
            "effort": cmd.effort_target,
        }
        for k, t in zip(keys, self.targets):
            buffers[t], values[t] = delay_buffer_push(buffers[t], values[t], k)
        cmd = cmd.replace(
            position_target=values["position"],
            velocity_target=values["velocity"],
            effort_target=values["effort"],
        )
        base_state, ctrl = self.base.compute(state.base, cmd)
        return state.replace(base=base_state, buffers=buffers, rng=rng), ctrl

    def reset(self, state: DelayedState, mask, rng):
        keys = jax.random.split(rng, len(self.targets) + 1)
        buffers = {
            t: delay_buffer_reset(state.buffers[t], mask, k)
            for k, t in zip(keys, self.targets)
        }
        base_state = self.base.reset(state.base, mask, keys[-1])
        return state.replace(base=base_state, buffers=buffers)

    @staticmethod
    def set_lags(state: DelayedState, min_lag, max_lag) -> DelayedState:
        buffers = {
            t: delay_buffer_set_lags(b, min_lag, max_lag)
            for t, b in state.buffers.items()
        }
        return state.replace(buffers=buffers)
