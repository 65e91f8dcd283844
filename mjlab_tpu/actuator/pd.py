"""Ideal PD actuator: explicit torque kp*(q* - q) + kd*(qd* - qd) + tau_ff.

Equivalent of reference src/mjlab/actuator/pd_actuator.py: emits a <motor>
per joint; gains live as per-env arrays in the actuator state so domain
randomization can perturb them (set_gains / set_effort_limit).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import mujoco

from mjlab_tpu.actuator.actuator import Actuator, ActuatorCfg, ActuatorCmd
from mjlab_tpu.utils.spec import create_motor_actuator
from mjlab_tpu.utils.struct import pytree


@pytree
class PdState:
    stiffness: jax.Array  # (E, J)
    damping: jax.Array  # (E, J)
    effort_limit: jax.Array  # (E, J)
    default_stiffness: jax.Array  # (J,)
    default_damping: jax.Array  # (J,)
    default_effort_limit: jax.Array  # (J,)


@dataclass(kw_only=True)
class IdealPdActuatorCfg(ActuatorCfg):
    stiffness: float
    damping: float
    effort_limit: float

    def build(self, entity, joint_ids, joint_names):
        return IdealPdActuator(self, entity, joint_ids, joint_names)


class IdealPdActuator(Actuator):
    is_passthrough = False

    def __init__(self, cfg, entity, joint_ids, joint_names):
        super().__init__(entity, joint_ids, joint_names)
        self.cfg = cfg

    def edit_spec(self, spec: mujoco.MjSpec, joint_names):
        for name in joint_names:
            self._mjs_actuators.append(
                create_motor_actuator(
                    spec,
                    name,
                    effort_limit=self.cfg.effort_limit,
                    armature=self.cfg.armature,
                    frictionloss=self.cfg.frictionloss,
                )
            )

    def initialize(self, num_envs: int, rng) -> PdState:
        J = len(self.joint_names)
        kp = jnp.full((J,), self.cfg.stiffness, jnp.float32)
        kd = jnp.full((J,), self.cfg.damping, jnp.float32)
        fl = jnp.full((J,), self.cfg.effort_limit, jnp.float32)
        return PdState(
            stiffness=jnp.tile(kp, (num_envs, 1)),
            damping=jnp.tile(kd, (num_envs, 1)),
            effort_limit=jnp.tile(fl, (num_envs, 1)),
            default_stiffness=kp,
            default_damping=kd,
            default_effort_limit=fl,
        )

    def compute(self, state: PdState, cmd: ActuatorCmd):
        tau = (
            state.stiffness * (cmd.position_target - cmd.joint_pos)
            + state.damping * (cmd.velocity_target - cmd.joint_vel)
            + cmd.effort_target
        )
        tau = jnp.clip(tau, -state.effort_limit, state.effort_limit)
        return state, tau

    def reset(self, state: PdState, mask: jax.Array, rng):
        return state

    # DR helpers (pure; callers thread the state)
    @staticmethod
    def set_gains(state: PdState, mask, stiffness=None, damping=None) -> PdState:
        m = mask[:, None]
        if stiffness is not None:
            state = state.replace(
                stiffness=jnp.where(m, stiffness, state.stiffness)
            )
        if damping is not None:
            state = state.replace(damping=jnp.where(m, damping, state.damping))
        return state

    @staticmethod
    def set_effort_limit(state: PdState, mask, effort_limit) -> PdState:
        return state.replace(
            effort_limit=jnp.where(mask[:, None], effort_limit, state.effort_limit)
        )
