"""MuJoCo builtin actuators (pass-through: physics computes the force).

The position actuator's PD law is an affine gain/bias handled *inside* the
implicitfast integrator (see mjlab_tpu/utils/spec.py:create_position_actuator
and phys/forward.py:_implicitfast_qacc), matching MuJoCo semantics
(reference src/mjlab/actuator/builtin_actuator.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import mujoco

from mjlab_tpu.actuator.actuator import Actuator, ActuatorCfg, ActuatorCmd
from mjlab_tpu.utils.spec import (
    create_motor_actuator,
    create_position_actuator,
    create_velocity_actuator,
)


@dataclass(kw_only=True)
class BuiltinPositionActuatorCfg(ActuatorCfg):
    stiffness: float
    damping: float
    effort_limit: float | None = None

    def build(self, entity, joint_ids, joint_names):
        return BuiltinPositionActuator(self, entity, joint_ids, joint_names)


class BuiltinPositionActuator(Actuator):
    is_passthrough = True
    target = "position"

    def __init__(self, cfg, entity, joint_ids, joint_names):
        super().__init__(entity, joint_ids, joint_names)
        self.cfg = cfg

    def edit_spec(self, spec: mujoco.MjSpec, joint_names):
        for name in joint_names:
            self._mjs_actuators.append(
                create_position_actuator(
                    spec,
                    name,
                    stiffness=self.cfg.stiffness,
                    damping=self.cfg.damping,
                    effort_limit=self.cfg.effort_limit,
                    armature=self.cfg.armature,
                    frictionloss=self.cfg.frictionloss,
                )
            )

    def compute(self, state, cmd: ActuatorCmd):
        return state, cmd.position_target


@dataclass(kw_only=True)
class BuiltinMotorActuatorCfg(ActuatorCfg):
    effort_limit: float
    gear: float = 1.0

    def build(self, entity, joint_ids, joint_names):
        return BuiltinMotorActuator(self, entity, joint_ids, joint_names)


class BuiltinMotorActuator(Actuator):
    is_passthrough = True
    target = "effort"

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
                    gear=self.cfg.gear,
                    armature=self.cfg.armature,
                    frictionloss=self.cfg.frictionloss,
                )
            )

    def compute(self, state, cmd: ActuatorCmd):
        return state, cmd.effort_target


@dataclass(kw_only=True)
class BuiltinVelocityActuatorCfg(ActuatorCfg):
    damping: float
    effort_limit: float | None = None

    def build(self, entity, joint_ids, joint_names):
        return BuiltinVelocityActuator(self, entity, joint_ids, joint_names)


class BuiltinVelocityActuator(Actuator):
    is_passthrough = True
    target = "velocity"

    def __init__(self, cfg, entity, joint_ids, joint_names):
        super().__init__(entity, joint_ids, joint_names)
        self.cfg = cfg

    def edit_spec(self, spec: mujoco.MjSpec, joint_names):
        for name in joint_names:
            self._mjs_actuators.append(
                create_velocity_actuator(
                    spec,
                    name,
                    damping=self.cfg.damping,
                    effort_limit=self.cfg.effort_limit,
                    armature=self.cfg.armature,
                    frictionloss=self.cfg.frictionloss,
                )
            )

    def compute(self, state, cmd: ActuatorCmd):
        return state, cmd.velocity_target
