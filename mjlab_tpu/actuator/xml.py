"""XML actuators: wrap <position>/<motor>/<velocity> actuators already
present in the robot XML (reference src/mjlab/actuator/xml_actuator.py).
Pass-through; joint properties optionally overridden."""

from __future__ import annotations

from dataclasses import dataclass

import mujoco

from mjlab_tpu.actuator.actuator import Actuator, ActuatorCfg, ActuatorCmd


class _XmlActuator(Actuator):
    is_passthrough = True

    def __init__(self, cfg, entity, joint_ids, joint_names, target: str):
        super().__init__(entity, joint_ids, joint_names)
        self.cfg = cfg
        self.target = target

    def edit_spec(self, spec: mujoco.MjSpec, joint_names):
        by_joint = {a.target: a for a in spec.actuators}
        for name in joint_names:
            if name not in by_joint:
                raise ValueError(f"no XML actuator targets joint '{name}'")
            self._mjs_actuators.append(by_joint[name])
            if self.cfg.armature:
                spec.joint(name).armature = self.cfg.armature
            if self.cfg.frictionloss:
                spec.joint(name).frictionloss = self.cfg.frictionloss

    def compute(self, state, cmd: ActuatorCmd):
        return state, {
            "position": cmd.position_target,
            "velocity": cmd.velocity_target,
            "effort": cmd.effort_target,
        }[self.target]


@dataclass(kw_only=True)
class XmlPositionActuatorCfg(ActuatorCfg):
    def build(self, entity, joint_ids, joint_names):
        return _XmlActuator(self, entity, joint_ids, joint_names, "position")


@dataclass(kw_only=True)
class XmlMotorActuatorCfg(ActuatorCfg):
    def build(self, entity, joint_ids, joint_names):
        return _XmlActuator(self, entity, joint_ids, joint_names, "effort")


@dataclass(kw_only=True)
class XmlVelocityActuatorCfg(ActuatorCfg):
    def build(self, entity, joint_ids, joint_names):
        return _XmlActuator(self, entity, joint_ids, joint_names, "velocity")
