"""DC motor actuator: ideal PD clipped by a linear torque-speed curve.

Equivalent of reference src/mjlab/actuator/dc_actuator.py: available torque
shrinks linearly from saturation_effort at zero speed to zero at
velocity_limit, asymmetically for motoring vs braking.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass

import jax.numpy as jnp

from mjlab_tpu.actuator.actuator import ActuatorCmd
from mjlab_tpu.actuator.pd import IdealPdActuator, IdealPdActuatorCfg, PdState


@dataclass(kw_only=True)
class DcMotorActuatorCfg(IdealPdActuatorCfg):
    saturation_effort: float = 0.0
    velocity_limit: float = 0.0

    def __post_init__(self):
        if self.saturation_effort < self.effort_limit:
            warnings.warn(
                "saturation_effort < effort_limit: torque-speed curve will "
                "clip below the configured effort limit at all speeds"
            )

    def build(self, entity, joint_ids, joint_names):
        return DcMotorActuator(self, entity, joint_ids, joint_names)


class DcMotorActuator(IdealPdActuator):
    cfg: DcMotorActuatorCfg

    def compute(self, state: PdState, cmd: ActuatorCmd):
        state, tau = super().compute(state, cmd)
        sat = self.cfg.saturation_effort
        vmax = max(self.cfg.velocity_limit, 1e-9)
        # linear torque-speed envelope
        ratio = cmd.joint_vel / vmax
        tau_max = sat * (1.0 - ratio)
        tau_min = sat * (-1.0 - ratio)
        tau_max = jnp.clip(tau_max, -state.effort_limit, state.effort_limit)
        tau_min = jnp.clip(tau_min, -state.effort_limit, state.effort_limit)
        return state, jnp.clip(tau, tau_min, tau_max)
