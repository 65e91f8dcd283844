"""Joint action terms (reference src/mjlab/envs/mdp/actions/joint_actions.py
and actions_config.py): scale/offset affine processing, default-position
offsets and encoder-bias compensation for position actions."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.action_manager import ActionTerm
from mjlab_tpu.managers.manager_term_config import ActionTermCfg
from mjlab_tpu.utils.string import resolve_matching_names_values


class JointAction(ActionTerm):
    @property
    def scale(self):
        """Per-joint action scale (deployment metadata surface)."""
        return self._scale

    @property
    def offset(self):
        return self._offset

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        ids, names = self._asset.find_actuators(list(cfg.actuator_names))
        self._joint_ids = np.array(ids, np.int32)
        self._joint_names = names
        J = len(names)

        def expand(value, default):
            if value is None:
                return np.full(J, default, np.float32)
            if isinstance(value, dict):
                idxs, _, vals = resolve_matching_names_values(value, names)
                out = np.full(J, default, np.float32)
                out[idxs] = vals
                return out
            return np.full(J, float(value), np.float32)

        self._scale = jnp.asarray(expand(cfg.scale, 1.0))
        self._offset = jnp.asarray(expand(cfg.offset, 0.0))
        self._raw = None
        self._processed = None

    @property
    def action_dim(self) -> int:
        return len(self._joint_names)

    @property
    def raw_actions(self):
        return self._raw

    @property
    def processed_actions(self):
        return self._processed

    def process_actions(self, actions):
        self._raw = actions
        self._processed = actions * self._scale + self._offset

    def reset(self, env_mask):
        pass


@dataclass
class JointPositionActionCfg(ActionTermCfg):
    actuator_names: tuple[str, ...] = (".*",)
    scale: object = 1.0
    offset: object = None
    use_default_offset: bool = True

    def __post_init__(self):
        self.class_type = JointPositionAction


class JointPositionAction(JointAction):
    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        if cfg.use_default_offset and cfg.offset is None:
            self._offset = self._asset.default_joint_pos[0, self._joint_ids]

    def apply_actions(self):
        # encoder-bias compensation (reference joint_actions.py:101-104):
        # policies command positions in the BIASED (encoder) frame; subtract
        # the bias so the physical target is consistent.
        bias = self._asset.data.encoder_bias[:, self._joint_ids]
        self._asset.data.set_joint_position_target(
            self._processed - bias, joint_ids=self._joint_ids
        )


@dataclass
class JointVelocityActionCfg(ActionTermCfg):
    actuator_names: tuple[str, ...] = (".*",)
    scale: object = 1.0
    offset: object = None
    use_default_offset: bool = True

    def __post_init__(self):
        self.class_type = JointVelocityAction


class JointVelocityAction(JointAction):
    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        if cfg.use_default_offset and cfg.offset is None:
            self._offset = self._asset.default_joint_vel[0, self._joint_ids]

    def apply_actions(self):
        self._asset.data.set_joint_velocity_target(
            self._processed, joint_ids=self._joint_ids
        )


@dataclass
class JointEffortActionCfg(ActionTermCfg):
    actuator_names: tuple[str, ...] = (".*",)
    scale: object = 1.0
    offset: object = 0.0

    def __post_init__(self):
        self.class_type = JointEffortAction


class JointEffortAction(JointAction):
    def apply_actions(self):
        self._asset.data.set_joint_effort_target(
            self._processed, joint_ids=self._joint_ids
        )
