"""Reward term library (reference src/mjlab/envs/mdp/rewards.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.manager_base import ManagerTermBase
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg
from mjlab_tpu.utils.string import resolve_matching_names_values

__all__ = [
    "is_alive",
    "is_terminated",
    "joint_torques_l2",
    "joint_vel_l2",
    "joint_acc_l2",
    "action_rate_l2",
    "action_acc_l2",
    "joint_pos_limits",
    "flat_orientation_l2",
    "posture",
    "electrical_power_cost",
]

_DEFAULT = SceneEntityCfg("robot")


def is_alive(env):
    return (~env.termination_manager.terminated).astype(jnp.float32)


def is_terminated(env):
    return env.termination_manager.terminated.astype(jnp.float32)


def joint_torques_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    return jnp.sum(jnp.square(data.actuator_force[:, asset_cfg.actuator_ids]), -1)


def joint_vel_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    return jnp.sum(jnp.square(data.joint_vel[:, asset_cfg.joint_ids]), -1)


def joint_acc_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    data = env.scene[asset_cfg.name].data
    return jnp.sum(jnp.square(data.joint_acc[:, asset_cfg.joint_ids]), -1)


def action_rate_l2(env):
    am = env.action_manager
    return jnp.sum(jnp.square(am.action - am.prev_action), -1)


def action_acc_l2(env):
    am = env.action_manager
    return jnp.sum(
        jnp.square(am.action - 2 * am.prev_action + am.prev_prev_action), -1
    )


def joint_pos_limits(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Penalize joint positions beyond the soft limits."""
    data = env.scene[asset_cfg.name].data
    ids = asset_cfg.joint_ids
    jp = data.joint_pos[:, ids]
    lo = data.soft_joint_pos_limits[:, ids, 0]
    hi = data.soft_joint_pos_limits[:, ids, 1]
    out_lo = -jnp.minimum(jp - lo, 0.0)
    out_hi = jnp.maximum(jp - hi, 0.0)
    return jnp.sum(out_lo + out_hi, -1)


def flat_orientation_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    g = env.scene[asset_cfg.name].data.projected_gravity_b
    return jnp.sum(jnp.square(g[:, :2]), -1)


class posture(ManagerTermBase):
    """Exp-kernel posture tracking with per-joint std resolved from regex
    (reference rewards.py:91)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        asset_cfg = cfg.params.get("asset_cfg", _DEFAULT)
        self._asset = env.scene[asset_cfg.name]
        std_map = cfg.params["std"]
        names = list(self._asset.joint_names)
        ids, _, vals = resolve_matching_names_values(std_map, names)
        std = np.full(len(names), np.inf, np.float32)
        std[ids] = vals
        self._std = jnp.asarray(std)

    def __call__(self, env, std=None, asset_cfg: SceneEntityCfg = _DEFAULT):
        data = self._asset.data
        err = data.joint_pos - data.default_joint_pos
        return jnp.exp(-jnp.mean(jnp.square(err / self._std), -1))


class electrical_power_cost(ManagerTermBase):
    """|tau * qd| cost with per-joint gear ratios
    (reference rewards.py:125)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        asset_cfg = cfg.params.get("asset_cfg", _DEFAULT)
        self._asset = env.scene[asset_cfg.name]

    def __call__(self, env, asset_cfg: SceneEntityCfg = _DEFAULT):
        data = self._asset.data
        power = data.actuator_force * data.joint_vel[:, : data.actuator_force.shape[1]]
        return jnp.sum(jnp.maximum(power, 0.0), -1)
