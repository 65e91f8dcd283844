"""Jumping-task rewards (reference src/mjlab/tasks/jumping/mdp/rewards.py).

The sparse landing reward keeps per-env peak/flight state in the reward
manager's traced state (ManagerTermBase state protocol)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerTermBase
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg
from mjlab_tpu.tasks.velocity.mdp.rewards import (  # noqa: F401
    flat_orientation,
    soft_landing,
)

_DEFAULT = SceneEntityCfg("robot")


class jump_height_reward(ManagerTermBase):
    """Sparse landing reward: exp(-|peak - target| / std) when both feet
    land after flight (reference rewards.py:21-93)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        asset_cfg = cfg.params.get("asset_cfg", _DEFAULT)
        self._asset = env.scene[asset_cfg.name]
        self._sensor = env.scene[cfg.params["sensor_name"]]

    def init_state(self, num_envs):
        return {
            "peak": jnp.zeros((num_envs,), jnp.float32),
            "was_in_flight": jnp.zeros((num_envs,), bool),
        }

    def __call__(
        self,
        env,
        command_name: str,
        sensor_name: str,
        std: float = 0.1,
        asset_cfg: SceneEntityCfg = _DEFAULT,
        standing_height: float = 0.76,
    ):
        st = dict(self.state)
        h = self._asset.data.root_link_pos_w[:, 2]
        st["peak"] = jnp.maximum(st["peak"], h)

        found = self._sensor.data.found
        both = jnp.all(found > 0, axis=1)
        st["was_in_flight"] = st["was_in_flight"] | ~both
        just_landed = st["was_in_flight"] & both

        command = env.command_manager.get_command(command_name)
        target_height = standing_height + command[:, 1]
        height_achieved = st["peak"] - standing_height
        err = jnp.abs(st["peak"] - target_height)
        reward = jnp.exp(-err / std) * just_landed

        n = jnp.sum(just_landed)
        env.extras["log"]["Metrics/jump_height_mean"] = jnp.sum(
            height_achieved * just_landed
        ) / jnp.maximum(n, 1)
        env.extras["log"]["Metrics/num_landings"] = n.astype(jnp.float32)

        st["peak"] = jnp.where(just_landed, h, st["peak"])
        st["was_in_flight"] = jnp.where(just_landed, False, st["was_in_flight"])
        self.state = st
        return reward

    def reset(self, env_mask, ctx=None):
        st = dict(self.state)
        st["peak"] = jnp.where(env_mask, 0.0, st["peak"])
        st["was_in_flight"] = jnp.where(env_mask, False, st["was_in_flight"])
        self.state = st
        return {}


class continuous_jump_height(ManagerTermBase):
    """Dense flight-height reward (reference rewards.py:190-220)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        asset_cfg = cfg.params.get("asset_cfg", _DEFAULT)
        self._asset = env.scene[asset_cfg.name]
        self._sensor = env.scene[cfg.params["sensor_name"]]

    def __call__(
        self,
        env,
        sensor_name: str,
        standing_height: float = 0.76,
        asset_cfg: SceneEntityCfg = _DEFAULT,
    ):
        h = self._asset.data.root_link_pos_w[:, 2] - standing_height
        both = jnp.all(self._sensor.data.found > 0, axis=1)
        return jnp.clip(h, 0.0) * ~both


def launch_velocity_reward(
    env, command_name: str, sensor_name: str, asset_cfg: SceneEntityCfg = _DEFAULT
):
    """Upward velocity while pushing off under an active jump trigger
    (reference rewards.py:95-124)."""
    asset = env.scene[asset_cfg.name]
    sensor = env.scene[sensor_name]
    vz = asset.data.root_link_lin_vel_w[:, 2]
    in_contact = jnp.any(sensor.data.found > 0, axis=1)
    triggered = env.command_manager.get_command(command_name)[:, 0] > 0.5
    return jnp.clip(vz, 0.0) * in_contact * triggered


def horizontal_drift_penalty(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    asset = env.scene[asset_cfg.name]
    return jnp.sum(jnp.square(asset.data.root_link_lin_vel_w[:, :2]), axis=1)


def excessive_rotation_penalty(
    env, sensor_name: str, asset_cfg: SceneEntityCfg = _DEFAULT
):
    asset = env.scene[asset_cfg.name]
    sensor = env.scene[sensor_name]
    in_flight = ~jnp.all(sensor.data.found > 0, axis=1)
    ang = asset.data.root_link_ang_vel_w[:, :2]
    return jnp.sum(jnp.square(ang), axis=1) * in_flight


def stable_landing_reward(
    env, sensor_name: str, std: float = 0.2, asset_cfg: SceneEntityCfg = _DEFAULT
):
    asset = env.scene[asset_cfg.name]
    sensor = env.scene[sensor_name]
    both = jnp.all(sensor.data.found > 0, axis=1)
    g = asset.data.projected_gravity_b
    upright = jnp.exp(-jnp.sum(jnp.square(g[:, :2]), axis=1) / (std * std))
    return upright * both


def feet_slip_penalty(
    env, sensor_name: str, asset_cfg: SceneEntityCfg = _DEFAULT
):
    asset = env.scene[asset_cfg.name]
    sensor = env.scene[sensor_name]
    in_contact = (sensor.data.found > 0).astype(jnp.float32)
    vel = asset.data.site_lin_vel_w[:, asset_cfg.site_ids, :2]
    return jnp.sum(jnp.sum(jnp.square(vel), axis=-1) * in_contact, axis=1)
