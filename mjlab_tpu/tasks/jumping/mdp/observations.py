"""Jumping-task observations (reference src/mjlab/tasks/jumping/mdp/
observations.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.envs.mdp.observations import (  # noqa: F401
    foot_contact,
    foot_contact_forces,
    foot_height,
)
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

_DEFAULT = SceneEntityCfg("robot")


def pelvis_height(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    asset = env.scene[asset_cfg.name]
    return asset.data.root_link_pos_w[:, 2:3]


def pelvis_vertical_velocity(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    asset = env.scene[asset_cfg.name]
    return asset.data.root_link_lin_vel_w[:, 2:3]


def pelvis_height_relative(
    env, standing_height: float = 0.76, asset_cfg: SceneEntityCfg = _DEFAULT
):
    asset = env.scene[asset_cfg.name]
    return asset.data.root_link_pos_w[:, 2:3] - standing_height


def feet_in_contact(env, sensor_name: str):
    sensor = env.scene[sensor_name]
    return (sensor.data.found > 0).astype(jnp.float32)


def both_feet_in_contact(env, sensor_name: str):
    sensor = env.scene[sensor_name]
    return jnp.all(sensor.data.found > 0, axis=1, keepdims=True).astype(
        jnp.float32
    )
