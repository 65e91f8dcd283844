"""Tracking-task terminations (reference
src/mjlab/tasks/tracking/mdp/terminations.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg
from mjlab_tpu.utils import math

__all__ = [
    "bad_anchor_pos",
    "bad_anchor_pos_z_only",
    "bad_anchor_ori",
    "bad_motion_body_pos",
    "bad_motion_body_pos_z_only",
]


def _body_indexes(command, body_names):
    return [
        i
        for i, name in enumerate(command.cfg.body_names)
        if body_names is None or name in body_names
    ]


def bad_anchor_pos(env, command_name: str, threshold: float):
    c = env.command_manager.get_term(command_name)
    return jnp.linalg.norm(c.anchor_pos_w - c.robot_anchor_pos_w, axis=1) > threshold


def bad_anchor_pos_z_only(env, command_name: str, threshold: float):
    c = env.command_manager.get_term(command_name)
    return jnp.abs(c.anchor_pos_w[:, -1] - c.robot_anchor_pos_w[:, -1]) > threshold


def bad_anchor_ori(
    env, asset_cfg: SceneEntityCfg, command_name: str, threshold: float
):
    asset = env.scene[asset_cfg.name]
    c = env.command_manager.get_term(command_name)
    g = asset.data.gravity_vec_w
    motion_g = math.quat_apply_inverse(c.anchor_quat_w, g)
    robot_g = math.quat_apply_inverse(c.robot_anchor_quat_w, g)
    return jnp.abs(motion_g[:, 2] - robot_g[:, 2]) > threshold


def bad_motion_body_pos(env, command_name: str, threshold: float, body_names=None):
    c = env.command_manager.get_term(command_name)
    ids = _body_indexes(c, body_names)
    err = jnp.linalg.norm(
        c.body_pos_relative_w[:, ids] - c.robot_body_pos_w[:, ids], axis=-1
    )
    return jnp.any(err > threshold, axis=-1)


def bad_motion_body_pos_z_only(
    env, command_name: str, threshold: float, body_names=None
):
    c = env.command_manager.get_term(command_name)
    ids = _body_indexes(c, body_names)
    err = jnp.abs(
        c.body_pos_relative_w[:, ids, -1] - c.robot_body_pos_w[:, ids, -1]
    )
    return jnp.any(err > threshold, axis=-1)
