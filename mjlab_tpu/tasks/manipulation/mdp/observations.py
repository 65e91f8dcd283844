"""Manipulation observations (reference src/mjlab/tasks/manipulation/mdp/
observations.py)."""

from __future__ import annotations

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg
from mjlab_tpu.utils import math

_DEFAULT = SceneEntityCfg("robot")


def ee_to_object_distance(
    env, object_name: str, asset_cfg: SceneEntityCfg = _DEFAULT
):
    """EE -> object vector in the robot base frame (reference L18-31)."""
    robot = env.scene[asset_cfg.name]
    obj = env.scene[object_name]
    ee_pos = robot.data.site_pos_w[:, asset_cfg.site_ids][:, 0]
    vec_w = obj.data.root_link_pos_w - ee_pos
    base_quat = robot.data.root_link_quat_w
    return math.quat_apply(math.quat_inv(base_quat), vec_w)


def object_position_error(env, object_name: str, command_name: str):
    """target - object position, world frame (reference L34-47)."""
    term = env.command_manager.get_term(command_name)
    obj = env.scene[object_name]
    return term.target_pos - obj.data.root_link_pos_w
