"""Unitree G1 jumping configuration
(reference src/mjlab/tasks/jumping/config/g1/env_cfgs.py)."""

from __future__ import annotations

from mjlab_tpu.asset_zoo.robots.unitree_g1.g1_constants import (
    G1_ACTION_SCALE,
    get_g1_robot_cfg,
)
from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnvCfg
from mjlab_tpu.sensor.contact_sensor import ContactMatch, ContactSensorCfg
from mjlab_tpu.tasks.jumping.jumping_env_cfg import make_jumping_env_cfg

_SITE_NAMES = ("left_foot", "right_foot")


def unitree_g1_jumping_env_cfg(play: bool = False) -> ManagerBasedRlEnvCfg:
    cfg = make_jumping_env_cfg()
    cfg.scene.entities = {"robot": get_g1_robot_cfg()}

    feet_ground_cfg = ContactSensorCfg(
        name="feet_ground_contact",
        primary=ContactMatch(
            mode="subtree",
            pattern=r"^(left_ankle_roll_link|right_ankle_roll_link)$",
            entity="robot",
        ),
        secondary=ContactMatch(mode="body", pattern="terrain/terrain"),
        fields=("found", "force"),
        reduce="netforce",
        num_slots=1,
        track_air_time=True,
    )
    cfg.scene.sensors = (feet_ground_cfg,)

    cfg.actions["joint_pos"].scale = G1_ACTION_SCALE

    cfg.observations["critic"].terms["foot_height"].params[
        "asset_cfg"
    ].site_names = _SITE_NAMES
    cfg.rewards["upright"].params["asset_cfg"].body_names = ("torso_link",)
    cfg.rewards["foot_slip"].params["asset_cfg"].site_names = _SITE_NAMES

    # G1 standing height from the KNEES_BENT keyframe
    standing_height = 0.76
    cfg.rewards["jump_height"].params["standing_height"] = standing_height
    cfg.rewards["continuous_height"].params["standing_height"] = standing_height
    cfg.commands["jump"].standing_height = standing_height

    if play:
        cfg.episode_length_s = int(1e9)
        cfg.observations["policy"].enable_corruption = False

    return cfg
