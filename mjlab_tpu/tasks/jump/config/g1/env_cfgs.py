"""Unitree G1 jump configuration
(reference src/mjlab/tasks/jump/config/g1/env_cfgs.py)."""

from __future__ import annotations

from mjlab_tpu.asset_zoo.robots.unitree_g1.g1_constants import (
    G1_ACTION_SCALE,
    get_g1_robot_cfg,
)
from mjlab_tpu.entity.entity import EntityCfg
from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnvCfg
from mjlab_tpu.sensor.contact_sensor import ContactMatch, ContactSensorCfg
from mjlab_tpu.tasks.jump.jump_env_cfg import make_jump_env_cfg

# Jump-ready crouch keyframe (reference config/g1/env_cfgs.py:19-47)
JUMP_CROUCH_KEYFRAME = EntityCfg.InitialStateCfg(
    pos=(0, 0, 0.55),
    joint_pos={
        ".*_hip_pitch_joint": -0.6,
        ".*_knee_joint": 1.2,
        ".*_ankle_pitch_joint": -0.6,
        ".*_hip_roll_joint": 0.0,
        ".*_hip_yaw_joint": 0.0,
        ".*_ankle_roll_joint": 0.0,
        "waist_yaw_joint": 0.0,
        "waist_roll_joint": 0.0,
        "waist_pitch_joint": 0.15,
        ".*_shoulder_pitch_joint": -0.5,
        "left_shoulder_roll_joint": 0.3,
        "right_shoulder_roll_joint": -0.3,
        ".*_shoulder_yaw_joint": 0.0,
        ".*_elbow_joint": 0.8,
        ".*_wrist_pitch_joint": 0.0,
        ".*_wrist_roll_joint": 0.0,
        ".*_wrist_yaw_joint": 0.0,
    },
    joint_vel={".*": 0.0},
)


def unitree_g1_jump_env_cfg(play: bool = False) -> ManagerBasedRlEnvCfg:
    cfg = make_jump_env_cfg()

    robot_cfg = get_g1_robot_cfg()
    robot_cfg.init_state = JUMP_CROUCH_KEYFRAME
    cfg.scene.entities = {"robot": robot_cfg}

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
    ].site_names = ("left_foot", "right_foot")
    cfg.rewards["upright_in_flight"].params["asset_cfg"].body_names = (
        "torso_link",
    )

    if play:
        cfg.episode_length_s = int(1e9)
        cfg.observations["policy"].enable_corruption = False
        cfg.events.clear()

    return cfg
