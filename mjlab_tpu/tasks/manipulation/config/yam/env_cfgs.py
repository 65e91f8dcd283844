"""I2RT YAM lift-cube configuration
(reference src/mjlab/tasks/manipulation/config/yam/env_cfgs.py)."""

from __future__ import annotations

import mujoco

from mjlab_tpu.asset_zoo.robots.i2rt_yam.yam_constants import (
    YAM_ACTION_SCALE,
    get_yam_robot_cfg,
)
from mjlab_tpu.entity.entity import EntityCfg
from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnvCfg
from mjlab_tpu.tasks.manipulation.lift_cube_env_cfg import make_lift_cube_env_cfg


def get_cube_spec(cube_size: float = 0.02, mass: float = 0.05) -> mujoco.MjSpec:
    spec = mujoco.MjSpec()
    body = spec.worldbody.add_body(name="cube")
    body.add_freejoint(name="cube_joint")
    body.add_geom(
        name="cube_geom",
        type=mujoco.mjtGeom.mjGEOM_BOX,
        size=(cube_size,) * 3,
        mass=mass,
        rgba=(0.8, 0.2, 0.2, 1.0),
        friction=(1.0, 5e-3, 5e-4),
        condim=6,
    )
    return spec


def yam_lift_cube_env_cfg(play: bool = False) -> ManagerBasedRlEnvCfg:
    cfg = make_lift_cube_env_cfg()

    cfg.scene.entities = {
        "robot": get_yam_robot_cfg(),
        "cube": EntityCfg(
            spec_fn=get_cube_spec,
            init_state=EntityCfg.InitialStateCfg(
                pos=(0.3, 0.0, 0.02), joint_pos=None
            ),
        ),
    }

    cfg.actions["joint_pos"].scale = YAM_ACTION_SCALE

    cfg.observations["policy"].terms["ee_to_cube"].params[
        "asset_cfg"
    ].site_names = ("grasp_site",)
    cfg.observations["critic"].terms["ee_to_cube"].params[
        "asset_cfg"
    ].site_names = ("grasp_site",)
    cfg.rewards["lift"].params["asset_cfg"].site_names = ("grasp_site",)

    fingertip_geoms = (r"[lr]f_down(6|7|8|9|10|11)_collision",)
    for ev in (
        "fingertip_friction_slide",
        "fingertip_friction_spin",
        "fingertip_friction_roll",
    ):
        cfg.events[ev].params["asset_cfg"].geom_names = fingertip_geoms

    for sensor in cfg.scene.sensors:
        if sensor.name == "ee_ground_collision":
            sensor.primary.pattern = "link_6"

    if play:
        cfg.episode_length_s = int(1e9)
        cfg.observations["policy"].enable_corruption = False

    return cfg
