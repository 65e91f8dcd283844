"""Jump-specific observations (reference src/mjlab/tasks/jump/mdp/
observations.py). Foot terms re-export the base library; the jump-only
terms are root height and vertical velocity."""

from __future__ import annotations

from mjlab_tpu.envs.mdp.observations import (  # noqa: F401
    foot_air_time,
    foot_contact,
    foot_contact_forces,
    foot_height,
)
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

_DEFAULT = SceneEntityCfg("robot")


def height_above_ground(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Root height above the (flat) terrain (reference observations.py:19)."""
    asset = env.scene[asset_cfg.name]
    return asset.data.root_link_pos_w[:, 2:3]


def vertical_velocity(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    """World-frame vertical root velocity (reference observations.py:44)."""
    asset = env.scene[asset_cfg.name]
    return asset.data.root_link_lin_vel_w[:, 2:3]
