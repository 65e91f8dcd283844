"""Manipulation rewards (reference src/mjlab/tasks/manipulation/mdp/
rewards.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

_DEFAULT = SceneEntityCfg("robot")


def staged_position_reward(
    env,
    command_name: str,
    object_name: str,
    reaching_std: float,
    bringing_std: float,
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    """reaching * (1 + bringing) Gaussian staging (reference L17-40)."""
    robot = env.scene[asset_cfg.name]
    obj = env.scene[object_name]
    term = env.command_manager.get_term(command_name)
    ee_pos = robot.data.site_pos_w[:, asset_cfg.site_ids][:, 0]
    obj_pos = obj.data.root_link_pos_w
    reach_err = jnp.sum(jnp.square(ee_pos - obj_pos), axis=-1)
    reaching = jnp.exp(-reach_err / reaching_std**2)
    pos_err = jnp.sum(jnp.square(term.target_pos - obj_pos), axis=-1)
    bringing = jnp.exp(-pos_err / bringing_std**2)
    return reaching * (1.0 + bringing)


def bring_object_reward(env, command_name: str, object_name: str, std: float):
    """Gaussian on object-to-target error (reference L42-53)."""
    obj = env.scene[object_name]
    term = env.command_manager.get_term(command_name)
    pos_err = jnp.sum(
        jnp.square(term.target_pos - obj.data.root_link_pos_w), axis=-1
    )
    return jnp.exp(-pos_err / std**2)


def joint_velocity_hinge_penalty(
    env, max_vel: float, asset_cfg: SceneEntityCfg = _DEFAULT
):
    """Quadratic hinge on |joint vel| beyond max_vel (reference L56-80)."""
    robot = env.scene[asset_cfg.name]
    jv = robot.data.joint_vel[:, asset_cfg.joint_ids]
    excess = jnp.clip(jnp.abs(jv) - max_vel, 0.0)
    return jnp.sum(excess**2, axis=-1)
