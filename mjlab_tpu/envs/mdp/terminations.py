"""Termination term library (reference src/mjlab/envs/mdp/terminations.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

__all__ = ["time_out", "bad_orientation", "root_height_below_minimum", "nan_detection"]

_DEFAULT = SceneEntityCfg("robot")


def time_out(env):
    return env.episode_length_buf >= env.max_episode_length


def bad_orientation(env, limit_angle: float, asset_cfg: SceneEntityCfg = _DEFAULT):
    g = env.scene[asset_cfg.name].data.projected_gravity_b
    # angle between -z and projected gravity
    tilt = jnp.arccos(jnp.clip(-g[:, 2], -1.0, 1.0))
    return tilt > limit_angle


def root_height_below_minimum(
    env, minimum_height: float, asset_cfg: SceneEntityCfg = _DEFAULT
):
    return env.scene[asset_cfg.name].data.root_link_pos_w[:, 2] < minimum_height


def nan_detection(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Per-env NaN quarantine (reference terminations.py:45): exploded envs
    terminate and reset while training continues."""
    d = env.ctx.data
    bad = ~jnp.isfinite(d.qpos).all(axis=-1)
    bad |= ~jnp.isfinite(d.qvel).all(axis=-1)
    bad |= ~jnp.isfinite(d.qacc).all(axis=-1)
    return bad
