"""Tracking-task rewards (reference src/mjlab/tasks/tracking/mdp/rewards.py)."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.utils import math

__all__ = [
    "motion_global_anchor_position_error_exp",
    "motion_global_anchor_orientation_error_exp",
    "motion_relative_body_position_error_exp",
    "motion_relative_body_orientation_error_exp",
    "motion_global_body_linear_velocity_error_exp",
    "motion_global_body_angular_velocity_error_exp",
    "self_collision_cost",
]


def _body_indexes(command, body_names):
    return [
        i
        for i, name in enumerate(command.cfg.body_names)
        if body_names is None or name in body_names
    ]


def motion_global_anchor_position_error_exp(env, command_name: str, std: float):
    c = env.command_manager.get_term(command_name)
    err = jnp.sum(jnp.square(c.anchor_pos_w - c.robot_anchor_pos_w), -1)
    return jnp.exp(-err / std**2)


def motion_global_anchor_orientation_error_exp(env, command_name: str, std: float):
    c = env.command_manager.get_term(command_name)
    err = math.quat_error_magnitude(c.anchor_quat_w, c.robot_anchor_quat_w) ** 2
    return jnp.exp(-err / std**2)


def motion_relative_body_position_error_exp(
    env, command_name: str, std: float, body_names=None
):
    c = env.command_manager.get_term(command_name)
    ids = _body_indexes(c, body_names)
    err = jnp.sum(
        jnp.square(
            c.body_pos_relative_w[:, ids] - c.robot_body_pos_w[:, ids]
        ),
        -1,
    )
    return jnp.exp(-jnp.mean(err, -1) / std**2)


def motion_relative_body_orientation_error_exp(
    env, command_name: str, std: float, body_names=None
):
    c = env.command_manager.get_term(command_name)
    ids = _body_indexes(c, body_names)
    err = (
        math.quat_error_magnitude(
            c.body_quat_relative_w[:, ids], c.robot_body_quat_w[:, ids]
        )
        ** 2
    )
    return jnp.exp(-jnp.mean(err, -1) / std**2)


def motion_global_body_linear_velocity_error_exp(
    env, command_name: str, std: float, body_names=None
):
    c = env.command_manager.get_term(command_name)
    ids = _body_indexes(c, body_names)
    err = jnp.sum(
        jnp.square(c.body_lin_vel_w[:, ids] - c.robot_body_lin_vel_w[:, ids]), -1
    )
    return jnp.exp(-jnp.mean(err, -1) / std**2)


def motion_global_body_angular_velocity_error_exp(
    env, command_name: str, std: float, body_names=None
):
    c = env.command_manager.get_term(command_name)
    ids = _body_indexes(c, body_names)
    err = jnp.sum(
        jnp.square(c.body_ang_vel_w[:, ids] - c.robot_body_ang_vel_w[:, ids]), -1
    )
    return jnp.exp(-jnp.mean(err, -1) / std**2)


def self_collision_cost(env, sensor_name: str):
    sensor = env.scene[sensor_name]
    found = sensor.data.found
    return jnp.sum(found.astype(jnp.float32), axis=-1)
