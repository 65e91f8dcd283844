"""Tracking evaluation metrics (reference
src/mjlab/tasks/tracking/mdp/metrics.py:13-84): mean-per-keypoint position
error (mpkpe), root-relative mpkpe, joint velocity error, end-effector
pos/ori errors. Used by the standalone evaluator and nightly benches."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.utils import math

__all__ = [
    "mpkpe",
    "root_relative_mpkpe",
    "joint_velocity_error",
    "ee_position_error",
    "ee_orientation_error",
]


def mpkpe(env, command_name: str):
    """Mean per-keypoint position error in the world frame (m)."""
    c = env.command_manager.get_term(command_name)
    return jnp.mean(
        jnp.linalg.norm(c.body_pos_w - c.robot_body_pos_w, axis=-1), axis=-1
    )


def root_relative_mpkpe(env, command_name: str):
    """mpkpe after expressing keypoints relative to the anchor frames."""
    c = env.command_manager.get_term(command_name)

    def rel(pos, anchor_pos, anchor_quat):
        return math.quat_apply_inverse(
            anchor_quat[:, None, :], pos - anchor_pos[:, None, :]
        )

    ref = rel(c.body_pos_w, c.anchor_pos_w, c.anchor_quat_w)
    cur = rel(c.robot_body_pos_w, c.robot_anchor_pos_w, c.robot_anchor_quat_w)
    return jnp.mean(jnp.linalg.norm(ref - cur, axis=-1), axis=-1)


def joint_velocity_error(env, command_name: str):
    c = env.command_manager.get_term(command_name)
    return jnp.linalg.norm(c.joint_vel - c.robot_joint_vel, axis=-1)


def ee_position_error(env, command_name: str, body_names: tuple):
    c = env.command_manager.get_term(command_name)
    ids = [c.cfg.body_names.index(n) for n in body_names]
    return jnp.mean(
        jnp.linalg.norm(
            c.body_pos_w[:, ids] - c.robot_body_pos_w[:, ids], axis=-1
        ),
        axis=-1,
    )


def ee_orientation_error(env, command_name: str, body_names: tuple):
    c = env.command_manager.get_term(command_name)
    ids = [c.cfg.body_names.index(n) for n in body_names]
    return jnp.mean(
        math.quat_error_magnitude(
            c.body_quat_w[:, ids], c.robot_body_quat_w[:, ids]
        ),
        axis=-1,
    )
