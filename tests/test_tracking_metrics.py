"""Tracking metrics math (reference tests/test_tracking_metrics.py):
mpkpe / root-relative mpkpe / ee errors on hand-built command states."""

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.tasks.tracking.mdp import metrics


class _Cfg:
    body_names = ("pelvis", "left_hand", "right_hand")


class _Cmd:
    def __init__(self):
        E, B = 2, 3
        self.cfg = _Cfg()
        self.body_pos_w = jnp.zeros((E, B, 3))
        # robot bodies offset by (0.1, 0, 0) everywhere
        self.robot_body_pos_w = self.body_pos_w + jnp.array([0.1, 0.0, 0.0])
        self.body_quat_w = jnp.tile(
            jnp.array([1.0, 0.0, 0.0, 0.0]), (E, B, 1)
        )
        # robot hands rotated 90 deg about z
        q90 = jnp.array([jnp.cos(jnp.pi / 4), 0.0, 0.0, jnp.sin(jnp.pi / 4)])
        self.robot_body_quat_w = jnp.tile(q90, (E, B, 1))
        self.anchor_pos_w = jnp.zeros((E, 3))
        self.anchor_quat_w = jnp.tile(jnp.array([1.0, 0, 0, 0]), (E, 1))
        self.robot_anchor_pos_w = jnp.full((E, 3), 0.1) * jnp.array([1, 0, 0])
        self.robot_anchor_quat_w = self.anchor_quat_w
        self.joint_vel = jnp.zeros((E, 4))
        self.robot_joint_vel = jnp.full((E, 4), 0.5)


class _CM:
    def __init__(self):
        self._t = _Cmd()

    def get_term(self, name):
        return self._t


class _Env:
    command_manager = None

    def __init__(self):
        self.command_manager = _CM()


def test_mpkpe_uniform_offset():
    env = _Env()
    v = np.asarray(metrics.mpkpe(env, "motion"))
    np.testing.assert_allclose(v, 0.1, atol=1e-6)


def test_root_relative_mpkpe_cancels_anchor_offset():
    env = _Env()
    # the robot anchor carries the same 0.1 offset as every body, so the
    # root-relative error vanishes
    v = np.asarray(metrics.root_relative_mpkpe(env, "motion"))
    np.testing.assert_allclose(v, 0.0, atol=1e-6)


def test_joint_velocity_error():
    env = _Env()
    v = np.asarray(metrics.joint_velocity_error(env, "motion"))
    np.testing.assert_allclose(v, 0.5 * 2.0, atol=1e-6)  # ||0.5*ones(4)||


def test_ee_errors():
    env = _Env()
    pos_err = np.asarray(
        metrics.ee_position_error(env, "motion", ("left_hand", "right_hand"))
    )
    np.testing.assert_allclose(pos_err, 0.1, atol=1e-6)
    ori_err = np.asarray(
        metrics.ee_orientation_error(env, "motion", ("left_hand", "right_hand"))
    )
    np.testing.assert_allclose(ori_err, np.pi / 2, atol=1e-5)
