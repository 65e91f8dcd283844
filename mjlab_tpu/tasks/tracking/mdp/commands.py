"""Motion-imitation command (BeyondMimic-style), as pure masked state
transitions (reference src/mjlab/tasks/tracking/mdp/commands.py:32-502).

Key pieces, all inside the jitted step:
  - MotionLoader: npz reference motion (joint pos/vel + body poses/vels)
    held as device constants
  - reference-state initialization (RSI) with pose/velocity/joint noise on
    resample, writing the robot state directly
  - ADAPTIVE start-frame sampling: per-bin failure EMA, smoothed by a
    non-causal exponential kernel, sampled via Gumbel/categorical — the
    reference's multinomial + conv1d redone with static shapes
  - anchor-relative retargeting: desired body poses re-expressed around the
    robot's current anchor (yaw-aligned, xy-translated)
"""

from __future__ import annotations

import math as pymath
from dataclasses import dataclass, field as dfield
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.command_manager import CommandTerm
from mjlab_tpu.managers.manager_term_config import CommandTermCfg
from mjlab_tpu.utils import math


class MotionLoader:
    """Reference motion arrays from npz (device constants)."""

    def __init__(self, motion_file: str, body_indexes: np.ndarray):
        data = np.load(motion_file)
        self.joint_pos = jnp.asarray(data["joint_pos"], jnp.float32)
        self.joint_vel = jnp.asarray(data["joint_vel"], jnp.float32)
        self.body_pos_w = jnp.asarray(
            data["body_pos_w"][:, body_indexes], jnp.float32
        )
        self.body_quat_w = jnp.asarray(
            data["body_quat_w"][:, body_indexes], jnp.float32
        )
        self.body_lin_vel_w = jnp.asarray(
            data["body_lin_vel_w"][:, body_indexes], jnp.float32
        )
        self.body_ang_vel_w = jnp.asarray(
            data["body_ang_vel_w"][:, body_indexes], jnp.float32
        )
        self.time_step_total = int(self.joint_pos.shape[0])


class MotionCommand(CommandTerm):
    cfg: "MotionCommandCfg"

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        self.robot = env.scene[cfg.asset_name]
        self.robot_anchor_body_index = self.robot.body_names.index(
            cfg.anchor_body_name
        )
        self.motion_anchor_body_index = cfg.body_names.index(cfg.anchor_body_name)
        ids, _ = self.robot.find_bodies(list(cfg.body_names), preserve_order=True)
        self.body_indexes = np.array(ids, np.int32)
        # motion npz stores ALL robot bodies in entity order; select ours
        self.motion = MotionLoader(cfg.motion_file, self.body_indexes)
        self.bin_count = (
            int(self.motion.time_step_total // (1 / env.step_dt)) + 1
        )
        k = np.array(
            [cfg.adaptive_lambda**i for i in range(cfg.adaptive_kernel_size)],
            np.float32,
        )
        self.kernel = jnp.asarray(k / k.sum())

    # -- state --

    def init_state(self, num_envs, rng):
        B = len(self.cfg.body_names)
        return {
            "time_steps": jnp.zeros((num_envs,), jnp.int32),
            "time_left": jnp.full((num_envs,), 1e9, jnp.float32),
            "body_pos_relative_w": jnp.zeros((num_envs, B, 3), jnp.float32),
            "body_quat_relative_w": jnp.zeros((num_envs, B, 4), jnp.float32)
            .at[:, :, 0].set(1.0),
            "bin_failed_count": jnp.zeros((self.bin_count,), jnp.float32),
            "current_bin_failed": jnp.zeros((self.bin_count,), jnp.float32),
            "metrics": {
                n: jnp.zeros((num_envs,), jnp.float32)
                for n in (
                    "error_anchor_pos", "error_anchor_rot",
                    "error_anchor_lin_vel", "error_anchor_ang_vel",
                    "error_body_pos", "error_body_rot",
                    "error_body_lin_vel", "error_body_ang_vel",
                    "error_joint_pos", "error_joint_vel",
                    "sampling_entropy", "sampling_top1_prob",
                    "sampling_top1_bin",
                )
            },
        }

    # -- motion-indexed views (use CURRENT state) --

    def _ts(self, state=None):
        return (state or self.state)["time_steps"]

    @property
    def joint_pos(self):
        return self.motion.joint_pos[self._ts()]

    @property
    def joint_vel(self):
        return self.motion.joint_vel[self._ts()]

    @property
    def body_pos_w(self):
        return (
            self.motion.body_pos_w[self._ts()]
            + self._env.scene.env_origins[:, None, :]
        )

    @property
    def body_quat_w(self):
        return self.motion.body_quat_w[self._ts()]

    @property
    def body_lin_vel_w(self):
        return self.motion.body_lin_vel_w[self._ts()]

    @property
    def body_ang_vel_w(self):
        return self.motion.body_ang_vel_w[self._ts()]

    @property
    def anchor_pos_w(self):
        return self.body_pos_w[:, self.motion_anchor_body_index]

    @property
    def anchor_quat_w(self):
        return self.body_quat_w[:, self.motion_anchor_body_index]

    @property
    def anchor_lin_vel_w(self):
        return self.body_lin_vel_w[:, self.motion_anchor_body_index]

    @property
    def anchor_ang_vel_w(self):
        return self.body_ang_vel_w[:, self.motion_anchor_body_index]

    @property
    def body_pos_relative_w(self):
        return self.state["body_pos_relative_w"]

    @property
    def body_quat_relative_w(self):
        return self.state["body_quat_relative_w"]

    # robot-side views
    @property
    def robot_joint_pos(self):
        return self.robot.data.joint_pos

    @property
    def robot_joint_vel(self):
        return self.robot.data.joint_vel

    @property
    def robot_body_pos_w(self):
        return self.robot.data.body_link_pos_w[:, self.body_indexes]

    @property
    def robot_body_quat_w(self):
        return self.robot.data.body_link_quat_w[:, self.body_indexes]

    @property
    def robot_body_lin_vel_w(self):
        return self.robot.data.body_link_lin_vel_w[:, self.body_indexes]

    @property
    def robot_body_ang_vel_w(self):
        return self.robot.data.body_link_ang_vel_w[:, self.body_indexes]

    @property
    def robot_anchor_pos_w(self):
        return self.robot.data.body_link_pos_w[:, self.robot_anchor_body_index]

    @property
    def robot_anchor_quat_w(self):
        return self.robot.data.body_link_quat_w[:, self.robot_anchor_body_index]

    @property
    def robot_anchor_lin_vel_w(self):
        return self.robot.data.body_link_lin_vel_w[:, self.robot_anchor_body_index]

    @property
    def robot_anchor_ang_vel_w(self):
        return self.robot.data.body_link_ang_vel_w[:, self.robot_anchor_body_index]

    def _get_command(self, state):
        ts = state["time_steps"]
        return jnp.concatenate(
            [self.motion.joint_pos[ts], self.motion.joint_vel[ts]], axis=1
        )

    # -- metrics --

    def _update_metrics(self, state):
        m = dict(state["metrics"])
        m["error_anchor_pos"] = jnp.linalg.norm(
            self.anchor_pos_w - self.robot_anchor_pos_w, axis=-1
        )
        m["error_anchor_rot"] = math.quat_error_magnitude(
            self.anchor_quat_w, self.robot_anchor_quat_w
        )
        m["error_anchor_lin_vel"] = jnp.linalg.norm(
            self.anchor_lin_vel_w - self.robot_anchor_lin_vel_w, axis=-1
        )
        m["error_anchor_ang_vel"] = jnp.linalg.norm(
            self.anchor_ang_vel_w - self.robot_anchor_ang_vel_w, axis=-1
        )
        m["error_body_pos"] = jnp.mean(
            jnp.linalg.norm(
                state["body_pos_relative_w"] - self.robot_body_pos_w, axis=-1
            ),
            axis=-1,
        )
        m["error_body_rot"] = jnp.mean(
            math.quat_error_magnitude(
                state["body_quat_relative_w"], self.robot_body_quat_w
            ),
            axis=-1,
        )
        m["error_body_lin_vel"] = jnp.mean(
            jnp.linalg.norm(
                self.body_lin_vel_w - self.robot_body_lin_vel_w, axis=-1
            ),
            axis=-1,
        )
        m["error_body_ang_vel"] = jnp.mean(
            jnp.linalg.norm(
                self.body_ang_vel_w - self.robot_body_ang_vel_w, axis=-1
            ),
            axis=-1,
        )
        m["error_joint_pos"] = jnp.linalg.norm(
            self.joint_pos - self.robot_joint_pos, axis=-1
        )
        m["error_joint_vel"] = jnp.linalg.norm(
            self.joint_vel - self.robot_joint_vel, axis=-1
        )
        state["metrics"] = m
        return state

    # -- sampling --

    def _sample_time_steps(self, state, mask, rng):
        E = mask.shape[0]
        T = self.motion.time_step_total
        nb = self.bin_count
        m = dict(state["metrics"])
        if self.cfg.sampling_mode == "start":
            new_ts = jnp.zeros((E,), jnp.int32)
        elif self.cfg.sampling_mode == "uniform":
            new_ts = jax.random.randint(rng, (E,), 0, T)
            m["sampling_entropy"] = jnp.full((E,), 1.0)
            m["sampling_top1_prob"] = jnp.full((E,), 1.0 / nb)
            m["sampling_top1_bin"] = jnp.full((E,), 0.5)
        else:  # adaptive
            # failure accumulation for envs resampling NOW
            failed = self._env.termination_manager.terminated & mask
            cur_bin = jnp.clip(
                (state["time_steps"] * nb) // max(T, 1), 0, nb - 1
            )
            counts = (
                jnp.zeros((nb,), jnp.float32)
                .at[cur_bin]
                .add(failed.astype(jnp.float32))
            )
            any_failed = jnp.any(failed)
            state["current_bin_failed"] = jnp.where(
                any_failed, counts, state["current_bin_failed"]
            )
            # smoothed sampling probabilities (replicate-pad + conv)
            p = state["bin_failed_count"] + self.cfg.adaptive_uniform_ratio / nb
            ksz = self.cfg.adaptive_kernel_size
            p_pad = jnp.concatenate([p, jnp.full((ksz - 1,), p[-1])])
            p_smooth = jnp.convolve(p_pad, self.kernel[::-1], mode="valid")
            p_smooth = p_smooth / jnp.sum(p_smooth)
            k1, k2 = jax.random.split(rng)
            bins = jax.random.categorical(
                k1, jnp.log(p_smooth + 1e-12), shape=(E,)
            )
            u = jax.random.uniform(k2, (E,))
            new_ts = (
                (bins.astype(jnp.float32) + u) / nb * (T - 1)
            ).astype(jnp.int32)
            H = -jnp.sum(p_smooth * jnp.log(p_smooth + 1e-12))
            m["sampling_entropy"] = jnp.full((E,), H / pymath.log(nb))
            m["sampling_top1_prob"] = jnp.full((E,), jnp.max(p_smooth))
            m["sampling_top1_bin"] = jnp.full(
                (E,), jnp.argmax(p_smooth).astype(jnp.float32) / nb
            )
        state["metrics"] = m
        state["time_steps"] = jnp.where(mask, new_ts, state["time_steps"])
        return state

    def _resample(self, state, mask, rng):
        """Sample start frames + RSI with pose/vel/joint noise
        (reference commands.py:309-375)."""
        keys = jax.random.split(rng, 5)
        state = self._sample_time_steps(state, mask, keys[0])
        ts = state["time_steps"]
        E = mask.shape[0]

        root_pos = (
            self.motion.body_pos_w[ts, 0] + self._env.scene.env_origins
        )
        root_quat = self.motion.body_quat_w[ts, 0]
        root_lin = self.motion.body_lin_vel_w[ts, 0]
        root_ang = self.motion.body_ang_vel_w[ts, 0]

        def ranges6(table):
            return jnp.asarray(
                [table.get(k2, (0.0, 0.0)) for k2 in
                 ("x", "y", "z", "roll", "pitch", "yaw")],
                jnp.float32,
            )

        pr = ranges6(self.cfg.pose_range)
        u = jax.random.uniform(
            keys[1], (E, 6), minval=pr[:, 0], maxval=pr[:, 1]
        )
        root_pos = root_pos + u[:, 0:3]
        dq = math.quat_from_euler_xyz(u[:, 3], u[:, 4], u[:, 5])
        root_quat = math.quat_mul(dq, root_quat)

        vr = ranges6(self.cfg.velocity_range)
        uv = jax.random.uniform(
            keys[2], (E, 6), minval=vr[:, 0], maxval=vr[:, 1]
        )
        root_lin = root_lin + uv[:, 0:3]
        root_ang = root_ang + uv[:, 3:6]

        jp = self.motion.joint_pos[ts] + jax.random.uniform(
            keys[3],
            self.motion.joint_pos[ts].shape,
            minval=self.cfg.joint_position_range[0],
            maxval=self.cfg.joint_position_range[1],
        )
        lims = self.robot.data.soft_joint_pos_limits
        jp = jnp.clip(jp, lims[..., 0], lims[..., 1])
        jv = self.motion.joint_vel[ts]

        data = self.robot.data
        data.write_joint_state(jp, jv, env_ids=mask)
        data.write_root_pose(
            jnp.concatenate([root_pos, root_quat], -1), mask
        )
        data.write_root_velocity(
            jnp.concatenate([root_lin, root_ang], -1), mask
        )
        data.clear_state(mask)
        return state

    def _update_command(self, state):
        """Advance time, resample overflowed envs, retarget to anchor
        (reference commands.py:377-412)."""
        ts = state["time_steps"] + 1
        state["time_steps"] = ts
        overflow = ts >= self.motion.time_step_total
        state["time_steps"] = jnp.where(
            overflow, self.motion.time_step_total - 1, state["time_steps"]
        )
        # branchless: resample with the overflow mask (no state change where
        # the mask is False)
        state = self._resample(state, overflow, self._env.ctx.next_key())

        # anchor-relative retargeting
        B = len(self.cfg.body_names)
        anchor_pos = self.anchor_pos_w[:, None, :]
        anchor_quat = self.anchor_quat_w[:, None, :]
        r_anchor_pos = self.robot_anchor_pos_w[:, None, :]
        r_anchor_quat = self.robot_anchor_quat_w[:, None, :]

        delta_pos = jnp.concatenate(
            [r_anchor_pos[..., :2], anchor_pos[..., 2:3]], axis=-1
        )
        delta_ori = math.yaw_quat(
            math.quat_mul(r_anchor_quat, math.quat_inv(anchor_quat))
        )
        state["body_quat_relative_w"] = math.quat_mul(
            jnp.broadcast_to(delta_ori, self.body_quat_w.shape), self.body_quat_w
        )
        state["body_pos_relative_w"] = delta_pos + math.quat_apply(
            jnp.broadcast_to(delta_ori, self.body_quat_w.shape),
            self.body_pos_w - anchor_pos,
        )

        # failure EMA update
        if self.cfg.sampling_mode == "adaptive":
            state["bin_failed_count"] = (
                self.cfg.adaptive_alpha * state["current_bin_failed"]
                + (1 - self.cfg.adaptive_alpha) * state["bin_failed_count"]
            )
            state["current_bin_failed"] = jnp.zeros_like(
                state["current_bin_failed"]
            )
        return state


@dataclass(kw_only=True)
class MotionCommandCfg(CommandTermCfg):
    motion_file: str = ""
    anchor_body_name: str = ""
    body_names: tuple[str, ...] = ()
    asset_name: str = "robot"
    pose_range: dict = dfield(default_factory=dict)
    velocity_range: dict = dfield(default_factory=dict)
    joint_position_range: tuple = (-0.52, 0.52)
    adaptive_kernel_size: int = 1
    adaptive_lambda: float = 0.8
    adaptive_uniform_ratio: float = 0.1
    adaptive_alpha: float = 0.001
    sampling_mode: Literal["adaptive", "uniform", "start"] = "adaptive"

    def __post_init__(self):
        self.class_type = MotionCommand
