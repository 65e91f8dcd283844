"""Lifting command (reference src/mjlab/tasks/manipulation/mdp/commands.py:
22-155): target lift position per episode, with dynamic difficulty and
object pose resampling. All state is traced."""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Literal

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.command_manager import CommandTerm
from mjlab_tpu.managers.manager_term_config import CommandTermCfg
from mjlab_tpu.utils.math import quat_from_euler_xyz


class LiftingCommand(CommandTerm):
    cfg: "LiftingCommandCfg"

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        self.object = env.scene[cfg.asset_name]

    def init_state(self, num_envs, rng):
        z = jnp.zeros((num_envs,), jnp.float32)
        return {
            "target_pos": jnp.zeros((num_envs, 3), jnp.float32),
            "episode_success": z,
            "time_left": z,
            "metrics": {
                "object_height": z,
                "position_error": z,
                "at_goal": z,
                "episode_success": z,
            },
        }

    def _get_command(self, state):
        return state["target_pos"]

    @property
    def target_pos(self):
        return self.state["target_pos"]

    def compute_success(self):
        return self.state["metrics"]["position_error"] < self.cfg.success_threshold

    def _update_metrics(self, state):
        obj_pos = self.object.data.root_link_pos_w
        err = jnp.linalg.norm(state["target_pos"] - obj_pos, axis=-1)
        at_goal = (err < self.cfg.success_threshold).astype(jnp.float32)
        state["episode_success"] = jnp.maximum(state["episode_success"], at_goal)
        m = dict(state["metrics"])
        m["object_height"] = obj_pos[:, 2]
        m["position_error"] = err
        m["at_goal"] = at_goal
        m["episode_success"] = state["episode_success"]
        state["metrics"] = m
        return state

    def _resample(self, state, mask, rng):
        E = mask.shape[0]
        k1, k2, k3 = jax.random.split(rng, 3)
        origins = self._env.scene.env_origins

        state["episode_success"] = jnp.where(mask, 0.0, state["episode_success"])

        if self.cfg.difficulty == "fixed":
            tgt = jnp.asarray([0.4, 0.0, 0.3], jnp.float32) + origins
        else:
            r = self.cfg.target_position_range
            lo = jnp.asarray([r.x[0], r.y[0], r.z[0]], jnp.float32)
            hi = jnp.asarray([r.x[1], r.y[1], r.z[1]], jnp.float32)
            u = jax.random.uniform(k1, (E, 3))
            tgt = lo + u * (hi - lo) + origins
        state["target_pos"] = jnp.where(mask[:, None], tgt, state["target_pos"])

        # reset the object pose for resampled envs
        if self.cfg.object_pose_range is not None:
            r = self.cfg.object_pose_range
            lo = jnp.asarray([r.x[0], r.y[0], r.z[0]], jnp.float32)
            hi = jnp.asarray([r.x[1], r.y[1], r.z[1]], jnp.float32)
            u = jax.random.uniform(k2, (E, 3))
            pos = lo + u * (hi - lo) + origins
            yaw = jax.random.uniform(
                k3, (E,), minval=r.yaw[0], maxval=r.yaw[1]
            )
            zero = jnp.zeros_like(yaw)
            quat = quat_from_euler_xyz(zero, zero, yaw)
            pose = jnp.concatenate([pos, quat], axis=-1)
            vel = jnp.zeros((E, 6), jnp.float32)
            self.object.data.write_root_pose(pose, mask)
            self.object.data.write_root_velocity(vel, mask)
        return state


@dataclass(kw_only=True)
class LiftingCommandCfg(CommandTermCfg):
    asset_name: str
    class_type: type = LiftingCommand
    success_threshold: float = 0.05
    difficulty: Literal["fixed", "dynamic"] = "fixed"

    @dataclass
    class TargetPositionRangeCfg:
        x: tuple[float, float] = (0.3, 0.5)
        y: tuple[float, float] = (-0.2, 0.2)
        z: tuple[float, float] = (0.2, 0.4)

    target_position_range: TargetPositionRangeCfg = field(
        default_factory=TargetPositionRangeCfg
    )

    @dataclass
    class ObjectPoseRangeCfg:
        x: tuple[float, float] = (0.3, 0.35)
        y: tuple[float, float] = (-0.1, 0.1)
        z: tuple[float, float] = (0.02, 0.05)
        yaw: tuple[float, float] = (-math.pi, math.pi)

    object_pose_range: ObjectPoseRangeCfg | None = field(
        default_factory=ObjectPoseRangeCfg
    )
