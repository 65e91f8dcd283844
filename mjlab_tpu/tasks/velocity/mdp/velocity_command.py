"""Uniform velocity command with heading control, standing envs and
initial-velocity sampling (reference
src/mjlab/tasks/velocity/mdp/velocity_command.py:23-209), as a pure masked
state-transition command term.

Command ranges live in the term STATE (traced arrays), so curriculum stages
can widen them at runtime without recompilation."""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.command_manager import CommandTerm
from mjlab_tpu.managers.manager_term_config import CommandTermCfg
from mjlab_tpu.utils import math


class UniformVelocityCommand(CommandTerm):
    cfg: "UniformVelocityCommandCfg"

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        if cfg.heading_command and cfg.ranges.heading is None:
            raise ValueError("heading_command=True requires ranges.heading")
        if cfg.ranges.heading and not cfg.heading_command:
            raise ValueError("ranges.heading set but heading_command=False")
        self.robot = env.scene[cfg.asset_name]

    def init_state(self, num_envs, rng):
        r = self.cfg.ranges
        return {
            "command": jnp.zeros((num_envs, 3), jnp.float32),
            "heading_target": jnp.zeros((num_envs,), jnp.float32),
            "is_heading_env": jnp.zeros((num_envs,), bool),
            "is_standing_env": jnp.zeros((num_envs,), bool),
            "time_left": jnp.zeros((num_envs,), jnp.float32),
            "ranges": {
                "lin_vel_x": jnp.asarray(r.lin_vel_x, jnp.float32),
                "lin_vel_y": jnp.asarray(r.lin_vel_y, jnp.float32),
                "ang_vel_z": jnp.asarray(r.ang_vel_z, jnp.float32),
                "heading": jnp.asarray(
                    r.heading if r.heading is not None else (0.0, 0.0),
                    jnp.float32,
                ),
            },
            "metrics": {
                "error_vel_xy": jnp.zeros((num_envs,), jnp.float32),
                "error_vel_yaw": jnp.zeros((num_envs,), jnp.float32),
            },
        }

    def _get_command(self, state):
        return state["command"]

    def _update_metrics(self, state):
        max_command_step = self.cfg.resampling_time_range[1] / self._env.step_dt
        cmd = state["command"]
        lin = self.robot.data.root_link_lin_vel_b
        ang = self.robot.data.root_link_ang_vel_b
        m = dict(state["metrics"])
        m["error_vel_xy"] = m["error_vel_xy"] + (
            jnp.linalg.norm(cmd[:, :2] - lin[:, :2], axis=-1) / max_command_step
        )
        m["error_vel_yaw"] = m["error_vel_yaw"] + (
            jnp.abs(cmd[:, 2] - ang[:, 2]) / max_command_step
        )
        state["metrics"] = m
        return state

    def _resample(self, state, mask, rng):
        E = mask.shape[0]
        keys = jax.random.split(rng, 7)
        rg = state["ranges"]

        def u(key, lohi, shape=(E,)):
            un = jax.random.uniform(key, shape)
            return lohi[0] + un * (lohi[1] - lohi[0])

        cmd = jnp.stack(
            [
                u(keys[0], rg["lin_vel_x"]),
                u(keys[1], rg["lin_vel_y"]),
                u(keys[2], rg["ang_vel_z"]),
            ],
            -1,
        )
        command = jnp.where(mask[:, None], cmd, state["command"])
        heading_target = jnp.where(
            mask, u(keys[3], rg["heading"]), state["heading_target"]
        )
        is_heading = jnp.where(
            mask,
            jax.random.uniform(keys[4], (E,)) <= self.cfg.rel_heading_envs,
            state["is_heading_env"],
        )
        is_standing = jnp.where(
            mask,
            jax.random.uniform(keys[5], (E,)) <= self.cfg.rel_standing_envs,
            state["is_standing_env"],
        )
        state = dict(state)
        state.update(
            command=command,
            heading_target=heading_target,
            is_heading_env=is_heading,
            is_standing_env=is_standing,
        )

        # initial-velocity sampling (reference velocity_command.py:76-89):
        # with probability p, set the root velocity to the new command.
        if self.cfg.init_velocity_prob > 0.0:
            init_mask = mask & (
                jax.random.uniform(keys[6], (E,)) < self.cfg.init_velocity_prob
            )
            data = self.robot.data
            lin_b = data.root_link_lin_vel_b
            lin_b = lin_b.at[:, :2].set(command[:, :2])
            lin_w = math.quat_apply(data.root_link_quat_w, lin_b)
            ang_b = data.root_link_ang_vel_b.at[:, 2].set(command[:, 2])
            ang_w = math.quat_apply(data.root_link_quat_w, ang_b)
            vel = jnp.concatenate([lin_w, ang_w], -1)
            data.write_root_velocity(vel, init_mask)
        return state

    def _update_command(self, state):
        cmd = state["command"]
        if self.cfg.heading_command:
            err = math.wrap_to_pi(
                state["heading_target"] - self.robot.data.heading_w
            )
            rg = state["ranges"]["ang_vel_z"]
            wz = jnp.clip(
                self.cfg.heading_control_stiffness * err, rg[0], rg[1]
            )
            cmd = cmd.at[:, 2].set(
                jnp.where(state["is_heading_env"], wz, cmd[:, 2])
            )
        cmd = jnp.where(state["is_standing_env"][:, None], 0.0, cmd)
        state = dict(state)
        state["command"] = cmd
        return state


@dataclass(kw_only=True)
class UniformVelocityCommandCfg(CommandTermCfg):
    asset_name: str = "robot"
    heading_command: bool = False
    heading_control_stiffness: float = 1.0
    rel_standing_envs: float = 0.0
    rel_heading_envs: float = 1.0
    init_velocity_prob: float = 0.0

    @dataclass
    class Ranges:
        lin_vel_x: tuple = (0.0, 0.0)
        lin_vel_y: tuple = (0.0, 0.0)
        ang_vel_z: tuple = (0.0, 0.0)
        heading: tuple | None = None

    ranges: Ranges = dfield(default_factory=Ranges)

    def __post_init__(self):
        self.class_type = UniformVelocityCommand
