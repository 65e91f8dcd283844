"""Jump height command (reference src/mjlab/tasks/jump/mdp/commands.py:17-78).

TPU-native: the target height / tolerance live in the command term's
TRACED state so the curriculum can advance them inside the jitted step
(the reference mutates cfg attributes from host python)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from mjlab_tpu.managers.command_manager import CommandTerm
from mjlab_tpu.managers.manager_term_config import CommandTermCfg


class JumpCommand(CommandTerm):
    """Target-jump-height command: set per episode, constant within it."""

    cfg: "JumpCommandCfg"

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        self.robot = env.scene[cfg.asset_name]

    def init_state(self, num_envs, rng):
        h = jnp.full((num_envs, 1), self.cfg.target_height, jnp.float32)
        return {
            "command": h,
            "target_height": jnp.asarray(self.cfg.target_height, jnp.float32),
            "height_tolerance": jnp.asarray(
                self.cfg.height_tolerance, jnp.float32
            ),
            "time_left": jnp.full((num_envs,), 1e9, jnp.float32),
            "metrics": {
                "target_height": jnp.zeros((num_envs,), jnp.float32),
            },
        }

    def _get_command(self, state):
        return state["command"]

    def _resample(self, state, mask, rng):
        cmd = jnp.where(
            mask[:, None], state["target_height"], state["command"]
        )
        state["command"] = cmd
        return state

    def _update_metrics(self, state):
        m = dict(state["metrics"])
        m["target_height"] = jnp.broadcast_to(
            state["target_height"], m["target_height"].shape
        )
        state["metrics"] = m
        return state


@dataclass(kw_only=True)
class JumpCommandCfg(CommandTermCfg):
    class_type: type = JumpCommand
    asset_name: str = "robot"
    resampling_time_range: tuple[float, float] = (1e9, 1e9)
    target_height: float = 0.25
    height_tolerance: float = 0.05
