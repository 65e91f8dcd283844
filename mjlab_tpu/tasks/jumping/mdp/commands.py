"""Jump command for the jumping task (reference
src/mjlab/tasks/jumping/mdp/commands.py:20-157).

Command layout (E, 2): [:, 0] = jump trigger (decays after landing),
[:, 1] = target height above standing. All event tracking (flight,
landing, trigger decay) is traced state."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from mjlab_tpu.managers.command_manager import CommandTerm
from mjlab_tpu.managers.manager_term_config import CommandTermCfg


class JumpCommand(CommandTerm):
    cfg: "JumpCommandCfg"

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        self.robot = env.scene[cfg.asset_name]

    def init_state(self, num_envs, rng):
        z = jnp.zeros((num_envs,), jnp.float32)
        return {
            "command": jnp.zeros((num_envs, 2), jnp.float32),
            "ranges": {
                "target_height": jnp.asarray(
                    self.cfg.ranges.target_height, jnp.float32
                ),
            },
            "jump_active": jnp.zeros((num_envs,), bool),
            "jump_completed": jnp.zeros((num_envs,), bool),
            "was_in_flight": jnp.zeros((num_envs,), bool),
            "time_left": z,
            "metrics": {"target_height": z},
        }

    def _get_command(self, state):
        return state["command"]

    def _resample(self, state, mask, rng):
        import jax

        lohi = state["ranges"]["target_height"]
        u = jax.random.uniform(rng, mask.shape)
        h = lohi[0] + u * (lohi[1] - lohi[0])
        cmd = state["command"]
        cmd = cmd.at[:, 1].set(jnp.where(mask, h, cmd[:, 1]))
        cmd = cmd.at[:, 0].set(jnp.where(mask, 1.0, cmd[:, 0]))
        state["command"] = cmd
        state["jump_active"] = jnp.where(mask, True, state["jump_active"])
        state["jump_completed"] = jnp.where(mask, False, state["jump_completed"])
        state["was_in_flight"] = jnp.where(mask, False, state["was_in_flight"])
        return state

    def _update_command(self, state):
        if self.cfg.contact_sensor_name is None:
            return state
        sensor = self._env.scene[self.cfg.contact_sensor_name]
        found = sensor.data.found
        both = jnp.all(found > 0, axis=1)
        state["was_in_flight"] = state["was_in_flight"] | ~both
        just_landed = state["was_in_flight"] & both
        state["jump_completed"] = state["jump_completed"] | just_landed
        cmd = state["command"]
        decayed = jnp.where(
            state["jump_completed"],
            cmd[:, 0] * self.cfg.trigger_decay_rate,
            cmd[:, 0],
        )
        state["command"] = cmd.at[:, 0].set(decayed)
        return state

    def _update_metrics(self, state):
        m = dict(state["metrics"])
        m["target_height"] = state["command"][:, 1]
        state["metrics"] = m
        return state


@dataclass(kw_only=True)
class JumpCommandCfg(CommandTermCfg):
    class_type: type = JumpCommand
    asset_name: str = "robot"
    contact_sensor_name: str | None = None
    standing_height: float = 0.76
    trigger_decay_rate: float = 0.95

    @dataclass
    class Ranges:
        target_height: tuple[float, float] = (0.02, 0.05)

    ranges: Ranges = field(default_factory=Ranges)
