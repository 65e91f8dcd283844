"""Velocity-task curricula (reference
src/mjlab/tasks/velocity/mdp/curriculums.py), redesigned as traced state
updates: command ranges live in the command term's state so stage changes
happen inside the jitted step with no recompile."""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

_DEFAULT = SceneEntityCfg("robot")


def commands_vel(env, env_mask, command_name: str, velocity_stages: list[dict]):
    """Staged widening of command ranges by global step count.

    velocity_stages: list of dicts {step, lin_vel_x, lin_vel_y, ang_vel_z}
    (reference curriculums.py:66)."""
    state = dict(env.command_manager.get_term(command_name).state)
    ranges = dict(state["ranges"])
    step = env.common_step_counter
    for stage in velocity_stages:
        cond = step > stage["step"]
        for key in ("lin_vel_x", "lin_vel_y", "ang_vel_z"):
            if stage.get(key) is not None:
                ranges[key] = jnp.where(
                    cond, jnp.asarray(stage[key], jnp.float32), ranges[key]
                )
    state["ranges"] = ranges
    env.command_manager.get_term(command_name).state = state
    # log the current max forward speed as curriculum progress
    return ranges["lin_vel_x"][1]


def terrain_levels_vel(
    env, env_mask, command_name: str, asset_cfg: SceneEntityCfg = _DEFAULT
):
    """Terrain level promotion by distance walked (reference
    velocity/mdp/curriculums.py:30-64): envs that cross half a sub-terrain
    move up a difficulty row; envs that cover less than half their
    commanded distance move down. Plane terrain: no-op, returns 0."""
    terrain = env.scene.terrain
    if terrain is None or terrain.generator is None:
        return jnp.zeros((), jnp.float32)
    asset = env.scene[asset_cfg.name]
    command = env.command_manager.get_command(command_name)
    dist = jnp.linalg.norm(
        asset.data.root_link_pos_w[:, :2] - env.scene.env_origins[:, :2], axis=1
    )
    size = terrain.cfg.terrain_generator.size[0]
    move_up = dist > size / 2
    move_down = (
        dist
        < jnp.linalg.norm(command[:, :2], axis=1) * env.max_episode_length_s * 0.5
    ) & ~move_up
    terrain.update_env_origins(env_mask, move_up, move_down, env.ctx.next_key())
    return jnp.mean(terrain.terrain_levels.astype(jnp.float32))
