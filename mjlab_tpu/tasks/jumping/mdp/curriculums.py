"""Jumping curricula (reference src/mjlab/tasks/jumping/mdp/curriculums.py):
staged widening of the commanded target-height range, as traced command
state updates."""

from __future__ import annotations

import jax.numpy as jnp


def jump_height_curriculum(
    env, env_mask, command_name: str, height_stages: list[dict]
):
    term = env.command_manager.get_term(command_name)
    state = dict(term.state)
    ranges = dict(state["ranges"])
    step = env.common_step_counter
    th = ranges["target_height"]
    for stage in height_stages:
        cond = step > stage["step"]
        th = jnp.where(
            cond, jnp.asarray(stage["target_height"], jnp.float32), th
        )
    ranges["target_height"] = th
    state["ranges"] = ranges
    term.state = state
    return th[1]
