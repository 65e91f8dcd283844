"""Progressive jump curricula (reference src/mjlab/tasks/jump/mdp/
curriculums.py), as traced state updates: target height / tolerance live in
the jump command state, reward weights in the reward manager state — stage
changes happen inside the jitted step, no recompiles."""

from __future__ import annotations

import jax.numpy as jnp


def progressive_jump_height(
    env, env_mask, command_name: str, height_stages: list[dict]
):
    """Stage the commanded jump height by global step count
    (reference curriculums.py:37-71)."""
    term = env.command_manager.get_term(command_name)
    state = dict(term.state)
    step = env.common_step_counter
    tgt = state["target_height"]
    tol = state["height_tolerance"]
    for stage in height_stages:
        cond = step > stage["step"]
        tgt = jnp.where(cond, jnp.asarray(stage["target_height"], jnp.float32), tgt)
        tol = jnp.where(cond, jnp.asarray(stage["tolerance"], jnp.float32), tol)
    state["target_height"] = tgt
    state["height_tolerance"] = tol
    term.state = state
    return tgt


def progressive_stability_requirement(
    env, env_mask, reward_name: str, weight_stages: list[dict]
):
    """Stage a reward term's weight by global step count
    (reference curriculums.py:74-...)."""
    step = env.common_step_counter
    w = env.ctx.reward_state["weights"][reward_name]
    for stage in weight_stages:
        cond = step > stage["step"]
        w = jnp.where(cond, jnp.asarray(stage["weight"], jnp.float32), w)
    env.reward_manager.set_weight(reward_name, w)
    return w
