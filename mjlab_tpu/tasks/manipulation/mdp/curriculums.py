"""Manipulation curricula (reference src/mjlab/tasks/manipulation/mdp/
curriculums.py): staged reward weights via the reward manager's traced
weight state."""

from __future__ import annotations

import jax.numpy as jnp


def reward_weight(env, env_mask, reward_name: str, weight_stages: list[dict]):
    step = env.common_step_counter
    w = env.ctx.reward_state["weights"][reward_name]
    for stage in weight_stages:
        cond = step > stage["step"]
        w = jnp.where(cond, jnp.asarray(stage["weight"], jnp.float32), w)
    env.reward_manager.set_weight(reward_name, w)
    return w
