"""Manipulation terminations (reference src/mjlab/tasks/manipulation/mdp/
terminations.py)."""

from __future__ import annotations

import jax.numpy as jnp


def illegal_contact(env, sensor_name: str):
    """Terminate when the monitored contact sensor fires (reference L13)."""
    sensor = env.scene[sensor_name]
    return jnp.any(sensor.data.found > 0, axis=1)
