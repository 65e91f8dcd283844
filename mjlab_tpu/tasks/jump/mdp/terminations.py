"""Jump terminations (reference src/mjlab/tasks/jump/mdp/terminations.py)."""

from __future__ import annotations

import jax.numpy as jnp


def excessive_landing_force(
    env, sensor_name: str, force_threshold: float = 2500.0
):
    """Terminate on landing forces beyond the hardware-safe threshold
    (reference terminations.py:15-45)."""
    sensor = env.scene[sensor_name]
    mag = jnp.linalg.norm(sensor.data.force, axis=-1)
    return jnp.max(mag, axis=1) > force_threshold
