"""Seeding helper (reference src/mjlab/utils/random.py:9).

The TPU stack threads explicit jax.random keys everywhere, so this only
seeds the HOST-side generators (python/numpy) used by terrain generation
and data tooling; it returns the root jax key for the caller to thread."""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_rng(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
