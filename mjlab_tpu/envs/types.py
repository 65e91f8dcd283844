"""Env return types (reference src/mjlab/envs/types.py)."""

from typing import Any, Dict, Tuple

import jax

VecEnvObs = Dict[str, Any]
VecEnvStepReturn = Tuple[VecEnvObs, jax.Array, jax.Array, jax.Array, Dict]
