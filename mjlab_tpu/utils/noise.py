"""Noise configs and stateless/stateful noise models.

Equivalent of reference src/mjlab/utils/noise/ (NoiseCfg hierarchy with
add/scale/abs operations, plus NoiseModelWithAdditiveBias whose bias is
resampled per episode). Functional: apply(cfg, rng, x) -> x'.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp


@dataclass
class NoiseCfg:
    operation: Literal["add", "scale", "abs"] = "add"

    def sample(self, rng: jax.Array, shape, dtype) -> jax.Array:
        raise NotImplementedError

    def apply(self, rng: jax.Array, x: jax.Array) -> jax.Array:
        n = self.sample(rng, x.shape, x.dtype)
        if self.operation == "add":
            return x + n
        if self.operation == "scale":
            return x * n
        return n  # abs: replace


@dataclass
class ConstantNoiseCfg(NoiseCfg):
    bias: float = 0.0

    def sample(self, rng, shape, dtype):
        return jnp.full(shape, self.bias, dtype)


@dataclass
class UniformNoiseCfg(NoiseCfg):
    n_min: float = -1.0
    n_max: float = 1.0

    def sample(self, rng, shape, dtype):
        return jax.random.uniform(
            rng, shape, dtype, minval=self.n_min, maxval=self.n_max
        )


@dataclass
class GaussianNoiseCfg(NoiseCfg):
    mean: float = 0.0
    std: float = 1.0

    def sample(self, rng, shape, dtype):
        return self.mean + self.std * jax.random.normal(rng, shape, dtype)


@dataclass
class NoiseModelCfg:
    noise_cfg: NoiseCfg | None = None


@dataclass
class NoiseModelWithAdditiveBiasCfg(NoiseModelCfg):
    bias_noise_cfg: NoiseCfg | None = None


def sample_bias(cfg: NoiseModelWithAdditiveBiasCfg, rng, shape, dtype):
    """Per-episode additive bias, resampled on reset."""
    if cfg.bias_noise_cfg is None:
        return jnp.zeros(shape, dtype)
    return cfg.bias_noise_cfg.sample(rng, shape, dtype)


def apply_noise(cfg: NoiseCfg | None, rng, x):
    if cfg is None:
        return x
    return cfg.apply(rng, x)
