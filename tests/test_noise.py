"""Noise config semantics (reference src/mjlab/utils/noise/: Constant/
Uniform/Gaussian x add/scale/abs, additive-bias noise model)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.utils.noise import (
    ConstantNoiseCfg,
    GaussianNoiseCfg,
    NoiseModelWithAdditiveBiasCfg,
    UniformNoiseCfg,
    apply_noise,
    sample_bias,
)


def test_constant_add_scale_abs():
    x = jnp.ones((4, 3)) * 2.0
    rng = jax.random.PRNGKey(0)
    np.testing.assert_allclose(
        np.asarray(apply_noise(ConstantNoiseCfg(bias=0.5), rng, x)), 2.5
    )
    np.testing.assert_allclose(
        np.asarray(apply_noise(ConstantNoiseCfg(bias=3.0, operation="scale"), rng, x)),
        6.0,
    )
    np.testing.assert_allclose(
        np.asarray(apply_noise(ConstantNoiseCfg(bias=7.0, operation="abs"), rng, x)),
        7.0,
    )


def test_uniform_bounds_and_determinism():
    x = jnp.zeros((1024,))
    rng = jax.random.PRNGKey(1)
    cfg = UniformNoiseCfg(n_min=-0.25, n_max=0.75)
    y = np.asarray(apply_noise(cfg, rng, x))
    assert y.min() >= -0.25 and y.max() <= 0.75
    assert y.std() > 0.1
    y2 = np.asarray(apply_noise(cfg, rng, x))
    np.testing.assert_array_equal(y, y2)  # same key -> same noise


def test_gaussian_stats():
    x = jnp.zeros((4096,))
    y = np.asarray(
        apply_noise(GaussianNoiseCfg(mean=1.0, std=0.5), jax.random.PRNGKey(2), x)
    )
    assert abs(y.mean() - 1.0) < 0.05
    assert abs(y.std() - 0.5) < 0.05


def test_none_passthrough():
    x = jnp.arange(5.0)
    np.testing.assert_array_equal(
        np.asarray(apply_noise(None, jax.random.PRNGKey(0), x)), np.asarray(x)
    )


def test_additive_bias_resample():
    cfg = NoiseModelWithAdditiveBiasCfg(
        bias_noise_cfg=UniformNoiseCfg(n_min=-1.0, n_max=1.0)
    )
    b1 = sample_bias(cfg, jax.random.PRNGKey(3), (8, 2), jnp.float32)
    b2 = sample_bias(cfg, jax.random.PRNGKey(4), (8, 2), jnp.float32)
    assert not np.allclose(np.asarray(b1), np.asarray(b2))
    # no bias cfg -> zeros
    none = sample_bias(
        NoiseModelWithAdditiveBiasCfg(), jax.random.PRNGKey(5), (3,), jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(none), 0.0)
