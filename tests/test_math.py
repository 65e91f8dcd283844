"""Quaternion / frame-transform math vs ground-truth MuJoCo C routines
(reference vendored lab_api math, src/mjlab/utils/lab_api/math.py)."""

import mujoco
import numpy as np
import jax.numpy as jnp

from mjlab_tpu.utils import math as mth


def _rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float64)


def test_quat_mul_matches_mujoco():
    qa, qb = _rand_quats(16, 1), _rand_quats(16, 2)
    got = np.asarray(mth.quat_mul(jnp.asarray(qa), jnp.asarray(qb)))
    for i in range(16):
        want = np.zeros(4)
        mujoco.mju_mulQuat(want, qa[i], qb[i])
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_quat_apply_matches_mujoco():
    q = _rand_quats(16, 3)
    rng = np.random.default_rng(4)
    v = rng.normal(size=(16, 3))
    got = np.asarray(mth.quat_apply(jnp.asarray(q), jnp.asarray(v)))
    got_inv = np.asarray(mth.quat_apply_inverse(jnp.asarray(q), jnp.asarray(v)))
    for i in range(16):
        want = np.zeros(3)
        mujoco.mju_rotVecQuat(want, v[i], q[i])
        np.testing.assert_allclose(got[i], want, atol=1e-6)
        neg = np.zeros(3)
        qinv = np.concatenate([q[i][:1], -q[i][1:]])
        mujoco.mju_rotVecQuat(neg, v[i], qinv)
        np.testing.assert_allclose(got_inv[i], neg, atol=1e-6)


def test_quat_euler_roundtrip():
    rng = np.random.default_rng(5)
    rpy = rng.uniform(-1.2, 1.2, size=(32, 3))
    q = mth.quat_from_euler_xyz(
        jnp.asarray(rpy[:, 0]), jnp.asarray(rpy[:, 1]), jnp.asarray(rpy[:, 2])
    )
    r, p, y = mth.euler_xyz_from_quat(q)
    np.testing.assert_allclose(np.asarray(r), rpy[:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(p), rpy[:, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), rpy[:, 2], atol=1e-6)


def test_yaw_quat_kills_roll_pitch():
    q = mth.quat_from_euler_xyz(jnp.asarray(0.3), jnp.asarray(-0.2), jnp.asarray(1.1))
    yq = mth.yaw_quat(q)
    r, p, y = mth.euler_xyz_from_quat(yq)
    assert abs(float(r)) < 1e-6 and abs(float(p)) < 1e-6
    np.testing.assert_allclose(float(y), 1.1, atol=1e-6)
    # heading of the yaw-only quat equals the original heading-from-x-axis
    np.testing.assert_allclose(
        float(mth.heading_from_quat(yq)), float(mth.heading_from_quat(yq)), atol=1e-7
    )


def test_frame_transform_combine_subtract_inverse():
    rng = np.random.default_rng(6)
    p1 = jnp.asarray(rng.normal(size=(8, 3)))
    p2 = jnp.asarray(rng.normal(size=(8, 3)))
    q1 = jnp.asarray(_rand_quats(8, 7))
    q2 = jnp.asarray(_rand_quats(8, 8))
    p02, q02 = mth.combine_frame_transforms(p1, q1, p2, q2)
    p12, q12 = mth.subtract_frame_transforms(p1, q1, p02, q02)
    np.testing.assert_allclose(np.asarray(p12), np.asarray(p2), atol=1e-6)
    # quats equal up to sign
    d = np.abs(np.sum(np.asarray(q12) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(d, 1.0, atol=1e-6)


def test_quat_error_magnitude():
    q1 = mth.quat_from_euler_xyz(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0))
    q2 = mth.quat_from_euler_xyz(jnp.asarray(0.5), jnp.asarray(0.0), jnp.asarray(0.0))
    err = float(mth.quat_error_magnitude(q1, q2))
    np.testing.assert_allclose(err, 0.5, atol=1e-5)


def test_wrap_to_pi():
    x = jnp.asarray([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.2])
    w = np.asarray(mth.wrap_to_pi(x))
    np.testing.assert_allclose(
        w, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.2], atol=1e-6
    )
