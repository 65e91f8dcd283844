"""Env-level math library (batched, jnp).

Functional equivalent of the reference's vendored Isaac Lab math utilities
(reference src/mjlab/utils/lab_api/math.py): quaternion ops, frame
transforms, yaw extraction, samplers. Core quaternion/spatial algebra is
shared with the physics engine (mjlab_tpu.phys.math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.phys.math import (  # noqa: F401
    axis_angle_to_quat,
    conj_quat,
    mat_to_quat,
    mul_quat,
    normalize,
    normalize_quat,
    quat_integrate,
    quat_sub,
    quat_to_mat,
    rot_vec_quat,
    rot_vec_quat_inv,
    skew,
)

# aliases matching the reference naming AND argument order (lab_api/math.py:
# quat_apply(q, v) rotates v by q)
quat_mul = mul_quat
quat_conjugate = conj_quat
quat_inv = conj_quat  # unit quaternions
quat_from_matrix = mat_to_quat
matrix_from_quat = quat_to_mat


def quat_apply(q, v):
    return rot_vec_quat(v, q)


def quat_apply_inverse(q, v):
    return rot_vec_quat_inv(v, q)


def quat_rotate(q, v):
    return rot_vec_quat(v, q)


def quat_rotate_inverse(q, v):
    return rot_vec_quat_inv(v, q)


def yaw_quat(q: jax.Array) -> jax.Array:
    """Extract the yaw-only quaternion (reference math.py:566)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    yaw = jnp.arctan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
    half = 0.5 * yaw
    out = jnp.stack(
        [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)],
        axis=-1,
    )
    return out


def heading_from_quat(q: jax.Array) -> jax.Array:
    """Heading (yaw) angle of the x-axis in the world frame."""
    fwd = rot_vec_quat(jnp.array([1.0, 0.0, 0.0], q.dtype), q)
    return jnp.arctan2(fwd[..., 1], fwd[..., 0])


def quat_error_magnitude(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angle of the rotation taking q2 to q1."""
    return jnp.linalg.norm(quat_sub(q1, q2), axis=-1)


def quat_from_euler_xyz(roll, pitch, yaw):
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def euler_xyz_from_quat(q: jax.Array):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def combine_frame_transforms(p1, q1, p2=None, q2=None):
    """T01 ∘ T12: pose of frame 2 in frame 0 (reference math.py:760)."""
    if p2 is None:
        p2 = jnp.zeros_like(p1)
    if q2 is None:
        q2 = jnp.zeros_like(q1).at[..., 0].set(1.0)
    p = p1 + rot_vec_quat(p2, q1)
    q = mul_quat(q1, q2)
    return p, q


def subtract_frame_transforms(p1, q1, p2, q2=None):
    """T10 ∘ T02: pose of frame 2 in frame 1 (reference math.py:800s)."""
    q1_inv = conj_quat(q1)
    p = rot_vec_quat(p2 - p1, q1_inv)
    if q2 is None:
        return p, None
    q = mul_quat(q1_inv, q2)
    return p, q


def wrap_to_pi(x: jax.Array) -> jax.Array:
    return jnp.mod(x + jnp.pi, 2 * jnp.pi) - jnp.pi


# ---------------------------------------------------------------------------
# samplers (reference math.py:1335-1474)
# ---------------------------------------------------------------------------


def sample_uniform(rng, lo, hi, shape, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, minval=lo, maxval=hi)


def sample_log_uniform(rng, lo, hi, shape, dtype=jnp.float32):
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)
    u = jax.random.uniform(rng, shape, dtype)
    return jnp.exp(jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo)))


def sample_gaussian(rng, mean, std, shape, dtype=jnp.float32):
    return mean + std * jax.random.normal(rng, shape, dtype)
