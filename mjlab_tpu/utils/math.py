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


# ---------------------------------------------------------------------------
# Extended reference surface (lab_api/math.py parity). Camera-projection
# helpers are intentionally absent: the engine computes no camera frames.
# ---------------------------------------------------------------------------


def scale_transform(x, lower, upper):
    """[lower, upper] -> [-1, 1] (reference L29)."""
    offset = (lower + upper) * 0.5
    return 2.0 * (x - offset) / (upper - lower)


def unscale_transform(x, lower, upper):
    """[-1, 1] -> [lower, upper] (reference L50)."""
    offset = (lower + upper) * 0.5
    return x * (upper - lower) * 0.5 + offset


def saturate(x, lower, upper):
    return jnp.clip(x, lower, upper)


def copysign_like(mag: float, other):
    """|mag| with the elementwise sign of `other` (reference copysign)."""
    return jnp.abs(mag) * jnp.sign(jnp.where(other == 0, 1.0, other))


def quat_unique(q):
    """Canonical hemisphere: flip quats with negative w (reference L150)."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def convert_quat(quat, to: str = "xyzw"):
    """Reorder between wxyz (MuJoCo) and xyzw conventions (reference L199)."""
    if to == "xyzw":
        return jnp.concatenate([quat[..., 1:4], quat[..., 0:1]], axis=-1)
    if to == "wxyz":
        return jnp.concatenate([quat[..., 3:4], quat[..., 0:3]], axis=-1)
    raise ValueError(f"convert_quat: unknown target '{to}'")


def quat_from_angle_axis(angle, axis):
    """wxyz quaternion from angle (rad) about unit axis (reference L510)."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate(
        [jnp.cos(half), jnp.sin(half) * axis], axis=-1
    )


def axis_angle_from_quat(quat, eps: float = 1e-6):
    """Rotation-vector (axis*angle) from wxyz quaternion (reference L478)."""
    q = quat_unique(quat)
    sin_half = jnp.linalg.norm(q[..., 1:4], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, q[..., 0:1])
    # Taylor fallback near identity: angle/sin(angle/2) -> 2 + angle^2/12
    small = sin_half < eps
    scale = jnp.where(
        small,
        2.0 + angle * angle / 12.0,
        angle / jnp.where(small, 1.0, sin_half),
    )
    return scale * q[..., 1:4]


def quat_box_minus(q1, q2):
    """Tangent-space difference q1 ⊟ q2 (reference L590)."""
    return axis_angle_from_quat(quat_mul(q1, quat_conjugate(q2)))


def quat_box_plus(q, delta, eps: float = 1e-6):
    """q ⊞ delta: apply a tangent-space increment (reference L608)."""
    angle = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    safe = jnp.where(angle < eps, 1.0, angle)
    axis = jnp.where(angle < eps, 0.0, delta / safe)
    dq = quat_from_angle_axis(angle[..., 0], axis)
    return normalize_quat(quat_mul(dq, q))


def quat_apply_yaw(quat, vec):
    """Rotate by only the yaw component of quat (reference L673)."""
    return quat_apply(yaw_quat(quat), vec)


def skew_symmetric_matrix(vec):
    return skew(vec)


def is_identity_pose(pos, rot, atol: float = 1e-6) -> bool:
    ident = jnp.zeros_like(rot).at[..., 0].set(1.0)
    return bool(
        jnp.allclose(pos, 0.0, atol=atol)
        and (
            jnp.allclose(rot, ident, atol=atol)
            or jnp.allclose(rot, -ident, atol=atol)
        )
    )


def rigid_body_twist_transform(v_b, w_b, p_ab, q_ab):
    """Twist of frame B expressed in A given B's twist and A<-B transform
    (reference L794): w_a = R w_b; v_a = R v_b + p x w_a."""
    w_a = quat_apply(q_ab, w_b)
    v_a = quat_apply(q_ab, v_b) + jnp.cross(p_ab, w_a)
    return v_a, w_a


def compute_pose_error(t01, q01, t02, q02, rot_error_type: str = "axis_angle"):
    """Position + orientation error between two poses (reference L867)."""
    pos_err = t02 - t01
    if rot_error_type == "quat":
        return pos_err, quat_mul(q02, quat_conjugate(q01))
    if rot_error_type == "axis_angle":
        return pos_err, quat_box_minus(q02, q01)
    raise ValueError(f"unknown rot_error_type '{rot_error_type}'")


def apply_delta_pose(source_pos, source_rot, delta_pose, eps: float = 1e-6):
    """Apply a 6D [dpos, drotvec] increment to a pose (reference L920)."""
    dpos = delta_pose[..., :3]
    drot = delta_pose[..., 3:6]
    target_pos = source_pos + dpos
    target_rot = quat_box_plus(source_rot, drot, eps)
    return target_pos, target_rot


def transform_points(points, pos=None, quat=None):
    """Transform (..., N, 3) points by a pose (reference L961)."""
    out = points
    if quat is not None:
        out = quat_apply(quat[..., None, :], out)
    if pos is not None:
        out = out + pos[..., None, :]
    return out


def default_orientation(num: int):
    return jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (num, 1))


def random_orientation(rng, num: int):
    """Uniform random unit quaternions (reference L1298)."""
    u1, u2, u3 = jax.random.uniform(rng, (3, num))
    w = jnp.sqrt(1 - u1) * jnp.sin(2 * jnp.pi * u2)
    x = jnp.sqrt(1 - u1) * jnp.cos(2 * jnp.pi * u2)
    y = jnp.sqrt(u1) * jnp.sin(2 * jnp.pi * u3)
    z = jnp.sqrt(u1) * jnp.cos(2 * jnp.pi * u3)
    return jnp.stack([w, x, y, z], axis=-1)


def random_yaw_orientation(rng, num: int):
    yaw = jax.random.uniform(rng, (num,), minval=-jnp.pi, maxval=jnp.pi)
    zeros = jnp.zeros((num,))
    return quat_from_euler_xyz(zeros, zeros, yaw)


def sample_triangle(rng, lower: float, upper: float, shape):
    """Symmetric triangular distribution on [lower, upper] (reference
    L1335)."""
    r = jax.random.uniform(rng, shape, minval=-1.0, maxval=1.0)
    r = jnp.where(r < 0, -jnp.sqrt(-r), jnp.sqrt(r))  # in [-1, 1], peaked at 0
    return (r + 1.0) * 0.5 * (upper - lower) + lower


def sample_cylinder(rng, radius: float, h_range, shape):
    """Uniform points inside a vertical cylinder (reference L1434)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    r = radius * jnp.sqrt(jax.random.uniform(k1, shape))
    theta = 2 * jnp.pi * jax.random.uniform(k2, shape)
    h = jax.random.uniform(
        k3, shape, minval=h_range[0], maxval=h_range[1]
    )
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), h], axis=-1)


def quat_slerp(q1, q2, tau):
    """Spherical interpolation (reference L1695)."""
    d = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(d < 0, -q2, q2)
    d = jnp.clip(jnp.abs(d), 0.0, 1.0)
    theta = jnp.arccos(d)
    sin = jnp.sin(theta)
    small = sin < 1e-6
    w1 = jnp.where(small, 1.0 - tau, jnp.sin((1 - tau) * theta) / jnp.where(small, 1.0, sin))
    w2 = jnp.where(small, tau, jnp.sin(tau * theta) / jnp.where(small, 1.0, sin))
    return normalize_quat(w1 * q1 + w2 * q2)


def make_pose(pos, rot_mat):
    """(..., 4, 4) homogeneous pose from pos + rotation matrix (L1611)."""
    batch = jnp.broadcast_shapes(pos.shape[:-1], rot_mat.shape[:-2])
    pose = jnp.zeros(batch + (4, 4), pos.dtype)
    pose = pose.at[..., :3, :3].set(rot_mat)
    pose = pose.at[..., :3, 3].set(pos)
    pose = pose.at[..., 3, 3].set(1.0)
    return pose


def unmake_pose(pose):
    return pose[..., :3, 3], pose[..., :3, :3]


def pose_inv(pose):
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(-jnp.einsum("...ij,...j->...i", Rt, t), Rt)


def pose_in_A_to_pose_in_B(pose_in_A, pose_A_in_B):
    return pose_A_in_B @ pose_in_A


def matrix_from_euler(euler_angles, convention: str = "XYZ"):
    """Rotation matrix from extrinsic euler angles (reference L406)."""
    axes = {"X": 0, "Y": 1, "Z": 2}
    out = None
    for i, ax in enumerate(convention):
        ang = euler_angles[..., i]
        c, s = jnp.cos(ang), jnp.sin(ang)
        one = jnp.ones_like(c)
        zero = jnp.zeros_like(c)
        if ax == "X":
            rows = [one, zero, zero, zero, c, -s, zero, s, c]
        elif ax == "Y":
            rows = [c, zero, s, zero, one, zero, -s, zero, c]
        else:
            rows = [c, -s, zero, s, c, zero, zero, zero, one]
        R = jnp.stack(rows, axis=-1).reshape(ang.shape + (3, 3))
        out = R if out is None else out @ R
    return out
