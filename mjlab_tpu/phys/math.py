"""Quaternion and spatial (6D) algebra with MuJoCo conventions.

Conventions:
  - Quaternions are (w, x, y, z), matching mujoco's mjtNum[4] layout.
  - Spatial vectors are 6D with ANGULAR part first: [omega(3), v(3)] for
    motion, [torque(3), force(3)] for force, matching mjData.cvel/cfrc.
  - All functions operate on the trailing axes and are vmap/batch friendly.

Behavioral reference: mujoco's mju_* quaternion utilities (documented in the
MuJoCo programming guide); re-derived here, not translated from any source.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def mul_quat(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product u*v, (w,x,y,z) convention."""
    uw, ux, uy, uz = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    vw, vx, vy, vz = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            uw * vw - ux * vx - uy * vy - uz * vz,
            uw * vx + ux * vw + uy * vz - uz * vy,
            uw * vy - ux * vz + uy * vw + uz * vx,
            uw * vz + ux * vy - uy * vx + uz * vw,
        ],
        axis=-1,
    )


def conj_quat(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize_quat(q: jax.Array, eps: float = 1e-15) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Guard the zero quaternion -> identity.
    safe = jnp.where(n < eps, 1.0, n)
    out = q / safe
    ident = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(n < eps, ident, out)


def rot_vec_quat(v: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (body->world if q is body orientation)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rot_vec_quat_inv(v: jax.Array, q: jax.Array) -> jax.Array:
    return rot_vec_quat(v, conj_quat(q))


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Quaternion -> 3x3 rotation matrix (broadcasts over leading dims)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> quaternion (w,x,y,z), branch-free.

    Uses the standard four-hypothesis construction selected by the largest
    diagonal combination (numerically stable for all rotations).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-18))

    # Hypothesis w-major
    qw = jnp.stack([safe_sqrt(1 + tr), m21 - m12, m02 - m20, m10 - m01], -1)
    # x-major
    qx = jnp.stack([m21 - m12, safe_sqrt(1 + m00 - m11 - m22), m01 + m10, m02 + m20], -1)
    # y-major
    qy = jnp.stack([m02 - m20, m01 + m10, safe_sqrt(1 - m00 + m11 - m22), m12 + m21], -1)
    # z-major
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, safe_sqrt(1 - m00 - m11 + m22)], -1)

    cases = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cases, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = normalize_quat(q)
    # canonical sign: w >= 0 (mujoco keyframe convention-free; sign irrelevant)
    return jnp.where(q[..., 0:1] < 0, -q, q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate quaternion by angular velocity omega (local frame) over dt.

    Matches mju_quatIntegrate: q' = q * exp(0.5 * omega * dt).
    """
    angle = jnp.linalg.norm(omega, axis=-1)
    safe = jnp.where(angle < 1e-12, 1.0, angle)
    axis = omega / safe[..., None]
    axis = jnp.where((angle < 1e-12)[..., None], jnp.zeros_like(omega), axis)
    dq = axis_angle_to_quat(axis, angle * dt)
    return normalize_quat(mul_quat(q, dq))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Velocity-space difference: 3D rotation taking qb to qa, in qb's local
    frame. Matches mju_subQuat."""
    qdif = mul_quat(conj_quat(qb), qa)
    qdif = jnp.where(qdif[..., 0:1] < 0, -qdif, qdif)
    sin_half = jnp.linalg.norm(qdif[..., 1:4], axis=-1)
    cos_half = qdif[..., 0]
    angle = 2.0 * jnp.arctan2(sin_half, cos_half)
    safe = jnp.where(sin_half < 1e-12, 1.0, sin_half)
    axis = qdif[..., 1:4] / safe[..., None]
    return jnp.where((sin_half < 1e-12)[..., None], jnp.zeros_like(axis), axis * angle[..., None])


# ---------------------------------------------------------------------------
# 3D helpers
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix: skew(v) @ u == cross(v, u)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def normalize(v: jax.Array, eps: float = 1e-15):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# Spatial algebra ([angular, linear] ordering)
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product v x m (crm): time derivative of a motion
    vector m moving with velocity v."""
    vang, vlin = v[..., :3], v[..., 3:]
    mang, mlin = m[..., :3], m[..., 3:]
    ang = jnp.cross(vang, mang)
    lin = jnp.cross(vlin, mang) + jnp.cross(vang, mlin)
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v x* f (crf)."""
    vang, vlin = v[..., :3], v[..., 3:]
    fang, flin = f[..., :3], f[..., 3:]
    ang = jnp.cross(vang, fang) + jnp.cross(vlin, flin)
    lin = jnp.cross(vang, flin)
    return jnp.concatenate([ang, lin], axis=-1)


def offset_motion(s: jax.Array, offset: jax.Array) -> jax.Array:
    """Re-express a spatial motion vector at a new origin.

    offset = old_origin - new_origin (both world). lin' = lin + ang x offset.
    """
    ang, lin = s[..., :3], s[..., 3:]
    return jnp.concatenate([ang, lin + jnp.cross(ang, offset)], axis=-1)


def offset_force(s: jax.Array, offset: jax.Array) -> jax.Array:
    """Re-express a spatial force vector at a new origin.

    offset = old_origin - new_origin. ang' = ang + offset x lin.
    """
    ang, lin = s[..., :3], s[..., 3:]
    return jnp.concatenate([ang + jnp.cross(offset, lin), lin], axis=-1)


def spatial_inertia(mass: jax.Array, inertia_c: jax.Array, com: jax.Array) -> jax.Array:
    """6x6 spatial inertia about a frame origin O.

    Args:
      mass: scalar mass (...,)
      inertia_c: 3x3 rotational inertia about the CoM, world-aligned (...,3,3)
      com: CoM position relative to O, world frame (...,3)

    Maps motion [w, v] at O to momentum [h_ang_O, p]:
      p     = m v - m cx w
      h_ang = (I_C - m cx cx) w + m cx v        with cx = skew(com)
    """
    cx = skew(com)
    m = mass[..., None, None]
    # skew(c)^2 == c c^T - (c.c) I, written out component-wise: batched
    # (..., 3, 3) dot_generals lower to bf16 3-pass MXU matmuls with
    # lane-padded (3, 3) tiles plus layout-flip copies (round-3 trace:
    # ~1.7 ms/substep at 4096 envs in this stage) — explicit products
    # keep the whole stage in one elementwise fusion.
    c0, c1, c2 = com[..., 0], com[..., 1], com[..., 2]
    cc = c0 * c0 + c1 * c1 + c2 * c2
    cxcx = jnp.stack(
        [
            c0 * c0 - cc, c0 * c1, c0 * c2,
            c1 * c0, c1 * c1 - cc, c1 * c2,
            c2 * c0, c2 * c1, c2 * c2 - cc,
        ],
        axis=-1,
    ).reshape(com.shape[:-1] + (3, 3))
    top_left = inertia_c - m * cxcx
    top_right = m * cx
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
    bottom_left = -m * cx  # == m * cx.T
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_motion(s: jax.Array, rot: jax.Array, offset: jax.Array) -> jax.Array:
    """Rotate (by 3x3 rot) then translate a motion vector to a new origin."""
    ang = jnp.einsum("...ij,...j->...i", rot, s[..., :3])
    lin = jnp.einsum("...ij,...j->...i", rot, s[..., 3:])
    return offset_motion(jnp.concatenate([ang, lin], -1), offset)
