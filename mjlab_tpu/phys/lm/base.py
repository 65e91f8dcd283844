"""Lane-major building blocks: scalar-plane math and model-param access.

Representation: a 3-vector is a tuple of three (E,) arrays ("planes"), a
quaternion a 4-tuple, a 3x3 matrix a 9-tuple (row-major), a spatial vector
a 6-tuple ([angular, linear], MuJoCo cvel convention). Every op is then
elementwise over the env lane axis — XLA fuses whole stages into a few
full-lane kernels, with zero layout padding. Stacked (..., E) arrays appear
only at stage boundaries.

Model parameters are accessed through `Params`, which hides whether a field
is shared (shape (...,), broadcast over envs) or DR-batched (leading env
axis, moved to the lane axis once — hoisted out of rollout scans by XLA's
loop-invariant code motion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Params:
    """Env-last view over (possibly DR-batched) Model fields.

    P(name)        -> array with env axis last (or a broadcastable scalar
                      shape ending in 1 if the field is shared)
    P.plane(name, *idx) -> a single scalar plane: shape (E,) or (1,)
    """

    def __init__(self, m, batched: frozenset[str], num_envs: int):
        self.m = m
        self.batched = frozenset(batched)
        self.E = num_envs

    def __call__(self, name: str):
        v = getattr(self.m, name)
        if name in self.batched:
            return jnp.moveaxis(v, 0, -1)  # (..., E)
        return v[..., None]  # (..., 1) broadcasts against (..., E)

    def plane(self, name: str, *idx):
        v = getattr(self.m, name)
        if name in self.batched:
            return v[(slice(None),) + idx]  # (E,)
        return v[idx][None] if idx else v[None]  # (1,)


# -- tuple-plane algebra -----------------------------------------------------


def vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def vscale(a, s):
    return tuple(x * s for x in a)


def vdot(a, b):
    out = a[0] * b[0]
    for x, y in zip(a[1:], b[1:]):
        out = out + x * y
    return out


def vcross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def vnorm(a, eps=1e-15):
    return jnp.sqrt(jnp.maximum(vdot(a, a), eps))


def vnormalize(a, eps=1e-15):
    n = vnorm(a, eps)
    return tuple(x / n for x in a)


def vwhere(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def quat_mul(u, v):
    uw, ux, uy, uz = u
    vw, vx, vy, vz = v
    return (
        uw * vw - ux * vx - uy * vy - uz * vz,
        uw * vx + ux * vw + uy * vz - uz * vy,
        uw * vy - ux * vz + uy * vw + uz * vx,
        uw * vz + ux * vy - uy * vx + uz * vw,
    )


def quat_conj(q):
    w, x, y, z = q
    return (w, -x, -y, -z)


def quat_normalize(q, eps=1e-15):
    n2 = vdot(q, q)
    n = jnp.sqrt(jnp.maximum(n2, eps * eps))
    bad = n < eps
    w = jnp.where(bad, 1.0, q[0] / n)
    rest = tuple(jnp.where(bad, 0.0, c / n) for c in q[1:])
    return (w,) + rest


def quat_rot(v, q):
    """Rotate vector v by quaternion q: v + 2w(u x v) + 2u x (u x v)."""
    w = q[0]
    u = q[1:]
    uv = vcross(u, v)
    uuv = vcross(u, uv)
    return tuple(vi + 2.0 * (w * uvi + uuvi) for vi, uvi, uuvi in zip(v, uv, uuv))


def quat_rot_inv(v, q):
    return quat_rot(v, quat_conj(q))


def quat_to_mat(q):
    """Quaternion -> 9-tuple rotation matrix, row-major."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    )


def mat_vec(m9, v):
    """(9-tuple row-major) @ (3-tuple)."""
    return (
        m9[0] * v[0] + m9[1] * v[1] + m9[2] * v[2],
        m9[3] * v[0] + m9[4] * v[1] + m9[5] * v[2],
        m9[6] * v[0] + m9[7] * v[1] + m9[8] * v[2],
    )


def mat_tvec(m9, v):
    """transpose(m9) @ v."""
    return (
        m9[0] * v[0] + m9[3] * v[1] + m9[6] * v[2],
        m9[1] * v[0] + m9[4] * v[1] + m9[7] * v[2],
        m9[2] * v[0] + m9[5] * v[1] + m9[8] * v[2],
    )


def mat_mul(a, b):
    """9-tuple row-major matrix product a @ b."""
    return (
        a[0] * b[0] + a[1] * b[3] + a[2] * b[6],
        a[0] * b[1] + a[1] * b[4] + a[2] * b[7],
        a[0] * b[2] + a[1] * b[5] + a[2] * b[8],
        a[3] * b[0] + a[4] * b[3] + a[5] * b[6],
        a[3] * b[1] + a[4] * b[4] + a[5] * b[7],
        a[3] * b[2] + a[4] * b[5] + a[5] * b[8],
        a[6] * b[0] + a[6 + 1] * b[3] + a[8] * b[6],
        a[6] * b[1] + a[7] * b[4] + a[8] * b[7],
        a[6] * b[2] + a[7] * b[5] + a[8] * b[8],
    )


def axis_angle_quat(axis, angle):
    half = 0.5 * angle
    s = jnp.sin(half)
    return (jnp.cos(half), axis[0] * s, axis[1] * s, axis[2] * s)


def quat_integrate(q, omega, dt):
    """q' = q * exp(0.5 * omega_local * dt) (mju_quatIntegrate)."""
    angle = jnp.sqrt(jnp.maximum(vdot(omega, omega), 0.0))
    small = angle < 1e-12
    safe = jnp.where(small, 1.0, angle)
    axis = tuple(jnp.where(small, 0.0, o / safe) for o in omega)
    dq = axis_angle_quat(axis, angle * dt)
    return quat_normalize(quat_mul(q, dq))


def quat_sub(qa, qb):
    """3D velocity-space difference taking qb to qa (mju_subQuat)."""
    qd = quat_mul(quat_conj(qb), qa)
    neg = qd[0] < 0
    qd = tuple(jnp.where(neg, -c, c) for c in qd)
    sin_half = jnp.sqrt(jnp.maximum(qd[1] ** 2 + qd[2] ** 2 + qd[3] ** 2, 0.0))
    angle = 2.0 * jnp.arctan2(sin_half, qd[0])
    small = sin_half < 1e-12
    safe = jnp.where(small, 1.0, sin_half)
    return tuple(jnp.where(small, 0.0, c / safe * angle) for c in qd[1:])


# -- spatial (6-tuple, [angular(3), linear(3)]) ------------------------------


def motion_cross(v, m):
    vang, vlin = v[:3], v[3:]
    mang, mlin = m[:3], m[3:]
    ang = vcross(vang, mang)
    lin = vadd(vcross(vlin, mang), vcross(vang, mlin))
    return ang + lin


def force_cross(v, f):
    vang, vlin = v[:3], v[3:]
    fang, flin = f[:3], f[3:]
    ang = vadd(vcross(vang, fang), vcross(vlin, flin))
    lin = vcross(vang, flin)
    return ang + lin


# -- stacking helpers --------------------------------------------------------


def stack_planes(planes):
    """Tuple/list of (E,) planes -> (n, E) array."""
    return jnp.stack(planes, axis=0)


def to_env_first(x):
    """(..., E) -> (E, ...)."""
    return jnp.moveaxis(x, -1, 0)


def to_env_last(x):
    """(E, ...) -> (..., E)."""
    return jnp.moveaxis(x, 0, -1)


def planes_of(x, n):
    """(n, E) array -> tuple of n (E,) planes."""
    return tuple(x[i] for i in range(n))
