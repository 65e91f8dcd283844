"""Batched ray casting against the primitive geom set.

TPU-native analog of MuJoCo's ``mj_ray`` for the geom types this engine
collides (plane, sphere, capsule, box). Used by rangefinder sensors
(reference consumes mjSENS_RANGEFINDER via sensordata,
/root/reference/src/mjlab/sensor/builtin_sensor.py:66).

All functions are batched over a leading env axis; geoms are unrolled
host-side (static topology), so the whole cast fuses into one kernel.

Limitations: hfield and mesh geoms are transparent to rays (the engine's
collision layer does not narrowphase meshes either); MuJoCo would hit
visual meshes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.model import Model

_INF = 1e10

GEOM_PLANE = 0
GEOM_SPHERE = 2
GEOM_CAPSULE = 3
GEOM_ELLIPSOID = 4
GEOM_CYLINDER = 5
GEOM_BOX = 6


def _ray_plane(p, v):
    """Ray vs the z=0 plane (local frame), hit only from above (z>0
    halfspace, the solid side faces +z). p, v: (..., 3)."""
    vz = v[..., 2]
    t = -p[..., 2] / jnp.where(jnp.abs(vz) < 1e-15, 1e-15, vz)
    hit = (t > 0) & (jnp.abs(vz) >= 1e-15)
    return jnp.where(hit, t, _INF)


def _ray_sphere(p, v, r):
    a = jnp.sum(v * v, axis=-1)
    b = 2.0 * jnp.sum(p * v, axis=-1)
    c = jnp.sum(p * p, axis=-1) - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2 * a)
    t1 = (-b + sq) / (2 * a)
    t = jnp.where(t0 > 0, t0, t1)
    hit = (disc >= 0) & (t > 0)
    return jnp.where(hit, t, _INF)


def _ray_capsule(p, v, r, hl):
    """Capsule along local z with half-length hl, radius r."""
    # infinite cylinder in xy
    a = jnp.sum(v[..., :2] ** 2, axis=-1)
    b = 2.0 * jnp.sum(p[..., :2] * v[..., :2], axis=-1)
    c = jnp.sum(p[..., :2] ** 2, axis=-1) - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.where(a < 1e-15, 1e-15, a)
    t0 = (-b - sq) / (2 * safe_a)
    t1 = (-b + sq) / (2 * safe_a)
    t_cyl = jnp.where(t0 > 0, t0, t1)
    z_hit = p[..., 2] + t_cyl * v[..., 2]
    cyl_ok = (disc >= 0) & (t_cyl > 0) & (jnp.abs(z_hit) <= hl) & (a >= 1e-15)
    t_cyl = jnp.where(cyl_ok, t_cyl, _INF)
    # end cap spheres
    up = p - jnp.array([0.0, 0.0, 1.0]) * hl
    dn = p + jnp.array([0.0, 0.0, 1.0]) * hl
    t_up = _ray_sphere(up, v, r)
    t_dn = _ray_sphere(dn, v, r)
    return jnp.minimum(t_cyl, jnp.minimum(t_up, t_dn))


def _ray_box(p, v, half):
    """Axis-aligned box in local frame, half extents half (3,)."""
    safe_v = jnp.where(jnp.abs(v) < 1e-15, 1e-15, v)
    t_lo = (-half - p) / safe_v
    t_hi = (half - p) / safe_v
    t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    t = jnp.where(t_near > 0, t_near, t_far)
    hit = (t_far >= t_near) & (t > 0)
    return jnp.where(hit, t, _INF)


def raycast(m: Model, d, pnt, vec, exclude_body: int):
    """Distance along `vec` (unit, world) from `pnt` (E, 3) to the nearest
    geom surface; -1 where nothing is hit. Excludes geoms on
    `exclude_body` (MuJoCo rangefinder semantics)."""
    E = pnt.shape[0]
    best = jnp.full((E,), _INF, pnt.dtype)
    gtype = np.asarray(m.geom_type)
    gbody = np.asarray(m.geom_bodyid)
    size = np.asarray(m.geom_size)
    for g in range(m.ngeom):
        if int(gbody[g]) == exclude_body:
            continue
        t = int(gtype[g])
        gpos = d.geom_xpos[:, g]
        gmat = d.geom_xmat[:, g]
        # to local frame
        pl = jnp.einsum("eij,ej->ei", jnp.swapaxes(gmat, -1, -2), pnt - gpos)
        vl = jnp.einsum("eij,ej->ei", jnp.swapaxes(gmat, -1, -2), vec)
        if t == GEOM_PLANE:
            dist = _ray_plane(pl, vl)
        elif t == GEOM_SPHERE:
            dist = _ray_sphere(pl, vl, float(size[g, 0]))
        elif t == GEOM_CAPSULE:
            dist = _ray_capsule(pl, vl, float(size[g, 0]), float(size[g, 1]))
        elif t == GEOM_BOX:
            dist = _ray_box(pl, vl, jnp.asarray(size[g], pnt.dtype))
        else:
            continue  # hfield/mesh/cylinder/ellipsoid: transparent
        best = jnp.minimum(best, dist)
    return jnp.where(best >= _INF, -1.0, best)
