"""Collision: static broadphase pair table (host) + batched narrowphase (jnp).

TPU-first design: there is no dynamic broadphase on device. All candidate
geom pairs are enumerated once on the host from contype/conaffinity, body
weld/parent filtering and explicit excludes — exactly MuJoCo's filtering
rules — and each pair owns a *static* number of contact slots determined by
the geom-type pair. The device narrowphase fills every slot every step;
inactive slots are masked by dist >= includemargin. This replaces the
reference's per-world nconmax allocation (reference src/mjlab/sim/sim.py:84-93)
with fully static shapes.

Supported narrowphase pairs (geom types ordered t1 <= t2):
  plane-{sphere(1), capsule(2), ellipsoid(1), cylinder(4), box(4), mesh(3)},
  hfield-{sphere(1), capsule(2), box(4)},
  sphere-{sphere(1), capsule(1), ellipsoid(1), cylinder(1), box(1)},
  capsule-{capsule(1), box(2)}, ellipsoid-{ellipsoid(1), cylinder(1)},
  cylinder-cylinder(1), box-box(4).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.phys import math

GEOM_PLANE = 0
GEOM_HFIELD = 1
GEOM_SPHERE = 2
GEOM_CAPSULE = 3
GEOM_ELLIPSOID = 4
GEOM_CYLINDER = 5
GEOM_BOX = 6
GEOM_MESH = 7

# contacts emitted per (type1, type2) narrowphase
_PAIR_NCON = {
    (GEOM_PLANE, GEOM_SPHERE): 1,
    (GEOM_PLANE, GEOM_CAPSULE): 2,
    (GEOM_PLANE, GEOM_BOX): 4,
    (GEOM_PLANE, GEOM_MESH): 3,
    (GEOM_PLANE, GEOM_CYLINDER): 4,
    (GEOM_PLANE, GEOM_ELLIPSOID): 1,
    (GEOM_SPHERE, GEOM_CYLINDER): 1,
    (GEOM_SPHERE, GEOM_ELLIPSOID): 1,
    (GEOM_ELLIPSOID, GEOM_ELLIPSOID): 1,
    (GEOM_ELLIPSOID, GEOM_CYLINDER): 1,
    (GEOM_CYLINDER, GEOM_CYLINDER): 1,
    (GEOM_HFIELD, GEOM_SPHERE): 1,
    (GEOM_HFIELD, GEOM_CAPSULE): 2,
    (GEOM_HFIELD, GEOM_BOX): 4,
    (GEOM_SPHERE, GEOM_SPHERE): 1,
    (GEOM_SPHERE, GEOM_CAPSULE): 1,
    (GEOM_SPHERE, GEOM_BOX): 1,
    (GEOM_CAPSULE, GEOM_CAPSULE): 1,
    (GEOM_CAPSULE, GEOM_BOX): 2,
    (GEOM_BOX, GEOM_BOX): 4,
}


def make_pair_table(mj: mujoco.MjModel):
    """Enumerate candidate contact pairs with MuJoCo's filtering rules."""
    from mjlab_tpu.phys.model import PairTable

    nbody = mj.nbody
    weld = mj.body_weldid
    # weld parent: weldid of the parent of the weld root body
    weld_parent = np.array(
        [weld[mj.body_parentid[mj.body_weldid[b]]] for b in range(nbody)]
    )
    excludes = set()
    for e in range(mj.nexclude):
        sig = int(mj.exclude_signature[e])
        # signature = body1 << 16 | body2
        excludes.add((sig >> 16, sig & 0xFFFF))
        excludes.add((sig & 0xFFFF, sig >> 16))

    filterparent = not (mj.opt.disableflags & mujoco.mjtDisableBit.mjDSBL_FILTERPARENT)

    # explicit <pair> elements come FIRST: they bypass contype/conaffinity
    # filtering, dedupe the dynamic pair, and carry their own
    # condim/friction/solref/solimp/margin/gap (measured semantics: a
    # geom pair listed explicitly produces exactly one contact with the
    # pair's parameters even when the dynamic filter also matches it)
    g1s, g2s = [], []
    explicit_rows = []  # parallel per-pair override dicts
    explicit_set = set()
    skipped = set()
    for p in range(mj.npair):
        i, j = int(mj.pair_geom1[p]), int(mj.pair_geom2[p])
        t1, t2 = int(mj.geom_type[i]), int(mj.geom_type[j])
        gi, gj = (i, j) if t1 <= t2 else (j, i)
        key = (min(t1, t2), max(t1, t2))
        if key not in _PAIR_NCON:
            skipped.add(key)
            continue
        if np.any(mj.pair_solreffriction[p] != 0.0):
            warnings.warn(
                "<pair solreffriction> is not supported; using solref for "
                "friction rows"
            )
        g1s.append(gi)
        g2s.append(gj)
        explicit_set.add((min(i, j), max(i, j)))
        fr = np.asarray(mj.pair_friction[p], np.float64).copy()
        explicit_rows.append(
            dict(
                condim=int(mj.pair_dim[p]),
                friction5=fr,
                solref=np.asarray(mj.pair_solref[p], np.float64).copy(),
                solimp=np.asarray(mj.pair_solimp[p], np.float64).copy(),
                margin=float(mj.pair_margin[p]),
                gap=float(mj.pair_gap[p]),
            )
        )

    n_explicit = len(g1s)
    for i in range(mj.ngeom):
        for j in range(i + 1, mj.ngeom):
            if (min(i, j), max(i, j)) in explicit_set:
                continue
            b1, b2 = int(mj.geom_bodyid[i]), int(mj.geom_bodyid[j])
            w1, w2 = int(weld[b1]), int(weld[b2])
            if w1 == w2:
                continue
            if filterparent and w1 != 0 and w2 != 0 and (
                w1 == weld_parent[b2] or w2 == weld_parent[b1]
            ):
                continue
            if (b1, b2) in excludes:
                continue
            if not (
                (mj.geom_contype[i] & mj.geom_conaffinity[j])
                or (mj.geom_contype[j] & mj.geom_conaffinity[i])
            ):
                continue
            t1, t2 = int(mj.geom_type[i]), int(mj.geom_type[j])
            gi, gj = (i, j) if t1 <= t2 else (j, i)
            key = (min(t1, t2), max(t1, t2))
            if key not in _PAIR_NCON:
                skipped.add(key)
                continue
            g1s.append(gi)
            g2s.append(gj)
    if skipped:
        warnings.warn(f"unsupported collision type pairs skipped: {sorted(skipped)}")

    # sort pairs by type-pair so each narrowphase group owns a contiguous
    # contact-slot range — collision() then assembles results by
    # concatenation instead of batched scatters
    ex_data = explicit_rows + [None] * (len(g1s) - n_explicit)
    order = sorted(
        range(len(g1s)),
        key=lambda p: (int(mj.geom_type[g1s[p]]), int(mj.geom_type[g2s[p]])),
    )
    g1s = [g1s[p] for p in order]
    g2s = [g2s[p] for p in order]
    ex_data = [ex_data[p] for p in order]

    geom1 = np.array(g1s, np.int32)
    geom2 = np.array(g2s, np.int32)
    npair = len(g1s)

    # condim: priority rule, else max; explicit pairs use their own dim
    p1 = mj.geom_priority[geom1] if npair else np.zeros(0)
    p2 = mj.geom_priority[geom2] if npair else np.zeros(0)
    c1 = mj.geom_condim[geom1] if npair else np.zeros(0, np.int32)
    c2 = mj.geom_condim[geom2] if npair else np.zeros(0, np.int32)
    pair_condim = np.where(
        p1 > p2, c1, np.where(p2 > p1, c2, np.maximum(c1, c2))
    ).astype(np.int32)

    ex_mask = np.array([e is not None for e in ex_data], bool)
    ex_friction5 = np.zeros((npair, 5))
    ex_solref = np.zeros((npair, 2))
    ex_solimp = np.zeros((npair, 5))
    ex_margin = np.zeros(npair)
    ex_gap = np.zeros(npair)
    for idx, e in enumerate(ex_data):
        if e is None:
            continue
        pair_condim[idx] = e["condim"]
        ex_friction5[idx] = e["friction5"]
        ex_solref[idx] = e["solref"]
        ex_solimp[idx] = e["solimp"]
        ex_margin[idx] = e["margin"]
        ex_gap[idx] = e["gap"]

    pair_ncon = np.array(
        [
            _PAIR_NCON[(int(mj.geom_type[a]), int(mj.geom_type[b]))]
            for a, b in zip(geom1, geom2)
        ],
        np.int32,
    ) if npair else np.zeros(0, np.int32)
    pair_conadr = np.concatenate([[0], np.cumsum(pair_ncon)[:-1]]).astype(np.int32) if npair else np.zeros(0, np.int32)
    ncon = int(pair_ncon.sum()) if npair else 0

    con_pairid = np.repeat(np.arange(npair, dtype=np.int32), pair_ncon) if npair else np.zeros(0, np.int32)
    con_geom1 = geom1[con_pairid] if npair else np.zeros(0, np.int32)
    con_geom2 = geom2[con_pairid] if npair else np.zeros(0, np.int32)
    con_dim = pair_condim[con_pairid] if npair else np.zeros(0, np.int32)

    return PairTable(
        geom1=geom1,
        geom2=geom2,
        pair_condim=pair_condim,
        pair_ncon=pair_ncon,
        pair_conadr=pair_conadr,
        ex_mask=ex_mask,
        ex_friction5=ex_friction5,
        ex_solref=ex_solref,
        ex_solimp=ex_solimp,
        ex_margin=ex_margin,
        ex_gap=ex_gap,
        ncon=ncon,
        con_pairid=con_pairid,
        con_geom1=con_geom1,
        con_geom2=con_geom2,
        con_dim=con_dim,
        con_efcadr=np.zeros(ncon, np.int32),  # filled by put_model
    )


# ---------------------------------------------------------------------------
# Runtime parameter combination (traced; supports DR on geom fields)
# ---------------------------------------------------------------------------


def pair_params(m) -> tuple:
    """Combined contact parameters per pair: friction(5), solref(2),
    solimp(5), margin, gap. Follows MuJoCo's mixing rules: priority geom
    wins outright; equal priorities mix solref/solimp by solmix weight and
    take elementwise max friction and max margin/gap."""
    pt = m.pairs
    g1, g2 = pt.geom1, pt.geom2
    pri1, pri2 = m.geom_priority[g1], m.geom_priority[g2]  # static numpy
    f1, f2 = m.geom_friction[g1], m.geom_friction[g2]
    sr1, sr2 = m.geom_solref[g1], m.geom_solref[g2]
    si1, si2 = m.geom_solimp[g1], m.geom_solimp[g2]
    mix1, mix2 = m.geom_solmix[g1], m.geom_solmix[g2]

    # solmix weight with guards
    denom = mix1 + mix2
    w = jnp.where(denom > 1e-12, mix1 / jnp.where(denom > 1e-12, denom, 1.0), 0.5)
    w = jnp.where((mix1 < 1e-12) & (mix2 < 1e-12), 0.5, w)
    w = jnp.where((mix1 < 1e-12) & (mix2 >= 1e-12), 0.0, w)
    w = jnp.where((mix2 < 1e-12) & (mix1 >= 1e-12), 1.0, w)
    w = w[:, None]

    # standard solref mixing; direct (non-positive timeconst) -> elementwise min
    solref_mix = w * sr1 + (1 - w) * sr2
    direct = (sr1[:, 0:1] <= 0) | (sr2[:, 0:1] <= 0)
    solref_eq = jnp.where(direct, jnp.minimum(sr1, sr2), solref_mix)
    solimp_eq = w * si1 + (1 - w) * si2
    friction_eq = jnp.maximum(f1, f2)

    pri1_gt = (pri1 > pri2)[:, None]  # numpy static -> constant
    pri2_gt = (pri2 > pri1)[:, None]
    friction = jnp.where(pri1_gt, f1, jnp.where(pri2_gt, f2, friction_eq))
    solref = jnp.where(pri1_gt, sr1, jnp.where(pri2_gt, sr2, solref_eq))
    solimp = jnp.where(pri1_gt, si1, jnp.where(pri2_gt, si2, solimp_eq))

    margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
    gap = jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])

    friction5 = jnp.stack(
        [friction[:, 0], friction[:, 0], friction[:, 1], friction[:, 2], friction[:, 2]],
        axis=-1,
    )

    # explicit <pair> rows use the pair's own parameters verbatim
    if pt.ex_mask.any():
        exm = pt.ex_mask[:, None]
        friction5 = jnp.where(exm, pt.ex_friction5, friction5)
        solref = jnp.where(exm, pt.ex_solref, solref)
        solimp = jnp.where(exm, pt.ex_solimp, solimp)
        margin = jnp.where(pt.ex_mask, pt.ex_margin, margin)
        gap = jnp.where(pt.ex_mask, pt.ex_gap, gap)
    return friction5, solref, solimp, margin, gap


# ---------------------------------------------------------------------------
# Narrowphase primitives (vectorized over pairs in a group)
# ---------------------------------------------------------------------------


def make_frame(n: jax.Array) -> jax.Array:
    """Build contact frame rows [normal, tangent1, tangent2] from normal.

    Matches mju_makeFrame (verified numerically against mujoco contacts):
    the tangent candidate is the world y-axis when |n_y| < 0.5, else the
    world z-axis; t1 = normalized rejection of the candidate, t2 = n x t1.
    """
    ny_small = jnp.abs(n[..., 1]) < 0.5
    cand = jnp.where(
        ny_small[..., None],
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
    )
    t1 = cand - n * jnp.sum(cand * n, axis=-1, keepdims=True)
    t1 = math.normalize(t1)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def _plane_sphere(xpos1, xmat1, size1, xpos2, xmat2, size2):
    n = xmat1[..., :, 2]
    r = size2[..., 0]
    h = jnp.sum(n * (xpos2 - xpos1), axis=-1)
    dist = h - r
    pos = xpos2 - n * (r + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]


def _plane_capsule(xpos1, xmat1, size1, xpos2, xmat2, size2):
    n = xmat1[..., :, 2]
    axis = xmat2[..., :, 2]
    r = size2[..., 0:1]
    hl = size2[..., 1:2]
    e1 = xpos2 + axis * hl
    e2 = xpos2 - axis * hl
    dists, poss = [], []
    for e in (e1, e2):
        h = jnp.sum(n * (e - xpos1), axis=-1)
        dist = h - r[..., 0]
        pos = e - n * (r[..., 0] + 0.5 * dist)[..., None]
        dists.append(dist)
        poss.append(pos)
    dist = jnp.stack(dists, axis=-1)
    pos = jnp.stack(poss, axis=-2)
    # MuJoCo aligns the first tangent with the capsule axis projected onto
    # the plane (verified numerically); falls back to mju_makeFrame when the
    # capsule is perpendicular to the plane.
    t1 = axis - n * jnp.sum(axis * n, axis=-1, keepdims=True)
    t1n = jnp.linalg.norm(t1, axis=-1, keepdims=True)
    default = make_frame(n)
    t1 = jnp.where(t1n > 1e-8, t1 / jnp.maximum(t1n, 1e-12), default[..., 1, :])
    t2 = jnp.cross(n, t1)
    frame = jnp.stack([n, t1, t2], axis=-2)
    frame = jnp.broadcast_to(frame[..., None, :, :], pos.shape[:-1] + (3, 3))
    return dist, pos, frame


def _plane_box(xpos1, xmat1, size1, xpos2, xmat2, size2):
    n = xmat1[..., :, 2]
    # 8 corners in box local frame
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=xpos2.dtype,
    )  # (8,3)
    corners = xpos2[..., None, :] + jnp.einsum(
        "...ij,...kj->...ki", xmat2, signs * size2[..., None, :]
    )
    h = jnp.sum(n[..., None, :] * (corners - xpos1[..., None, :]), axis=-1)  # (...,8)
    # keep the 4 deepest corners
    neg_h, idx = jax.lax.top_k(-h, 4)
    dist = -neg_h
    pos = jnp.take_along_axis(corners, idx[..., None].repeat(3, -1), axis=-2)
    pos = pos - n[..., None, :] * 0.5 * dist[..., None]
    frame = jnp.broadcast_to(make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3))
    return dist, pos, frame


def _plane_cylinder(xpos1, xmat1, size1, xpos2, xmat2, size2):
    """Plane vs cylinder: 4 candidate slots — the deepest rim point of the
    near cap, its +-120deg rim neighbors (cap resting flat), and the far
    cap's deepest rim point (side-lying line contact). Matches measured
    mujoco contact sets for standing / tilted / lying cylinders."""
    n = xmat1[..., :, 2]
    a = xmat2[..., :, 2]
    r = size2[..., 0:1]
    h = size2[..., 1:2]
    prj = jnp.sum(n * a, axis=-1, keepdims=True)
    # tangential direction of the plane normal within the disk plane
    t = n - a * prj
    tn = jnp.linalg.norm(t, axis=-1, keepdims=True)
    that = jnp.where(tn > 1e-10, t / jnp.maximum(tn, 1e-12), xmat2[..., :, 0])
    sgn = jnp.where(prj >= 0, 1.0, -1.0)
    near = xpos2 - a * h * sgn
    far = xpos2 + a * h * sgn
    b = jnp.cross(a, that)  # unit, in-disk, orthogonal to that

    # rim points at +-120deg from the deepest direction (-that):
    # cap + r*(cos120*(-that) +- sin120*b)
    c120, s120 = -0.5, 0.8660254037844386
    p120a = near + r * (c120 * (-that) + s120 * b)
    p120b = near + r * (c120 * (-that) - s120 * b)
    cands = jnp.stack([near - r * that, p120a, p120b, far - r * that], axis=-2)

    dist = jnp.sum(
        n[..., None, :] * (cands - xpos1[..., None, :]), axis=-1
    )  # (..., 4)
    pos = cands - n[..., None, :] * 0.5 * dist[..., None]
    frame = jnp.broadcast_to(
        make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3)
    )
    return dist, pos, frame


def _plane_ellipsoid(xpos1, xmat1, size1, xpos2, xmat2, size2):
    """Plane vs ellipsoid: single support point along -n."""
    n = xmat1[..., :, 2]
    S = size2[..., :3]
    n_l = jnp.einsum("...ij,...i->...j", xmat2, n)  # R^T n
    Sn = S * n_l
    denom = jnp.linalg.norm(Sn, axis=-1, keepdims=True)
    p_local = -(S * Sn) / jnp.maximum(denom, 1e-12)
    g = xpos2 + jnp.einsum("...ij,...j->...i", xmat2, p_local)
    dist = jnp.sum(n * (g - xpos1), axis=-1)
    pos = g - n * 0.5 * dist[..., None]
    return (
        dist[..., None],
        pos[..., None, :],
        make_frame(n)[..., None, :, :],
    )


def _ellipsoid_surface_point(p, S, iters=30):
    """Closest point on the ellipsoid surface {x : x^T diag(1/S^2) x = 1}
    to local point p (works for p inside or outside), via safeguarded
    Newton on the Lagrange parameter t of x(t) = (I + t D)^{-1} p:
    f(t) = sum_i p_i^2 S_i^2 / (S_i^2 + t)^2 - 1, monotone decreasing on
    (-min S^2, inf). Returns (x, outward unit normal at x)."""
    S2 = S * S
    p2S2 = p * p * S2
    tmin = -0.999 * jnp.min(S2, axis=-1)
    t = jnp.zeros_like(tmin)
    for _ in range(iters):
        denom = S2 + t[..., None]
        f = jnp.sum(p2S2 / (denom * denom), axis=-1) - 1.0
        fp = -2.0 * jnp.sum(p2S2 / (denom * denom * denom), axis=-1)
        t = jnp.maximum(t - f / jnp.minimum(fp, -1e-30), tmin)
    x = p * S2 / (S2 + t[..., None])
    n = x / S2
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(
        nn > 1e-12, n / jnp.maximum(nn, 1e-12),
        jnp.array([0.0, 0.0, 1.0], p.dtype),
    )
    return x, n


def _cylinder_surface_point(p, r, h):
    """Closest point on the SURFACE of the solid cylinder {rho<=r, |z|<=h}
    to local point p (inside points project to the nearer of wall/cap —
    the same case logic as _sphere_cylinder)."""
    z = p[..., 2]
    rho = p[..., :2]
    rho_n = jnp.linalg.norm(rho, axis=-1)
    inside = (jnp.abs(z) <= h) & (rho_n <= r)

    z_c = jnp.clip(z, -h, h)
    scale = jnp.minimum(1.0, r / jnp.maximum(rho_n, 1e-12))
    rho_c = rho * scale[..., None]
    cp_out = jnp.concatenate([rho_c, z_c[..., None]], axis=-1)

    side_gap = r - rho_n
    cap_gap = h - jnp.abs(z)
    rho_dir = rho / jnp.maximum(rho_n, 1e-12)[..., None]
    rho_dir = jnp.where(
        (rho_n < 1e-12)[..., None], jnp.array([1.0, 0.0], p.dtype), rho_dir
    )
    cp_side = jnp.concatenate([rho_dir * r[..., None], z[..., None]], axis=-1)
    cp_cap = jnp.concatenate(
        [rho, jnp.sign(z)[..., None] * h[..., None]], axis=-1
    )
    cp_in = jnp.where((side_gap < cap_gap)[..., None], cp_side, cp_cap)
    return jnp.where(inside[..., None], cp_in, cp_out)


def _pt_local(xpos, xmat, w):
    return jnp.einsum("...ij,...i->...j", xmat, w - xpos)


def _pt_world(xpos, xmat, l):
    return xpos + jnp.einsum("...ij,...j->...i", xmat, l)


def _cso_penetration(sup1, sup2, supset1, supset2, c1, c2, iters=120):
    """Penetration depth/normal/witnesses of two OVERLAPPING convex
    bodies: minimize the Minkowski-difference (CSO = B - A) support
    height h(n) = w(n).n over the unit sphere by projected gradient
    descent (Danskin: grad h = the support point w). depth = min h,
    contact normal (geom1 -> geom2) = -argmin, witnesses = the two
    body support points at the optimum."""
    cc = c1 - c2
    ccn = jnp.linalg.norm(cc, axis=-1, keepdims=True)
    n = jnp.where(
        ccn > 1e-12, cc / jnp.maximum(ccn, 1e-12),
        jnp.array([0.0, 0.0, 1.0], c1.dtype),
    )
    best_h = jnp.full(c1.shape[:-1], jnp.inf, c1.dtype)
    best_n = n

    def _norm(v):
        vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return jnp.where(
            vn > 1e-12, v / jnp.maximum(vn, 1e-12),
            jnp.array([0.0, 0.0, 1.0], c1.dtype),
        )

    def _descend(n, best_h, best_n, iters, c, decay):
        for k in range(iters):
            w = sup2(n) - sup1(-n)
            h = jnp.sum(w * n, axis=-1)
            better = h < best_h
            best_h = jnp.where(better, h, best_h)
            best_n = jnp.where(better[..., None], n, best_n)
            g = w - h[..., None] * n  # tangent-space (sub)gradient
            n = _norm(n - (c / (1.0 + decay * k)) * g)
        return best_h, best_n

    # two-phase subgradient schedule: coarse to find the valley, then a
    # fine restart from the incumbent — edge-edge cylinder minima sit in
    # narrow nonsmooth valleys (tuned against MuJoCo's EPA: converges to
    # ~1e-6 of its depth on the deep cyl-cyl parity state)
    best_h, best_n = _descend(n, best_h, best_n, iters, 0.5, 0.08)
    best_h, best_n = _descend(best_n, best_h, best_n, iters, 0.01, 0.5)
    a = sup1(-best_n)
    b = sup2(best_n)
    # contact position: at a set-valued support direction (cylinder wall
    # line or cap disk) the raw support point is an arbitrary member of
    # the support SET — e.g. crossed cylinders resting on each other pick
    # a wall-line endpoint instead of the crossing point. Refine by
    # alternating projections between the two support sets (supset:
    # project a point onto the support set for a direction); for
    # strictly convex shapes the set is the point itself.
    for _ in range(8):
        a = supset1(-best_n, b)
        b = supset2(best_n, a)
    n_c = -best_n  # contact normal, geom1 -> geom2
    return best_h, n_c, 0.5 * (a + b)


def _convex_pair_witness(proj1, inside1, proj2, inside2, sup1, sup2,
                         supset1, supset2, c1, c2, iters=40):
    """Closest/deepest single contact between two convex bodies — the
    same single-contact semantics as the reference's convex-convex
    narrowphase (which delegates to mjwarp's GJK/EPA).

    Separated: alternating projections between the two surfaces (POCS)
    converge to the closest pair. Overlapping: POCS converges to the
    surface-intersection curve (distance 0), so the penetrating branch
    switches to support-function descent on the Minkowski difference
    (_cso_penetration), the EPA analog for depth + normal."""
    x1 = proj1(c2)
    x2 = proj2(x1)
    for _ in range(iters):
        x1 = proj1(x2)
        x2 = proj2(x1)
    L = jnp.linalg.norm(x2 - x1, axis=-1)
    n = (x2 - x1) / jnp.maximum(L, 1e-12)[..., None]
    # degenerate coincident witnesses: fall back to the center axis
    cc = c2 - c1
    ccn = jnp.linalg.norm(cc, axis=-1, keepdims=True)
    n = jnp.where(
        (L < 1e-12)[..., None], cc / jnp.maximum(ccn, 1e-12), n
    )
    depth, n_pen, pos_pen = _cso_penetration(
        sup1, sup2, supset1, supset2, c1, c2
    )
    # overlap oracle: min_n of the CSO support height is positive iff the
    # origin is inside the Minkowski difference, i.e. the bodies overlap.
    # The POCS inside-tests alone are NOT sufficient — for intersecting
    # bodies the surface iteration can converge to a LOCAL
    # positive-separation pair away from the overlap lens and miss the
    # contact entirely (caught by the cyl-ellipsoid parity state where
    # MuJoCo reports -4 mm). Keep the inside-tests OR'd in: they certify
    # overlap when the descent is unconverged.
    pen = (depth > 0.0) | inside1(x2) | inside2(x1)
    dist = jnp.where(pen, -jnp.maximum(depth, 0.0), L)
    n = jnp.where(pen[..., None], n_pen, n)
    pos = jnp.where(pen[..., None], pos_pen, 0.5 * (x1 + x2))
    return dist, pos, n


def _ellipsoid_support(xpos, xmat, S, n):
    """World support point of an ellipsoid in world direction n."""
    d = jnp.einsum("...ij,...i->...j", xmat, n)  # R^T n
    S2d = S * S * d
    lam = jnp.sqrt(jnp.maximum(jnp.sum(S * d * (S * d), axis=-1), 1e-24))
    return xpos + jnp.einsum(
        "...ij,...j->...i", xmat, S2d / lam[..., None]
    )


def _cylinder_support(xpos, xmat, r, h, n):
    """World support point of a cylinder in world direction n."""
    d = jnp.einsum("...ij,...i->...j", xmat, n)
    dxy = d[..., :2]
    dn = jnp.linalg.norm(dxy, axis=-1, keepdims=True)
    xy = jnp.where(
        dn > 1e-12, r[..., None] * dxy / jnp.maximum(dn, 1e-12), 0.0 * dxy
    )
    z = jnp.where(d[..., 2] >= 0, h, -h)
    loc = jnp.concatenate([xy, z[..., None]], axis=-1)
    return xpos + jnp.einsum("...ij,...j->...i", xmat, loc)


def _ellipsoid_supset(xpos, xmat, S):
    """Support-SET projection for a strictly convex shape: the set is the
    support point itself."""

    def f(n, p):
        return _ellipsoid_support(xpos, xmat, S, n)

    return f


def _cylinder_supset(xpos, xmat, r, h, tol=1e-3):
    """Support-SET projection for a cylinder: project point p onto the
    support set in (unit, world) direction n — a wall line when n is
    near-perpendicular to the axis, the cap disk when near-parallel, the
    support point otherwise."""

    def f(n, p):
        d = jnp.einsum("...ij,...i->...j", xmat, n)
        dxy = d[..., :2]
        dn = jnp.linalg.norm(dxy, axis=-1)
        dz = d[..., 2]
        xy_pt = jnp.where(
            dn[..., None] > 1e-12,
            r[..., None] * dxy / jnp.maximum(dn[..., None], 1e-12),
            0.0 * dxy,
        )
        z_pt = jnp.where(dz >= 0, h, -h)
        pl = jnp.einsum("...ij,...i->...j", xmat, p - xpos)
        # wall line: z free within [-h, h]
        z = jnp.where(
            jnp.abs(dz) < tol, jnp.clip(pl[..., 2], -h, h), z_pt
        )
        # cap disk: xy free within radius r
        pn = jnp.linalg.norm(pl[..., :2], axis=-1)
        xy_cap = pl[..., :2] * jnp.minimum(
            1.0, r / jnp.maximum(pn, 1e-12)
        )[..., None]
        xy = jnp.where((dn < tol)[..., None], xy_cap, xy_pt)
        loc = jnp.concatenate([xy, z[..., None]], axis=-1)
        return xpos + jnp.einsum("...ij,...j->...i", xmat, loc)

    return f


def _sphere_ellipsoid(xpos1, xmat1, size1, xpos2, xmat2, size2):
    """Sphere vs ellipsoid: project the sphere center onto the ellipsoid
    surface (Newton on the Lagrange parameter); single contact."""
    rs = size1[..., 0]
    S = size2[..., :3]
    p = _pt_local(xpos2, xmat2, xpos1)
    x, n_out = _ellipsoid_surface_point(p, S)
    gap = jnp.linalg.norm(p - x, axis=-1)
    inside = jnp.sum(p * p / jnp.maximum(S * S, 1e-24), axis=-1) < 1.0
    dist = jnp.where(inside, -gap, gap) - rs
    # contact normal (geom1 -> geom2) = inward ellipsoid normal at x,
    # continuous across the surface crossing
    n_l = -n_out
    n = jnp.einsum("...ij,...j->...i", xmat2, n_l)
    pos = xpos1 + n * (rs + 0.5 * dist)[..., None]
    return (
        dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]
    )


def _ellipsoid_ellipsoid(xpos1, xmat1, size1, xpos2, xmat2, size2):
    S1 = size1[..., :3]
    S2 = size2[..., :3]

    def proj1(w):
        loc = _pt_local(xpos1, xmat1, w)
        x, _ = _ellipsoid_surface_point(loc, S1)
        return _pt_world(xpos1, xmat1, x)

    def inside1(w):
        loc = _pt_local(xpos1, xmat1, w)
        return jnp.sum(loc * loc / jnp.maximum(S1 * S1, 1e-24), axis=-1) < 1.0

    def proj2(w):
        loc = _pt_local(xpos2, xmat2, w)
        x, _ = _ellipsoid_surface_point(loc, S2)
        return _pt_world(xpos2, xmat2, x)

    def inside2(w):
        loc = _pt_local(xpos2, xmat2, w)
        return jnp.sum(loc * loc / jnp.maximum(S2 * S2, 1e-24), axis=-1) < 1.0

    sup1 = lambda n: _ellipsoid_support(xpos1, xmat1, S1, n)  # noqa: E731
    sup2 = lambda n: _ellipsoid_support(xpos2, xmat2, S2, n)  # noqa: E731
    dist, pos, n = _convex_pair_witness(
        proj1, inside1, proj2, inside2, sup1, sup2,
        _ellipsoid_supset(xpos1, xmat1, S1), _ellipsoid_supset(xpos2, xmat2, S2),
        xpos1, xpos2,
    )
    return (
        dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]
    )


def _ellipsoid_cylinder(xpos1, xmat1, size1, xpos2, xmat2, size2):
    S = size1[..., :3]
    r = size2[..., 0]
    h = size2[..., 1]

    def proj1(w):
        loc = _pt_local(xpos1, xmat1, w)
        x, _ = _ellipsoid_surface_point(loc, S)
        return _pt_world(xpos1, xmat1, x)

    def inside1(w):
        loc = _pt_local(xpos1, xmat1, w)
        return jnp.sum(loc * loc / jnp.maximum(S * S, 1e-24), axis=-1) < 1.0

    def proj2(w):
        loc = _pt_local(xpos2, xmat2, w)
        return _pt_world(xpos2, xmat2, _cylinder_surface_point(loc, r, h))

    def inside2(w):
        loc = _pt_local(xpos2, xmat2, w)
        return (jnp.abs(loc[..., 2]) <= h) & (
            jnp.linalg.norm(loc[..., :2], axis=-1) <= r
        )

    sup1 = lambda n: _ellipsoid_support(xpos1, xmat1, S, n)  # noqa: E731
    sup2 = lambda n: _cylinder_support(xpos2, xmat2, r, h, n)  # noqa: E731
    dist, pos, n = _convex_pair_witness(
        proj1, inside1, proj2, inside2, sup1, sup2,
        _ellipsoid_supset(xpos1, xmat1, S), _cylinder_supset(xpos2, xmat2, r, h),
        xpos1, xpos2,
    )
    return (
        dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]
    )


def _cylinder_cylinder(xpos1, xmat1, size1, xpos2, xmat2, size2):
    r1, h1 = size1[..., 0], size1[..., 1]
    r2, h2 = size2[..., 0], size2[..., 1]

    def proj1(w):
        loc = _pt_local(xpos1, xmat1, w)
        return _pt_world(xpos1, xmat1, _cylinder_surface_point(loc, r1, h1))

    def inside1(w):
        loc = _pt_local(xpos1, xmat1, w)
        return (jnp.abs(loc[..., 2]) <= h1) & (
            jnp.linalg.norm(loc[..., :2], axis=-1) <= r1
        )

    def proj2(w):
        loc = _pt_local(xpos2, xmat2, w)
        return _pt_world(xpos2, xmat2, _cylinder_surface_point(loc, r2, h2))

    def inside2(w):
        loc = _pt_local(xpos2, xmat2, w)
        return (jnp.abs(loc[..., 2]) <= h2) & (
            jnp.linalg.norm(loc[..., :2], axis=-1) <= r2
        )

    sup1 = lambda n: _cylinder_support(xpos1, xmat1, r1, h1, n)  # noqa: E731
    sup2 = lambda n: _cylinder_support(xpos2, xmat2, r2, h2, n)  # noqa: E731
    dist, pos, n = _convex_pair_witness(
        proj1, inside1, proj2, inside2, sup1, sup2,
        _cylinder_supset(xpos1, xmat1, r1, h1),
        _cylinder_supset(xpos2, xmat2, r2, h2),
        xpos1, xpos2, iters=60,
    )
    return (
        dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]
    )


def _sphere_cylinder(xpos1, xmat1, size1, xpos2, xmat2, size2):
    """Sphere vs solid cylinder: closest surface point, incl. the
    center-inside case (nearest of side wall vs cap)."""
    rs = size1[..., 0]
    r = size2[..., 0]
    h = size2[..., 1]
    d_l = jnp.einsum(
        "...ij,...i->...j", xmat2, xpos1 - xpos2
    )  # sphere center in cylinder frame
    z = d_l[..., 2]
    rho = d_l[..., :2]
    rho_n = jnp.linalg.norm(rho, axis=-1)
    inside = (jnp.abs(z) <= h) & (rho_n <= r)

    # outside: clamp to the solid
    z_c = jnp.clip(z, -h, h)
    scale = jnp.minimum(1.0, r / jnp.maximum(rho_n, 1e-12))
    rho_c = rho * scale[..., None]
    cp_out = jnp.concatenate([rho_c, z_c[..., None]], axis=-1)

    # inside: project to the nearer surface
    side_gap = r - rho_n
    cap_gap = h - jnp.abs(z)
    rho_dir = rho / jnp.maximum(rho_n, 1e-12)[..., None]
    # degenerate on-axis: pick local +x
    rho_dir = jnp.where(
        (rho_n < 1e-12)[..., None],
        jnp.array([1.0, 0.0], xpos1.dtype),
        rho_dir,
    )
    cp_side = jnp.concatenate(
        [rho_dir * r[..., None], z[..., None]], axis=-1
    )
    cp_cap = jnp.concatenate(
        [rho, jnp.sign(z)[..., None] * h[..., None]], axis=-1
    )
    cp_in = jnp.where((side_gap < cap_gap)[..., None], cp_side, cp_cap)

    cp_l = jnp.where(inside[..., None], cp_in, cp_out)
    cp_w = xpos2 + jnp.einsum("...ij,...j->...i", xmat2, cp_l)

    # outside: sphere-vs-point; inside: penetration through the surface
    d_out, p_out, n_out = _sphere_sphere_raw(
        xpos1, rs, cp_w, jnp.zeros_like(rs), xpos1.dtype
    )
    pen = jnp.minimum(side_gap, cap_gap)
    d_in = -(pen + rs)
    n_in_l = jnp.where(
        (side_gap < cap_gap)[..., None],
        jnp.concatenate([rho_dir, jnp.zeros_like(z)[..., None]], axis=-1),
        jnp.concatenate(
            [jnp.zeros_like(rho), jnp.sign(z)[..., None]], axis=-1
        ),
    )
    # normal points sphere -> cylinder (geom1 -> geom2): inward = -surface dir
    n_in = -jnp.einsum("...ij,...j->...i", xmat2, n_in_l)
    p_in = cp_w - n_in * 0.5 * d_in[..., None]

    dist = jnp.where(inside, d_in, d_out)
    pos = jnp.where(inside[..., None], p_in, p_out)
    nrm = jnp.where(inside[..., None], n_in, n_out)
    return dist[..., None], pos[..., None, :], make_frame(nrm)[..., None, :, :]


def _sphere_sphere_raw(c1, r1, c2, r2, dtype):
    dvec = c2 - c1
    L = jnp.linalg.norm(dvec, axis=-1)
    n = dvec / jnp.maximum(L, 1e-12)[..., None]
    # degenerate: coincident centers -> arbitrary up normal
    n = jnp.where((L < 1e-12)[..., None], jnp.array([0.0, 0.0, 1.0], dtype), n)
    dist = L - (r1 + r2)
    pos = c1 + n * (r1 + 0.5 * dist)[..., None]
    return dist, pos, n


def _sphere_sphere(xpos1, xmat1, size1, xpos2, xmat2, size2):
    dist, pos, n = _sphere_sphere_raw(
        xpos1, size1[..., 0], xpos2, size2[..., 0], xpos1.dtype
    )
    return dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]


def _closest_on_segment(p, a, b):
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(
        jnp.sum(ab * ab, axis=-1), 1e-12
    )
    t = jnp.clip(t, 0.0, 1.0)
    return a + ab * t[..., None]


def _sphere_capsule(xpos1, xmat1, size1, xpos2, xmat2, size2):
    axis = xmat2[..., :, 2]
    hl = size2[..., 1:2]
    a = xpos2 - axis * hl
    b = xpos2 + axis * hl
    cp = _closest_on_segment(xpos1, a, b)
    dist, pos, n = _sphere_sphere_raw(
        xpos1, size1[..., 0], cp, size2[..., 0], xpos1.dtype
    )
    return dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]


def _segment_segment(a1, b1, a2, b2):
    """Closest points between segments [a1,b1], [a2,b2] (batched)."""
    d1 = b1 - a1
    d2 = b2 - a2
    r = a1 - a2
    A = jnp.sum(d1 * d1, -1)
    E = jnp.sum(d2 * d2, -1)
    F = jnp.sum(d2 * r, -1)
    C = jnp.sum(d1 * r, -1)
    B = jnp.sum(d1 * d2, -1)
    denom = A * E - B * B
    s = jnp.where(denom > 1e-12, (B * F - C * E) / jnp.maximum(denom, 1e-12), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(E > 1e-12, (B * s + F) / jnp.maximum(E, 1e-12), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    # re-project s for clamped t
    s = jnp.where(
        t != t_cl,
        jnp.clip((B * t_cl - C) / jnp.maximum(A, 1e-12), 0.0, 1.0),
        s,
    )
    p1 = a1 + d1 * s[..., None]
    p2 = a2 + d2 * t_cl[..., None]
    return p1, p2


def _capsule_capsule(xpos1, xmat1, size1, xpos2, xmat2, size2):
    ax1 = xmat1[..., :, 2]
    ax2 = xmat2[..., :, 2]
    a1 = xpos1 - ax1 * size1[..., 1:2]
    b1 = xpos1 + ax1 * size1[..., 1:2]
    a2 = xpos2 - ax2 * size2[..., 1:2]
    b2 = xpos2 + ax2 * size2[..., 1:2]
    p1, p2 = _segment_segment(a1, b1, a2, b2)
    dist, pos, n = _sphere_sphere_raw(p1, size1[..., 0], p2, size2[..., 0], xpos1.dtype)
    return dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]


def _point_box_dist(p_local, size):
    """Signed distance from point to box surface (local frame) and outward
    normal (local frame). Negative inside."""
    q = jnp.clip(p_local, -size, size)
    delta = p_local - q
    d_out = jnp.linalg.norm(delta, axis=-1)
    outside = d_out > 1e-12
    n_out = delta / jnp.maximum(d_out, 1e-12)[..., None]
    # inside: nearest face
    face_d = size - jnp.abs(p_local)  # (..., 3) distances to faces
    k = jnp.argmin(face_d, axis=-1)
    sgn = jnp.sign(jnp.take_along_axis(p_local, k[..., None], -1))[..., 0]
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    n_in = jnp.eye(3, dtype=p_local.dtype)[k] * sgn[..., None]
    d_in = -jnp.take_along_axis(face_d, k[..., None], -1)[..., 0]
    dist = jnp.where(outside, d_out, d_in)
    n = jnp.where(outside[..., None], n_out, n_in)
    # surface point
    surf = jnp.where(outside[..., None], q, p_local - n * d_in[..., None])
    return dist, n, surf


def _sphere_box(xpos1, xmat1, size1, xpos2, xmat2, size2):
    # sphere is geom1, box geom2
    p_local = jnp.einsum("...ji,...j->...i", xmat2, xpos1 - xpos2)
    sd, n_local, surf_local = _point_box_dist(p_local, size2)
    r = size1[..., 0]
    dist = sd - r
    n_world = jnp.einsum("...ij,...j->...i", xmat2, n_local)
    surf_world = xpos2 + jnp.einsum("...ij,...j->...i", xmat2, surf_local)
    # normal from geom1(sphere) to geom2(box): pointing INTO the box = -n_world
    n = -n_world
    pos = surf_world - n * (0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]


def _capsule_box(xpos1, xmat1, size1, xpos2, xmat2, size2):
    """Capsule (geom1) vs box (geom2): 2 contacts at segment samples closest
    to the box, found by fixed-iteration ternary search (convex in t)."""
    ax = xmat1[..., :, 2]
    hl = size1[..., 1:2]
    a = xpos1 - ax * hl
    b = xpos1 + ax * hl

    def seg_dist(t):
        p = a + (b - a) * t[..., None]
        p_local = jnp.einsum("...ji,...j->...i", xmat2, p - xpos2)
        sd, _, _ = _point_box_dist(p_local, size2)
        return sd

    lo = jnp.zeros(xpos1.shape[:-1], xpos1.dtype)
    hi = jnp.ones(xpos1.shape[:-1], xpos1.dtype)
    for _ in range(20):
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        f1, f2 = seg_dist(m1), seg_dist(m2)
        lo = jnp.where(f1 > f2, m1, lo)
        hi = jnp.where(f1 > f2, hi, m2)
    t_star = 0.5 * (lo + hi)

    dists, poss, ns = [], [], []
    for t in (t_star, jnp.where(t_star > 0.5, lo * 0.0, lo * 0.0 + 1.0)):
        # second sample: opposite endpoint for a stable 2-point manifold
        p = a + (b - a) * t[..., None]
        p_local = jnp.einsum("...ji,...j->...i", xmat2, p - xpos2)
        sd, n_local, surf_local = _point_box_dist(p_local, size2)
        r = size1[..., 0]
        dist = sd - r
        n = -jnp.einsum("...ij,...j->...i", xmat2, n_local)
        surf_world = xpos2 + jnp.einsum("...ij,...j->...i", xmat2, surf_local)
        pos = surf_world - n * (0.5 * dist)[..., None]
        dists.append(dist)
        poss.append(pos)
        ns.append(n)
    return (
        jnp.stack(dists, -1),
        jnp.stack(poss, -2),
        make_frame(jnp.stack(ns, -2)),
    )


def _box_corners(xpos, xmat, size):
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=xpos.dtype,
    )
    return xpos[..., None, :] + jnp.einsum(
        "...ij,...kj->...ki", xmat, signs * size[..., None, :]
    )  # (..., 8, 3)


def _box_box(xpos1, xmat1, size1, xpos2, xmat2, size2):
    """Box-box via face SAT: test the 6 face axes, take the axis of
    minimal overlap as the contact normal, and emit the 4 deepest corners
    of the incident box measured against the reference face plane.

    Face-dominant manifolds (grasping, stacking) are handled exactly;
    edge-edge crossing manifolds fall back to the best face axis and
    correct within a step once a vertex penetrates. (MuJoCo's mjc_BoxBox
    also does SAT, with up-to-8-point face clipping; this static-shape
    variant keeps the 4-slot pyramid layout.)"""
    delta = xpos2 - xpos1  # (..., 3)
    axes = jnp.concatenate(
        [xmat1[..., :, :].swapaxes(-1, -2), xmat2[..., :, :].swapaxes(-1, -2)],
        axis=-2,
    )  # (..., 6, 3) rows = candidate axes (box1 xyz, box2 xyz)

    # projection radii of each box onto each axis
    def radius(axis, xmat, size):
        # |axis . u_i| * s_i summed over the box's 3 local axes
        proj = jnp.abs(jnp.einsum("...kx,...xi->...ki", axis, xmat))
        return jnp.sum(proj * size[..., None, :], axis=-1)

    r1 = radius(axes, xmat1, size1)  # (..., 6)
    r2 = radius(axes, xmat2, size2)
    cdist = jnp.einsum("...kx,...x->...k", axes, delta)  # center separation
    sep = jnp.abs(cdist) - (r1 + r2)  # signed separation per axis (<0 overlap)

    k = jnp.argmax(sep, axis=-1)  # least-overlapping face axis
    a = jnp.take_along_axis(axes, k[..., None, None].repeat(3, -1), axis=-2)[
        ..., 0, :
    ]
    cd_k = jnp.take_along_axis(cdist, k[..., None], axis=-1)[..., 0]
    n = a * jnp.sign(cd_k)[..., None]  # geom1 -> geom2

    ref_is_1 = k < 3  # reference box owns the face axis
    # reference face plane: point on face + outward normal toward the other
    ref_pos = jnp.where(ref_is_1[..., None], xpos1, xpos2)
    r_ref = jnp.where(
        ref_is_1,
        jnp.take_along_axis(r1, k[..., None], -1)[..., 0],
        jnp.take_along_axis(r2, k[..., None], -1)[..., 0],
    )
    # outward normal of the reference face, pointing at the incident box
    n_out = jnp.where(ref_is_1[..., None], n, -n)
    plane_p = ref_pos + n_out * r_ref[..., None]

    inc_corners = jnp.where(
        ref_is_1[..., None, None],
        _box_corners(xpos2, xmat2, size2),
        _box_corners(xpos1, xmat1, size1),
    )  # (..., 8, 3)
    # signed distance of incident corners beyond the reference face
    d8 = jnp.einsum(
        "...kx,...x->...k", inc_corners - plane_p[..., None, :], n_out
    )
    neg, idx = jax.lax.top_k(-d8, 4)
    dist = -neg
    corners = jnp.take_along_axis(inc_corners, idx[..., None].repeat(3, -1), -2)
    pos = corners - n_out[..., None, :] * 0.5 * dist[..., None]
    frame = jnp.broadcast_to(
        make_frame(n)[..., None, :, :], pos.shape[:-1] + (3, 3)
    )
    return dist, pos, frame


# ---------------------------------------------------------------------------
# Heightfield narrowphase (TPU-native terrain collision)
# ---------------------------------------------------------------------------
#
# The terrain — whatever mix of sub-terrains generated it — is ONE global
# elevation grid (terrains/terrain_generator.py). Collision against it is a
# bilinear height/gradient sample per query point: O(robot geoms) gathers
# with static shapes, regardless of terrain complexity. This replaces the
# reference's per-box CUDA broadphase over thousands of terrain geoms.


def _hfield_sample(m, lx, ly):
    """Bilinear height + gradient of the hfield at local (x, y).

    mjModel layout: data (nrow, ncol) normalized to [0,1], col -> x over
    [-size0, size0], row -> y over [-size1, size1]; elevation = data*size2.
    """
    sz = m.hfield_size[0]
    nr, nc = m.hfield_nrow, m.hfield_ncol
    gx = (lx / sz[0] + 1.0) * 0.5 * (nc - 1)
    gy = (ly / sz[1] + 1.0) * 0.5 * (nr - 1)
    gx = jnp.clip(gx, 0.0, nc - 1.000001)
    gy = jnp.clip(gy, 0.0, nr - 1.000001)
    ix = jnp.floor(gx).astype(jnp.int32)
    iy = jnp.floor(gy).astype(jnp.int32)
    fx = gx - ix
    fy = gy - iy
    data = m.hfield_data
    h00 = data[iy, ix]
    h01 = data[iy, ix + 1]
    h10 = data[iy + 1, ix]
    h11 = data[iy + 1, ix + 1]
    h = ((1 - fx) * (1 - fy) * h00 + fx * (1 - fy) * h01
         + (1 - fx) * fy * h10 + fx * fy * h11) * sz[2]
    dhdx = (((1 - fy) * (h01 - h00) + fy * (h11 - h10)) * sz[2]
            * (0.5 * (nc - 1) / sz[0]))
    dhdy = (((1 - fx) * (h10 - h00) + fx * (h11 - h01)) * sz[2]
            * (0.5 * (nr - 1) / sz[1]))
    return h, dhdx, dhdy


def _hfield_point(m, p_local, radius):
    """Contact of a sphere (center p_local, radius) with the hfield, in the
    hfield's local frame. Returns (dist, pos_local, n_local)."""
    h, dhdx, dhdy = _hfield_sample(m, p_local[..., 0], p_local[..., 1])
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    # signed distance along n from the surface plane at the footpoint
    dist = (p_local[..., 2] - h) * n[..., 2] - radius
    pos = p_local - n * (radius + 0.5 * dist)[..., None]
    return dist, pos, n


def _to_world(xpos, xmat, pos_l, n_l):
    pos = xpos + jnp.einsum("...ij,...j->...i", xmat, pos_l)
    n = jnp.einsum("...ij,...j->...i", xmat, n_l)
    return pos, n


def _hfield_sphere(m, xpos1, xmat1, size1, xpos2, xmat2, size2):
    p_l = jnp.einsum("...ji,...j->...i", xmat1, xpos2 - xpos1)
    dist, pos_l, n_l = _hfield_point(m, p_l, size2[..., 0])
    pos, n = _to_world(xpos1, xmat1, pos_l, n_l)
    return dist[..., None], pos[..., None, :], make_frame(n)[..., None, :, :]


def _hfield_capsule(m, xpos1, xmat1, size1, xpos2, xmat2, size2):
    axis = xmat2[..., :, 2]
    hl = size2[..., 1:2]
    r = size2[..., 0]
    dists, poss, frames = [], [], []
    for e in (xpos2 + axis * hl, xpos2 - axis * hl):
        p_l = jnp.einsum("...ji,...j->...i", xmat1, e - xpos1)
        dist, pos_l, n_l = _hfield_point(m, p_l, r)
        pos, n = _to_world(xpos1, xmat1, pos_l, n_l)
        dists.append(dist)
        poss.append(pos)
        frames.append(make_frame(n))
    return (
        jnp.stack(dists, -1),
        jnp.stack(poss, -2),
        jnp.stack(frames, -3),
    )


def _hfield_box(m, xpos1, xmat1, size1, xpos2, xmat2, size2):
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=xpos2.dtype,
    )
    corners = xpos2[..., None, :] + jnp.einsum(
        "...ij,...kj->...ki", xmat2, signs * size2[..., None, :]
    )  # (..., 8, 3)
    p_l = jnp.einsum("...ji,...kj->...ki", xmat1, corners - xpos1[..., None, :])
    dist8, pos8_l, n8_l = _hfield_point(m, p_l, jnp.zeros(p_l.shape[:-1], p_l.dtype))
    neg, idx = jax.lax.top_k(-dist8, 4)
    dist = -neg
    pos_l = jnp.take_along_axis(pos8_l, idx[..., None].repeat(3, -1), axis=-2)
    n_l = jnp.take_along_axis(n8_l, idx[..., None].repeat(3, -1), axis=-2)
    pos = xpos1[..., None, :] + jnp.einsum("...ij,...kj->...ki", xmat1, pos_l)
    n = jnp.einsum("...ij,...kj->...ki", xmat1, n_l)
    return dist, pos, make_frame(n)


_HFIELD_NARROWPHASE = {
    GEOM_SPHERE: _hfield_sphere,
    GEOM_CAPSULE: _hfield_capsule,
    GEOM_BOX: _hfield_box,
}


def _plane_mesh(m, g2, xpos1, xmat1, xpos2, xmat2, margin):
    """Plane vs convex mesh hull, vectorized over the pair group (P,).

    Up to 3 contacts: deepest hull vertex, the farthest below-margin
    vertex from it, and the below-margin vertex farthest from the line
    through those two (max spread). CPU MuJoCo's mjc_PlaneConvex emits an
    equivalent support triangle; exact vertex choice can differ only in
    degenerate flat-rest ties where several supports are equally deep —
    the reference's own engine (mujoco_warp plane-convex) deviates from
    the C engine the same way. Gated by force-balance and drift tests in
    tests/test_phys_mesh.py.
    """
    dtype = xpos1.dtype
    mesh_id = m.geom_dataid[g2]  # static numpy (P,)
    verts_l = jnp.asarray(m.mesh_hull_vert[mesh_id], dtype)  # (P, V, 3)
    vmask = jnp.asarray(m.mesh_hull_mask[mesh_id])  # (P, V)
    n = xmat1[..., :, 2]  # (P, 3) plane normal (z column)
    vw = xpos2[:, None, :] + jnp.einsum("pij,pvj->pvi", xmat2, verts_l)
    dist = jnp.einsum("pi,pvi->pv", n, vw - xpos1[:, None, :])
    BIG = jnp.asarray(1e10, dtype)
    dist = jnp.where(vmask, dist, BIG)
    below = dist < margin[:, None]

    def take_v(idx):
        return jnp.take_along_axis(vw, idx[:, None, None], axis=1)[:, 0]

    def take_d(idx):
        return jnp.take_along_axis(dist, idx[:, None], axis=1)[:, 0]

    i1 = jnp.argmin(dist, axis=1)
    v1, d1 = take_v(i1), take_d(i1)

    # farthest below-margin vertex from v1 (dup of i1 when none other)
    dd2 = jnp.where(below, jnp.sum((vw - v1[:, None, :]) ** 2, -1), -1.0)
    i2 = jnp.argmax(dd2, axis=1)
    v2, d2 = take_v(i2), take_d(i2)
    ok2 = (i2 != i1) & (jnp.take_along_axis(dd2, i2[:, None], 1)[:, 0] > 0)

    # below-margin vertex farthest from the line v1-v2
    e = v2 - v1
    elen2 = jnp.maximum(jnp.sum(e * e, -1), 1e-12)
    w = vw - v1[:, None, :]
    t = jnp.sum(w * e[:, None, :], -1) / elen2[:, None]
    perp = w - t[..., None] * e[:, None, :]
    dd3 = jnp.where(below, jnp.sum(perp * perp, -1), -1.0)
    i3 = jnp.argmax(dd3, axis=1)
    v3, d3 = take_v(i3), take_d(i3)
    ok3 = (
        ok2
        & (i3 != i1)
        & (i3 != i2)
        & (jnp.take_along_axis(dd3, i3[:, None], 1)[:, 0] > 1e-12)
    )

    d2 = jnp.where(ok2, d2, BIG)
    d3 = jnp.where(ok3, d3, BIG)
    dists = jnp.stack([d1, d2, d3], axis=1)  # (P, 3)
    # midpoint between vertex and plane; inactive slots keep the raw
    # vertex position (a BIG offset would overflow f32 downstream)
    off = jnp.where(dists < BIG, dists, 0.0)
    poss = (
        jnp.stack([v1, v2, v3], axis=1)
        - 0.5 * off[..., None] * n[:, None, :]
    )
    frames = jnp.broadcast_to(
        make_frame(n)[:, None], (n.shape[0], 3, 3, 3)
    )
    return dists, poss, frames


_MESH_NARROWPHASE = {
    GEOM_PLANE: _plane_mesh,
}


_NARROWPHASE = {
    (GEOM_PLANE, GEOM_SPHERE): _plane_sphere,
    (GEOM_PLANE, GEOM_CAPSULE): _plane_capsule,
    (GEOM_PLANE, GEOM_BOX): _plane_box,
    (GEOM_PLANE, GEOM_CYLINDER): _plane_cylinder,
    (GEOM_PLANE, GEOM_ELLIPSOID): _plane_ellipsoid,
    (GEOM_SPHERE, GEOM_CYLINDER): _sphere_cylinder,
    (GEOM_SPHERE, GEOM_ELLIPSOID): _sphere_ellipsoid,
    (GEOM_ELLIPSOID, GEOM_ELLIPSOID): _ellipsoid_ellipsoid,
    (GEOM_ELLIPSOID, GEOM_CYLINDER): _ellipsoid_cylinder,
    (GEOM_CYLINDER, GEOM_CYLINDER): _cylinder_cylinder,
    (GEOM_SPHERE, GEOM_SPHERE): _sphere_sphere,
    (GEOM_SPHERE, GEOM_CAPSULE): _sphere_capsule,
    (GEOM_SPHERE, GEOM_BOX): _sphere_box,
    (GEOM_CAPSULE, GEOM_CAPSULE): _capsule_capsule,
    (GEOM_CAPSULE, GEOM_BOX): _capsule_box,
    (GEOM_BOX, GEOM_BOX): _box_box,
}


def collision(m, d):
    """Fill d.contact from geom poses. Single world (vmap for batching)."""
    pt = m.pairs
    ncon = pt.ncon
    dtype = d.qpos.dtype
    if ncon == 0:
        return d

    friction5, solref, solimp, margin, gap = pair_params(m)

    # group pairs by type-pair; the pair table is sorted by type-pair at
    # build time, so iterating groups in sorted key order visits contact
    # slots contiguously and results concatenate in slot order
    type1 = m.geom_type[pt.geom1]
    type2 = m.geom_type[pt.geom2]
    keys = {}
    for p in range(len(pt.geom1)):
        keys.setdefault((int(type1[p]), int(type2[p])), []).append(p)

    dist_b, pos_b, frame_b = [], [], []
    expected_adr = 0
    for key in sorted(keys):
        plist = keys[key]
        assert pt.pair_conadr[plist[0]] == expected_adr, "pair table not sorted"
        pidx = np.array(plist, np.int32)
        g1 = pt.geom1[pidx]
        g2 = pt.geom2[pidx]
        if key[0] == GEOM_HFIELD:
            fn = _HFIELD_NARROWPHASE[key[1]]
            dd, pp, nn = fn(
                m,
                d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
                d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2],
            )
        elif key[1] == GEOM_MESH:
            fn = _MESH_NARROWPHASE[key[0]]
            dd, pp, nn = fn(
                m, g2,
                d.geom_xpos[g1], d.geom_xmat[g1],
                d.geom_xpos[g2], d.geom_xmat[g2],
                margin[pidx],
            )
        else:
            fn = _NARROWPHASE[key]
            dd, pp, nn = fn(
                d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
                d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2],
            )
        k = dd.shape[-1]
        expected_adr += k * len(plist)
        dist_b.append(dd.reshape(-1))
        pos_b.append(pp.reshape(-1, 3))
        frame_b.append(nn.reshape(-1, 3, 3))
    dist = jnp.concatenate(dist_b)
    pos = jnp.concatenate(pos_b)
    frame = jnp.concatenate(frame_b)

    cp = pt.con_pairid
    packed = jnp.concatenate(
        [
            dist[:, None],
            (margin - gap)[cp][:, None],
            pos,
            friction5[cp],
            solref[cp],
            solimp[cp],
            frame.reshape(-1, 9),
        ],
        axis=-1,
    )
    return d.replace(
        contact=d.contact.replace(packed=packed),
        condist=dist,
        con_found=dist < (margin - gap)[cp],
        connormal=frame[..., 0, :],
    )
