"""Lane-major narrowphase: same contact formulas as phys/collision.py, with
pair groups vectorized on the sublane axis and envs on the lane axis.

Outputs stacked env-last arrays:
    dist  (S, E)      pos (S, 3, E)     frame (S, 9, E)  rows [n, t1, t2]
plus per-slot contact parameters (friction5/solref/solimp/margin-gap),
computed host-side as numpy constants when no involved geom field is
domain-randomized (the common case), else traced env-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.phys.collision import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_HFIELD, GEOM_PLANE, GEOM_SPHERE,
)
from mjlab_tpu.phys.lm.base import (
    Params, vadd, vcross, vdot, vscale, vsub, vwhere,
)

_PARAM_FIELDS = (
    "geom_friction", "geom_solref", "geom_solimp", "geom_solmix",
    "geom_margin", "geom_gap",
)


def _np_pair_params(m):
    """Host-side numpy pair parameter mixing (no DR on geom params)."""
    pt = m.pairs
    g1, g2 = pt.geom1, pt.geom2
    pri1 = np.asarray(m.geom_priority)[g1]
    pri2 = np.asarray(m.geom_priority)[g2]
    f1 = np.asarray(m.geom_friction)[g1]
    f2 = np.asarray(m.geom_friction)[g2]
    sr1 = np.asarray(m.geom_solref)[g1]
    sr2 = np.asarray(m.geom_solref)[g2]
    si1 = np.asarray(m.geom_solimp)[g1]
    si2 = np.asarray(m.geom_solimp)[g2]
    mix1 = np.asarray(m.geom_solmix)[g1]
    mix2 = np.asarray(m.geom_solmix)[g2]

    denom = mix1 + mix2
    w = np.where(denom > 1e-12, mix1 / np.where(denom > 1e-12, denom, 1.0), 0.5)
    w = np.where((mix1 < 1e-12) & (mix2 < 1e-12), 0.5, w)
    w = np.where((mix1 < 1e-12) & (mix2 >= 1e-12), 0.0, w)
    w = np.where((mix2 < 1e-12) & (mix1 >= 1e-12), 1.0, w)
    w = w[:, None]

    solref_mix = w * sr1 + (1 - w) * sr2
    direct = (sr1[:, 0:1] <= 0) | (sr2[:, 0:1] <= 0)
    solref_eq = np.where(direct, np.minimum(sr1, sr2), solref_mix)
    solimp_eq = w * si1 + (1 - w) * si2
    friction_eq = np.maximum(f1, f2)

    p1_gt = (pri1 > pri2)[:, None]
    p2_gt = (pri2 > pri1)[:, None]
    friction = np.where(p1_gt, f1, np.where(p2_gt, f2, friction_eq))
    solref = np.where(p1_gt, sr1, np.where(p2_gt, sr2, solref_eq))
    solimp = np.where(p1_gt, si1, np.where(p2_gt, si2, solimp_eq))
    margin = np.maximum(np.asarray(m.geom_margin)[g1], np.asarray(m.geom_margin)[g2])
    gap = np.maximum(np.asarray(m.geom_gap)[g1], np.asarray(m.geom_gap)[g2])
    friction5 = np.stack(
        [friction[:, 0], friction[:, 0], friction[:, 1], friction[:, 2], friction[:, 2]],
        axis=-1,
    )
    if pt.ex_mask.any():
        exm = pt.ex_mask[:, None]
        friction5 = np.where(exm, pt.ex_friction5, friction5)
        solref = np.where(exm, pt.ex_solref, solref)
        solimp = np.where(exm, pt.ex_solimp, solimp)
        margin = np.where(pt.ex_mask, pt.ex_margin, margin)
        gap = np.where(pt.ex_mask, pt.ex_gap, gap)
    return friction5, solref, solimp, margin, gap


def slot_params(m, P: Params, dtype):
    """Per contact-SLOT parameters, env-last.

    Returns (friction5 (S,5,Eb), solref (S,2,Eb), solimp (S,5,Eb),
    inclmargin (S,Eb)) with Eb in {1, E}. When no involved geom field is
    DR-batched (the common case) the mixing happens host-side in numpy
    and the results are compile-time constants."""
    cp = m.pairs.con_pairid
    host_const = not any(
        f in P.batched or isinstance(getattr(m, f), jax.core.Tracer)
        for f in _PARAM_FIELDS
    )
    if host_const:
        # no DR and the model is a closed-over host constant: mix in numpy
        # so the slot parameters fold to compile-time constants
        f5, sr, si, mg, gp = _np_pair_params(m)
        to = lambda x: jnp.asarray(x[cp], dtype)[..., None]
        return to(f5), to(sr), to(si), jnp.asarray((mg - gp)[cp], dtype)[:, None]

    # DR path: traced mixing, env-last (MuJoCo's priority/solmix rules).
    pt = m.pairs
    g1, g2 = pt.geom1, pt.geom2
    pri1 = np.asarray(m.geom_priority)[g1][:, None, None]
    pri2 = np.asarray(m.geom_priority)[g2][:, None, None]

    def gf(name, gsel):
        v = P(name)  # (ngeom, k, Eb)
        return v[gsel]  # (npair, k, Eb)

    f1, f2 = gf("geom_friction", g1), gf("geom_friction", g2)
    sr1, sr2 = gf("geom_solref", g1), gf("geom_solref", g2)
    si1, si2 = gf("geom_solimp", g1), gf("geom_solimp", g2)
    # geom_solmix is (ngeom, Eb) -> (npair, 1, Eb)
    mix1 = P("geom_solmix")[g1][:, None]
    mix2 = P("geom_solmix")[g2][:, None]

    denom = mix1 + mix2
    w = jnp.where(denom > 1e-12, mix1 / jnp.where(denom > 1e-12, denom, 1.0), 0.5)
    w = jnp.where((mix1 < 1e-12) & (mix2 < 1e-12), 0.5, w)
    w = jnp.where((mix1 < 1e-12) & (mix2 >= 1e-12), 0.0, w)
    w = jnp.where((mix2 < 1e-12) & (mix1 >= 1e-12), 1.0, w)

    solref_mix = w * sr1 + (1 - w) * sr2
    direct = (sr1[:, 0:1] <= 0) | (sr2[:, 0:1] <= 0)
    solref = jnp.where(direct, jnp.minimum(sr1, sr2), solref_mix)
    solimp = w * si1 + (1 - w) * si2
    friction = jnp.maximum(f1, f2)

    p1_gt = pri1 > pri2
    p2_gt = pri2 > pri1
    friction = jnp.where(p1_gt, f1, jnp.where(p2_gt, f2, friction))
    solref = jnp.where(p1_gt, sr1, jnp.where(p2_gt, sr2, solref))
    solimp = jnp.where(p1_gt, si1, jnp.where(p2_gt, si2, solimp))
    margin = jnp.maximum(P("geom_margin")[g1], P("geom_margin")[g2])
    gap = jnp.maximum(P("geom_gap")[g1], P("geom_gap")[g2])

    friction5 = jnp.stack(
        [friction[:, 0], friction[:, 0], friction[:, 1],
         friction[:, 2], friction[:, 2]],
        axis=1,
    )
    if pt.ex_mask.any():
        exm = pt.ex_mask[:, None, None]
        friction5 = jnp.where(exm, pt.ex_friction5[..., None], friction5)
        solref = jnp.where(exm, pt.ex_solref[..., None], solref)
        solimp = jnp.where(exm, pt.ex_solimp[..., None], solimp)
        margin = jnp.where(
            pt.ex_mask[:, None], pt.ex_margin[:, None], margin
        )
        gap = jnp.where(pt.ex_mask[:, None], pt.ex_gap[:, None], gap)
    bc = lambda x: jnp.broadcast_to(x[cp], (len(cp),) + x.shape[1:])
    return bc(friction5), bc(solref), bc(solimp), bc(margin - gap)


def _make_frame(n):
    """Contact frame rows from normal tuple; matches mju_makeFrame."""
    ny_small = jnp.abs(n[1]) < 0.5
    cand = (
        jnp.where(ny_small, 0.0, 0.0),
        jnp.where(ny_small, 1.0, 0.0),
        jnp.where(ny_small, 0.0, 1.0),
    )
    d = vdot(cand, n)
    t1 = vsub(cand, vscale(n, d))
    nrm = jnp.sqrt(jnp.maximum(vdot(t1, t1), 1e-30))
    t1 = tuple(x / nrm for x in t1)
    t2 = vcross(n, t1)
    return n + t1 + t2  # 9-tuple rows [n, t1, t2]


def _sphere_sphere_raw(c1, r1, c2, r2):
    dvec = vsub(c2, c1)
    L = jnp.sqrt(jnp.maximum(vdot(dvec, dvec), 0.0))
    bad = L < 1e-12
    safeL = jnp.where(bad, 1.0, L)
    n = tuple(jnp.where(bad, z, x / safeL) for x, z in zip(dvec, (0.0, 0.0, 1.0)))
    n = (n[0], n[1], jnp.where(bad, 1.0, n[2]))
    dist = L - (r1 + r2)
    pos = vadd(c1, vscale(n, r1 + 0.5 * dist))
    return dist, pos, n


def _closest_on_segment(p, a, b):
    ab = vsub(b, a)
    t = vdot(vsub(p, a), ab) / jnp.maximum(vdot(ab, ab), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    return vadd(a, vscale(ab, t))


def _point_box_dist(p, size):
    """Signed distance of point p (local) to box surface + outward normal
    + surface point, all local-frame tuples."""
    q = tuple(jnp.clip(pi, -si, si) for pi, si in zip(p, size))
    delta = vsub(p, q)
    d_out = jnp.sqrt(jnp.maximum(vdot(delta, delta), 0.0))
    outside = d_out > 1e-12
    n_out = tuple(x / jnp.maximum(d_out, 1e-12) for x in delta)
    # inside: nearest face
    fd = tuple(si - jnp.abs(pi) for pi, si in zip(p, size))
    k0 = (fd[0] <= fd[1]) & (fd[0] <= fd[2])
    k1 = (~k0) & (fd[1] <= fd[2])
    k2 = ~(k0 | k1)
    sgn = tuple(jnp.where(pi >= 0, 1.0, -1.0) for pi in p)
    n_in = (
        jnp.where(k0, sgn[0], 0.0),
        jnp.where(k1, sgn[1], 0.0),
        jnp.where(k2, sgn[2], 0.0),
    )
    d_in = -(
        jnp.where(k0, fd[0], 0.0)
        + jnp.where(k1, fd[1], 0.0)
        + jnp.where(k2, fd[2], 0.0)
    )
    dist = jnp.where(outside, d_out, d_in)
    n = vwhere(outside, n_out, n_in)
    surf = vwhere(outside, q, vsub(p, vscale(n_in, d_in)))
    return dist, n, surf


def _col(mat9, i):
    """Column i of a row-major 9-tuple."""
    return (mat9[i], mat9[3 + i], mat9[6 + i])


def collision_lm(m, P: Params, k: dict, dtype):
    """Returns (dist (S,E), pos (S,3,E), frame (S,9,E)) in slot order."""
    pt = m.pairs
    S = pt.ncon
    E = P.E
    if S == 0:
        k.update(con_dist=jnp.zeros((0, E), dtype))
        return k

    gx = k["geom_xpos"]  # list per geom of vec3 planes
    gm = k["geom_xmat"]  # list per geom of 9-tuple

    def gsize(g, i):
        return P.plane("geom_size", g, i)

    type1 = m.geom_type[pt.geom1]
    type2 = m.geom_type[pt.geom2]
    groups = {}
    for p in range(len(pt.geom1)):
        groups.setdefault((int(type1[p]), int(type2[p])), []).append(p)

    dist_b, pos_b, frame_b = [], [], []

    # stack per-GEOM components once, then per-group static takes: the
    # previous per-pair broadcast+stack emitted ~25k jaxpr eqns for a
    # 533-slot table (compile-cost dominant), the take form ~1k
    ngeom = m.ngeom
    gx_all = tuple(
        jnp.stack([jnp.broadcast_to(gx[g][i], (E,)) for g in range(ngeom)])
        for i in range(3)
    )
    gm_all = tuple(
        jnp.stack([jnp.broadcast_to(gm[g][i], (E,)) for g in range(ngeom)])
        for i in range(9)
    )
    gs_all = tuple(
        jnp.stack(
            [jnp.broadcast_to(gsize(g, i), (E,)) for g in range(ngeom)]
        )
        for i in range(3)
    )

    def takev(all_comps, idx):
        return tuple(c[idx] for c in all_comps)

    def emit(dists, poss, frames):
        """dists: list per contact-point of (P,E); poss/frames tuples.
        Emits interleaved per-pair slots: slot order within a group is
        pair-major (pair p owns contiguous slots)."""
        ncp = len(dists)  # contact points per pair
        d = jnp.stack(dists, axis=1)  # (P, ncp, E)
        dist_b.append(d.reshape(-1, d.shape[-1]))
        po = jnp.stack(
            [jnp.stack(p3, axis=1) for p3 in poss], axis=1
        )  # (P, ncp, 3, E)
        pos_b.append(po.reshape(-1, 3, po.shape[-1]))
        fr = jnp.stack(
            [jnp.stack(f9, axis=1) for f9 in frames], axis=1
        )  # (P, ncp, 9, E)
        frame_b.append(fr.reshape(-1, 9, fr.shape[-1]))

    expected_adr = 0
    for key in sorted(groups):
        plist = groups[key]
        assert pt.pair_conadr[plist[0]] == expected_adr, "pair table not sorted"
        g1 = pt.geom1[np.array(plist)]
        g2 = pt.geom2[np.array(plist)]
        t1, t2 = key

        # stacked group inputs: components (P, E) via static takes
        xp1 = takev(gx_all, g1)
        xm1 = takev(gm_all, g1)
        xp2 = takev(gx_all, g2)
        xm2 = takev(gm_all, g2)
        s1 = takev(gs_all, g1)
        s2 = takev(gs_all, g2)

        if t1 == GEOM_PLANE and t2 == GEOM_SPHERE:
            n = _col(xm1, 2)
            h = vdot(n, vsub(xp2, xp1))
            dist = h - s2[0]
            pos = vsub(xp2, vscale(n, s2[0] + 0.5 * dist))
            emit([dist], [pos], [_make_frame(n)])
            ncp = 1
        elif t1 == GEOM_PLANE and t2 == GEOM_CAPSULE:
            n = _col(xm1, 2)
            axis = _col(xm2, 2)
            r, hl = s2[0], s2[1]
            # first tangent along the projected capsule axis
            an = vdot(axis, n)
            t1v = vsub(axis, vscale(n, an))
            t1n = jnp.sqrt(jnp.maximum(vdot(t1v, t1v), 0.0))
            dflt = _make_frame(n)
            good = t1n > 1e-8
            t1u = tuple(
                jnp.where(good, x / jnp.maximum(t1n, 1e-12), dflt[3 + i])
                for i, x in enumerate(t1v)
            )
            t2u = vcross(n, t1u)
            frame = n + t1u + t2u
            ds, ps = [], []
            for sgn in (1.0, -1.0):
                e = vadd(xp2, vscale(axis, sgn * hl))
                h = vdot(n, vsub(e, xp1))
                dist = h - r
                pos = vsub(e, vscale(n, r + 0.5 * dist))
                ds.append(dist)
                ps.append(pos)
            emit(ds, ps, [frame, frame])
            ncp = 2
        elif t1 == GEOM_PLANE and t2 == GEOM_BOX:
            n = _col(xm1, 2)
            frame = _make_frame(n)
            dists8, poss8 = [], []
            for sx in (-1, 1):
                for sy in (-1, 1):
                    for sz_ in (-1, 1):
                        local = (s2[0] * sx, s2[1] * sy, s2[2] * sz_)
                        corner = vadd(
                            xp2,
                            (
                                xm2[0] * local[0] + xm2[1] * local[1] + xm2[2] * local[2],
                                xm2[3] * local[0] + xm2[4] * local[1] + xm2[5] * local[2],
                                xm2[6] * local[0] + xm2[7] * local[1] + xm2[8] * local[2],
                            ),
                        )
                        h = vdot(n, vsub(corner, xp1))
                        dists8.append(h)
                        poss8.append(corner)
            D8 = jnp.stack(dists8, axis=-1)  # (P, E, 8)
            _, idx = jax.lax.top_k(-D8, 4)  # (P, E, 4) deepest
            P8 = jnp.stack(
                [jnp.stack(pp, axis=-1) for pp in poss8], axis=-1
            )  # (P, E, 3, 8)
            d4 = jnp.take_along_axis(D8, idx, axis=-1)  # (P, E, 4)
            p4 = jnp.take_along_axis(
                P8, idx[:, :, None, :], axis=-1
            )  # (P, E, 3, 4)
            ds, ps = [], []
            for c in range(4):
                dc = d4[..., c]
                pc = tuple(
                    p4[:, :, i, c] - n[i] * 0.5 * dc for i in range(3)
                )
                ds.append(dc)
                ps.append(pc)
            emit(ds, ps, [frame] * 4)
            ncp = 4
        elif t1 == GEOM_SPHERE and t2 == GEOM_SPHERE:
            dist, pos, n = _sphere_sphere_raw(xp1, s1[0], xp2, s2[0])
            emit([dist], [pos], [_make_frame(n)])
            ncp = 1
        elif t1 == GEOM_SPHERE and t2 == GEOM_CAPSULE:
            axis = _col(xm2, 2)
            a = vsub(xp2, vscale(axis, s2[1]))
            b = vadd(xp2, vscale(axis, s2[1]))
            cp = _closest_on_segment(xp1, a, b)
            dist, pos, n = _sphere_sphere_raw(xp1, s1[0], cp, s2[0])
            emit([dist], [pos], [_make_frame(n)])
            ncp = 1
        elif t1 == GEOM_SPHERE and t2 == GEOM_BOX:
            p_local = (
                xm2[0] * (xp1[0] - xp2[0]) + xm2[3] * (xp1[1] - xp2[1]) + xm2[6] * (xp1[2] - xp2[2]),
                xm2[1] * (xp1[0] - xp2[0]) + xm2[4] * (xp1[1] - xp2[1]) + xm2[7] * (xp1[2] - xp2[2]),
                xm2[2] * (xp1[0] - xp2[0]) + xm2[5] * (xp1[1] - xp2[1]) + xm2[8] * (xp1[2] - xp2[2]),
            )
            sd, n_l, surf_l = _point_box_dist(p_local, s2)
            dist = sd - s1[0]
            n_w = (
                xm2[0] * n_l[0] + xm2[1] * n_l[1] + xm2[2] * n_l[2],
                xm2[3] * n_l[0] + xm2[4] * n_l[1] + xm2[5] * n_l[2],
                xm2[6] * n_l[0] + xm2[7] * n_l[1] + xm2[8] * n_l[2],
            )
            surf_w = vadd(
                xp2,
                (
                    xm2[0] * surf_l[0] + xm2[1] * surf_l[1] + xm2[2] * surf_l[2],
                    xm2[3] * surf_l[0] + xm2[4] * surf_l[1] + xm2[5] * surf_l[2],
                    xm2[6] * surf_l[0] + xm2[7] * surf_l[1] + xm2[8] * surf_l[2],
                ),
            )
            n = tuple(-x for x in n_w)
            pos = vsub(surf_w, vscale(n, 0.5 * dist))
            emit([dist], [pos], [_make_frame(n)])
            ncp = 1
        elif t1 == GEOM_CAPSULE and t2 == GEOM_CAPSULE:
            ax1 = _col(xm1, 2)
            ax2 = _col(xm2, 2)
            a1 = vsub(xp1, vscale(ax1, s1[1]))
            b1 = vadd(xp1, vscale(ax1, s1[1]))
            a2 = vsub(xp2, vscale(ax2, s2[1]))
            b2 = vadd(xp2, vscale(ax2, s2[1]))
            d1 = vsub(b1, a1)
            d2 = vsub(b2, a2)
            r = vsub(a1, a2)
            A = vdot(d1, d1)
            Eq = vdot(d2, d2)
            F = vdot(d2, r)
            C = vdot(d1, r)
            B = vdot(d1, d2)
            denom = A * Eq - B * B
            s = jnp.where(denom > 1e-12, (B * F - C * Eq) / jnp.maximum(denom, 1e-12), 0.0)
            s = jnp.clip(s, 0.0, 1.0)
            t = jnp.where(Eq > 1e-12, (B * s + F) / jnp.maximum(Eq, 1e-12), 0.0)
            t_cl = jnp.clip(t, 0.0, 1.0)
            s = jnp.where(
                t != t_cl,
                jnp.clip((B * t_cl - C) / jnp.maximum(A, 1e-12), 0.0, 1.0),
                s,
            )
            p1 = vadd(a1, vscale(d1, s))
            p2 = vadd(a2, vscale(d2, t_cl))
            dist, pos, n = _sphere_sphere_raw(p1, s1[0], p2, s2[0])
            emit([dist], [pos], [_make_frame(n)])
            ncp = 1
        elif t1 == GEOM_CAPSULE and t2 == GEOM_BOX:
            ax = _col(xm1, 2)
            a = vsub(xp1, vscale(ax, s1[1]))
            b = vadd(xp1, vscale(ax, s1[1]))

            def seg_dist(t):
                p = vadd(a, vscale(vsub(b, a), t))
                rel = vsub(p, xp2)
                p_local = (
                    xm2[0] * rel[0] + xm2[3] * rel[1] + xm2[6] * rel[2],
                    xm2[1] * rel[0] + xm2[4] * rel[1] + xm2[7] * rel[2],
                    xm2[2] * rel[0] + xm2[5] * rel[1] + xm2[8] * rel[2],
                )
                sd, _, _ = _point_box_dist(p_local, s2)
                return sd

            lo = jnp.zeros_like(a[0])
            hi = jnp.ones_like(a[0])
            for _ in range(20):
                m1_ = lo + (hi - lo) / 3.0
                m2_ = hi - (hi - lo) / 3.0
                f1_, f2_ = seg_dist(m1_), seg_dist(m2_)
                take = f1_ > f2_
                lo = jnp.where(take, m1_, lo)
                hi = jnp.where(take, hi, m2_)
            t_star = 0.5 * (lo + hi)
            ds, ps, fs = [], [], []
            for t in (t_star, jnp.where(t_star > 0.5, jnp.zeros_like(t_star), jnp.ones_like(t_star))):
                p = vadd(a, vscale(vsub(b, a), t))
                rel = vsub(p, xp2)
                p_local = (
                    xm2[0] * rel[0] + xm2[3] * rel[1] + xm2[6] * rel[2],
                    xm2[1] * rel[0] + xm2[4] * rel[1] + xm2[7] * rel[2],
                    xm2[2] * rel[0] + xm2[5] * rel[1] + xm2[8] * rel[2],
                )
                sd, n_l, surf_l = _point_box_dist(p_local, s2)
                dist = sd - s1[0]
                n_w = (
                    xm2[0] * n_l[0] + xm2[1] * n_l[1] + xm2[2] * n_l[2],
                    xm2[3] * n_l[0] + xm2[4] * n_l[1] + xm2[5] * n_l[2],
                    xm2[6] * n_l[0] + xm2[7] * n_l[1] + xm2[8] * n_l[2],
                )
                n = tuple(-x for x in n_w)
                surf_w = vadd(
                    xp2,
                    (
                        xm2[0] * surf_l[0] + xm2[1] * surf_l[1] + xm2[2] * surf_l[2],
                        xm2[3] * surf_l[0] + xm2[4] * surf_l[1] + xm2[5] * surf_l[2],
                        xm2[6] * surf_l[0] + xm2[7] * surf_l[1] + xm2[8] * surf_l[2],
                    ),
                )
                pos = vsub(surf_w, vscale(n, 0.5 * dist))
                ds.append(dist)
                ps.append(pos)
                fs.append(_make_frame(n))
            emit(ds, ps, fs)
            ncp = 2
        elif t1 == GEOM_BOX and t2 == GEOM_BOX:
            dist4, pos4, frame = _box_box_lm(xp1, xm1, s1, xp2, xm2, s2)
            emit(dist4, pos4, [frame] * 4)
            ncp = 4
        elif t1 == GEOM_HFIELD:
            ncp = _hfield_group_lm(m, P, key[1], xp1, xm1, xp2, xm2, s2, emit)
        else:  # pragma: no cover
            raise NotImplementedError(f"lm narrowphase for type pair {key}")

        expected_adr += ncp * len(plist)

    dist = jnp.concatenate(dist_b, axis=0)  # (S, E)
    pos = jnp.concatenate(pos_b, axis=0)  # (S, 3, E)
    frame = jnp.concatenate(frame_b, axis=0)  # (S, 9, E)
    k.update(con_dist=dist, con_pos=pos, con_frame=frame)
    return k


def _box_box_lm(xp1, xm1, s1, xp2, xm2, s2):
    """Face-SAT box-box (mirrors phys.collision._box_box)."""
    delta = vsub(xp2, xp1)
    axes = [_col(xm1, i) for i in range(3)] + [_col(xm2, i) for i in range(3)]

    def radius(ax, xm, s):
        # sum_i |ax . u_i| s_i where u_i = columns of xm
        out = None
        for i in range(3):
            u = _col(xm, i)
            t = jnp.abs(vdot(ax, u)) * s[i]
            out = t if out is None else out + t
        return out

    seps, cds = [], []
    for ax in axes:
        r1 = radius(ax, xm1, s1)
        r2 = radius(ax, xm2, s2)
        cd = vdot(ax, delta)
        seps.append(jnp.abs(cd) - (r1 + r2))
        cds.append(cd)

    sep = jnp.stack(seps, axis=-1)  # (P, E, 6)
    kbest = jnp.argmax(sep, axis=-1)  # (P, E)

    def select(vals):
        """vals: list of 6 (P,E) -> selected (P,E)."""
        out = vals[0]
        for i in range(1, 6):
            out = jnp.where(kbest == i, vals[i], out)
        return out

    a = tuple(select([axes[i][c] for i in range(6)]) for c in range(3))
    cd_k = select(cds)
    sgn = jnp.sign(cd_k)
    n = vscale(a, sgn)

    ref_is_1 = kbest < 3
    ref_pos = vwhere(ref_is_1, xp1, xp2)
    r1_list = [radius(ax, xm1, s1) for ax in axes]
    r2_list = [radius(ax, xm2, s2) for ax in axes]
    r_ref = jnp.where(ref_is_1, select(r1_list), select(r2_list))
    n_out = vwhere(ref_is_1, n, vscale(n, -1.0))
    plane_p = vadd(ref_pos, vscale(n_out, r_ref))

    # incident corners: 8 corners of the other box
    d_list, c_list = [], []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz_ in (-1, 1):
                lc1 = (s1[0] * sx, s1[1] * sy, s1[2] * sz_)
                c1 = vadd(
                    xp1,
                    (
                        xm1[0] * lc1[0] + xm1[1] * lc1[1] + xm1[2] * lc1[2],
                        xm1[3] * lc1[0] + xm1[4] * lc1[1] + xm1[5] * lc1[2],
                        xm1[6] * lc1[0] + xm1[7] * lc1[1] + xm1[8] * lc1[2],
                    ),
                )
                lc2 = (s2[0] * sx, s2[1] * sy, s2[2] * sz_)
                c2 = vadd(
                    xp2,
                    (
                        xm2[0] * lc2[0] + xm2[1] * lc2[1] + xm2[2] * lc2[2],
                        xm2[3] * lc2[0] + xm2[4] * lc2[1] + xm2[5] * lc2[2],
                        xm2[6] * lc2[0] + xm2[7] * lc2[1] + xm2[8] * lc2[2],
                    ),
                )
                corner = vwhere(ref_is_1, c2, c1)
                d_list.append(vdot(vsub(corner, plane_p), n_out))
                c_list.append(corner)

    D8 = jnp.stack(d_list, axis=-1)  # (P, E, 8)
    _, idx = jax.lax.top_k(-D8, 4)
    d4 = jnp.take_along_axis(D8, idx, axis=-1)
    C8 = jnp.stack([jnp.stack(c, axis=-1) for c in c_list], axis=-1)  # (P,E,3,8)
    c4 = jnp.take_along_axis(C8, idx[:, :, None, :], axis=-1)
    dist4, pos4 = [], []
    for c in range(4):
        dc = d4[..., c]
        pc = tuple(c4[:, :, i, c] - n_out[i] * 0.5 * dc for i in range(3))
        dist4.append(dc)
        pos4.append(pc)
    return dist4, pos4, _make_frame(n)


def _hfield_group_lm(m, P, t2, xp1, xm1, xp2, xm2, s2, emit):
    """Heightfield narrowphase (sphere/capsule/box vs the one hfield)."""
    sz0 = P.plane("hfield_size", 0, 0)
    sz1 = P.plane("hfield_size", 0, 1)
    sz2 = P.plane("hfield_size", 0, 2)
    nr, nc = m.hfield_nrow, m.hfield_ncol
    data = P("hfield_data")  # (nr, nc, 1) or (nr, nc, E)
    flat = data.reshape(nr * nc, -1)

    def sample(lx, ly):
        gx = (lx / sz0 + 1.0) * 0.5 * (nc - 1)
        gy = (ly / sz1 + 1.0) * 0.5 * (nr - 1)
        gx = jnp.clip(gx, 0.0, nc - 1.000001)
        gy = jnp.clip(gy, 0.0, nr - 1.000001)
        ix = jnp.floor(gx).astype(jnp.int32)
        iy = jnp.floor(gy).astype(jnp.int32)
        fx = gx - ix
        fy = gy - iy
        base = iy * nc + ix
        if flat.shape[-1] == 1:
            tab = flat[:, 0]
            h00 = tab[base]
            h01 = tab[base + 1]
            h10 = tab[base + nc]
            h11 = tab[base + nc + 1]
        else:  # DR'd terrain (unusual)
            h00 = jnp.take_along_axis(flat, base, axis=0)
            h01 = jnp.take_along_axis(flat, base + 1, axis=0)
            h10 = jnp.take_along_axis(flat, base + nc, axis=0)
            h11 = jnp.take_along_axis(flat, base + nc + 1, axis=0)
        h = ((1 - fx) * (1 - fy) * h00 + fx * (1 - fy) * h01
             + (1 - fx) * fy * h10 + fx * fy * h11) * sz2
        dhdx = (((1 - fy) * (h01 - h00) + fy * (h11 - h10)) * sz2
                * (0.5 * (nc - 1) / sz0))
        dhdy = (((1 - fx) * (h10 - h00) + fx * (h11 - h01)) * sz2
                * (0.5 * (nr - 1) / sz1))
        return h, dhdx, dhdy

    def hf_point(p_local, radius):
        h, dhdx, dhdy = sample(p_local[0], p_local[1])
        n = (-dhdx, -dhdy, jnp.ones_like(h))
        nn = jnp.sqrt(jnp.maximum(vdot(n, n), 1e-30))
        n = tuple(x / nn for x in n)
        dist = (p_local[2] - h) * n[2] - radius
        pos = vsub(p_local, vscale(n, radius + 0.5 * dist))
        return dist, pos, n

    def to_local(p):
        rel = vsub(p, xp1)
        return (
            xm1[0] * rel[0] + xm1[3] * rel[1] + xm1[6] * rel[2],
            xm1[1] * rel[0] + xm1[4] * rel[1] + xm1[7] * rel[2],
            xm1[2] * rel[0] + xm1[5] * rel[1] + xm1[8] * rel[2],
        )

    def to_world(pos_l, n_l):
        pos = vadd(
            xp1,
            (
                xm1[0] * pos_l[0] + xm1[1] * pos_l[1] + xm1[2] * pos_l[2],
                xm1[3] * pos_l[0] + xm1[4] * pos_l[1] + xm1[5] * pos_l[2],
                xm1[6] * pos_l[0] + xm1[7] * pos_l[1] + xm1[8] * pos_l[2],
            ),
        )
        n = (
            xm1[0] * n_l[0] + xm1[1] * n_l[1] + xm1[2] * n_l[2],
            xm1[3] * n_l[0] + xm1[4] * n_l[1] + xm1[5] * n_l[2],
            xm1[6] * n_l[0] + xm1[7] * n_l[1] + xm1[8] * n_l[2],
        )
        return pos, n

    if t2 == GEOM_SPHERE:
        p_l = to_local(xp2)
        dist, pos_l, n_l = hf_point(p_l, s2[0])
        pos, n = to_world(pos_l, n_l)
        emit([dist], [pos], [_make_frame(n)])
        return 1
    if t2 == GEOM_CAPSULE:
        axis = _col(xm2, 2)
        ds, ps, fs = [], [], []
        for sgn in (1.0, -1.0):
            e = vadd(xp2, vscale(axis, sgn * s2[1]))
            p_l = to_local(e)
            dist, pos_l, n_l = hf_point(p_l, s2[0])
            pos, n = to_world(pos_l, n_l)
            ds.append(dist)
            ps.append(pos)
            fs.append(_make_frame(n))
        emit(ds, ps, fs)
        return 2
    if t2 == GEOM_BOX:
        d8, p8, n8 = [], [], []
        for sx in (-1, 1):
            for sy in (-1, 1):
                for sz_ in (-1, 1):
                    lc = (s2[0] * sx, s2[1] * sy, s2[2] * sz_)
                    corner = vadd(
                        xp2,
                        (
                            xm2[0] * lc[0] + xm2[1] * lc[1] + xm2[2] * lc[2],
                            xm2[3] * lc[0] + xm2[4] * lc[1] + xm2[5] * lc[2],
                            xm2[6] * lc[0] + xm2[7] * lc[1] + xm2[8] * lc[2],
                        ),
                    )
                    p_l = to_local(corner)
                    dist, pos_l, n_l = hf_point(p_l, jnp.zeros_like(p_l[0]))
                    pos, n = to_world(pos_l, n_l)
                    d8.append(dist)
                    p8.append(pos)
                    n8.append(n)
        D8 = jnp.stack(d8, axis=-1)  # (P, E, 8)
        _, idx = jax.lax.top_k(-D8, 4)
        d4v = jnp.take_along_axis(D8, idx, axis=-1)
        P8 = jnp.stack([jnp.stack(p, axis=-1) for p in p8], axis=-1)
        N8 = jnp.stack([jnp.stack(n, axis=-1) for n in n8], axis=-1)
        p4 = jnp.take_along_axis(P8, idx[:, :, None, :], axis=-1)
        n4 = jnp.take_along_axis(N8, idx[:, :, None, :], axis=-1)
        ds, ps, fs = [], [], []
        for c in range(4):
            ds.append(d4v[..., c])
            ps.append(tuple(p4[:, :, i, c] for i in range(3)))
            fs.append(_make_frame(tuple(n4[:, :, i, c] for i in range(3))))
        emit(ds, ps, fs)
        return 4
    raise NotImplementedError(f"hfield vs type {t2}")
