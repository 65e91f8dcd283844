"""Geom -> triangle-mesh conversion for web viewers (pure numpy).

Equivalent of the reference's trimesh-based conversions
(/root/reference/src/mjlab/viewer/viser/conversions.py, 521 LoC): every
MuJoCo geom type becomes (vertices, faces[, color]) payloads that any
mesh-based viewer (viser, three.js, ...) can consume. trimesh is not a
dependency — primitives are tessellated directly and mesh assets are read
from the compiled MjModel's vertex/face tables.
"""

from __future__ import annotations

import math

import mujoco
import numpy as np


def _uv_sphere(radius: float, lat: int = 12, lon: int = 16):
    verts = []
    for i in range(lat + 1):
        theta = math.pi * i / lat
        for j in range(lon):
            phi = 2 * math.pi * j / lon
            verts.append(
                [
                    radius * math.sin(theta) * math.cos(phi),
                    radius * math.sin(theta) * math.sin(phi),
                    radius * math.cos(theta),
                ]
            )
    faces = []
    for i in range(lat):
        for j in range(lon):
            a = i * lon + j
            b = i * lon + (j + 1) % lon
            c = (i + 1) * lon + j
            d = (i + 1) * lon + (j + 1) % lon
            if i > 0:
                faces.append([a, b, c])
            if i < lat - 1:
                faces.append([b, d, c])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def _cylinder(radius: float, half_h: float, seg: int = 24, caps: bool = True):
    verts, faces = [], []
    for s, z in ((0, -half_h), (1, half_h)):
        for j in range(seg):
            phi = 2 * math.pi * j / seg
            verts.append([radius * math.cos(phi), radius * math.sin(phi), z])
    for j in range(seg):
        a, b = j, (j + 1) % seg
        c, d = seg + j, seg + (j + 1) % seg
        faces += [[a, b, c], [b, d, c]]
    if caps:
        lo = len(verts)
        verts += [[0, 0, -half_h], [0, 0, half_h]]
        for j in range(seg):
            a, b = j, (j + 1) % seg
            faces.append([b, a, lo])
            faces.append([seg + a, seg + b, lo + 1])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def _capsule(radius: float, half_h: float, lat: int = 8, lon: int = 16):
    sv, sf = _uv_sphere(radius, 2 * lat, lon)
    verts = sv.copy()
    verts[:, 2] += np.where(sv[:, 2] >= 0, half_h, -half_h)
    return verts, sf


def _box(half: np.ndarray):
    x, y, z = half
    verts = np.array(
        [
            [-x, -y, -z], [x, -y, -z], [x, y, -z], [-x, y, -z],
            [-x, -y, z], [x, -y, z], [x, y, z], [-x, y, z],
        ],
        np.float32,
    )
    faces = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],
            [1, 2, 6], [1, 6, 5],
            [2, 3, 7], [2, 7, 6],
            [3, 0, 4], [3, 4, 7],
        ],
        np.int32,
    )
    return verts, faces


def _plane(size: np.ndarray, extent: float = 10.0):
    sx = float(size[0]) or extent
    sy = float(size[1]) or extent
    verts = np.array(
        [[-sx, -sy, 0], [sx, -sy, 0], [sx, sy, 0], [-sx, sy, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def _hfield(mj_model: mujoco.MjModel, hid: int):
    nrow = int(mj_model.hfield_nrow[hid])
    ncol = int(mj_model.hfield_ncol[hid])
    size = mj_model.hfield_size[hid]  # rx, ry, z_top, z_bottom
    data = mj_model.hfield_data[
        mj_model.hfield_adr[hid]: mj_model.hfield_adr[hid] + nrow * ncol
    ].reshape(nrow, ncol)
    xs = np.linspace(-size[0], size[0], ncol)
    ys = np.linspace(-size[1], size[1], nrow)
    xx, yy = np.meshgrid(xs, ys)
    zz = data * size[2]
    verts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(nrow - 1):
        for j in range(ncol - 1):
            a = i * ncol + j
            b = a + 1
            c = a + ncol
            d = c + 1
            faces += [[a, b, c], [b, d, c]]
    return verts, np.asarray(faces, np.int32)


def _mesh(mj_model: mujoco.MjModel, mesh_id: int):
    vadr = int(mj_model.mesh_vertadr[mesh_id])
    vnum = int(mj_model.mesh_vertnum[mesh_id])
    fadr = int(mj_model.mesh_faceadr[mesh_id])
    fnum = int(mj_model.mesh_facenum[mesh_id])
    verts = np.asarray(mj_model.mesh_vert[vadr: vadr + vnum], np.float32)
    faces = np.asarray(mj_model.mesh_face[fadr: fadr + fnum], np.int32)
    return verts, faces


def geom_to_mesh(mj_model: mujoco.MjModel, gid: int):
    """(vertices (N,3) float32 local frame, faces (M,3) int32) of geom gid;
    None if the type is not renderable."""
    gtype = int(mj_model.geom_type[gid])
    size = mj_model.geom_size[gid]
    T = mujoco.mjtGeom
    if gtype == T.mjGEOM_PLANE:
        return _plane(size)
    if gtype == T.mjGEOM_SPHERE:
        return _uv_sphere(float(size[0]))
    if gtype == T.mjGEOM_CAPSULE:
        return _capsule(float(size[0]), float(size[1]))
    if gtype == T.mjGEOM_CYLINDER:
        return _cylinder(float(size[0]), float(size[1]))
    if gtype == T.mjGEOM_ELLIPSOID:
        v, f = _uv_sphere(1.0)
        return (v * np.asarray(size[:3], np.float32)), f
    if gtype == T.mjGEOM_BOX:
        return _box(np.asarray(size[:3], np.float64))
    if gtype == T.mjGEOM_MESH:
        mid = int(mj_model.geom_dataid[gid])
        if mid >= 0:
            return _mesh(mj_model, mid)
        return None
    if gtype == T.mjGEOM_HFIELD:
        hid = int(mj_model.geom_dataid[gid])
        if hid >= 0:
            return _hfield(mj_model, hid)
        return None
    return None


def geom_color(mj_model: mujoco.MjModel, gid: int) -> np.ndarray:
    """RGBA for the geom: material color when assigned, else geom rgba."""
    rgba = np.asarray(mj_model.geom_rgba[gid], np.float32)
    mat = int(mj_model.geom_matid[gid])
    if mat >= 0 and np.allclose(rgba, [0.5, 0.5, 0.5, 1.0]):
        rgba = np.asarray(mj_model.mat_rgba[mat], np.float32)
    return rgba


def visible_geoms(mj_model: mujoco.MjModel, groups=(0, 1, 2)) -> list[int]:
    """Geom ids worth rendering: visible groups, non-transparent."""
    out = []
    for g in range(mj_model.ngeom):
        if int(mj_model.geom_group[g]) not in groups:
            continue
        if geom_color(mj_model, g)[3] <= 0.0:
            continue
        out.append(g)
    return out


def arrow_mesh(length: float = 1.0, radius: float = 0.02):
    """Unit +z arrow (shaft + head) used for contact-force visuals."""
    shaft_v, shaft_f = _cylinder(radius, 0.4 * length, seg=12, caps=False)
    shaft_v[:, 2] += 0.4 * length
    head_v, head_f = _cylinder(2.5 * radius, 1e-6, seg=12, caps=True)
    # cone: collapse the top ring of a short cylinder
    hv = []
    seg = 12
    for j in range(seg):
        phi = 2 * math.pi * j / seg
        hv.append([2.5 * radius * math.cos(phi), 2.5 * radius * math.sin(phi),
                   0.8 * length])
    hv.append([0.0, 0.0, length])
    hv.append([0.0, 0.0, 0.8 * length])
    hf = []
    apex = seg
    base_c = seg + 1
    for j in range(seg):
        a, b = j, (j + 1) % seg
        hf.append([a, b, apex])
        hf.append([b, a, base_c])
    head_v = np.asarray(hv, np.float32)
    head_f = np.asarray(hf, np.int32)
    verts = np.concatenate([shaft_v, head_v])
    faces = np.concatenate([shaft_f, head_f + len(shaft_v)])
    return verts, faces
