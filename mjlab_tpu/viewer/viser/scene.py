"""Viser scene management: per-body meshes, contact visuals, ghosts.

Web-viewer counterpart of the reference's ViserMujocoScene
(/root/reference/src/mjlab/viewer/viser/scene.py:76): visible geoms are
merged into ONE mesh per body (transform updates are per body, not per
geom), contact points/forces render as reusable arrow handles fed from the
engine's decoded per-contact forces, and the DebugVisualizer protocol
(arrows / ghost meshes / frames / spheres) is implemented so command terms
can annotate the scene.

All geometry math is pure numpy (mjlab_tpu.viewer.viser.conversions);
viser itself is imported lazily by the caller which passes the server in,
so this module stays importable (and its math testable) without viser.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import mujoco
import numpy as np

from mjlab_tpu.viewer.debug_visualizer import DebugVisualizer
from mjlab_tpu.viewer.viser.conversions import (
    arrow_mesh, geom_color, geom_to_mesh, visible_geoms,
)

_CONTACT_FORCE_COLOR = (220, 40, 40)
_CONTACT_POINT_COLOR = (230, 153, 51)
_FORCE_SCALE = 0.002  # meters of arrow length per Newton


def quat_to_wxyz(q: np.ndarray) -> np.ndarray:
    return np.asarray(q, np.float64)


def _rotate(verts: np.ndarray, quat: np.ndarray) -> np.ndarray:
    mat = np.zeros(9)
    mujoco.mju_quat2Mat(mat, np.asarray(quat, np.float64))
    return verts @ mat.reshape(3, 3).T


def z_align_quat(direction: np.ndarray) -> np.ndarray:
    """wxyz quaternion rotating +z onto `direction` (normalized)."""
    d = np.asarray(direction, np.float64)
    n = np.linalg.norm(d)
    if n < 1e-12:
        return np.array([1.0, 0, 0, 0])
    d = d / n
    z = np.array([0.0, 0.0, 1.0])
    c = float(np.dot(z, d))
    if c > 1 - 1e-12:
        return np.array([1.0, 0, 0, 0])
    if c < -1 + 1e-12:
        return np.array([0.0, 1.0, 0, 0])  # 180 deg about x
    axis = np.cross(z, d)
    axis = axis / np.linalg.norm(axis)
    half = 0.5 * np.arccos(np.clip(c, -1, 1))
    return np.concatenate([[np.cos(half)], np.sin(half) * axis])


def merge_body_geoms(mj_model: mujoco.MjModel, body_id: int, groups=(0, 1, 2)):
    """Merge the body's visible geoms (local frames baked in) into one
    (vertices, faces, rgba) payload; None if nothing renderable."""
    vs, fs, colors = [], [], []
    offset = 0
    for g in visible_geoms(mj_model, groups):
        if int(mj_model.geom_bodyid[g]) != body_id:
            continue
        got = geom_to_mesh(mj_model, g)
        if got is None:
            continue
        v, f = got
        v = _rotate(v, mj_model.geom_quat[g]) + mj_model.geom_pos[g]
        vs.append(v.astype(np.float32))
        fs.append(f + offset)
        colors.append(geom_color(mj_model, g))
        offset += len(v)
    if not vs:
        return None
    rgba = np.mean(np.stack(colors), axis=0)
    return np.concatenate(vs), np.concatenate(fs), rgba


@dataclass
class ContactVisual:
    """One contact marker: position + force arrow payload."""

    pos: np.ndarray
    force_world: np.ndarray
    normal: np.ndarray

    def arrow_transform(self):
        mag = float(np.linalg.norm(self.force_world))
        quat = z_align_quat(self.force_world)
        return self.pos, quat, max(mag * _FORCE_SCALE, 1e-4)


@dataclass
class ViserMujocoScene(DebugVisualizer):
    server: object  # viser.ViserServer
    mj_model: mujoco.MjModel
    num_envs: int = 1
    show_contact_points: bool = True
    show_contact_forces: bool = True
    max_contacts: int = 32
    _body_handles: dict = field(default_factory=dict)
    _ghost_handles: dict = field(default_factory=dict)
    _contact_handles: list = field(default_factory=list)
    _debug_handles: dict = field(default_factory=dict)

    def __post_init__(self):
        self._movable_bodies = []
        for b in range(self.mj_model.nbody):
            payload = merge_body_geoms(self.mj_model, b)
            if payload is None:
                continue
            verts, faces, rgba = payload
            handle = self.server.scene.add_mesh_simple(
                f"/bodies/{self._body_name(b)}",
                vertices=verts,
                faces=faces,
                color=tuple(float(c) for c in rgba[:3]),
                opacity=float(rgba[3]),
            )
            self._body_handles[b] = handle
            # world-fixed bodies never move: skip them in update()
            if b != 0 and not self._is_static(b):
                self._movable_bodies.append(b)
        arrow_v, arrow_f = arrow_mesh()
        self._arrow_payload = (arrow_v, arrow_f)

    def _body_name(self, b: int) -> str:
        return (
            mujoco.mj_id2name(self.mj_model, mujoco.mjtObj.mjOBJ_BODY, b)
            or f"body_{b}"
        ).replace("/", "_")

    def _is_static(self, b: int) -> bool:
        # a body is static if it has no dofs anywhere up its chain and is
        # not a mocap body
        m = self.mj_model
        if m.body_mocapid[b] >= 0:
            return False
        while b != 0:
            if m.body_dofnum[b]:
                return False
            b = int(m.body_parentid[b])
        return True

    # -- per-frame sync -----------------------------------------------------

    def update_body_poses(self, xpos: np.ndarray, xquat: np.ndarray) -> None:
        """xpos (nbody, 3), xquat (nbody, 4 wxyz) of the SELECTED env."""
        for b in self._movable_bodies:
            h = self._body_handles[b]
            h.position = tuple(np.asarray(xpos[b], np.float64))
            h.wxyz = tuple(np.asarray(xquat[b], np.float64))

    def update_contacts(self, contacts: list[ContactVisual]) -> None:
        """Render up to max_contacts force arrows, reusing handles."""
        if not (self.show_contact_points or self.show_contact_forces):
            return
        scene = self.server.scene
        n = min(len(contacts), self.max_contacts)
        # grow handle pool lazily
        while len(self._contact_handles) < n:
            i = len(self._contact_handles)
            point = scene.add_icosphere(
                f"/contacts/point_{i}", radius=0.012,
                color=tuple(c / 255 for c in _CONTACT_POINT_COLOR),
            )
            arrow = scene.add_mesh_simple(
                f"/contacts/force_{i}",
                vertices=self._arrow_payload[0],
                faces=self._arrow_payload[1],
                color=tuple(c / 255 for c in _CONTACT_FORCE_COLOR),
            )
            self._contact_handles.append((point, arrow))
        for i, (point, arrow) in enumerate(self._contact_handles):
            vis = i < n
            point.visible = vis and self.show_contact_points
            arrow.visible = vis and self.show_contact_forces
            if not vis:
                continue
            c = contacts[i]
            point.position = tuple(c.pos)
            pos, quat, scale = c.arrow_transform()
            arrow.position = tuple(pos)
            arrow.wxyz = tuple(quat)
            arrow.scale = float(scale)

    @staticmethod
    def contacts_from_data(m, d, env_idx: int) -> list[ContactVisual]:
        """Decode the engine's compacted per-contact forces for one env
        (phys Data fields con_sel/con_packed_c/con_force_c)."""
        out = []
        if not getattr(m, "ncon_max", 0):
            return out
        act = np.asarray(d.con_sel_active[env_idx])
        pk = np.asarray(d.con_packed_c[env_idx])
        fw = np.asarray(d.con_force_c[env_idx])
        for k in np.nonzero(act)[0]:
            out.append(
                ContactVisual(
                    pos=pk[k, 2:5],
                    force_world=fw[k],
                    normal=pk[k, 17:20],
                )
            )
        return out

    # -- DebugVisualizer protocol ------------------------------------------

    def add_arrow(self, start, end, color=(1.0, 0.2, 0.2, 1.0), width=0.015,
                  label: str = "arrow") -> None:
        start = np.asarray(start, np.float64)
        end = np.asarray(end, np.float64)
        h = self._debug_handles.get(label)
        if h is None:
            v, f = self._arrow_payload
            h = self.server.scene.add_mesh_simple(
                f"/debug/{label}", vertices=v, faces=f,
                color=tuple(float(c) for c in color[:3]),
            )
            self._debug_handles[label] = h
        h.position = tuple(start)
        h.wxyz = tuple(z_align_quat(end - start))
        h.scale = float(max(np.linalg.norm(end - start), 1e-4))
        h.visible = True

    def add_sphere(self, center, radius=0.02, color=(0.2, 0.6, 1.0, 1.0),
                   label: str = "sphere") -> None:
        h = self._debug_handles.get(label)
        if h is None:
            h = self.server.scene.add_icosphere(
                f"/debug/{label}", radius=float(radius),
                color=tuple(float(c) for c in color[:3]),
            )
            self._debug_handles[label] = h
        h.position = tuple(np.asarray(center, np.float64))
        h.visible = True

    def add_frame(self, pos, quat, scale=0.15, label: str = "frame") -> None:
        h = self._debug_handles.get(label)
        if h is None:
            h = self.server.scene.add_frame(
                f"/debug/{label}", axes_length=float(scale),
                axes_radius=float(scale) * 0.06,
            )
            self._debug_handles[label] = h
        h.position = tuple(np.asarray(pos, np.float64))
        h.wxyz = tuple(np.asarray(quat, np.float64))
        h.visible = True

    def add_cylinder(self, start, end, radius, color=(1.0, 0.2, 0.2, 1.0),
                     label: str = "cylinder") -> None:
        start = np.asarray(start, np.float64)
        end = np.asarray(end, np.float64)
        mid = 0.5 * (start + end)
        length = float(np.linalg.norm(end - start))
        h = self._debug_handles.get(label)
        if h is None:
            h = self.server.scene.add_icosphere(  # placeholder geometry
                f"/debug/{label}", radius=float(radius),
                color=tuple(float(c) for c in color[:3]),
            )
            self._debug_handles[label] = h
        h.position = tuple(mid)
        h.wxyz = tuple(z_align_quat(end - start))
        h.visible = length > 1e-9

    def add_ghost_mesh(self, qpos: np.ndarray, mj_data=None,
                       color=(0.3, 0.9, 0.3, 0.35), label: str = "ghost") -> None:
        """Semi-transparent copy of the robot at `qpos` (e.g. the motion
        target pose in tracking tasks)."""
        if mj_data is None:
            mj_data = mujoco.MjData(self.mj_model)
        mj_data.qpos[:] = np.asarray(qpos, np.float64)
        mujoco.mj_kinematics(self.mj_model, mj_data)
        for b in self._movable_bodies:
            gkey = (label, b)
            h = self._ghost_handles.get(gkey)
            if h is None:
                payload = merge_body_geoms(self.mj_model, b)
                if payload is None:
                    continue
                verts, faces, _ = payload
                h = self.server.scene.add_mesh_simple(
                    f"/ghost/{label}/{self._body_name(b)}",
                    vertices=verts, faces=faces,
                    color=tuple(float(c) for c in color[:3]),
                    opacity=float(color[3]),
                )
                self._ghost_handles[gkey] = h
            h.position = tuple(mj_data.xpos[b])
            h.wxyz = tuple(mj_data.xquat[b])
            h.visible = True

    def clear_debug(self) -> None:
        for h in self._debug_handles.values():
            h.visible = False
        for h in self._ghost_handles.values():
            h.visible = False
