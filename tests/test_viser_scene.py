"""Viser scene/geometry logic without viser: a fake server records handle
calls, the geometry pipeline runs on the REAL G1 model (mesh visuals), and
the reward plotter history is exercised. Covers the capability the
reference implements in viewer/viser/{scene,conversions,reward_plotter}.py.
"""

import mujoco
import numpy as np
import pytest

from mjlab_tpu.viewer.viser.conversions import (
    arrow_mesh, geom_to_mesh, visible_geoms,
)
from mjlab_tpu.viewer.viser.reward_plotter import RewardPlotter
from mjlab_tpu.viewer.viser.scene import (
    ContactVisual, ViserMujocoScene, merge_body_geoms, z_align_quat,
)


class _Handle:
    def __init__(self, name, **kw):
        self.name = name
        self.kw = kw
        self.position = (0.0, 0.0, 0.0)
        self.wxyz = (1.0, 0.0, 0.0, 0.0)
        self.scale = 1.0
        self.visible = True


class _FakeScene:
    def __init__(self):
        self.handles = {}

    def _add(self, name, **kw):
        h = _Handle(name, **kw)
        self.handles[name] = h
        return h

    add_mesh_simple = _add
    add_icosphere = _add
    add_frame = _add


class _FakeServer:
    def __init__(self):
        self.scene = _FakeScene()


def _g1_model():
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.scene.scene import Scene

    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = 1
    return Scene(cfg.scene).compile()


@pytest.fixture(scope="module")
def g1():
    return _g1_model()


def test_g1_bodies_become_meshes(g1):
    """The G1's mesh visuals must actually render (reference gap: round-1
    viewer drew only spheres/boxes so the robot was invisible)."""
    server = _FakeServer()
    scene = ViserMujocoScene(server=server, mj_model=g1, num_envs=1)
    body_meshes = [n for n in server.scene.handles if n.startswith("/bodies/")]
    assert len(body_meshes) > 10, body_meshes
    # pelvis visual is an STL mesh in the XML: it must have real triangles
    pelvis = [n for n in body_meshes if "pelvis" in n]
    assert pelvis
    h = server.scene.handles[pelvis[0]]
    assert h.kw["vertices"].shape[0] > 100
    assert h.kw["faces"].shape[0] > 100
    assert len(scene._movable_bodies) > 10


def test_pose_update_moves_handles(g1):
    server = _FakeServer()
    scene = ViserMujocoScene(server=server, mj_model=g1, num_envs=1)
    d = mujoco.MjData(g1)
    mujoco.mj_resetDataKeyframe(g1, d, 0) if g1.nkey else mujoco.mj_resetData(g1, d)
    d.qpos[2] += 0.3
    mujoco.mj_kinematics(g1, d)
    scene.update_body_poses(d.xpos, d.xquat)
    b = scene._movable_bodies[0]
    np.testing.assert_allclose(
        scene._body_handles[b].position, d.xpos[b], atol=1e-12
    )


def test_contact_visuals_reuse_handles(g1):
    server = _FakeServer()
    scene = ViserMujocoScene(server=server, mj_model=g1, num_envs=1)
    contacts = [
        ContactVisual(
            pos=np.array([0.1 * i, 0.0, 0.0]),
            force_world=np.array([0.0, 0.0, 50.0]),
            normal=np.array([0.0, 0.0, 1.0]),
        )
        for i in range(4)
    ]
    scene.update_contacts(contacts)
    n_handles = len(server.scene.handles)
    assert len(scene._contact_handles) == 4
    # fewer contacts: handles hidden, not recreated
    scene.update_contacts(contacts[:2])
    assert len(server.scene.handles) == n_handles
    assert not scene._contact_handles[3][0].visible
    assert scene._contact_handles[0][0].visible
    # force arrow points up with sensible scale
    _, arrow = scene._contact_handles[0]
    np.testing.assert_allclose(arrow.wxyz, [1, 0, 0, 0], atol=1e-9)
    assert 0.05 < arrow.scale < 0.2  # 50 N * 0.002 m/N


def test_debug_primitives_and_ghost(g1):
    server = _FakeServer()
    scene = ViserMujocoScene(server=server, mj_model=g1, num_envs=1)
    scene.add_arrow([0, 0, 0], [0, 0, 1], label="vel_cmd")
    scene.add_sphere([1, 2, 3], radius=0.05, label="target")
    scene.add_frame([0, 0, 1], [1, 0, 0, 0], label="anchor")
    d = mujoco.MjData(g1)
    mujoco.mj_resetDataKeyframe(g1, d, 0) if g1.nkey else mujoco.mj_resetData(g1, d)
    scene.add_ghost_mesh(d.qpos, label="motion_target")
    ghosts = [n for n in server.scene.handles if n.startswith("/ghost/")]
    assert len(ghosts) > 10  # whole robot duplicated translucently
    scene.clear_debug()
    assert not server.scene.handles["/debug/vel_cmd"].visible
    assert not server.scene.handles[ghosts[0]].visible


def test_z_align_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = rng.standard_normal(3)
        q = z_align_quat(v)
        mat = np.zeros(9)
        mujoco.mju_quat2Mat(mat, q)
        got = mat.reshape(3, 3) @ np.array([0.0, 0.0, 1.0])
        np.testing.assert_allclose(got, v / np.linalg.norm(v), atol=1e-9)


def test_primitive_tessellations():
    xml = """
<mujoco><worldbody>
  <geom name="p" type="plane" size="2 2 .1"/>
  <body><geom name="s" type="sphere" size="0.2"/></body>
  <body><geom name="c" type="capsule" size="0.1 0.3"/></body>
  <body><geom name="cy" type="cylinder" size="0.1 0.3"/></body>
  <body><geom name="e" type="ellipsoid" size="0.1 0.2 0.3"/></body>
  <body><geom name="b" type="box" size="0.1 0.2 0.3"/></body>
</worldbody></mujoco>"""
    mj = mujoco.MjModel.from_xml_string(xml)
    for g in range(mj.ngeom):
        v, f = geom_to_mesh(mj, g)
        assert len(v) >= 4 and len(f) >= 2
        assert f.max() < len(v)
        gtype = int(mj.geom_type[g])
        r = np.linalg.norm(v, axis=1).max()
        if gtype == mujoco.mjtGeom.mjGEOM_SPHERE:
            np.testing.assert_allclose(r, 0.2, atol=1e-6)
        if gtype == mujoco.mjtGeom.mjGEOM_CAPSULE:
            np.testing.assert_allclose(r, 0.4, atol=1e-6)
    assert len(visible_geoms(mj)) == mj.ngeom
    av, af = arrow_mesh()
    assert av[:, 2].max() == pytest.approx(1.0)


def test_reward_plotter_history():
    p = RewardPlotter(["a", "b"], window=5)
    for i in range(8):
        p.record({"a": float(i), "b": -1.0})
    s = p.series()
    assert s["a"][1] == [3.0, 4.0, 5.0, 6.0, 7.0]  # window keeps last 5
    assert s["b"][1] == [-1.0] * 5
    assert s["a"][0] == [4, 5, 6, 7, 8]
    p.reset()
    assert p.series()["a"] == ([], [])
    p.push()  # no GUI attached: must be a no-op, not an error
