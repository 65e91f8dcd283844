"""Contact sensor fields/reduce modes vs MuJoCo's native mjSENS_CONTACT.

The reference exposes mujoco_warp's contact sensors
(/root/reference/src/mjlab/sensor/contact_sensor.py:66-123); our engine
computes the same quantities from the static slot table. CPU MuJoCo >= 3.3
implements the same sensor natively, so every field and reduce mode is
validated against it on identical states.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.phys.model import put_model
from mjlab_tpu.phys.data import make_data
import mjlab_tpu.phys.forward as fwd
from mjlab_tpu.scene.scene import SimContext
from mjlab_tpu.sensor.contact_sensor import (
    ContactMatch, ContactSensor, ContactSensorCfg,
)

XML = """
<mujoco>
  <option timestep="0.002" iterations="60" ls_iterations="30"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="b1" pos="0 0 0.095">
      <freejoint/>
      <geom name="ballg" type="sphere" size="0.1" condim="6"
            friction="1 0.05 0.01"/>
    </body>
    <body name="b2" pos="0.5 0 0.045">
      <freejoint/>
      <geom name="boxg" type="box" size="0.05 0.05 0.05"/>
    </body>
  </worldbody>
  <sensor>
    <contact name="c_min" geom1="ballg"
             data="found force torque dist pos normal tangent"
             reduce="mindist" num="2"/>
    <contact name="c_net" geom1="boxg" data="found force dist" reduce="netforce"
             num="1"/>
    <contact name="c_max" geom1="boxg" geom2="floor" data="found force"
             reduce="maxforce" num="3"/>
  </sensor>
</mujoco>
"""

E = 2


@pytest.fixture(autouse=True)
def x64():
    with jax.enable_x64(True):
        yield


@pytest.fixture(scope="module")
def setup():
    with jax.enable_x64(True):
        mj = mujoco.MjModel.from_xml_string(XML)
        m = put_model(mj, dtype=jnp.float64, nconmax=12)
        mjd = mujoco.MjData(mj)

        qpos = np.zeros((E, mj.nq))
        qvel = np.zeros((E, mj.nv))
        ws = np.zeros((E, mj.nv))
        sens = np.zeros((E, mj.nsensordata))
        rng = np.random.default_rng(0)
        for e in range(E):
            mujoco.mj_resetData(mj, mjd)
            # give the ball spin/slide so tangential + torsional friction act
            mjd.qvel[0:3] = [0.5 * (e + 1), 0.2, 0.0]
            mjd.qvel[3:6] = [0.0, 0.0, 6.0]
            mjd.qvel[6:9] = 0.1 * rng.standard_normal(3)
            for _ in range(40):
                mujoco.mj_step(mj, mjd)
            qpos[e] = mjd.qpos
            qvel[e] = mjd.qvel
            ws[e] = mjd.qacc_warmstart
            mujoco.mj_forward(mj, mjd)
            sens[e] = mjd.sensordata

        d0 = make_data(m, dtype=jnp.float64)
        dB = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (E,) + x.shape), d0
        )
        dB = dB.replace(
            qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
            qacc_warmstart=jnp.asarray(ws),
        )
        dB = jax.jit(jax.vmap(lambda dd: fwd.forward(m, dd)))(dB)
        ctx = SimContext(m, dB)
        yield mj, m, dB, ctx, sens


def _mj_sensor(mj, sens, name):
    sid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SENSOR, name)
    adr, dim = mj.sensor_adr[sid], mj.sensor_dim[sid]
    return sens[:, adr:adr + dim]


def _build(mj, ctx, **kw):
    cfg = ContactSensorCfg(name="t", primary=kw.pop("primary"), **kw)
    s = ContactSensor(cfg, scene=None)
    s.initialize(mj, E, None, ctx)
    return s


def test_mindist_full_fields(setup):
    mj, m, dB, ctx, sens = setup
    s = _build(
        mj, ctx,
        primary=ContactMatch(mode="geom", pattern="ballg"),
        fields=("found", "force", "torque", "dist", "pos", "normal", "tangent"),
        reduce="mindist", num_slots=2, global_frame=False,
    )
    d = s.data
    want = _mj_sensor(mj, sens, "c_min").reshape(E, 2, 17)
    np.testing.assert_allclose(np.asarray(d.found), want[..., 0], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(d.force), want[..., 1:4], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(d.torque), want[..., 4:7], rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(d.dist), want[..., 7], rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(d.pos), want[..., 8:11], rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(d.normal), want[..., 11:14], rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(d.tangent), want[..., 14:17], rtol=1e-6, atol=1e-9
    )


def test_netforce(setup):
    mj, m, dB, ctx, sens = setup
    s = _build(
        mj, ctx,
        primary=ContactMatch(mode="geom", pattern="boxg"),
        fields=("found", "force", "dist"),
        reduce="netforce",
    )
    d = s.data
    want = _mj_sensor(mj, sens, "c_net")  # [found, force(3), dist]
    np.testing.assert_allclose(np.asarray(d.found)[:, 0], want[:, 0], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(d.force)[:, 0], want[:, 1:4], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(d.dist)[:, 0], want[:, 4], rtol=1e-6, atol=1e-10
    )


def test_maxforce(setup):
    mj, m, dB, ctx, sens = setup
    s = _build(
        mj, ctx,
        primary=ContactMatch(mode="geom", pattern="boxg"),
        secondary=ContactMatch(mode="geom", pattern="floor"),
        fields=("found", "force"),
        reduce="maxforce", num_slots=3, global_frame=False,
    )
    d = s.data
    want = _mj_sensor(mj, sens, "c_max").reshape(E, 3, 4)
    np.testing.assert_allclose(np.asarray(d.found), want[..., 0], atol=1e-9)
    # maxforce ordering among nearly-equal corner forces can differ between
    # implementations: compare as sorted sets of force vectors
    got_f = np.sort(np.asarray(d.force), axis=1)
    want_f = np.sort(want[..., 1:4], axis=1)
    np.testing.assert_allclose(got_f, want_f, rtol=1e-3, atol=1e-5)


def test_global_frame_rotation(setup):
    mj, m, dB, ctx, sens = setup
    s_local = _build(
        mj, ctx,
        primary=ContactMatch(mode="geom", pattern="ballg"),
        fields=("found", "force", "normal", "tangent"),
        reduce="mindist", num_slots=1, global_frame=False,
    )
    s_global = _build(
        mj, ctx,
        primary=ContactMatch(mode="geom", pattern="ballg"),
        fields=("found", "force", "normal", "tangent"),
        reduce="mindist", num_slots=1, global_frame=True,
    )
    dl, dg = s_local.data, s_global.data
    n = np.asarray(dl.normal)[:, 0]
    t1 = np.asarray(dl.tangent)[:, 0]
    t2 = np.cross(n, t1)
    fl = np.asarray(dl.force)[:, 0]
    # reconstruct world force from the flipped-frame components
    fw = fl[:, 0:1] * n + fl[:, 1:2] * t1 + fl[:, 2:3] * t2
    np.testing.assert_allclose(
        np.asarray(dg.force)[:, 0], fw, rtol=1e-6, atol=1e-9
    )


def test_secondary_policy_error(setup):
    mj, m, dB, ctx, sens = setup
    with pytest.raises(ValueError, match="secondary_policy"):
        _build(
            mj, ctx,
            primary=ContactMatch(mode="geom", pattern="ballg"),
            secondary=ContactMatch(mode="geom", pattern="boxg|floor"),
            fields=("found",),
            secondary_policy="error",
        )
    # "any": unions both secondaries
    s = _build(
        mj, ctx,
        primary=ContactMatch(mode="geom", pattern="ballg"),
        secondary=ContactMatch(mode="geom", pattern="boxg|floor"),
        fields=("found",),
        secondary_policy="any",
    )
    assert s.slot_mask.any()
