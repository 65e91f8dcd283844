"""Every builtin sensor type vs CPU MuJoCo sensordata on a toy model.

Mirrors the reference's per-type builtin sensor coverage
(/root/reference/tests/test_builtin_sensor.py): the reference trusts
mujoco_warp's mjSENS_* kernels; here every type is computed in JAX from
the batched Data, so each one is validated against mujoco.mj_forward's
sensordata on identical states.
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
from mjlab_tpu.sensor.builtin_sensor import BuiltinSensor, BuiltinSensorCfg, ObjRef

XML = """
<mujoco>
  <option timestep="0.002" integrator="implicitfast" iterations="30"
          ls_iterations="20" magnetic="0.1 -0.4 0.2"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="base" pos="0 0 0.30">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1" pos="0.02 0.01 0.0" mass="2"/>
      <site name="imu" pos="0.03 0.02 0.05" euler="10 20 30"/>
      <site name="down" pos="0.0 0.0 -0.05" zaxis="0 0 -1"/>
      <body name="leg" pos="0.1 0 0">
        <joint name="hip" type="hinge" axis="0 1 0" pos="0 0 0.05"
               range="-1 1" damping="0.1" armature="0.01" stiffness="4"
               springref="0.1"/>
        <geom name="legc" type="capsule" size="0.03" fromto="0 0 0 0 0 -0.3"/>
        <site name="legtip" pos="0 0 -0.3"/>
        <body name="foot" pos="0 0 -0.3">
          <joint name="knee" type="hinge" axis="0 1 0" range="-2 0.5"
                 damping="0.05"/>
          <geom name="footg" type="box" size="0.05 0.03 0.02"/>
        </body>
      </body>
    </body>
    <body name="obstacle" pos="0.6 0 0.15">
      <geom name="obst" type="box" size="0.1 0.4 0.15"/>
    </body>
  </worldbody>
  <actuator>
    <position name="hip_act" joint="hip" kp="30" kv="2"/>
    <motor name="knee_act" joint="knee" gear="1.5"/>
  </actuator>
  <sensor>
    <accelerometer name="s_acc" site="imu"/>
    <velocimeter name="s_velo" site="imu"/>
    <gyro name="s_gyro" site="imu"/>
    <force name="s_force" site="imu"/>
    <torque name="s_torque" site="imu"/>
    <magnetometer name="s_mag" site="imu"/>
    <rangefinder name="s_range" site="down"/>
    <jointpos name="s_jpos" joint="hip"/>
    <jointvel name="s_jvel" joint="hip"/>
    <jointlimitpos name="s_jlpos" joint="knee"/>
    <jointlimitvel name="s_jlvel" joint="knee"/>
    <jointlimitfrc name="s_jlfrc" joint="knee"/>
    <jointactuatorfrc name="s_jafrc" joint="hip"/>
    <actuatorpos name="s_apos" actuator="hip_act"/>
    <actuatorvel name="s_avel" actuator="hip_act"/>
    <actuatorfrc name="s_afrc" actuator="hip_act"/>
    <framepos name="s_fpos" objtype="site" objname="legtip"/>
    <framepos name="s_fpos_ref" objtype="site" objname="legtip"
              reftype="site" refname="imu"/>
    <framequat name="s_fquat" objtype="body" objname="leg"/>
    <framequat name="s_fquat_ref" objtype="body" objname="leg"
               reftype="site" refname="imu"/>
    <framexaxis name="s_fx" objtype="site" objname="imu"/>
    <frameyaxis name="s_fy" objtype="site" objname="imu"/>
    <framezaxis name="s_fz" objtype="site" objname="imu"/>
    <framezaxis name="s_fz_ref" objtype="site" objname="legtip"
                reftype="site" refname="imu"/>
    <framelinvel name="s_flv" objtype="site" objname="legtip"/>
    <frameangvel name="s_fav" objtype="site" objname="legtip"/>
    <framelinvel name="s_flv_ref" objtype="site" objname="legtip"
                 reftype="site" refname="imu"/>
    <frameangvel name="s_fav_ref" objtype="site" objname="legtip"
                 reftype="site" refname="imu"/>
    <framelinacc name="s_fla" objtype="site" objname="legtip"/>
    <frameangacc name="s_faa" objtype="site" objname="legtip"/>
    <framepos name="s_fpos_geom" objtype="geom" objname="legc"/>
    <framepos name="s_fpos_body" objtype="body" objname="leg"/>
    <framepos name="s_fpos_xbody" objtype="xbody" objname="leg"/>
    <subtreecom name="s_stcom" body="leg"/>
    <subtreelinvel name="s_stlv" body="leg"/>
    <subtreeangmom name="s_stam" body="base"/>
    <e_potential name="s_epot"/>
    <e_kinetic name="s_ekin"/>
    <clock name="s_clock"/>
  </sensor>
</mujoco>
"""

E = 3


@pytest.fixture(autouse=True)
def x64():
    with jax.enable_x64(True):
        yield


@pytest.fixture(scope="module")
def setup():
    with jax.enable_x64(True):
        yield from _build_setup()


def _build_setup():
    mj = mujoco.MjModel.from_xml_string(XML)
    m = put_model(mj, dtype=jnp.float64, nconmax=8)
    rng = np.random.default_rng(3)

    # states: settle with mj_step so contacts + warmstart are realistic
    mjd = mujoco.MjData(mj)
    qpos = np.tile(mjd.qpos, (E, 1))
    qvel = np.zeros((E, mj.nv))
    ctrl = 0.3 * rng.standard_normal((E, mj.nu))
    sensordata = np.zeros((E, mj.nsensordata))
    qacc_ws = np.zeros((E, mj.nv))
    times = np.zeros(E)
    for e in range(E):
        mujoco.mj_resetData(mj, mjd)
        mjd.qpos[0] += 0.05 * e
        mjd.qvel[:] = 0.2 * rng.standard_normal(mj.nv)
        mjd.ctrl[:] = ctrl[e]
        for _ in range(30 + 10 * e):
            mujoco.mj_step(mj, mjd)
        qpos[e] = mjd.qpos
        qvel[e] = mjd.qvel
        qacc_ws[e] = mjd.qacc_warmstart
        times[e] = mjd.time
        mujoco.mj_forward(mj, mjd)
        sensordata[e] = mjd.sensordata

    d0 = make_data(m, dtype=jnp.float64)
    dB = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (E,) + x.shape), d0)
    dB = dB.replace(
        qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
        ctrl=jnp.asarray(ctrl), qacc_warmstart=jnp.asarray(qacc_ws),
        time=jnp.asarray(times),
    )
    fwdB = jax.jit(jax.vmap(lambda dd: fwd.forward(m, dd)))
    dB = fwdB(dB)
    ctx = SimContext(m, dB)
    yield mj, m, dB, ctx, sensordata


def _make(mj, ctx, stype, obj=None, ref=None):
    cfg = BuiltinSensorCfg(sensor_type=stype, obj=obj, ref=ref)
    s = BuiltinSensor(cfg, scene=None)
    s.initialize(mj, E, None, ctx)
    return np.asarray(s.data)


def _expected(mj, sensordata, name):
    sid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SENSOR, name)
    adr = mj.sensor_adr[sid]
    dim = mj.sensor_dim[sid]
    return sensordata[:, adr:adr + dim]


CASES = [
    ("s_velo", "velocimeter", ObjRef(type="site", name="imu"), None),
    ("s_gyro", "gyro", ObjRef(type="site", name="imu"), None),
    ("s_mag", "magnetometer", ObjRef(type="site", name="imu"), None),
    ("s_range", "rangefinder", ObjRef(type="site", name="down"), None),
    ("s_jpos", "jointpos", ObjRef(type="joint", name="hip"), None),
    ("s_jvel", "jointvel", ObjRef(type="joint", name="hip"), None),
    ("s_jlpos", "jointlimitpos", ObjRef(type="joint", name="knee"), None),
    ("s_jlvel", "jointlimitvel", ObjRef(type="joint", name="knee"), None),
    ("s_jafrc", "jointactuatorfrc", ObjRef(type="joint", name="hip"), None),
    ("s_apos", "actuatorpos", ObjRef(type="actuator", name="hip_act"), None),
    ("s_avel", "actuatorvel", ObjRef(type="actuator", name="hip_act"), None),
    ("s_afrc", "actuatorfrc", ObjRef(type="actuator", name="hip_act"), None),
    ("s_fpos", "framepos", ObjRef(type="site", name="legtip"), None),
    ("s_fpos_ref", "framepos", ObjRef(type="site", name="legtip"),
     ObjRef(type="site", name="imu")),
    ("s_fquat", "framequat", ObjRef(type="body", name="leg"), None),
    ("s_fquat_ref", "framequat", ObjRef(type="body", name="leg"),
     ObjRef(type="site", name="imu")),
    ("s_fx", "framexaxis", ObjRef(type="site", name="imu"), None),
    ("s_fy", "frameyaxis", ObjRef(type="site", name="imu"), None),
    ("s_fz", "framezaxis", ObjRef(type="site", name="imu"), None),
    ("s_fz_ref", "framezaxis", ObjRef(type="site", name="legtip"),
     ObjRef(type="site", name="imu")),
    ("s_flv", "framelinvel", ObjRef(type="site", name="legtip"), None),
    ("s_fav", "frameangvel", ObjRef(type="site", name="legtip"), None),
    ("s_flv_ref", "framelinvel", ObjRef(type="site", name="legtip"),
     ObjRef(type="site", name="imu")),
    ("s_fav_ref", "frameangvel", ObjRef(type="site", name="legtip"),
     ObjRef(type="site", name="imu")),
    ("s_fpos_geom", "framepos", ObjRef(type="geom", name="legc"), None),
    ("s_fpos_body", "framepos", ObjRef(type="body", name="leg"), None),
    ("s_fpos_xbody", "framepos", ObjRef(type="xbody", name="leg"), None),
    ("s_stcom", "subtreecom", ObjRef(type="body", name="leg"), None),
    ("s_stlv", "subtreelinvel", ObjRef(type="body", name="leg"), None),
    ("s_stam", "subtreeangmom", ObjRef(type="body", name="base"), None),
    ("s_epot", "e_potential", None, None),
    ("s_ekin", "e_kinetic", None, None),
    ("s_clock", "clock", None, None),
    # acceleration-stage sensors (need rne-post)
    ("s_acc", "accelerometer", ObjRef(type="site", name="imu"), None),
    ("s_force", "force", ObjRef(type="site", name="imu"), None),
    ("s_torque", "torque", ObjRef(type="site", name="imu"), None),
    ("s_fla", "framelinacc", ObjRef(type="site", name="legtip"), None),
    ("s_faa", "frameangacc", ObjRef(type="site", name="legtip"), None),
]


@pytest.mark.parametrize("name,stype,obj,ref", CASES, ids=[c[0] for c in CASES])
def test_sensor_matches_mujoco(setup, name, stype, obj, ref):
    mj, m, dB, ctx, sensordata = setup
    got = _make(mj, ctx, stype, obj, ref)
    want = _expected(mj, sensordata, name)
    scale = max(1.0, np.abs(want).max())
    err = np.abs(got - want).max() / scale
    assert err < 5e-6, f"{name}: max rel err {err:.3e}\n got={got}\nwant={want}"


def test_jointlimitfrc(setup):
    """Separate looser check: limit force depends on the solver's efc_force
    which matches mj to solver tolerance, not machine precision."""
    mj, m, dB, ctx, sensordata = setup
    got = _make(mj, ctx, "jointlimitfrc", ObjRef(type="joint", name="knee"))
    want = _expected(mj, sensordata, "s_jlfrc")
    assert np.abs(got - want).max() < 5e-4, (got, want)


def test_cutoff_clips(setup):
    mj, m, dB, ctx, _ = setup
    cfg = BuiltinSensorCfg(
        sensor_type="framepos", obj=ObjRef(type="site", name="legtip"),
        cutoff=0.01,
    )
    s = BuiltinSensor(cfg, scene=None)
    s.initialize(mj, E, None, ctx)
    assert np.abs(np.asarray(s.data)).max() <= 0.01 + 1e-12
