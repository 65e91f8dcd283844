"""Spec-editing helpers (reference tests/test_spec_utils.py,
test_spec_config.py): actuator creation semantics and CollisionCfg regex
editing on tiny inline MJCF."""

import mujoco
import numpy as np

from mjlab_tpu.utils.spec import (
    create_motor_actuator,
    create_position_actuator,
    create_velocity_actuator,
)
from mjlab_tpu.utils.spec_config import CollisionCfg

_XML = """
<mujoco>
  <worldbody>
    <body name="b1">
      <joint name="j1" type="hinge" axis="0 0 1" range="-1 1"/>
      <geom name="g_foot" type="sphere" size="0.05"/>
      <body name="b2">
        <joint name="j2" type="slide" axis="1 0 0"/>
        <geom name="g_knee" type="sphere" size="0.05"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def _spec():
    return mujoco.MjSpec.from_string(_XML)


def test_position_actuator_affine_pd():
    spec = _spec()
    create_position_actuator(
        spec, "j1", stiffness=50.0, damping=3.0, effort_limit=20.0
    )
    model = spec.compile()
    assert model.nu == 1
    # gainprm kp; biasprm [0, -kp, -kd]: PD inside the implicit solver
    np.testing.assert_allclose(model.actuator_gainprm[0, 0], 50.0)
    np.testing.assert_allclose(model.actuator_biasprm[0, 1], -50.0)
    np.testing.assert_allclose(model.actuator_biasprm[0, 2], -3.0)
    # ctrl unlimited (policies command setpoints beyond joint range),
    # force limited
    assert not model.actuator_ctrllimited[0]
    assert model.actuator_forcelimited[0]
    np.testing.assert_allclose(model.actuator_forcerange[0], [-20.0, 20.0])


def test_motor_actuator_limits_and_joint_props():
    spec = _spec()
    create_motor_actuator(
        spec, "j2", effort_limit=7.0, armature=0.01, frictionloss=0.2
    )
    model = spec.compile()
    np.testing.assert_allclose(model.actuator_ctrlrange[0], [-7.0, 7.0])
    j2 = model.joint("j2")
    np.testing.assert_allclose(model.dof_armature[j2.dofadr[0]], 0.01)
    np.testing.assert_allclose(model.dof_frictionloss[j2.dofadr[0]], 0.2)


def test_velocity_actuator():
    spec = _spec()
    create_velocity_actuator(spec, "j1", damping=4.0)
    model = spec.compile()
    np.testing.assert_allclose(model.actuator_gainprm[0, 0], 4.0)
    np.testing.assert_allclose(model.actuator_biasprm[0, 2], -4.0)
    # ctrlrange inherited from joint range
    assert model.actuator_ctrllimited[0]
    np.testing.assert_allclose(model.actuator_ctrlrange[0], [-1.0, 1.0])


def test_collision_cfg_regex_and_disable():
    spec = _spec()
    CollisionCfg(
        geom_names_expr=(".*_foot",),
        condim=3,
        priority=1,
        friction={".*_foot": (0.9,)},
    ).edit_spec(spec)
    model = spec.compile()
    foot = model.geom("g_foot")
    knee = model.geom("g_knee")
    assert foot.contype[0] == 1 and foot.condim[0] == 3 and foot.priority[0] == 1
    np.testing.assert_allclose(model.geom_friction[foot.id, 0], 0.9)
    # non-matching geom has collisions disabled
    assert knee.contype[0] == 0 and knee.conaffinity[0] == 0


def test_collision_cfg_dict_resolution_keeps_default():
    spec = _spec()
    CollisionCfg(
        geom_names_expr=(".*",),
        contype={"g_foot": 2},  # g_knee falls back to default 1
    ).edit_spec(spec)
    model = spec.compile()
    assert model.geom("g_foot").contype[0] == 2
    assert model.geom("g_knee").contype[0] == 1


# ---- visual element cfgs (reference tests/test_spec_config.py:160-224) ----


def test_texture_cfg():
    from mjlab_tpu.utils.spec_config import TextureCfg

    spec = mujoco.MjSpec()
    TextureCfg(
        name="test_texture", type="2d", builtin="checker",
        rgb1=(1.0, 0.0, 0.0), rgb2=(0.0, 1.0, 0.0), width=64, height=64,
    ).edit_spec(spec)
    tex = spec.texture("test_texture")
    assert tex.name == "test_texture"
    assert tex.width == 64 and tex.height == 64
    np.testing.assert_allclose(tex.rgb1, (1.0, 0.0, 0.0))


def test_material_cfg():
    from mjlab_tpu.utils.spec_config import MaterialCfg, TextureCfg

    spec = mujoco.MjSpec()
    TextureCfg(name="t").edit_spec(spec)
    MaterialCfg(
        name="test_material", texture="t", texrepeat=(2, 2), reflectance=0.5,
    ).edit_spec(spec)
    mat = spec.material("test_material")
    assert mat.name == "test_material"
    assert mat.reflectance == 0.5
    np.testing.assert_allclose(mat.texrepeat, (2, 2))


def test_light_cfg():
    from mjlab_tpu.utils.spec_config import LightCfg

    spec = mujoco.MjSpec()
    LightCfg(
        name="test_light", body="world", pos=(1.0, 2.0, 3.0),
        dir=(0.0, 0.0, -1.0),
    ).edit_spec(spec)
    light = spec.light("test_light")
    assert light.name == "test_light"
    np.testing.assert_allclose(light.pos, (1.0, 2.0, 3.0))


def test_camera_cfg():
    from mjlab_tpu.utils.spec_config import CameraCfg

    spec = mujoco.MjSpec()
    CameraCfg(
        name="test_camera", body="world", fovy=60.0, pos=(0.0, 0.0, 5.0),
    ).edit_spec(spec)
    cam = spec.camera("test_camera")
    assert cam.name == "test_camera"
    assert cam.fovy == 60.0


# ---- asset zoo compiles (reference tests/test_asset_zoo.py) ----


def test_asset_zoo_robots_compile():
    from mjlab_tpu.asset_zoo.robots import get_g1_robot_cfg, get_go1_robot_cfg
    from mjlab_tpu.asset_zoo.robots.i2rt_yam.yam_constants import (
        get_yam_robot_cfg,
    )
    from mjlab_tpu.entity import Entity

    for cfg_fn in (get_g1_robot_cfg, get_go1_robot_cfg, get_yam_robot_cfg):
        model = Entity(cfg_fn()).spec.compile()
        assert isinstance(model, mujoco.MjModel)
        assert model.nq > 0
