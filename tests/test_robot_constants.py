"""Robot asset-zoo constants (reference tests/test_g1_constants.py,
test_go1_constants.py): armature derivations, actuator gains landing in
the compiled model, keyframes, action scales."""

import re

import mujoco
import numpy as np
import pytest

from mjlab_tpu.asset_zoo.robots.unitree_g1 import g1_constants as g1
from mjlab_tpu.asset_zoo.robots.unitree_go1 import go1_constants as go1
from mjlab_tpu.utils.actuator import reflected_inertia_from_two_stage_planetary


@pytest.fixture(scope="module")
def g1_entity():
    return g1.get_g1_robot_cfg().build()


@pytest.fixture(scope="module")
def g1_model(g1_entity):
    return g1_entity.spec.compile()


def test_g1_armature_derivation():
    # two-stage planetary reflected inertia is monotone in rotor inertia
    # (stage gear ratios start at 1: rotor, stage1, stage2)
    a = reflected_inertia_from_two_stage_planetary((1e-5, 1e-5, 1e-5), (1.0, 2.0, 3.0))
    b = reflected_inertia_from_two_stage_planetary((2e-5, 2e-5, 2e-5), (1.0, 2.0, 3.0))
    assert b > a > 0
    assert g1.ARMATURE_7520_22 > g1.ARMATURE_5020 > 0


def _check_gains(model, acfg, stiffness, damping):
    matched = 0
    for i in range(model.nu):
        name = model.actuator(i).name
        short = name.split("/")[-1]
        if any(re.fullmatch(p, short) for p in acfg.joint_names_expr):
            a = model.actuator(i)
            np.testing.assert_allclose(a.gainprm[0], stiffness, rtol=1e-6)
            np.testing.assert_allclose(a.biasprm[1], -stiffness, rtol=1e-6)
            np.testing.assert_allclose(a.biasprm[2], -damping, rtol=1e-6)
            np.testing.assert_allclose(
                a.forcerange, [-acfg.effort_limit, acfg.effort_limit], rtol=1e-6
            )
            matched += 1
    assert matched > 0, acfg.joint_names_expr


def test_g1_actuator_gains_in_model(g1_model):
    for acfg, kp, kd in [
        (g1.G1_ACTUATOR_5020, g1.STIFFNESS_5020, g1.DAMPING_5020),
        (g1.G1_ACTUATOR_7520_14, g1.STIFFNESS_7520_14, g1.DAMPING_7520_14),
        (g1.G1_ACTUATOR_7520_22, g1.STIFFNESS_7520_22, g1.DAMPING_7520_22),
        (g1.G1_ACTUATOR_4010, g1.STIFFNESS_4010, g1.DAMPING_4010),
    ]:
        _check_gains(g1_model, acfg, kp, kd)


def test_g1_keyframe(g1_model):
    data = mujoco.MjData(g1_model)
    mujoco.mj_resetDataKeyframe(g1_model, data, 0)
    np.testing.assert_array_equal(data.qpos[:3], g1.KNEES_BENT_KEYFRAME.pos)
    np.testing.assert_array_equal(data.qpos[3:7], g1.KNEES_BENT_KEYFRAME.rot)


def test_g1_action_scale():
    # 0.25 * effort / stiffness per joint class (reference
    # g1_constants.py:287-295)
    assert g1.G1_ACTION_SCALE
    for name, val in g1.G1_ACTION_SCALE.items():
        assert 0.0 < val < 10.0, (name, val)


def test_g1_compiles_and_is_floating_base(g1_model):
    assert g1_model.njnt > 0
    assert g1_model.jnt_type[0] == mujoco.mjtJoint.mjJNT_FREE
    assert g1_model.nu == 29  # 29 actuated joints


def test_go1_model_compiles():
    model = go1.get_go1_robot_cfg().build().spec.compile()
    assert model.nu == 12
    assert model.jnt_type[0] == mujoco.mjtJoint.mjJNT_FREE
    for i in range(model.nu):
        assert model.actuator(i).gainprm[0] > 0
