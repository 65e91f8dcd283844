"""XmlActuator: adopt actuators already present in the robot XML
(reference tests/test_xml_actuator.py). The YAM arm uses this path."""

import mujoco
import numpy as np
import pytest

from mjlab_tpu.actuator.xml import XmlPositionActuatorCfg
from mjlab_tpu.entity.entity import EntityArticulationInfoCfg, EntityCfg


def _arm_spec():
    return mujoco.MjSpec.from_string(
        """
<mujoco>
  <worldbody>
    <body name="base">
      <joint name="j1" type="hinge" axis="0 0 1" range="-1 1"/>
      <geom name="g1" type="capsule" size="0.02" fromto="0 0 0 0.2 0 0"/>
      <body name="link2" pos="0.2 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="-2 2"/>
        <geom name="g2" type="capsule" size="0.02" fromto="0 0 0 0.2 0 0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position name="j1" joint="j1" kp="40" kv="2"/>
    <position name="j2" joint="j2" kp="30" kv="1.5"/>
  </actuator>
</mujoco>
"""
    )


def test_xml_actuators_adopted_not_duplicated():
    cfg = EntityCfg(
        spec_fn=_arm_spec,
        articulation=EntityArticulationInfoCfg(
            actuators=(
                XmlPositionActuatorCfg(joint_names_expr=("j1", "j2")),
            )
        ),
    )
    entity = cfg.build()
    model = entity.spec.compile()
    # the XML already had the actuators; adopting must not add more
    assert model.nu == 2
    np.testing.assert_allclose(model.actuator_gainprm[0, 0], 40.0)
    np.testing.assert_allclose(model.actuator_gainprm[1, 0], 30.0)


def test_xml_actuator_is_passthrough():
    cfg = EntityCfg(
        spec_fn=_arm_spec,
        articulation=EntityArticulationInfoCfg(
            actuators=(
                XmlPositionActuatorCfg(joint_names_expr=("j1", "j2")),
            )
        ),
    )
    entity = cfg.build()
    act = entity.actuators[0]
    assert act.is_passthrough
    assert act.joint_names == ["j1", "j2"]
