"""Entity regex find_* APIs (reference tests/test_entity.py): joints,
bodies, geoms resolution with regex and ordering."""

import mujoco
import pytest

from mjlab_tpu.entity.entity import EntityCfg


def _spec():
    return mujoco.MjSpec.from_string(
        """
<mujoco>
  <worldbody>
    <body name="torso" pos="0 0 1">
      <freejoint name="root"/>
      <geom name="torso_collision" type="sphere" size="0.1"/>
      <body name="left_leg">
        <joint name="left_hip" type="hinge" axis="0 1 0"/>
        <geom name="left_leg_collision" type="capsule" size="0.03"
              fromto="0 0 0 0 0 -0.3"/>
        <site name="left_foot"/>
      </body>
      <body name="right_leg">
        <joint name="right_hip" type="hinge" axis="0 1 0"/>
        <geom name="right_leg_collision" type="capsule" size="0.03"
              fromto="0 0 0 0 0 -0.3"/>
        <site name="right_foot"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""
    )


@pytest.fixture(scope="module")
def entity():
    return EntityCfg(spec_fn=_spec).build()


def test_properties(entity):
    assert not entity.is_fixed_base
    assert entity.is_articulated
    assert entity.joint_names == ["left_hip", "right_hip"]


def test_find_joints_regex(entity):
    ids, names = entity.find_joints([".*_hip"])
    assert names == ["left_hip", "right_hip"]
    assert ids == [0, 1]
    ids, names = entity.find_joints(["right_.*"])
    assert names == ["right_hip"] and ids == [1]


def test_find_bodies(entity):
    ids, names = entity.find_bodies([".*_leg"])
    assert set(names) == {"left_leg", "right_leg"}


def test_find_geoms_and_sites(entity):
    _, names = entity.find_geoms([".*_collision"])
    assert len(names) == 3
    _, names = entity.find_sites([".*_foot"])
    assert set(names) == {"left_foot", "right_foot"}


def test_no_match_raises(entity):
    # reference lab_api string resolution also raises when an expression
    # matches nothing (catches task-cfg typos at construction time)
    with pytest.raises(ValueError):
        entity.find_joints(["elbow.*"])
