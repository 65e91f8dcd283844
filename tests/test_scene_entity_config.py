"""SceneEntityCfg regex resolution into static indices (reference
tests/test_scene_entity_config.py): name patterns -> ids, slice
optimization for all-match, preserve_order."""

import numpy as np
import pytest

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg


class _FakeEntity:
    joint_names = ["hip", "knee", "ankle"]
    body_names = ["base", "thigh", "shin", "foot"]
    geom_names = ["g0", "g1"]
    site_names = []
    actuator_joint_names = ["hip", "knee", "ankle"]

    def _find(self, names, pool, preserve_order=False):
        from mjlab_tpu.utils.string import resolve_matching_names

        return resolve_matching_names(names, pool, preserve_order)

    def find_joints(self, names, preserve_order=False):
        return self._find(names, self.joint_names, preserve_order)

    def find_bodies(self, names, preserve_order=False):
        return self._find(names, self.body_names, preserve_order)

    def find_geoms(self, names, preserve_order=False):
        return self._find(names, self.geom_names, preserve_order)

    def find_sites(self, names, preserve_order=False):
        return self._find(names, self.site_names, preserve_order)

    def find_actuators(self, names, preserve_order=False):
        return self._find(names, self.actuator_joint_names, preserve_order)


class _FakeScene(dict):
    pass


def _scene():
    s = _FakeScene()
    s["robot"] = _FakeEntity()
    return s


def test_regex_resolves_to_indices():
    cfg = SceneEntityCfg("robot", joint_names=("knee", "ankle"))
    cfg.resolve(_scene())
    np.testing.assert_array_equal(np.asarray(cfg.joint_ids), [1, 2])
    assert cfg.joint_names == ("knee", "ankle")


def test_full_match_becomes_slice():
    cfg = SceneEntityCfg("robot", joint_names=(".*",))
    cfg.resolve(_scene())
    assert cfg.joint_ids == slice(None)  # fast-path: no gather needed


def test_body_regex():
    cfg = SceneEntityCfg("robot", body_names=("thigh", "shin"))
    cfg.resolve(_scene())
    np.testing.assert_array_equal(np.asarray(cfg.body_ids), [1, 2])


def test_preserve_order():
    cfg = SceneEntityCfg(
        "robot", joint_names=("ankle", "hip"), preserve_order=True
    )
    cfg.resolve(_scene())
    np.testing.assert_array_equal(np.asarray(cfg.joint_ids), [2, 0])
    assert cfg.joint_names == ("ankle", "hip")


def test_unresolved_defaults_to_full_slice():
    cfg = SceneEntityCfg("robot")
    cfg.resolve(_scene())
    assert cfg.joint_ids == slice(None)
    assert cfg.geom_ids == slice(None)
