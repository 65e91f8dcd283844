"""Regex name resolution (reference tests/test_spec_utils.py style)."""

import pytest

from mjlab_tpu.utils.string import (
    resolve_matching_names,
    resolve_matching_names_values,
)

NAMES = ["hip_l", "hip_r", "knee_l", "knee_r", "ankle"]


def test_order_follows_names():
    ids, matched = resolve_matching_names(["knee_.*", "hip_.*"], NAMES)
    assert matched == ["hip_l", "hip_r", "knee_l", "knee_r"]
    assert ids == [0, 1, 2, 3]


def test_preserve_order():
    ids, matched = resolve_matching_names(
        ["knee_.*", "hip_.*"], NAMES, preserve_order=True
    )
    assert matched == ["knee_l", "knee_r", "hip_l", "hip_r"]


def test_unmatched_raises():
    with pytest.raises(ValueError):
        resolve_matching_names(["elbow"], NAMES)


def test_values_resolution():
    ids, matched, values = resolve_matching_names_values(
        {"hip_.*": 1.0, "ankle": 2.0}, NAMES
    )
    assert matched == ["hip_l", "hip_r", "ankle"]
    assert values == [1.0, 1.0, 2.0]


def test_values_conflict_raises():
    with pytest.raises(ValueError):
        resolve_matching_names_values({"hip_.*": 1.0, "hip_l": 2.0}, NAMES)
