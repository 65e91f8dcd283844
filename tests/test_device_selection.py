"""Device selection helper (reference tests/test_gpu_selection.py analog:
indices resolve against the visible device list; conftest provides 8
virtual CPU devices)."""

import pytest

from mjlab_tpu.utils.device import select_devices


def test_all_devices():
    devs, n = select_devices("all")
    assert n == 8 and len(devs) == 8


def test_subset_indices():
    devs, n = select_devices([0, 3, 5])
    assert n == 3
    assert [d.id for d in devs] == [0, 3, 5]


def test_out_of_range_raises():
    with pytest.raises(ValueError):
        select_devices([0, 99])


def test_cpu_mode():
    devs, n = select_devices(None)
    assert devs is None and n == 0
