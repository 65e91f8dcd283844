"""Tensorboard logging: in-repo event writer vs TensorBoard's own reader.

The runner's `logger: "tensorboard"` option (reference rl/config.py:85-90)
writes scalar events either through torch's SummaryWriter or through the
dependency-free rl/tb_writer.py. This gate round-trips the in-repo writer
through tensorboard's EventFileLoader so the format claim doesn't rest on
self-agreement (advisor r2 pattern for the ONNX writer)."""

import glob
import os

import pytest

from mjlab_tpu.rl.tb_writer import SummaryWriter, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_events_readable_by_tensorboard(tmp_path):
    tb = pytest.importorskip("tensorboard")  # noqa: F841
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    d = str(tmp_path / "run")
    w = SummaryWriter(d)
    w.add_scalar("train/mean_reward", 1.25, 3)
    w.add_scalars_dict({"loss/value": 0.5, "loss/surrogate": -0.125}, 4)
    w.close()

    files = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert len(files) == 1
    got = {}
    for ev in EventFileLoader(files[0]).Load():
        for v in getattr(ev.summary, "value", []):
            # the loader's data-compat pass migrates simple_value into a
            # scalar tensor; accept either representation
            if v.HasField("tensor"):
                got[(v.tag, ev.step)] = v.tensor.float_val[0]
            else:
                got[(v.tag, ev.step)] = v.simple_value
    assert got[("train/mean_reward", 3)] == 1.25
    assert got[("loss/value", 4)] == 0.5
    assert got[("loss/surrogate", 4)] == -0.125


def test_runner_tensorboard_logger_writes_events(tmp_path):
    """The runner path: logger='tensorboard' produces a readable event file
    without wandb or network access."""
    from mjlab_tpu.rl.runner import OnPolicyRunner

    r = OnPolicyRunner.__new__(OnPolicyRunner)  # logging only, no env
    from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg

    r.cfg = RslRlOnPolicyRunnerCfg(logger="tensorboard")
    r.log_dir = str(tmp_path / "tb")
    r.iteration = 7
    r._writer = None
    r._log({"train/mean_reward": 2.0}, steps_per_sec=1234.0)
    files = glob.glob(os.path.join(r.log_dir, "**", "events.out.tfevents.*"),
                      recursive=True)
    assert files, "tensorboard logger produced no event file"
