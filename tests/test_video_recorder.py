"""VideoRecorder trigger/encode logic with a mocked offscreen renderer
(no GL backend in CI — reference tests cover the same wrapper logic;
the real render path needs EGL and is exercised manually)."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

import mjlab_tpu.utils.wrappers.video_recorder as vr
from tests.mini_env import E, make_pendulum_env


class _FakeRenderer:
    def __init__(self, mj_model, viewer_cfg, env_idx=0):
        self.count = 0

    def render(self, env):
        self.count += 1
        return np.full((24, 32, 3), self.count % 256, np.uint8)

    def close(self):
        pass


@pytest.mark.slow
def test_video_recorder_triggers_and_encodes(tmp_path, monkeypatch):
    monkeypatch.setattr(vr, "OffscreenRenderer", _FakeRenderer)
    monkeypatch.setenv("PATH", "")  # force the PIL gif path

    env = make_pendulum_env()
    rec = vr.VideoRecorder(
        env,
        video_folder=str(tmp_path),
        step_trigger=lambda step: step == 3,
        video_length=5,
        fps=10,
    )
    a = jnp.zeros((E, 1), jnp.float32)
    for _ in range(12):
        rec.step(a)
    files = glob.glob(str(tmp_path / "*.gif"))
    assert len(files) == 1, files
    assert "step-3" in files[0]
    assert os.path.getsize(files[0]) > 0
    # exactly video_length frames were captured
    assert rec._renderer.count == 5
    # recording stopped after flushing
    assert not rec._recording and rec._frames == []


@pytest.mark.slow
def test_video_recorder_close_flushes_partial(tmp_path, monkeypatch):
    monkeypatch.setattr(vr, "OffscreenRenderer", _FakeRenderer)
    monkeypatch.setenv("PATH", "")

    env = make_pendulum_env()
    rec = vr.VideoRecorder(
        env, video_folder=str(tmp_path),
        step_trigger=lambda step: step == 0, video_length=100, fps=10,
    )
    a = jnp.zeros((E, 1), jnp.float32)
    for _ in range(4):
        rec.step(a)
    rec.close()
    files = glob.glob(str(tmp_path / "*.gif"))
    assert len(files) == 1
    assert rec._renderer.count == 4
