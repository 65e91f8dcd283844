"""Motion retarget pipeline end-to-end (reference scripts/csv_to_npz.py):
synthetic G1 CSV -> interpolation -> FK -> npz with MotionLoader keys,
velocity consistency, and the standalone video encoder."""

import os

import numpy as np
import pytest

from mjlab_tpu.scripts.csv_to_npz import interpolate_motion, run
from mjlab_tpu.utils.wrappers.video_recorder import encode_video


def test_interpolate_motion_resamples():
    T, J = 10, 3
    rng = np.random.default_rng(0)
    frames = np.zeros((T, 7 + J))
    frames[:, 0] = np.linspace(0, 1, T)  # x ramp
    frames[:, 3] = 1.0  # identity quat
    frames[:, 7:] = rng.standard_normal((T, J))
    out, T_out = interpolate_motion(frames, input_fps=30, output_fps=60)
    assert T_out == 19  # (10-1)/30 s * 60 fps + 1
    np.testing.assert_allclose(out[:, 0], np.linspace(0, 1, 19), atol=1e-9)
    np.testing.assert_allclose(
        np.linalg.norm(out[:, 3:7], axis=1), 1.0, atol=1e-9
    )


@pytest.mark.slow
def test_csv_to_npz_g1(tmp_path):
    import mujoco

    from mjlab_tpu.asset_zoo.robots.unitree_g1.g1_constants import (
        get_g1_robot_cfg,
    )
    from mjlab_tpu.entity.entity import Entity

    entity = Entity(get_g1_robot_cfg())
    mj = entity.spec.compile()
    nj = mj.nq - 7
    T = 12
    rng = np.random.default_rng(1)
    rows = np.zeros((T, 7 + nj))
    rows[:, 0] = 0.05 * np.arange(T)  # walk forward
    rows[:, 2] = 0.78
    rows[:, 3] = 1.0
    rows[:, 7:] = 0.1 * rng.standard_normal((T, nj))
    csv = tmp_path / "motion.csv"
    np.savetxt(csv, rows, delimiter=",")

    out = tmp_path / "motion.npz"
    run(str(csv), str(out), input_fps=30, output_fps=50)
    z = np.load(out)
    for key in (
        "fps", "joint_pos", "joint_vel", "body_pos_w", "body_quat_w",
        "body_lin_vel_w", "body_ang_vel_w",
    ):
        assert key in z, key
    assert z["fps"][0] == 50
    Tm = z["joint_pos"].shape[0]
    assert z["body_pos_w"].shape == (Tm, mj.nbody, 3)
    # root body linear velocity ~ the constant forward ramp (0.05*30 = 1.5 m/s)
    root_vx = z["body_lin_vel_w"][2:-2, 1, 0]
    np.testing.assert_allclose(root_vx, 1.5, rtol=0.05)
    # quaternions normalized
    np.testing.assert_allclose(
        np.linalg.norm(z["body_quat_w"], axis=-1), 1.0, atol=1e-5
    )


def test_encode_video_gif_fallback(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", "")  # hide ffmpeg -> PIL gif fallback
    frames = [
        (np.full((32, 48, 3), c, np.uint8)) for c in (0, 128, 255)
    ]
    out = encode_video(frames, str(tmp_path / "v.mp4"), fps=10)
    assert out.endswith(".gif") and os.path.getsize(out) > 0
