"""Video recorder env wrapper
(reference src/mjlab/utils/wrappers/video_recorder.py:15-206).

Records env 0 via the offscreen renderer on a step/episode trigger and
encodes with ffmpeg (mp4) when available, else PIL (gif). Requires a
MuJoCo GL backend; without one, construction raises (the train script
catches and disables video).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

from mjlab_tpu.viewer.offscreen_renderer import OffscreenRenderer


class VideoRecorder:
    def __init__(
        self,
        env,
        video_folder: str,
        step_trigger=None,
        video_length: int = 200,
        fps: int | None = None,
        name_prefix: str = "rl-video",
    ):
        self.env = env
        self.video_folder = video_folder
        self.step_trigger = step_trigger or (lambda step: step % 2000 == 0)
        self.video_length = video_length
        self.name_prefix = name_prefix
        self.fps = fps or int(round(1.0 / env.step_dt))
        os.makedirs(video_folder, exist_ok=True)
        self._renderer = OffscreenRenderer(env.mj_model, env.cfg.viewer)
        self._frames: list[np.ndarray] = []
        self._recording = False
        self._record_start = 0
        self._step = 0

    # -- env interface passthrough --

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, *a, **k):
        return self.env.reset(*a, **k)

    def step(self, action):
        out = self.env.step(action)
        if not self._recording and self.step_trigger(self._step):
            self._recording = True
            self._record_start = self._step
            self._frames = []
        if self._recording:
            self._frames.append(self._renderer.render(self.env))
            if len(self._frames) >= self.video_length:
                self._flush()
        self._step += 1
        return out

    def _flush(self):
        if not self._frames:
            return
        stem = os.path.join(
            self.video_folder, f"{self.name_prefix}-step-{self._record_start}"
        )
        frames = self._frames
        self._frames = []
        self._recording = False
        if shutil.which("ffmpeg"):
            self._encode_mp4(stem + ".mp4", frames)
        else:
            self._encode_gif(stem + ".gif", frames)

    def _encode_mp4(self, path: str, frames):
        h, w = frames[0].shape[:2]
        cmd = [
            "ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
            "-s", f"{w}x{h}", "-r", str(self.fps), "-i", "-",
            "-c:v", "libx264", "-pix_fmt", "yuv420p", path,
        ]
        proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for f in frames:
            proc.stdin.write(np.ascontiguousarray(f).tobytes())
        proc.stdin.close()
        proc.wait()

    def _encode_gif(self, path: str, frames):
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            path, save_all=True, append_images=imgs[1:],
            duration=int(1000 / self.fps), loop=0,
        )

    def close(self):
        self._flush()
        self._renderer.close()
        self.env.close()


def encode_video(frames, path: str, fps: int) -> str:
    """Standalone frame-list encoder: mp4 via ffmpeg when available, else
    animated gif via PIL (same pipeline the VideoRecorder uses). Returns
    the path actually written."""
    if not frames:
        raise ValueError("no frames to encode")
    if shutil.which("ffmpeg"):
        h, w = frames[0].shape[:2]
        cmd = [
            "ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
            "-s", f"{w}x{h}", "-r", str(fps), "-i", "-",
            "-c:v", "libx264", "-pix_fmt", "yuv420p", path,
        ]
        proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for f in frames:
            proc.stdin.write(np.ascontiguousarray(f).tobytes())
        proc.stdin.close()
        proc.wait()
        return path
    from PIL import Image

    if not path.endswith(".gif"):
        path = os.path.splitext(path)[0] + ".gif"
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
    return path
