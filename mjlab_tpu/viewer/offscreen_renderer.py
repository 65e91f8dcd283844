"""Offscreen RGB renderer for video capture
(reference src/mjlab/viewer/offscreen_renderer.py:15-155).

Renders env 0's state through mujoco.Renderer. Requires a GL backend
(EGL/OSMesa); constructing without one raises a clear error so headless
CI simply skips video.
"""

from __future__ import annotations

import numpy as np

import mujoco


class OffscreenRenderer:
    def __init__(self, mj_model: mujoco.MjModel, viewer_cfg, env_idx: int = 0):
        self.cfg = viewer_cfg
        self.env_idx = env_idx
        self.mj_model = mj_model
        self.mj_data = mujoco.MjData(mj_model)
        try:
            self._renderer = mujoco.Renderer(
                mj_model, height=viewer_cfg.height, width=viewer_cfg.width
            )
        except Exception as e:  # no GL backend available
            raise RuntimeError(
                "offscreen rendering needs a MuJoCo GL backend (set "
                "MUJOCO_GL=egl or osmesa with the libraries installed): "
                f"{e}"
            ) from e
        self._camera = mujoco.MjvCamera()
        self._camera.distance = viewer_cfg.distance
        self._camera.azimuth = viewer_cfg.azimuth
        self._camera.elevation = viewer_cfg.elevation

    def _sync_from_env(self, env) -> None:
        """Copy env state (device) for env_idx into the host MjData."""
        state = env._state
        self.mj_data.qpos[:] = np.asarray(state.data.qpos[self.env_idx])
        self.mj_data.qvel[:] = np.asarray(state.data.qvel[self.env_idx])
        if self.mj_model.nmocap:
            self.mj_data.mocap_pos[:] = np.asarray(
                state.data.mocap_pos[self.env_idx]
            )
            self.mj_data.mocap_quat[:] = np.asarray(
                state.data.mocap_quat[self.env_idx]
            )
        mujoco.mj_forward(self.mj_model, self.mj_data)

    def _update_camera(self, env) -> None:
        if self.cfg.origin_type == "asset_body" and self.cfg.asset_name:
            robot = env.scene[self.cfg.asset_name]
            root = np.asarray(robot.data.root_link_pos_w[self.env_idx])
            self._camera.lookat[:] = root
        elif self.cfg.origin_type == "asset_root" and self.cfg.asset_name:
            robot = env.scene[self.cfg.asset_name]
            self._camera.lookat[:] = np.asarray(
                robot.data.root_link_pos_w[self.env_idx]
            )

    def render(self, env) -> np.ndarray:
        self._sync_from_env(env)
        self._update_camera(env)
        self._renderer.update_scene(self.mj_data, camera=self._camera)
        return self._renderer.render()

    def close(self):
        self._renderer.close()
