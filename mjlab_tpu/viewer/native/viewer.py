"""Native MuJoCo GLFW viewer (reference src/mjlab/viewer/native/viewer.py:45).

Policy-in-the-loop interactive viewer over mujoco.viewer.launch_passive;
syncs env 0 (or a selected env) from device state into a host MjData each
frame. Key bindings: SPACE pause, BACKSPACE reset, -/= speed.
Requires a display/GLFW; raises a clear error otherwise.
"""

from __future__ import annotations

import numpy as np

import mujoco

from mjlab_tpu.viewer.base import BaseViewer


class NativeMujocoViewer(BaseViewer):
    def __init__(self, env, policy, frame_rate: float = 50.0, env_idx: int = 0,
                 show_reward_plots: bool = True):
        super().__init__(env, policy, frame_rate)
        self.env_idx = env_idx
        self.mj_model = env.mj_model
        self.mj_data = mujoco.MjData(self.mj_model)
        self._handle = None
        # reward live-plot data layer (reference native/viewer.py:337-397);
        # figures update every frame, the blit needs a GL context which
        # launch_passive owns — mjr_figure runs via its user callbacks when
        # supported, otherwise figures stay available for custom loops
        self.reward_plots = None
        if show_reward_plots:
            from mjlab_tpu.viewer.native.reward_plots import RewardPlots

            terms = list(getattr(env.reward_manager, "active_terms", []))
            if terms:
                self.reward_plots = RewardPlots(terms)

    def setup(self) -> None:
        import mujoco.viewer

        try:
            self._handle = mujoco.viewer.launch_passive(
                self.mj_model, self.mj_data, key_callback=self._on_key
            )
        except Exception as e:
            raise RuntimeError(
                f"native viewer needs GLFW + a display: {e}"
            ) from e
        cfg = self.env.cfg.viewer
        with self._handle.lock():
            self._handle.cam.distance = cfg.distance
            self._handle.cam.azimuth = cfg.azimuth
            self._handle.cam.elevation = cfg.elevation

    def _on_key(self, key: int) -> None:
        from mjlab_tpu.viewer.native.keys import BINDINGS

        binding = BINDINGS.get(key)
        if binding is None:
            return
        action, arg = binding
        if action == "toggle_pause":
            self.toggle_pause()
        elif action == "request_reset":
            self.request_reset()
        elif action == "speed_scale":
            self.set_speed(self.speed * arg)
        elif action == "env_delta":
            self.env_idx = int(
                (self.env_idx + arg) % self.env.num_envs
            )
        elif action == "toggle_reward_plots" and self.reward_plots is not None:
            self._show_plots = not getattr(self, "_show_plots", True)

    def is_open(self) -> bool:
        return self._handle is not None and self._handle.is_running()

    def sync_env_to_viewer(self) -> None:
        state = self.env._state
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
        cfg = self.env.cfg.viewer
        if cfg.origin_type == "asset_body" and cfg.asset_name:
            robot = self.env.scene[cfg.asset_name]
            with self._handle.lock():
                self._handle.cam.lookat[:] = np.asarray(
                    robot.data.root_link_pos_w[self.env_idx]
                )
        if self.reward_plots is not None:
            vals = getattr(self.env.ctx, "reward_step_values", {})
            if vals:
                self.reward_plots.record(
                    {
                        k: float(np.asarray(v)[self.env_idx])
                        for k, v in vals.items()
                    }
                )
        self._handle.sync()

    def teardown(self) -> None:
        if self._handle is not None:
            self._handle.close()
