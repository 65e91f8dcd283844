"""Web-based play viewer over viser
(reference src/mjlab/viewer/viser/viewer.py:19 + scene.py:76).

viser is an optional host-side dependency; when present this serves an
interactive web scene with play/pause/speed/env-selection controls,
per-body MESH rendering (incl. robot visual meshes, merged per body),
contact point/force arrows decoded from the engine state, per-term reward
live plots and debug-visualizer annotations. When absent, construction
raises with install instructions (the rest of the framework never imports
this module implicitly).
"""

from __future__ import annotations

import numpy as np

import mujoco

from mjlab_tpu.viewer.base import BaseViewer
from mjlab_tpu.viewer.viser.reward_plotter import RewardPlotter
from mjlab_tpu.viewer.viser.scene import ViserMujocoScene


def _require_viser():
    try:
        import viser  # noqa: F401

        return viser
    except ImportError as e:
        raise RuntimeError(
            "the web viewer needs the optional 'viser' package "
            "(pip install viser)"
        ) from e


class ViserPlayViewer(BaseViewer):
    def __init__(self, env, policy, frame_rate: float = 50.0, env_idx: int = 0):
        super().__init__(env, policy, frame_rate)
        self.env_idx = env_idx
        self.mj_model = env.mj_model
        self._server = None
        self.scene: ViserMujocoScene | None = None
        self._plotter: RewardPlotter | None = None

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
        self._show_contacts = gui.add_checkbox("contact forces", True)
        self.scene = ViserMujocoScene(
            server=self._server,
            mj_model=self.mj_model,
            num_envs=self.env.num_envs,
        )
        terms = list(getattr(self.env.reward_manager, "active_terms", []))
        if terms:
            self._plotter = RewardPlotter(terms)
            with gui.add_folder("rewards"):
                self._plotter.attach(gui)

    def sync_env_to_viewer(self) -> None:
        self.env_idx = int(self._env_sel.value)
        self.set_speed(float(self._speed.value))
        state = self.env._state
        d = state.data
        e = self.env_idx
        xpos = np.asarray(d.xpos[e])
        xquat = np.asarray(d.xquat[e])
        self.scene.update_body_poses(xpos, xquat)

        self.scene.show_contact_points = bool(self._show_contacts.value)
        self.scene.show_contact_forces = bool(self._show_contacts.value)
        contacts = ViserMujocoScene.contacts_from_data(
            self.env.sim.model, d, e
        )
        self.scene.update_contacts(contacts)

        if self._plotter is not None:
            vals = getattr(self.env.ctx, "reward_step_values", {})
            if vals:
                self._plotter.record(
                    {k: float(np.asarray(v)[e]) for k, v in vals.items()}
                )
                self._plotter.push()

    def teardown(self) -> None:
        if self._server is not None:
            self._server.stop()
