"""Debug visualization API (reference src/mjlab/viewer/debug_visualizer.py:
15-167): command terms and tasks draw arrows/ghosts/frames through this
interface; concrete viewers implement it, headless runs get the null sink."""

from __future__ import annotations

import abc


class DebugVisualizer(abc.ABC):
    """Primitive-drawing interface for in-viewer task debug overlays."""

    env_idx: int = 0

    @abc.abstractmethod
    def add_arrow(self, start, end, color=(1, 0, 0, 1), width=0.015, label=""):
        ...

    @abc.abstractmethod
    def add_sphere(self, center, radius, color=(1, 0, 0, 1), label=""):
        ...

    @abc.abstractmethod
    def add_frame(self, pos, quat, scale=0.1, label=""):
        ...

    @abc.abstractmethod
    def add_cylinder(self, start, end, radius, color=(1, 0, 0, 1), label=""):
        ...

    @abc.abstractmethod
    def add_ghost_mesh(self, qpos, color=(0.5, 0.5, 1.0, 0.4), label=""):
        ...

    def clear(self):
        ...


class NullDebugVisualizer(DebugVisualizer):
    """No-op sink for headless execution (reference L136)."""

    def add_arrow(self, *a, **k):
        ...

    def add_sphere(self, *a, **k):
        ...

    def add_frame(self, *a, **k):
        ...

    def add_cylinder(self, *a, **k):
        ...

    def add_ghost_mesh(self, *a, **k):
        ...
