"""Per-term reward live-plot figures for the native viewer.

Data layer of the reference's native reward plots
(/root/reference/src/mjlab/viewer/native/viewer.py:337-397): one
mjvFigure per reward term with a rolling history ring, percentile-based
y autoscaling and a right-edge column viewport layout. mjvFigure is pure
data, so everything here runs headless (tested in
tests/test_native_reward_plots.py); the GL blit happens in the viewer's
render loop via mjr_figure when a window exists.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import mujoco
import numpy as np


@dataclass
class RewardPlotCfg:
    history: int = 200
    grid_size: tuple = (2, 3)
    init_yrange: tuple = (-0.05, 0.05)
    background_alpha: float = 0.5
    p_lo: float = 5.0
    p_hi: float = 95.0
    pad: float = 0.15
    min_span: float = 1e-3
    column_frac: float = 0.22  # fraction of window width for the plots
    plot_height_px: int = 150


def make_empty_figure(
    title: str, cfg: RewardPlotCfg
) -> mujoco.MjvFigure:
    fig = mujoco.MjvFigure()
    mujoco.mjv_defaultFigure(fig)
    fig.title = title.encode() if isinstance(title, str) else title
    fig.flg_ticklabel[0] = 0
    fig.flg_ticklabel[1] = 1
    fig.gridsize[0] = cfg.grid_size[0]
    fig.gridsize[1] = cfg.grid_size[1]
    fig.range[0][0] = -float(cfg.history)
    fig.range[0][1] = 0.0
    fig.range[1][0] = float(cfg.init_yrange[0])
    fig.range[1][1] = float(cfg.init_yrange[1])
    fig.figurergba[3] = cfg.background_alpha
    fig.linergb[0] = (0.1, 0.8, 0.4)
    return fig


@dataclass
class RewardPlots:
    term_names: list
    cfg: RewardPlotCfg = field(default_factory=RewardPlotCfg)

    def __post_init__(self):
        self.figures = {
            n: make_empty_figure(n, self.cfg) for n in self.term_names
        }
        self.histories = {
            n: deque(maxlen=self.cfg.history) for n in self.term_names
        }

    def record(self, term_values: dict) -> None:
        for n in self.term_names:
            v = float(term_values.get(n, np.nan))
            if np.isfinite(v):
                self.histories[n].append(v)
        self._write_all()

    def clear(self) -> None:
        for n in self.term_names:
            self.histories[n].clear()
            fig = self.figures[n]
            fig.linepnt[0] = 0
            fig.range[1][0] = float(self.cfg.init_yrange[0])
            fig.range[1][1] = float(self.cfg.init_yrange[1])

    def _write_all(self) -> None:
        for n in self.term_names:
            self._write_history_to_figure(n)

    def _write_history_to_figure(self, name: str) -> None:
        fig = self.figures[name]
        hist = self.histories[name]
        n = min(len(hist), self.cfg.history)
        fig.linepnt[0] = n
        for i in range(n):
            fig.linedata[0][2 * i] = float(-i)
            fig.linedata[0][2 * i + 1] = float(hist[-1 - i])
        if n >= 5:
            data = np.fromiter(hist, dtype=float, count=len(hist))[-n:]
            lo = float(np.percentile(data, self.cfg.p_lo))
            hi = float(np.percentile(data, self.cfg.p_hi))
            span = max(hi - lo, self.cfg.min_span)
            lo -= self.cfg.pad * span
            hi += self.cfg.pad * span
        elif n >= 1:
            v = float(hist[-1])
            span = max(abs(v), 1e-3)
            lo, hi = v - span, v + span
        else:
            lo, hi = self.cfg.init_yrange
        fig.range[1][0] = float(lo)
        fig.range[1][1] = float(hi)

    def viewports(self, width: int, height: int) -> list:
        """(name, mjrRect) column layout down the right edge."""
        col_w = int(width * self.cfg.column_frac)
        h = min(self.cfg.plot_height_px, max(height // max(len(self.term_names), 1), 40))
        out = []
        x = width - col_w
        y = height - h
        for n in self.term_names:
            if y < 0:
                break
            out.append((n, mujoco.MjrRect(x, y, col_w, h)))
            y -= h
        return out

    def render(self, ctx, width: int, height: int) -> None:
        """Blit every figure (requires a live mjrContext)."""
        for name, rect in self.viewports(width, height):
            mujoco.mjr_figure(rect, self.figures[name], ctx)
