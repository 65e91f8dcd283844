"""Live per-term reward plot for the web viewer.

Counterpart of the reference's viser reward plotter
(/root/reference/src/mjlab/viewer/viser/reward_plotter.py:10): maintains a
rolling window of per-term reward values for the selected env and renders
them as a plotly line figure in the viser GUI. The history/layout logic is
pure Python (testable without viser); only `attach` touches the GUI.
"""

from __future__ import annotations

from collections import deque


class RewardPlotter:
    def __init__(self, term_names: list[str], window: int = 300):
        self.term_names = list(term_names)
        self.window = window
        self._t = deque(maxlen=window)
        self._hist = {n: deque(maxlen=window) for n in self.term_names}
        self._step = 0
        self._handle = None
        self._gui = None

    def record(self, term_values: dict[str, float]) -> None:
        self._step += 1
        self._t.append(self._step)
        for n in self.term_names:
            self._hist[n].append(float(term_values.get(n, 0.0)))

    def reset(self) -> None:
        self._t.clear()
        for h in self._hist.values():
            h.clear()

    def series(self) -> dict[str, tuple[list, list]]:
        t = list(self._t)
        return {n: (t, list(self._hist[n])) for n in self.term_names}

    # -- viser integration --------------------------------------------------

    def attach(self, gui) -> None:
        """Create the plot inside a viser GUI folder (requires plotly)."""
        self._gui = gui

    def push(self) -> None:
        """Refresh the figure (no-op when plotly or the GUI is absent)."""
        if self._gui is None or not self._t:
            return
        try:
            import plotly.graph_objects as go
        except ImportError:
            return
        fig = go.Figure()
        for name, (t, v) in self.series().items():
            fig.add_trace(go.Scatter(x=t, y=v, mode="lines", name=name))
        fig.update_layout(
            margin=dict(l=10, r=10, t=10, b=10), height=260,
            legend=dict(font=dict(size=9)),
        )
        if self._handle is None:
            self._handle = self._gui.add_plotly(figure=fig, aspect=1.6)
        else:
            self._handle.figure = fig
