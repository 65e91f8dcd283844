"""Native-viewer reward figure data layer (headless: mjvFigure is plain
data). Mirrors the reference's figure/auto-scale/viewport semantics
(/root/reference/src/mjlab/viewer/native/viewer.py:337-397)."""

import numpy as np

from mjlab_tpu.viewer.native.reward_plots import (
    RewardPlotCfg, RewardPlots, make_empty_figure,
)


def test_history_ring_and_figure_points():
    p = RewardPlots(["track", "alive"], RewardPlotCfg(history=16))
    for i in range(40):
        p.record({"track": np.sin(i / 5.0), "alive": 1.0})
    fig = p.figures["track"]
    assert fig.linepnt[0] == 16
    # newest point at x=0, value = last recorded
    assert fig.linedata[0][0] == 0.0
    np.testing.assert_allclose(fig.linedata[0][1], np.sin(39 / 5.0), atol=1e-6)
    # x coordinates descend into the past
    assert fig.linedata[0][2] == -1.0


def test_autoscale_percentiles():
    p = RewardPlots(["r"], RewardPlotCfg(history=100))
    for v in np.linspace(0.0, 1.0, 50):
        p.record({"r": float(v)})
    fig = p.figures["r"]
    lo, hi = fig.range[1]
    assert lo < 0.1 and hi > 0.9
    assert lo > -0.5 and hi < 1.5  # padded percentile window, not [-inf, inf]


def test_nan_values_skipped():
    p = RewardPlots(["r"])
    p.record({"r": float("nan")})
    assert p.figures["r"].linepnt[0] == 0
    p.record({"r": 2.0})
    assert p.figures["r"].linepnt[0] == 1


def test_clear_resets():
    p = RewardPlots(["r"])
    p.record({"r": 5.0})
    p.clear()
    assert p.figures["r"].linepnt[0] == 0
    assert list(p.histories["r"]) == []


def test_viewport_layout():
    p = RewardPlots([f"t{i}" for i in range(4)])
    vps = p.viewports(1280, 720)
    assert len(vps) == 4
    xs = {r.left for _, r in vps}
    assert xs == {1280 - int(1280 * p.cfg.column_frac)}
    tops = [r.bottom for _, r in vps]
    assert tops == sorted(tops, reverse=True)  # stacked downward
    # tiny window: layout truncates instead of going negative
    assert len(p.viewports(300, 100)) <= 4


def test_make_empty_figure_ranges():
    cfg = RewardPlotCfg(history=64, init_yrange=(-1.0, 1.0))
    fig = make_empty_figure("x", cfg)
    assert fig.range[0][0] == -64.0
    assert tuple(fig.range[1]) == (-1.0, 1.0)
