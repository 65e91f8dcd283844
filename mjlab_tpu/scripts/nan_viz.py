"""NaN dump scrubber (reference src/mjlab/scripts/nan_viz.py:22-50).

Replays a NaN-guard dump (npz history + .mjb model) frame by frame. With a
display it opens the native MuJoCo viewer and scrubs with ,/. keys; headless
it prints a per-frame finite-state report so exploding dofs can be located.
"""

from __future__ import annotations

import argparse
import os

import mujoco
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dump", help="path to a nan_dumps/<...>.npz (or 'latest')")
    p.add_argument("--model", default=None, help=".mjb model (default: sibling)")
    p.add_argument("--headless", action="store_true")
    a = p.parse_args()

    dump_path = a.dump
    if dump_path == "latest":
        dump_path = os.path.join("nan_dumps", "latest.npz")
    data = np.load(dump_path)
    model_path = a.model or dump_path.replace(".npz", ".mjb")
    if not os.path.exists(model_path):
        model_path = os.path.join(os.path.dirname(dump_path), "latest.mjb")

    qpos_hist = data["qpos"]  # (T, nq)
    qvel_hist = data["qvel"]
    T = qpos_hist.shape[0]
    print(f"loaded {T} frames from {dump_path}")

    # report: first non-finite frame and offending indices
    for t in range(T):
        badq = ~np.isfinite(qpos_hist[t])
        badv = ~np.isfinite(qvel_hist[t])
        if badq.any() or badv.any():
            print(f"first non-finite frame: {t}")
            print("  qpos idx:", np.nonzero(badq)[0].tolist())
            print("  qvel idx:", np.nonzero(badv)[0].tolist())
            break
    else:
        print("history is fully finite (dump may capture pre-NaN window)")
    print(
        "max |qvel| per frame tail:",
        np.nanmax(np.abs(qvel_hist), axis=1)[-10:].round(2).tolist(),
    )

    if a.headless:
        return

    m = mujoco.MjModel.from_binary_path(model_path)
    d = mujoco.MjData(m)
    frame = [0]

    def show(v, t):
        d.qpos[:] = np.nan_to_num(qpos_hist[t])
        d.qvel[:] = np.nan_to_num(qvel_hist[t])
        mujoco.mj_forward(m, d)
        v.sync()

    import mujoco.viewer

    def key_cb(key):
        if key == ord("."):
            frame[0] = min(frame[0] + 1, T - 1)
        elif key == ord(","):
            frame[0] = max(frame[0] - 1, 0)

    with mujoco.viewer.launch_passive(m, d, key_callback=key_cb) as v:
        while v.is_running():
            show(v, frame[0])


if __name__ == "__main__":
    main()
