"""NaN guard: rolling physics-state history + dump on first NaN.

Equivalent of reference src/mjlab/utils/nan_guard.py: keeps a ring buffer of
(qpos, qvel, ctrl) for the last N control steps and, when any env goes
non-finite, dumps the history npz + the binary model for offline replay.
TPU-native: the ring buffer is part of the jitted step (a CircularBuffer
pytree); detection is a cheap reduction; the dump runs host-side via
jax.debug.callback OFF the hot path (only fires on detection).

Per-env NaN quarantine for training runs is separate — the
envs/mdp/terminations.py:nan_detection term resets exploded envs while
training continues.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import mujoco
import numpy as np


@dataclass
class NanGuardCfg:
    enabled: bool = False
    buffer_size: int = 100
    output_dir: str = "nan_dumps"


def detect_nans(data) -> jax.Array:
    """(E,) bool: any non-finite qpos/qvel/qacc/qacc_warmstart per env."""
    bad = ~jnp.isfinite(data.qpos).all(-1)
    bad |= ~jnp.isfinite(data.qvel).all(-1)
    bad |= ~jnp.isfinite(data.qacc).all(-1)
    bad |= ~jnp.isfinite(data.qacc_warmstart).all(-1)
    return bad


class NanGuard:
    """Host-side dump manager. Use record()/check() inside the step trace."""

    def __init__(self, cfg: NanGuardCfg, mj_model: mujoco.MjModel):
        self.cfg = cfg
        self.mj_model = mj_model
        self._dumped = False

    def make_state(self, num_envs: int, nq: int, nv: int, nu: int):
        from mjlab_tpu.utils.buffers import circular_buffer_init

        T = self.cfg.buffer_size
        return {
            "qpos": circular_buffer_init(T, num_envs, (nq,)),
            "qvel": circular_buffer_init(T, num_envs, (nv,)),
            "ctrl": circular_buffer_init(T, num_envs, (nu,)),
        }

    def record(self, state: dict, data) -> dict:
        from mjlab_tpu.utils.buffers import circular_buffer_append

        return {
            "qpos": circular_buffer_append(state["qpos"], data.qpos),
            "qvel": circular_buffer_append(state["qvel"], data.qvel),
            "ctrl": circular_buffer_append(state["ctrl"], data.ctrl),
        }

    def check_and_dump(self, state: dict, data) -> None:
        """Host callback on detection (off hot path: fires at most once)."""
        bad = detect_nans(data)

        def dump(bad_mask, qpos_hist, qvel_hist, ctrl_hist):
            if self._dumped or not np.any(bad_mask):
                return
            self._dumped = True
            os.makedirs(self.cfg.output_dir, exist_ok=True)
            stamp = time.strftime("%Y%m%d_%H%M%S")
            path = os.path.join(self.cfg.output_dir, f"nan_dump_{stamp}")
            np.savez(
                path + ".npz",
                bad_envs=np.nonzero(bad_mask)[0],
                qpos=qpos_hist,
                qvel=qvel_hist,
                ctrl=ctrl_hist,
            )
            mujoco.mj_saveModel(self.mj_model, path + ".mjb")
            latest = os.path.join(self.cfg.output_dir, "latest.npz")
            try:
                if os.path.islink(latest):
                    os.unlink(latest)
                os.symlink(os.path.basename(path) + ".npz", latest)
            except OSError:
                pass
            print(f"[nan_guard] dumped NaN state history to {path}.npz")

        from mjlab_tpu.utils.buffers import circular_buffer_window

        jax.debug.callback(
            dump,
            bad,
            circular_buffer_window(state["qpos"]),
            circular_buffer_window(state["qvel"]),
            circular_buffer_window(state["ctrl"]),
        )
