"""Viewer-agnostic run loop (reference src/mjlab/viewer/base.py:82-321).

Drives policy-in-the-loop stepping with pause/reset/speed control; concrete
viewers implement setup/sync/teardown. Works against any env exposing the
ManagerBasedRlEnv surface (EnvProtocol below).
"""

from __future__ import annotations

import time
from typing import Any, Protocol

import jax.numpy as jnp
import numpy as np


class EnvProtocol(Protocol):
    def reset(self) -> tuple: ...
    def step(self, action) -> tuple: ...
    @property
    def num_envs(self) -> int: ...


class PolicyProtocol(Protocol):
    def __call__(self, obs) -> Any: ...


class BaseViewer:
    """Run loop: policy(obs) -> env.step -> sync view, with wall-clock
    pacing, speed multiplier, pause and reset controls."""

    def __init__(self, env, policy, frame_rate: float = 50.0):
        self.env = env
        self.policy = policy
        self.frame_rate = frame_rate
        self.speed = 1.0
        self.paused = False
        self._running = False

    # -- concrete viewer contract --

    def setup(self) -> None:
        ...

    def sync_env_to_viewer(self) -> None:
        ...

    def teardown(self) -> None:
        ...

    def is_open(self) -> bool:
        return True

    # -- controls --

    def toggle_pause(self):
        self.paused = not self.paused

    def request_reset(self):
        self._want_reset = True

    def set_speed(self, mult: float):
        self.speed = float(np.clip(mult, 0.0625, 16.0))

    # -- loop --

    def run(self, max_steps: int | None = None) -> None:
        obs, _ = self.env.reset()
        self._want_reset = False
        self.setup()
        self._running = True
        steps = 0
        try:
            while self._running and self.is_open():
                t0 = time.perf_counter()
                if self._want_reset:
                    obs, _ = self.env.reset()
                    self._want_reset = False
                if not self.paused:
                    action = self.policy(obs)
                    obs, *_ = self.env.step(action)
                    steps += 1
                self.sync_env_to_viewer()
                if max_steps is not None and steps >= max_steps:
                    break
                # wall-clock pacing
                target_dt = 1.0 / (self.frame_rate * self.speed)
                dt = time.perf_counter() - t0
                if dt < target_dt:
                    time.sleep(target_dt - dt)
        finally:
            self._running = False
            self.teardown()


class ZeroPolicy:
    def __init__(self, env):
        self._dim = env.action_manager.total_action_dim
        self._n = env.num_envs

    def __call__(self, obs):
        return jnp.zeros((self._n, self._dim), jnp.float32)


class RandomPolicy:
    def __init__(self, env, scale: float = 0.1, seed: int = 0):
        self._dim = env.action_manager.total_action_dim
        self._n = env.num_envs
        self._rng = np.random.default_rng(seed)
        self._scale = scale

    def __call__(self, obs):
        return jnp.asarray(
            self._scale
            * self._rng.standard_normal((self._n, self._dim)).astype(np.float32)
        )
