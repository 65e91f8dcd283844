"""Phase-aware jump rewards (reference src/mjlab/tasks/jump/mdp/rewards.py).

Stateful terms (peak-height tracker L20, landing-balance timer L220) keep
their per-env state in the reward manager's traced state via
ManagerTermBase.init_state/state — pure masked updates, one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerTermBase
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

_DEFAULT = SceneEntityCfg("robot")


class jump_height_reward(ManagerTermBase):
    """Exp-kernel reward on (peak height - initial height) vs target
    (reference rewards.py:20-72)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        asset_cfg = cfg.params.get("asset_cfg", _DEFAULT)
        self._asset = env.scene[asset_cfg.name]

    def init_state(self, num_envs):
        z = jnp.zeros((num_envs,), jnp.float32)
        return {
            "peak": z,
            "initial": z,
            "initialized": jnp.zeros((num_envs,), bool),
        }

    def __call__(
        self,
        env,
        target_height: float,
        std: float,
        asset_cfg: SceneEntityCfg = _DEFAULT,
    ):
        st = dict(self.state)
        h = self._asset.data.root_link_pos_w[:, 2]
        st["initial"] = jnp.where(st["initialized"], st["initial"], h)
        st["initialized"] = jnp.ones_like(st["initialized"])
        st["peak"] = jnp.maximum(st["peak"], h)
        jump_h = st["peak"] - st["initial"]
        # target may be overridden at runtime by the curriculum through the
        # jump command state
        cmd_term = env.command_manager.get_term("jump")
        tgt = (
            cmd_term.state["target_height"]
            if cmd_term is not None
            else jnp.asarray(target_height)
        )
        reward = jnp.exp(-jnp.square(jump_h - tgt) / (std * std))
        env.extras["log"]["Metrics/peak_jump_height"] = jnp.mean(st["peak"])
        env.extras["log"]["Metrics/jump_height"] = jnp.mean(jump_h)
        self.state = st
        return reward

    def reset(self, env_mask, ctx=None):
        st = dict(self.state)
        st["peak"] = jnp.where(env_mask, 0.0, st["peak"])
        st["initial"] = jnp.where(env_mask, 0.0, st["initial"])
        st["initialized"] = jnp.where(env_mask, False, st["initialized"])
        self.state = st
        return {}


def explosive_takeoff(
    env,
    sensor_name: str,
    power_threshold: float = 500.0,
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    """Joint power above threshold while in ground contact
    (reference rewards.py:75-113)."""
    asset = env.scene[asset_cfg.name]
    sensor = env.scene[sensor_name]
    in_contact = jnp.any(sensor.data.found > 0, axis=1)
    power = jnp.abs(asset.data.actuator_force * asset.data.joint_vel)
    ids = asset_cfg.joint_ids if asset_cfg.joint_ids else slice(None)
    total = jnp.sum(power[:, ids], axis=1)
    reward = jnp.clip(total - power_threshold, 0.0) * in_contact
    return reward / 1000.0


def synchronized_extension(env, asset_cfg: SceneEntityCfg = _DEFAULT):
    """Joint-velocity variance penalty proxy for asymmetric extension
    (reference rewards.py:116-147)."""
    asset = env.scene[asset_cfg.name]
    jv = asset.data.joint_vel
    return jnp.var(jv, axis=1)


def vertical_impulse(env, sensor_name: str):
    """Upward ground-reaction force reward (reference rewards.py:149-178)."""
    sensor = env.scene[sensor_name]
    fz = jnp.clip(sensor.data.force[:, :, 2], 0.0)
    return jnp.sum(fz, axis=1) / 500.0


def air_time_bonus(env, sensor_name: str, min_air_time: float = 0.2):
    """Exponential bonus once BOTH feet exceed min air time
    (reference rewards.py:181-217)."""
    sensor = env.scene[sensor_name]
    air = sensor.data.current_air_time
    min_air = jnp.min(air, axis=1)
    reward = jnp.clip(jnp.exp((min_air - min_air_time) / min_air_time) - 1.0, 0.0)
    in_air = air > 0
    n = jnp.clip(jnp.sum(in_air), 1)
    env.extras["log"]["Metrics/air_time_mean"] = jnp.sum(air * in_air) / n
    return reward


class landing_balance(ManagerTermBase):
    """Exponential reward on post-landing stability duration
    (reference rewards.py:220-283)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        asset_cfg = cfg.params.get("asset_cfg", _DEFAULT)
        self._asset = env.scene[asset_cfg.name]
        self._sensor = env.scene[cfg.params["sensor_name"]]

    def init_state(self, num_envs):
        return {
            "timer": jnp.zeros((num_envs,), jnp.float32),
            "was_in_air": jnp.zeros((num_envs,), bool),
        }

    def __call__(
        self,
        env,
        sensor_name: str,
        stability_time: float = 0.5,
        asset_cfg: SceneEntityCfg = _DEFAULT,
    ):
        st = dict(self.state)
        in_contact = jnp.any(self._sensor.data.found > 0, axis=1)
        just_landed = st["was_in_air"] & in_contact
        st["was_in_air"] = ~in_contact

        data = self._asset.data
        upright = jnp.abs(data.projected_gravity_b[:, 2] + 1.0) < 0.2
        low_vel = (
            jnp.linalg.norm(data.root_link_lin_vel_w, axis=1) < 0.5
        ) & (jnp.linalg.norm(data.root_link_ang_vel_w, axis=1) < 0.5)
        stable = upright & low_vel & in_contact

        timer = jnp.where(just_landed, 0.0, st["timer"])
        timer = jnp.where(stable, timer + env.step_dt, 0.0)
        st["timer"] = timer
        reward = jnp.exp(timer / stability_time) - 1.0
        env.extras["log"]["Metrics/landing_success_rate"] = jnp.mean(
            (timer > stability_time).astype(jnp.float32)
        )
        self.state = st
        return reward

    def reset(self, env_mask, ctx=None):
        st = dict(self.state)
        st["timer"] = jnp.where(env_mask, 0.0, st["timer"])
        st["was_in_air"] = jnp.where(env_mask, False, st["was_in_air"])
        self.state = st
        return {}


def symmetric_landing(env, sensor_name: str, time_tolerance: float = 0.05):
    """Both feet first-contact in the same step (reference rewards.py:286)."""
    sensor = env.scene[sensor_name]
    first = sensor.compute_first_contact(env.step_dt)
    if first.shape[1] < 2:
        return jnp.zeros((env.num_envs,), jnp.float32)
    return (first[:, 0] & first[:, 1]).astype(jnp.float32)
