"""Velocity-task reward terms (reference
src/mjlab/tasks/velocity/mdp/rewards.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.manager_base import ManagerTermBase
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg
from mjlab_tpu.utils.string import resolve_matching_names_values

_DEFAULT = SceneEntityCfg("robot")


def _command_activity(env, command_name, threshold):
    command = env.command_manager.get_command(command_name)
    total = jnp.linalg.norm(command[:, :2], axis=1) + jnp.abs(command[:, 2])
    return (total > threshold).astype(jnp.float32)


def track_linear_velocity(
    env, std: float, command_name: str, asset_cfg: SceneEntityCfg = _DEFAULT
):
    """exp(-(xy error^2 + z^2)/std^2); commanded z velocity is zero."""
    asset = env.scene[asset_cfg.name]
    command = env.command_manager.get_command(command_name)
    actual = asset.data.root_link_lin_vel_b
    xy_err = jnp.sum(jnp.square(command[:, :2] - actual[:, :2]), axis=1)
    z_err = jnp.square(actual[:, 2])
    return jnp.exp(-(xy_err + z_err) / std**2)


def track_angular_velocity(
    env, std: float, command_name: str, asset_cfg: SceneEntityCfg = _DEFAULT
):
    asset = env.scene[asset_cfg.name]
    command = env.command_manager.get_command(command_name)
    actual = asset.data.root_link_ang_vel_b
    z_err = jnp.square(command[:, 2] - actual[:, 2])
    xy_err = jnp.sum(jnp.square(actual[:, :2]), axis=1)
    return jnp.exp(-(z_err + xy_err) / std**2)


def flat_orientation(env, std: float, asset_cfg: SceneEntityCfg = _DEFAULT):
    g = env.scene[asset_cfg.name].data.projected_gravity_b
    return jnp.exp(-jnp.sum(jnp.square(g[:, :2]), axis=1) / std**2)


def self_collision_cost(env, sensor_name: str):
    sensor = env.scene[sensor_name]
    return jnp.sum(sensor.data.found.astype(jnp.float32), axis=1)


def body_angular_velocity_penalty(
    env, asset_cfg: SceneEntityCfg = _DEFAULT
):
    ang = env.scene[asset_cfg.name].data.root_link_ang_vel_b
    return jnp.sum(jnp.square(ang[:, :2]), axis=1)


def feet_air_time(
    env,
    sensor_name: str,
    threshold_min: float = 0.05,
    threshold_max: float = 0.5,
    command_name: str | None = None,
    command_threshold: float = 0.5,
):
    sensor = env.scene[sensor_name]
    air = sensor.data.current_air_time
    in_range = (air > threshold_min) & (air < threshold_max)
    reward = jnp.sum(in_range.astype(jnp.float32), axis=1)
    in_air = (air > 0).astype(jnp.float32)
    env.extras["log"]["Metrics/air_time_mean"] = jnp.sum(air * in_air) / jnp.maximum(
        jnp.sum(in_air), 1.0
    )
    if command_name is not None:
        reward = reward * _command_activity(env, command_name, command_threshold)
    return reward


def feet_clearance(
    env,
    target_height: float,
    command_name: str | None = None,
    command_threshold: float = 0.01,
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    asset = env.scene[asset_cfg.name]
    foot_z = asset.data.site_pos_w[:, asset_cfg.site_ids, 2]
    foot_vel_xy = asset.data.site_lin_vel_w[:, asset_cfg.site_ids, :2]
    vel_norm = jnp.linalg.norm(foot_vel_xy, axis=-1)
    cost = jnp.sum(jnp.abs(foot_z - target_height) * vel_norm, axis=1)
    if command_name is not None:
        cost = cost * _command_activity(env, command_name, command_threshold)
    return cost


class feet_swing_height(ManagerTermBase):
    """Penalize swing-apex height error (reference rewards.py:180)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        self._sensor = env.scene[cfg.params["sensor_name"]]
        asset_cfg = cfg.params.get("asset_cfg", _DEFAULT)
        self._asset = env.scene[asset_cfg.name]
        self._site_ids = asset_cfg.site_ids

    def __call__(
        self,
        env,
        sensor_name: str,
        target_height: float,
        command_name: str | None = None,
        command_threshold: float = 0.01,
        asset_cfg: SceneEntityCfg = _DEFAULT,
    ):
        first_contact = self._sensor.compute_first_contact(env.step_dt)
        foot_z = self._asset.data.site_pos_w[:, self._site_ids, 2]
        err = jnp.square(foot_z - target_height) * first_contact.astype(
            jnp.float32
        )
        cost = jnp.sum(err, axis=1)
        if command_name is not None:
            cost = cost * _command_activity(env, command_name, command_threshold)
        return cost


def feet_slip(
    env,
    sensor_name: str,
    command_name: str,
    command_threshold: float = 0.01,
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    asset = env.scene[asset_cfg.name]
    sensor = env.scene[sensor_name]
    active = _command_activity(env, command_name, command_threshold)
    in_contact = sensor.data.found.astype(jnp.float32)
    foot_vel_xy = asset.data.site_lin_vel_w[:, asset_cfg.site_ids, :2]
    v = jnp.linalg.norm(foot_vel_xy, axis=-1)
    cost = jnp.sum(jnp.square(v) * in_contact, axis=1) * active
    env.extras["log"]["Metrics/slip_velocity_mean"] = jnp.sum(
        v * in_contact
    ) / jnp.maximum(jnp.sum(in_contact), 1.0)
    return cost


def soft_landing(
    env,
    sensor_name: str,
    command_name: str | None = None,
    command_threshold: float = 0.05,
):
    sensor = env.scene[sensor_name]
    fmag = jnp.linalg.norm(sensor.data.force, axis=-1)
    first = sensor.compute_first_contact(env.step_dt).astype(jnp.float32)
    impact = fmag * first
    cost = jnp.sum(impact, axis=1)
    env.extras["log"]["Metrics/landing_force_mean"] = jnp.sum(impact) / jnp.maximum(
        jnp.sum(first), 1.0
    )
    if command_name is not None:
        cost = cost * _command_activity(env, command_name, command_threshold)
    return cost


class variable_posture(ManagerTermBase):
    """Exp-kernel posture reward with three command-magnitude regimes:
    standing / walking / running, each with per-joint stds resolved from
    regex dicts (reference rewards.py:291)."""

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        asset_cfg = cfg.params.get("asset_cfg", _DEFAULT)
        self._asset = env.scene[asset_cfg.name]
        names = list(self._asset.joint_names)

        def build_std(std_map):
            if not std_map:
                return jnp.full((len(names),), jnp.inf, jnp.float32)
            ids, _, vals = resolve_matching_names_values(std_map, names)
            std = np.full(len(names), np.inf, np.float32)
            std[ids] = vals
            return jnp.asarray(std)

        self._std_standing = build_std(cfg.params.get("std_standing", {}))
        self._std_walking = build_std(cfg.params.get("std_walking", {}))
        self._std_running = build_std(cfg.params.get("std_running", {}))

    def __call__(
        self,
        env,
        std_standing=None,
        std_walking=None,
        std_running=None,
        command_name: str = "twist",
        walking_threshold: float = 0.05,
        running_threshold: float = 1.5,
        asset_cfg: SceneEntityCfg = _DEFAULT,
    ):
        data = self._asset.data
        err = data.joint_pos - data.default_joint_pos
        command = env.command_manager.get_command(command_name)
        mag = jnp.linalg.norm(command[:, :2], axis=1) + jnp.abs(command[:, 2])
        std = jnp.where(
            (mag <= walking_threshold)[:, None],
            self._std_standing[None],
            jnp.where(
                (mag >= running_threshold)[:, None],
                self._std_running[None],
                self._std_walking[None],
            ),
        )
        return jnp.exp(-jnp.mean(jnp.square(err / std), axis=-1))


def angular_momentum_penalty(env, sensor_name: str | None = None,
                             asset_cfg: SceneEntityCfg = _DEFAULT):
    """Squared subtree angular momentum about the root subtree CoM
    (reference rewards.py:110, backed by a subtreeangmom sensor)."""
    entity = env.scene[asset_cfg.name]
    d = env.ctx.data
    idx = entity.indexing
    # spatial momentum of each body in the c-frame, summed over the subtree
    import jax.numpy as _jnp
    h = _jnp.einsum("ebij,ebj->ebi", d.cinert[:, idx.body_ids], d.cvel[:, idx.body_ids])
    L = _jnp.sum(h[..., :3], axis=1)
    return _jnp.sum(_jnp.square(L), axis=-1)
