"""Event term library: resets, pushes, and the domain-randomization core
(reference src/mjlab/envs/mdp/events.py).

All terms take (env, env_mask, **params) and apply masked, in-place-style
updates through the env context — fully traceable, no dynamic shapes.
Model-field randomization writes into the per-env-expanded Model that lives
in EnvState (see sim.expand_model_fields), always derived from the DEFAULT
field values so repeated resets don't accumulate (reference events.py:341).
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg
from mjlab_tpu.utils import math

__all__ = [
    "randomize_terrain",
    "reset_scene_to_default",
    "reset_root_state_uniform",
    "reset_joints_by_offset",
    "push_by_setting_velocity",
    "apply_external_force_torque",
    "randomize_field",
    "randomize_pd_gains",
    "randomize_effort_limits",
    "randomize_encoder_bias",
    "sync_actuator_delays",
    "FIELD_SPECS",
]

_DEFAULT = SceneEntityCfg("robot")


def _rand(rng, distribution, lo, hi, shape, dtype=jnp.float32):
    if distribution == "uniform":
        return jax.random.uniform(rng, shape, dtype, minval=lo, maxval=hi)
    if distribution == "log_uniform":
        u = jax.random.uniform(rng, shape, dtype)
        return jnp.exp(jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo)))
    if distribution == "gaussian":
        return lo + hi * jax.random.normal(rng, shape, dtype)
    raise ValueError(distribution)


# ---------------------------------------------------------------------------
# state resets
# ---------------------------------------------------------------------------


def randomize_terrain(env, env_mask):
    """Re-assign resetting envs a random sub-terrain level AND type
    (reference events.py:26-38) — play/eval variety."""
    terrain = env.scene.terrain
    if terrain is not None:
        terrain.randomize_env_origins(env_mask, env.ctx.next_key())


def reset_scene_to_default(env, env_mask):
    """Reset every entity to its default state + env origin
    (reference events.py:40)."""
    origins = env.scene.env_origins
    for entity in env.scene.entities.values():
        data = entity.data
        if not entity.is_fixed_base:
            default = jnp.broadcast_to(
                data.default_root_state, (env.num_envs, 13)
            )
            pose = default[:, :7].at[:, :3].add(origins)
            data.write_root_pose(pose, env_mask)
            data.write_root_velocity(default[:, 7:13], env_mask)
        if entity.is_articulated and entity.num_joints:
            jp = jnp.broadcast_to(
                data.default_joint_pos, (env.num_envs, entity.num_joints)
            )
            jv = jnp.broadcast_to(
                data.default_joint_vel, (env.num_envs, entity.num_joints)
            )
            data.write_joint_state(jp, jv, env_ids=env_mask)


def reset_root_state_uniform(
    env,
    env_mask,
    pose_range: dict[str, tuple] | None = None,
    velocity_range: dict[str, tuple] | None = None,
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    """Default root state + env origin + uniform pose/velocity perturbation
    (reference events.py:81). pose_range keys: x y z roll pitch yaw."""
    pose_range = pose_range or {}
    velocity_range = velocity_range or {}
    entity = env.scene[asset_cfg.name]
    data = entity.data
    E = env.num_envs
    rng = env.ctx.next_key()
    keys = jax.random.split(rng, 12)

    default = jnp.broadcast_to(data.default_root_state, (E, 13))

    def rr(key, name):
        lo, hi = (pose_range.get(name) or (0.0, 0.0))
        return jax.random.uniform(key, (E,), minval=lo, maxval=hi)

    dx, dy, dz = rr(keys[0], "x"), rr(keys[1], "y"), rr(keys[2], "z")
    droll, dpitch, dyaw = rr(keys[3], "roll"), rr(keys[4], "pitch"), rr(keys[5], "yaw")
    pos = default[:, :3] + env.scene.env_origins + jnp.stack([dx, dy, dz], -1)
    dq = math.quat_from_euler_xyz(droll, dpitch, dyaw)
    quat = math.quat_mul(dq, default[:, 3:7])

    def vr(key, name):
        lo, hi = (velocity_range.get(name) or (0.0, 0.0))
        return jax.random.uniform(key, (E,), minval=lo, maxval=hi)

    vel = default[:, 7:13] + jnp.stack(
        [vr(keys[6 + i], n) for i, n in enumerate(["x", "y", "z", "roll", "pitch", "yaw"])],
        -1,
    )
    if entity.indexing.mocap_id is not None:
        data.write_mocap_pose(jnp.concatenate([pos, quat], -1), env_mask)
    else:
        data.write_root_pose(jnp.concatenate([pos, quat], -1), env_mask)
        data.write_root_velocity(vel, env_mask)


def reset_joints_by_offset(
    env,
    env_mask,
    position_range: tuple = (0.0, 0.0),
    velocity_range: tuple = (0.0, 0.0),
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    """Default joint state + uniform offsets, clipped to soft limits
    (reference events.py:171)."""
    entity = env.scene[asset_cfg.name]
    data = entity.data
    E, J = env.num_envs, entity.num_joints
    k1, k2 = jax.random.split(env.ctx.next_key())
    jp = jnp.broadcast_to(data.default_joint_pos, (E, J)) + jax.random.uniform(
        k1, (E, J), minval=position_range[0], maxval=position_range[1]
    )
    jv = jnp.broadcast_to(data.default_joint_vel, (E, J)) + jax.random.uniform(
        k2, (E, J), minval=velocity_range[0], maxval=velocity_range[1]
    )
    lims = jnp.broadcast_to(data.soft_joint_pos_limits, (E, J, 2))
    jp = jnp.clip(jp, lims[..., 0], lims[..., 1])
    data.write_joint_state(jp, jv, env_ids=env_mask)


def push_by_setting_velocity(
    env,
    env_mask,
    velocity_range: dict[str, tuple],
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    """Overwrite root velocity with a sampled one (reference events.py:209)."""
    entity = env.scene[asset_cfg.name]
    data = entity.data
    E = env.num_envs
    keys = jax.random.split(env.ctx.next_key(), 6)
    names = ["x", "y", "z", "roll", "pitch", "yaw"]
    vel = data.root_link_vel_w
    delta = jnp.stack(
        [
            jax.random.uniform(
                keys[i],
                (E,),
                minval=(velocity_range.get(n) or (0.0, 0.0))[0],
                maxval=(velocity_range.get(n) or (0.0, 0.0))[1],
            )
            for i, n in enumerate(names)
        ],
        -1,
    )
    data.write_root_velocity(vel + delta, env_mask)


def apply_external_force_torque(
    env,
    env_mask,
    force_range: tuple = (0.0, 0.0),
    torque_range: tuple = (0.0, 0.0),
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    """Sampled constant wrench on selected bodies (reference events.py:226)."""
    entity = env.scene[asset_cfg.name]
    data = entity.data
    ids = asset_cfg.body_ids
    nb = (
        len(entity.indexing.body_ids)
        if isinstance(ids, slice)
        else len(np.atleast_1d(ids))
    )
    E = env.num_envs
    k1, k2 = jax.random.split(env.ctx.next_key())
    force = jax.random.uniform(
        k1, (E, nb, 3), minval=force_range[0], maxval=force_range[1]
    )
    torque = jax.random.uniform(
        k2, (E, nb, 3), minval=torque_range[0], maxval=torque_range[1]
    )
    data.write_external_wrench(
        force, torque, body_ids=None if isinstance(ids, slice) else ids,
        env_ids=env_mask,
    )


# ---------------------------------------------------------------------------
# domain randomization over model fields
# ---------------------------------------------------------------------------

# field -> (id kind, component axes in the trailing dim or None)
FIELD_SPECS: dict[str, tuple[str, tuple | None]] = {
    "geom_friction": ("geom", None),
    "geom_solref": ("geom", None),
    "geom_solimp": ("geom", None),
    "body_mass": ("body", None),
    "body_ipos": ("body", None),
    "body_inertia": ("body", None),
    "dof_damping": ("dof", None),
    "dof_armature": ("dof", None),
    "dof_frictionloss": ("dof", None),
    "jnt_stiffness": ("joint", None),
    "actuator_gainprm": ("actuator", None),
    "actuator_biasprm": ("actuator", None),
    "qpos0": ("qpos", None),
}


def _resolve_field_ids(env, entity, field: str, asset_cfg: SceneEntityCfg):
    kind, _ = FIELD_SPECS[field]
    idx = entity.indexing
    if kind == "geom":
        sel = asset_cfg.geom_ids
        base = idx.geom_ids
    elif kind == "body":
        sel = asset_cfg.body_ids
        base = idx.body_ids
    elif kind in ("dof", "joint"):
        sel = asset_cfg.joint_ids
        base = idx.joint_v_adr if kind == "dof" else idx.joint_ids
    elif kind == "actuator":
        sel = asset_cfg.actuator_ids
        base = idx.ctrl_ids
    elif kind == "qpos":
        sel = asset_cfg.joint_ids
        base = idx.joint_q_adr
    else:
        raise ValueError(kind)
    if isinstance(sel, slice):
        return np.asarray(base)
    return np.asarray(base)[np.asarray(sel)]


def randomize_field(
    env,
    env_mask,
    field: str,
    ranges: tuple | dict,
    distribution: Literal["uniform", "log_uniform", "gaussian"] = "uniform",
    operation: Literal["add", "scale", "abs"] = "scale",
    axes: tuple | None = None,
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    """Randomize a per-env model field (reference events.py:292): sample one
    value per (env, element), combine with the DEFAULT field value, write
    into the env-expanded model. ``ranges`` may be a (lo, hi) tuple applied
    to the axes in ``axes`` (or all components), or a dict
    {component_index: (lo, hi)} with per-component ranges."""
    entity = env.scene[asset_cfg.name]
    ids = _resolve_field_ids(env, entity, field, asset_cfg)
    model = env.ctx.model
    cur = getattr(model, field)
    if cur.ndim == 0 or cur.shape[0] != env.num_envs:
        raise RuntimeError(
            f"field '{field}' is not env-expanded; mark the event term with "
            "domain_randomization=True"
        )
    default = env.sim.get_default_field(field)  # unbatched
    E = env.num_envs
    sub_default = default[ids]  # (n, ...) or (n,)
    shape = (E,) + sub_default.shape

    if isinstance(ranges, dict):
        # per-component ranges: {axis: (lo, hi)}
        ncomp = sub_default.shape[-1]
        lo = np.zeros(ncomp, np.float32)
        hi = np.zeros(ncomp, np.float32)
        comp = np.zeros(ncomp, bool)
        for a, (l, h) in ranges.items():
            lo[int(a)], hi[int(a)], comp[int(a)] = l, h, True
        u = jax.random.uniform(env.ctx.next_key(), shape)
        sample = lo + u * (hi - lo)
        comp_mask = jnp.asarray(comp)
    else:
        sample = _rand(
            env.ctx.next_key(), distribution, ranges[0], ranges[1], shape
        )
        if axes is not None and sub_default.ndim > 1:
            comp_mask = (
                jnp.zeros(sub_default.shape[-1], bool)
                .at[np.asarray(axes, np.int32)]
                .set(True)
            )
        else:
            comp_mask = None

    if operation == "add":
        new = sub_default[None] + sample
    elif operation == "scale":
        new = sub_default[None] * sample
    else:  # abs
        new = sample
    if comp_mask is not None:
        new = jnp.where(comp_mask, new, sub_default[None])

    m = env_mask.reshape((E,) + (1,) * sub_default.ndim)
    updated = jnp.where(m, new, cur[:, ids])
    env.ctx.model = model.replace(**{field: cur.at[:, ids].set(updated)})


def randomize_pd_gains(
    env,
    env_mask,
    stiffness_scale: tuple | None = None,
    damping_scale: tuple | None = None,
    asset_cfg: SceneEntityCfg = _DEFAULT,
    distribution: str = "uniform",
):
    """Randomize PD gains (reference events.py:519): builtin position
    actuators -> model gainprm/biasprm; IdealPd-family -> actuator state."""
    from mjlab_tpu.actuator.builtin import BuiltinPositionActuator
    from mjlab_tpu.actuator.pd import IdealPdActuator, PdState

    entity = env.scene[asset_cfg.name]
    E = env.num_envs
    st = env.ctx.entity_states[entity.name]
    new_act_states = dict(st.actuator_states)
    for i, act in enumerate(entity.actuators):
        nj = len(act.joint_names)
        ks = jax.random.split(env.ctx.next_key(), 2)
        s_scale = (
            _rand(ks[0], distribution, stiffness_scale[0], stiffness_scale[1], (E, nj))
            if stiffness_scale
            else None
        )
        d_scale = (
            _rand(ks[1], distribution, damping_scale[0], damping_scale[1], (E, nj))
            if damping_scale
            else None
        )
        if isinstance(act, BuiltinPositionActuator):
            model = env.ctx.model
            gain = model.actuator_gainprm
            bias = model.actuator_biasprm
            if gain.shape[0] != E:
                raise RuntimeError(
                    "actuator_gainprm/biasprm not env-expanded; set "
                    "domain_randomization=True with field='actuator_gainprm'"
                )
            d_gain = env.sim.get_default_field("actuator_gainprm")
            d_bias = env.sim.get_default_field("actuator_biasprm")
            cid = act.ctrl_ids
            kp0 = d_gain[cid, 0]
            kd0 = -d_bias[cid, 2]
            kp = kp0[None] * (s_scale if s_scale is not None else 1.0)
            kd = kd0[None] * (d_scale if d_scale is not None else 1.0)
            m = env_mask[:, None]
            gain = gain.at[:, cid, 0].set(jnp.where(m, kp, gain[:, cid, 0]))
            bias = bias.at[:, cid, 1].set(jnp.where(m, -kp, bias[:, cid, 1]))
            bias = bias.at[:, cid, 2].set(jnp.where(m, -kd, bias[:, cid, 2]))
            env.ctx.model = model.replace(
                actuator_gainprm=gain, actuator_biasprm=bias
            )
        elif isinstance(act, IdealPdActuator):
            pstate: PdState = new_act_states[str(i)]
            kp = pstate.default_stiffness[None] * (
                s_scale if s_scale is not None else 1.0
            )
            kd = pstate.default_damping[None] * (
                d_scale if d_scale is not None else 1.0
            )
            new_act_states[str(i)] = IdealPdActuator.set_gains(
                pstate, env_mask, stiffness=kp, damping=kd
            )
    env.ctx.entity_states[entity.name] = st.replace(
        actuator_states=new_act_states
    )


def randomize_effort_limits(
    env,
    env_mask,
    scale: tuple = (1.0, 1.0),
    asset_cfg: SceneEntityCfg = _DEFAULT,
    distribution: str = "uniform",
):
    """Randomize effort limits (reference events.py:627)."""
    from mjlab_tpu.actuator.pd import IdealPdActuator, PdState

    entity = env.scene[asset_cfg.name]
    E = env.num_envs
    st = env.ctx.entity_states[entity.name]
    new_act_states = dict(st.actuator_states)
    for i, act in enumerate(entity.actuators):
        if not isinstance(act, IdealPdActuator):
            # builtin: forcerange in model
            model = env.ctx.model
            fr = model.actuator_forcerange
            if fr.shape[0] != E:
                continue
            d_fr = env.sim.get_default_field("actuator_forcerange")
            cid = act.ctrl_ids
            s = _rand(
                env.ctx.next_key(), distribution, scale[0], scale[1],
                (E, len(cid)),
            )
            m = env_mask[:, None]
            new = d_fr[cid][None] * s[..., None]
            fr = fr.at[:, cid].set(jnp.where(m[..., None], new, fr[:, cid]))
            env.ctx.model = model.replace(actuator_forcerange=fr)
            continue
        pstate: PdState = new_act_states[str(i)]
        nj = len(act.joint_names)
        s = _rand(env.ctx.next_key(), distribution, scale[0], scale[1], (E, nj))
        new_act_states[str(i)] = IdealPdActuator.set_effort_limit(
            pstate, env_mask, pstate.default_effort_limit[None] * s
        )
    env.ctx.entity_states[entity.name] = st.replace(
        actuator_states=new_act_states
    )


def randomize_encoder_bias(
    env,
    env_mask,
    bias_range: tuple = (0.0, 0.0),
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    """Per-episode joint encoder offset (reference events.py:709)."""
    entity = env.scene[asset_cfg.name]
    st = env.ctx.entity_states[entity.name]
    E, J = st.encoder_bias.shape
    ids = asset_cfg.joint_ids
    new = jax.random.uniform(
        env.ctx.next_key(), (E, J), minval=bias_range[0], maxval=bias_range[1]
    )
    if not isinstance(ids, slice):
        keep = jnp.ones((J,), bool).at[np.asarray(ids)].set(False)
        new = jnp.where(keep, st.encoder_bias, new)
    bias = jnp.where(env_mask[:, None], new, st.encoder_bias)
    env.ctx.entity_states[entity.name] = st.replace(encoder_bias=bias)


def sync_actuator_delays(
    env,
    env_mask,
    min_lag: int,
    max_lag: int,
    asset_cfg: SceneEntityCfg = _DEFAULT,
):
    """Set identical lag ranges across all delayed actuators
    (reference events.py:747)."""
    from mjlab_tpu.actuator.delayed import DelayedActuator

    entity = env.scene[asset_cfg.name]
    st = env.ctx.entity_states[entity.name]
    new_states = dict(st.actuator_states)
    for i, act in enumerate(entity.actuators):
        if isinstance(act, DelayedActuator):
            new_states[str(i)] = DelayedActuator.set_lags(
                new_states[str(i)], min_lag, max_lag
            )
    env.ctx.entity_states[entity.name] = st.replace(actuator_states=new_states)
