"""EntityData: batched views over the scene-wide physics Data.

Read properties compute from the current Data (valid after forward); write
methods functionally update the Data held by the simulation context. API
mirrors reference src/mjlab/entity/data.py; all tensors are jnp with leading
num_envs axis. World-frame conventions:
  *_link_* : at the body frame origin
  *_com_*  : at the body center of mass
  root velocities in the body frame use root_link_quat_w.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.utils import math

if TYPE_CHECKING:
    from mjlab_tpu.entity.entity import Entity, EntityIndexing


def compute_velocity_from_cvel(pos, subtree_com, cvel):
    """cvel ([ang, lin] at the subtree-root com) -> [lin, ang] at pos."""
    ang = cvel[..., 0:3]
    lin = cvel[..., 3:6]
    lin_w = lin + jnp.cross(ang, pos - subtree_com)
    return jnp.concatenate([lin_w, ang], axis=-1)


class EntityData:
    """Lazy view bound to an Entity and its simulation context."""

    ROOT_POSE_DIM = 7
    ROOT_VEL_DIM = 6
    ROOT_STATE_DIM = 13

    def __init__(self, entity: "Entity"):
        self._e = entity

    # -- plumbing --

    @property
    def _ctx(self):
        return self._e.ctx

    @property
    def _d(self):
        return self._e.ctx.data

    @property
    def _idx(self) -> "EntityIndexing":
        return self._e.indexing

    @property
    def _st(self):
        return self._e.ctx.entity_states[self._e.name]

    # -- static metadata --

    @property
    def is_fixed_base(self):
        return self._e.is_fixed_base

    @property
    def is_articulated(self):
        return self._e.is_articulated

    @property
    def gravity_vec_w(self):
        B = self._d.qpos.shape[0]
        return jnp.broadcast_to(
            jnp.array([0.0, 0.0, -1.0], self._d.qpos.dtype), (B, 3)
        )

    @property
    def forward_vec_b(self):
        B = self._d.qpos.shape[0]
        return jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0], self._d.qpos.dtype), (B, 3)
        )

    # -- defaults (host-derived, device-resident) --

    @property
    def default_root_state(self):
        return self._e.default_root_state  # (13,) broadcastable or (E,13)

    @property
    def default_joint_pos(self):
        return self._e.default_joint_pos

    @property
    def default_joint_vel(self):
        return self._e.default_joint_vel

    @property
    def joint_pos_limits(self):
        return self._e.joint_pos_limits  # (J, 2)

    @property
    def soft_joint_pos_limits(self):
        return self._e.soft_joint_pos_limits  # (J, 2)

    @property
    def encoder_bias(self):
        return self._st.encoder_bias  # (E, J)

    # -- targets (per-env state) --

    @property
    def joint_pos_target(self):
        return self._st.joint_pos_target

    @property
    def joint_vel_target(self):
        return self._st.joint_vel_target

    @property
    def joint_effort_target(self):
        return self._st.joint_effort_target

    # -- root state (world) --

    @property
    def root_link_pos_w(self):
        return self._d.xpos[:, self._idx.root_body_id]

    @property
    def root_link_quat_w(self):
        return self._d.xquat[:, self._idx.root_body_id]

    @property
    def root_link_pose_w(self):
        return jnp.concatenate([self.root_link_pos_w, self.root_link_quat_w], -1)

    @property
    def root_link_vel_w(self):
        b = self._idx.root_body_id
        d = self._d
        root = self._idx.root_tree_id
        return compute_velocity_from_cvel(
            d.xpos[:, b], d.subtree_com[:, root], d.cvel[:, b]
        )

    @property
    def root_link_lin_vel_w(self):
        return self.root_link_vel_w[..., 0:3]

    @property
    def root_link_ang_vel_w(self):
        return self.root_link_vel_w[..., 3:6]

    @property
    def root_com_pos_w(self):
        return self._d.xipos[:, self._idx.root_body_id]

    @property
    def root_com_quat_w(self):
        return math.quat_mul(
            self.root_link_quat_w,
            jnp.asarray(self._e.body_iquat_local[self._idx.root_body_id]),
        )

    @property
    def root_com_vel_w(self):
        b = self._idx.root_body_id
        d = self._d
        root = self._idx.root_tree_id
        return compute_velocity_from_cvel(
            d.xipos[:, b], d.subtree_com[:, root], d.cvel[:, b]
        )

    @property
    def root_com_lin_vel_w(self):
        return self.root_com_vel_w[..., 0:3]

    @property
    def root_com_ang_vel_w(self):
        return self.root_com_vel_w[..., 3:6]

    # -- root state (body frame) --

    @property
    def root_link_lin_vel_b(self):
        return math.quat_apply_inverse(self.root_link_quat_w, self.root_link_lin_vel_w)

    @property
    def root_link_ang_vel_b(self):
        return math.quat_apply_inverse(self.root_link_quat_w, self.root_link_ang_vel_w)

    @property
    def root_com_lin_vel_b(self):
        return math.quat_apply_inverse(self.root_link_quat_w, self.root_com_lin_vel_w)

    @property
    def root_com_ang_vel_b(self):
        return math.quat_apply_inverse(self.root_link_quat_w, self.root_com_ang_vel_w)

    # shorthand used by mdp observation terms (link-frame variants,
    # matching reference envs/mdp/observations.py:28-35)
    root_pos_w = root_link_pos_w
    root_quat_w = root_link_quat_w
    root_lin_vel_b = root_link_lin_vel_b
    root_ang_vel_b = root_link_ang_vel_b

    @property
    def projected_gravity_b(self):
        return math.quat_apply_inverse(self.root_link_quat_w, self.gravity_vec_w)

    @property
    def heading_w(self):
        fwd = math.quat_apply(self.root_link_quat_w, self.forward_vec_b)
        return jnp.arctan2(fwd[..., 1], fwd[..., 0])

    # -- bodies / geoms / sites --

    @property
    def body_link_pos_w(self):
        return self._d.xpos[:, self._idx.body_ids]

    @property
    def body_link_quat_w(self):
        return self._d.xquat[:, self._idx.body_ids]

    @property
    def body_link_vel_w(self):
        d = self._d
        ids = self._idx.body_ids
        roots = self._idx.body_tree_ids
        return compute_velocity_from_cvel(
            d.xpos[:, ids], d.subtree_com[:, roots], d.cvel[:, ids]
        )

    @property
    def body_link_lin_vel_w(self):
        return self.body_link_vel_w[..., 0:3]

    @property
    def body_link_ang_vel_w(self):
        return self.body_link_vel_w[..., 3:6]

    @property
    def body_com_pos_w(self):
        return self._d.xipos[:, self._idx.body_ids]

    @property
    def body_com_vel_w(self):
        d = self._d
        ids = self._idx.body_ids
        roots = self._idx.body_tree_ids
        return compute_velocity_from_cvel(
            d.xipos[:, ids], d.subtree_com[:, roots], d.cvel[:, ids]
        )

    @property
    def body_com_lin_vel_w(self):
        return self.body_com_vel_w[..., 0:3]

    @property
    def body_com_ang_vel_w(self):
        return self.body_com_vel_w[..., 3:6]

    @property
    def geom_pos_w(self):
        return self._d.geom_xpos[:, self._idx.geom_ids]

    @property
    def site_pos_w(self):
        return self._d.site_xpos[:, self._idx.site_ids]

    @property
    def site_quat_w(self):
        return math.mat_to_quat(self._d.site_xmat[:, self._idx.site_ids])

    @property
    def site_vel_w(self):
        d = self._d
        bids = self._e.site_bodyids
        roots = self._e.site_tree_ids
        return compute_velocity_from_cvel(
            d.site_xpos[:, self._idx.site_ids],
            d.subtree_com[:, roots],
            d.cvel[:, bids],
        )

    @property
    def site_lin_vel_w(self):
        return self.site_vel_w[..., 0:3]

    @property
    def site_ang_vel_w(self):
        return self.site_vel_w[..., 3:6]

    @property
    def geom_lin_vel_w(self):
        d = self._d
        bids = self._e.geom_bodyids
        roots = self._e.geom_tree_ids
        vel = compute_velocity_from_cvel(
            d.geom_xpos[:, self._idx.geom_ids],
            d.subtree_com[:, roots],
            d.cvel[:, bids],
        )
        return vel[..., 0:3]

    # -- joints --

    @property
    def joint_pos(self):
        return self._d.qpos[:, self._idx.joint_q_adr]

    @property
    def joint_pos_biased(self):
        return self.joint_pos + self.encoder_bias

    @property
    def joint_vel(self):
        return self._d.qvel[:, self._idx.joint_v_adr]

    @property
    def joint_acc(self):
        return self._d.qacc[:, self._idx.joint_v_adr]

    @property
    def actuator_force(self):
        return self._d.actuator_force[:, self._idx.ctrl_ids]

    @property
    def generalized_force(self):
        return self._d.qfrc_actuator[:, self._idx.joint_v_adr]

    # -- writes (functional: replace data in the context) --

    def _mask(self, env_ids, B):
        if env_ids is None:
            return jnp.ones((B,), bool)
        env_ids = jnp.asarray(env_ids)
        if env_ids.dtype == jnp.bool_:
            return env_ids
        return jnp.zeros((B,), bool).at[env_ids].set(True)

    def write_root_pose(self, pose, env_ids=None):
        if self._e.is_fixed_base:
            raise ValueError("cannot write root pose of fixed-base entity")
        d = self._d
        mask = self._mask(env_ids, d.qpos.shape[0])[:, None]
        adr = self._idx.free_joint_q_adr
        qpos = d.qpos.at[:, adr].set(
            jnp.where(mask, pose, d.qpos[:, adr])
        )
        self._ctx.data = d.replace(qpos=qpos)

    def write_root_velocity(self, velocity, env_ids=None):
        """velocity: (E, 6) [lin_w, ang_w]; free-joint ang part is stored
        body-local per MuJoCo convention."""
        if self._e.is_fixed_base:
            raise ValueError("cannot write root velocity of fixed-base entity")
        d = self._d
        mask = self._mask(env_ids, d.qpos.shape[0])[:, None]
        quat = d.qpos[:, self._idx.free_joint_q_adr[3:7]]
        ang_b = math.quat_apply_inverse(quat, velocity[:, 3:6])
        vel_q = jnp.concatenate([velocity[:, 0:3], ang_b], -1)
        adr = self._idx.free_joint_v_adr
        qvel = d.qvel.at[:, adr].set(jnp.where(mask, vel_q, d.qvel[:, adr]))
        self._ctx.data = d.replace(qvel=qvel)

    def write_root_state(self, root_state, env_ids=None):
        self.write_root_pose(root_state[:, :7], env_ids)
        self.write_root_velocity(root_state[:, 7:13], env_ids)

    def write_joint_position(self, position, joint_ids=None, env_ids=None):
        d = self._d
        mask = self._mask(env_ids, d.qpos.shape[0])[:, None]
        adr = self._idx.joint_q_adr
        if joint_ids is not None:
            adr = adr[joint_ids]
        qpos = d.qpos.at[:, adr].set(jnp.where(mask, position, d.qpos[:, adr]))
        self._ctx.data = d.replace(qpos=qpos)

    def write_joint_velocity(self, velocity, joint_ids=None, env_ids=None):
        d = self._d
        mask = self._mask(env_ids, d.qpos.shape[0])[:, None]
        adr = self._idx.joint_v_adr
        if joint_ids is not None:
            adr = adr[joint_ids]
        qvel = d.qvel.at[:, adr].set(jnp.where(mask, velocity, d.qvel[:, adr]))
        self._ctx.data = d.replace(qvel=qvel)

    def write_joint_state(self, position, velocity, joint_ids=None, env_ids=None):
        self.write_joint_position(position, joint_ids, env_ids)
        self.write_joint_velocity(velocity, joint_ids, env_ids)

    def write_external_wrench(self, force, torque, body_ids=None, env_ids=None):
        d = self._d
        mask = self._mask(env_ids, d.qpos.shape[0])[:, None, None]
        ids = self._idx.body_ids if body_ids is None else self._idx.body_ids[body_ids]
        wrench = jnp.concatenate([force, torque], -1)
        xfrc = d.xfrc_applied.at[:, ids].set(
            jnp.where(mask, wrench, d.xfrc_applied[:, ids])
        )
        self._ctx.data = d.replace(xfrc_applied=xfrc)

    def write_ctrl(self, ctrl, ctrl_ids=None, env_ids=None):
        d = self._d
        mask = self._mask(env_ids, d.qpos.shape[0])[:, None]
        ids = self._idx.ctrl_ids if ctrl_ids is None else ctrl_ids
        new = d.ctrl.at[:, ids].set(jnp.where(mask, ctrl, d.ctrl[:, ids]))
        self._ctx.data = d.replace(ctrl=new)

    def write_mocap_pose(self, pose, env_ids=None):
        if self._idx.mocap_id is None:
            raise ValueError("entity is not a mocap body")
        d = self._d
        mask = self._mask(env_ids, d.qpos.shape[0])[:, None]
        mid = self._idx.mocap_id
        mocap_pos = d.mocap_pos.at[:, mid].set(
            jnp.where(mask, pose[:, :3], d.mocap_pos[:, mid])
        )
        mocap_quat = d.mocap_quat.at[:, mid].set(
            jnp.where(mask, pose[:, 3:7], d.mocap_quat[:, mid])
        )
        self._ctx.data = d.replace(mocap_pos=mocap_pos, mocap_quat=mocap_quat)

    def set_joint_position_target(self, target, joint_ids=None, env_ids=None):
        self._set_target("joint_pos_target", target, joint_ids, env_ids)

    def set_joint_velocity_target(self, target, joint_ids=None, env_ids=None):
        self._set_target("joint_vel_target", target, joint_ids, env_ids)

    def set_joint_effort_target(self, target, joint_ids=None, env_ids=None):
        self._set_target("joint_effort_target", target, joint_ids, env_ids)

    def _set_target(self, name, target, joint_ids, env_ids):
        st = self._st
        cur = getattr(st, name)
        B = cur.shape[0]
        mask = self._mask(env_ids, B)[:, None]
        if joint_ids is None:
            new = jnp.where(mask, target, cur)
        else:
            sub = cur[:, joint_ids]
            new = cur.at[:, joint_ids].set(jnp.where(mask, target, sub))
        self._ctx.entity_states[self._e.name] = st.replace(**{name: new})

    def clear_state(self, env_ids=None):
        st = self._st
        B = st.joint_pos_target.shape[0]
        mask = self._mask(env_ids, B)[:, None]
        self._ctx.entity_states[self._e.name] = st.replace(
            joint_pos_target=jnp.where(mask, 0.0, st.joint_pos_target),
            joint_vel_target=jnp.where(mask, 0.0, st.joint_vel_target),
            joint_effort_target=jnp.where(mask, 0.0, st.joint_effort_target),
        )
        # clear external wrenches
        d = self._d
        m3 = self._mask(env_ids, B)[:, None, None]
        ids = self._idx.body_ids
        xfrc = d.xfrc_applied.at[:, ids].set(
            jnp.where(m3, 0.0, d.xfrc_applied[:, ids])
        )
        self._ctx.data = d.replace(xfrc_applied=xfrc)
