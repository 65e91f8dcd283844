"""Entity: a robot or object composed into the scene.

Host side (startup): loads the entity MjSpec, applies spec editors and the
actuator edit pipeline, and — after the scene compiles the merged model —
resolves global indices (EntityIndexing) and default states.

Runtime: per-env state (targets, actuator states, encoder bias) lives in the
simulation context's ``entity_states[name]`` pytree; reads/writes flow
through EntityData (see entity/data.py). API mirrors reference
src/mjlab/entity/entity.py:97-825.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Callable

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.actuator import ActuatorCfg
from mjlab_tpu.entity.data import EntityData
from mjlab_tpu.actuator.actuator import ActuatorCmd
from mjlab_tpu.utils import spec_config
from mjlab_tpu.utils.spec import auto_wrap_fixed_base_mocap, is_joint_limited
from mjlab_tpu.utils.string import resolve_matching_names, resolve_matching_names_values
from mjlab_tpu.utils.struct import pytree


@pytree
class EntityState:
    """Per-env runtime state of one entity."""

    joint_pos_target: jax.Array  # (E, J)
    joint_vel_target: jax.Array
    joint_effort_target: jax.Array
    encoder_bias: jax.Array  # (E, J)
    actuator_states: dict  # actuator index (str) -> pytree


@dataclass
class EntityIndexing:
    """Global indices/addresses of this entity in the compiled scene."""

    body_ids: np.ndarray
    geom_ids: np.ndarray
    site_ids: np.ndarray
    joint_ids: np.ndarray  # non-free joints (global)
    ctrl_ids: np.ndarray  # global actuator ids, ordered per entity joints
    joint_q_adr: np.ndarray  # qpos addresses of non-free joints
    joint_v_adr: np.ndarray
    free_joint_q_adr: np.ndarray  # (7,) or empty
    free_joint_v_adr: np.ndarray  # (6,) or empty
    mocap_id: int | None
    root_body_id: int
    root_tree_id: int  # body_rootid[root_body_id]
    body_tree_ids: np.ndarray  # body_rootid of each body


@dataclass
class EntityArticulationInfoCfg:
    actuators: tuple[ActuatorCfg, ...] = ()
    soft_joint_pos_limit_factor: float = 1.0


@dataclass
class EntityCfg:
    @dataclass
    class InitialStateCfg:
        pos: tuple = (0.0, 0.0, 0.0)
        rot: tuple = (1.0, 0.0, 0.0, 0.0)
        lin_vel: tuple = (0.0, 0.0, 0.0)
        ang_vel: tuple = (0.0, 0.0, 0.0)
        joint_pos: dict[str, float] | None = dfield(
            default_factory=lambda: {".*": 0.0}
        )
        joint_vel: dict[str, float] = dfield(default_factory=lambda: {".*": 0.0})

    init_state: InitialStateCfg = dfield(default_factory=InitialStateCfg)
    spec_fn: Callable[[], mujoco.MjSpec] = dfield(
        default_factory=lambda: (lambda: mujoco.MjSpec())
    )
    articulation: EntityArticulationInfoCfg | None = None

    lights: tuple = ()
    cameras: tuple = ()
    textures: tuple = ()
    materials: tuple = ()
    collisions: tuple = ()

    debug_vis: bool = False

    def build(self) -> "Entity":
        return Entity(self)


class Entity:
    """See module docstring. Supported type matrix matches the reference:
    fixed/floating x articulated/non-articulated (fixed non-articulated may
    be mocap)."""

    def __init__(self, cfg: EntityCfg):
        self.cfg = cfg
        self._spec = auto_wrap_fixed_base_mocap(cfg.spec_fn)()
        self.name: str = ""  # assigned by Scene.attach
        self.ctx = None  # simulation context, set at initialize
        self.indexing: EntityIndexing | None = None

        # give unnamed geoms/sites synthetic names so global id resolution
        # by prefixed name works after scene attach
        for i, g in enumerate(self._spec.geoms):
            if not g.name:
                g.name = f"_geom{i}"
        for i, s in enumerate(self._spec.sites):
            if not s.name:
                s.name = f"_site{i}"

        joints = list(self._spec.joints)
        self._free_joint = None
        if joints and joints[0].type == mujoco.mjtJoint.mjJNT_FREE:
            self._free_joint = joints[0]
            joints = joints[1:]
        self._non_free_joints = joints

        # spec editors
        for editor in (
            list(cfg.textures)
            + list(cfg.materials)
            + list(cfg.lights)
            + list(cfg.cameras)
            + list(cfg.collisions)
        ):
            editor.edit_spec(self._spec)

        # actuators
        self.actuators: list = []
        if cfg.articulation:
            joint_names = [j.name for j in self._non_free_joints]
            claimed: set[str] = set()
            for acfg in cfg.articulation.actuators:
                ids, names = resolve_matching_names(
                    list(acfg.joint_names_expr), joint_names
                )
                overlap = claimed & set(names)
                if overlap:
                    raise ValueError(f"joints claimed twice: {sorted(overlap)}")
                claimed |= set(names)
                act = acfg.build(self, ids, names)
                act.edit_spec(self._spec, names)
                self.actuators.append(act)

        self._add_initial_state_keyframe()

    def _add_initial_state_keyframe(self) -> None:
        """Synthesize an 'init_state' keyframe on the entity spec from
        cfg.init_state (reference entity/entity.py:170: Scene extracts and
        merges these into the scene-level keyframe; standalone compiles
        get a usable reset key)."""
        ist = self.cfg.init_state
        if ist.joint_pos is None:
            if self._spec.keys:
                self._spec.keys[0].name = "init_state"
            return
        qpos: list[float] = []
        if not self.is_fixed_base:
            qpos += list(ist.pos) + list(ist.rot)
        joint_names = [j.name for j in self._non_free_joints]
        vals = [0.0] * len(joint_names)
        if joint_names:
            ids, _, v = resolve_matching_names_values(ist.joint_pos, joint_names)
            for i, x in zip(ids, v):
                vals[i] = float(x)
        # qpos width per joint: hinge/slide 1 (ball/free not in
        # _non_free_joints joint_pos mapping)
        qpos += vals
        # ctrl: position actuators hold the init joint pos
        ctrl: list[float] = []
        by_name = dict(zip(joint_names, vals))
        for a in self._spec.actuators:
            tgt = by_name.get(a.target, 0.0)
            is_position = float(a.gainprm[0]) > 0 and float(a.biasprm[1]) < 0
            ctrl.append(tgt if is_position else 0.0)
        try:
            self._spec.add_key(name="init_state", qpos=qpos, ctrl=ctrl)
        except Exception:
            pass  # specs with ball joints etc: skip (scene still works)

    # -- static properties --

    @property
    def spec(self) -> mujoco.MjSpec:
        return self._spec

    @property
    def is_fixed_base(self) -> bool:
        return self._free_joint is None

    @property
    def is_articulated(self) -> bool:
        return len(self._non_free_joints) > 0

    @property
    def is_actuated(self) -> bool:
        return len(self.actuators) > 0

    @property
    def joint_names(self) -> list[str]:
        return [j.name.split("/")[-1] for j in self._non_free_joints]

    @property
    def body_names(self) -> list[str]:
        return [b.name.split("/")[-1] for b in self._spec.bodies if b.name != "world"]

    @property
    def geom_names(self) -> list[str]:
        return [g.name.split("/")[-1] for g in self._spec.geoms]

    @property
    def site_names(self) -> list[str]:
        return [s.name.split("/")[-1] for s in self._spec.sites]

    @property
    def actuator_joint_names(self) -> list[str]:
        out = []
        for a in self.actuators:
            out.extend(a.joint_names)
        return out

    @property
    def num_joints(self) -> int:
        return len(self._non_free_joints)

    # -- regex finders (local indices) --

    def find_bodies(self, expr, preserve_order=False):
        return resolve_matching_names(expr, self.body_names, preserve_order)

    def find_joints(self, expr, preserve_order=False):
        return resolve_matching_names(expr, self.joint_names, preserve_order)

    def find_geoms(self, expr, preserve_order=False):
        return resolve_matching_names(expr, self.geom_names, preserve_order)

    def find_sites(self, expr, preserve_order=False):
        return resolve_matching_names(expr, self.site_names, preserve_order)

    def find_actuators(self, expr, preserve_order=False):
        return resolve_matching_names(
            expr, self.actuator_joint_names, preserve_order
        )

    # -- initialization after scene compile --

    def initialize(self, mj_model: mujoco.MjModel, num_envs: int, rng, ctx):
        """Resolve global indexing against the compiled scene model and
        build default states. ``ctx`` is the simulation context (owns data
        and entity_states)."""
        self.ctx = ctx
        self.num_envs = num_envs
        prefix = f"{self.name}/" if self.name else ""

        def gid(objtype, local_name):
            i = mujoco.mj_name2id(mj_model, objtype, prefix + local_name)
            if i < 0:
                raise ValueError(f"'{prefix + local_name}' not in compiled model")
            return i

        body_ids = np.array(
            [gid(mujoco.mjtObj.mjOBJ_BODY, n) for n in self.body_names], np.int32
        )
        geom_ids = np.array(
            [gid(mujoco.mjtObj.mjOBJ_GEOM, n) for n in self.geom_names], np.int32
        )
        site_ids = np.array(
            [gid(mujoco.mjtObj.mjOBJ_SITE, n) for n in self.site_names], np.int32
        )
        joint_ids = np.array(
            [gid(mujoco.mjtObj.mjOBJ_JOINT, n) for n in self.joint_names], np.int32
        )
        joint_q_adr = np.array(
            [mj_model.jnt_qposadr[j] for j in joint_ids], np.int32
        )
        joint_v_adr = np.array(
            [mj_model.jnt_dofadr[j] for j in joint_ids], np.int32
        )
        if self._free_joint is not None:
            fj = gid(mujoco.mjtObj.mjOBJ_JOINT, self._free_joint.name.split("/")[-1])
            fq = int(mj_model.jnt_qposadr[fj])
            fv = int(mj_model.jnt_dofadr[fj])
            free_q = np.arange(fq, fq + 7, dtype=np.int32)
            free_v = np.arange(fv, fv + 6, dtype=np.int32)
        else:
            free_q = np.zeros(0, np.int32)
            free_v = np.zeros(0, np.int32)

        # actuators: global ids by prefixed name (one per joint, named after
        # the joint by the spec helpers)
        ctrl_ids = []
        for act in self.actuators:
            ids = []
            for jn in act.joint_names:
                aid = mujoco.mj_name2id(
                    mj_model, mujoco.mjtObj.mjOBJ_ACTUATOR, prefix + jn
                )
                if aid < 0:
                    raise ValueError(f"actuator '{prefix+jn}' missing")
                ids.append(aid)
            act.ctrl_ids = np.array(ids, np.int32)
            ctrl_ids.extend(ids)
        ctrl_ids = np.array(ctrl_ids, np.int32)

        root_body_id = int(body_ids[0]) if len(body_ids) else 0
        mocap_id = (
            int(mj_model.body_mocapid[root_body_id])
            if len(body_ids) and mj_model.body_mocapid[root_body_id] >= 0
            else None
        )
        self.indexing = EntityIndexing(
            body_ids=body_ids,
            geom_ids=geom_ids,
            site_ids=site_ids,
            joint_ids=joint_ids,
            ctrl_ids=ctrl_ids,
            joint_q_adr=joint_q_adr,
            joint_v_adr=joint_v_adr,
            free_joint_q_adr=free_q,
            free_joint_v_adr=free_v,
            mocap_id=mocap_id,
            root_body_id=root_body_id,
            root_tree_id=int(mj_model.body_rootid[root_body_id]),
            body_tree_ids=mj_model.body_rootid[body_ids].astype(np.int32),
        )
        self.body_iquat_local = mj_model.body_iquat.astype(np.float32)
        self.site_bodyids = mj_model.site_bodyid[site_ids].astype(np.int32)
        self.site_tree_ids = mj_model.body_rootid[self.site_bodyids].astype(np.int32)
        self.geom_bodyids = mj_model.geom_bodyid[geom_ids].astype(np.int32)
        self.geom_tree_ids = mj_model.body_rootid[self.geom_bodyids].astype(np.int32)

        # -- default states from cfg.init_state --
        ist = self.cfg.init_state
        J = self.num_joints
        default_joint_pos = np.zeros((1, J), np.float32)
        default_joint_vel = np.zeros((1, J), np.float32)
        if J:
            if ist.joint_pos is None:
                # use qpos0 from the model (keyframe-free default)
                default_joint_pos[0] = mj_model.qpos0[joint_q_adr]
            else:
                ids, _, vals = resolve_matching_names_values(
                    ist.joint_pos, self.joint_names
                )
                default_joint_pos[0, ids] = vals
            ids, _, vals = resolve_matching_names_values(
                ist.joint_vel, self.joint_names
            )
            default_joint_vel[0, ids] = vals
        self.default_joint_pos = jnp.asarray(default_joint_pos)
        self.default_joint_vel = jnp.asarray(default_joint_vel)
        self.default_root_state = jnp.asarray(
            np.concatenate(
                [ist.pos, ist.rot, ist.lin_vel, ist.ang_vel], dtype=np.float32
            )[None]
        )  # (1, 13)

        # joint limits
        if J:
            limits = mj_model.jnt_range[joint_ids].astype(np.float32)
            limited = np.array(
                [mj_model.jnt_limited[j] for j in joint_ids], bool
            )
            limits[~limited] = (-1e10, 1e10)
        else:
            limits = np.zeros((0, 2), np.float32)
        self.joint_pos_limits = jnp.asarray(limits)[None]  # (1, J, 2)
        factor = (
            self.cfg.articulation.soft_joint_pos_limit_factor
            if self.cfg.articulation
            else 1.0
        )
        mid = 0.5 * (limits[:, 0] + limits[:, 1])
        half = 0.5 * (limits[:, 1] - limits[:, 0]) * factor
        soft = np.stack([mid - half, mid + half], -1)
        self.soft_joint_pos_limits = jnp.asarray(soft)[None]  # (1, J, 2)

        # runtime state
        keys = jax.random.split(rng, len(self.actuators) + 1)
        act_states = {
            str(i): a.initialize(num_envs, keys[i])
            for i, a in enumerate(self.actuators)
        }
        zeros = jnp.zeros((num_envs, J), jnp.float32)
        ctx.entity_states[self.name] = EntityState(
            joint_pos_target=zeros,
            joint_vel_target=zeros,
            joint_effort_target=zeros,
            encoder_bias=zeros,
            actuator_states=act_states,
        )
        self._data_view = EntityData(self)

        # default qpos/qvel for reset_scene_to_default
        self._default_qpos_addr = (
            np.concatenate([free_q, joint_q_adr])
            if len(free_q)
            else joint_q_adr
        )

    @property
    def data(self) -> EntityData:
        return self._data_view

    # -- per-substep control application --

    def apply_actuator_controls(self):
        """Compute every actuator's ctrl and write into data.ctrl. Runs at
        physics rate inside the jitted control step (reference
        entity/entity.py:815)."""
        if not self.actuators:
            return
        st = self.ctx.entity_states[self.name]
        d = self.ctx.data
        qpos = d.qpos[:, self.indexing.joint_q_adr]
        qvel = d.qvel[:, self.indexing.joint_v_adr]
        ctrl = d.ctrl
        new_act_states = dict(st.actuator_states)
        for i, act in enumerate(self.actuators):
            jids = np.asarray(act.joint_ids, np.int32)
            cmd = ActuatorCmd(
                position_target=st.joint_pos_target[:, jids],
                velocity_target=st.joint_vel_target[:, jids],
                effort_target=st.joint_effort_target[:, jids],
                joint_pos=qpos[:, jids],
                joint_vel=qvel[:, jids],
            )
            s, out = act.compute(new_act_states[str(i)], cmd)
            new_act_states[str(i)] = s
            ctrl = ctrl.at[:, act.ctrl_ids].set(out)
        self.ctx.entity_states[self.name] = st.replace(
            actuator_states=new_act_states
        )
        self.ctx.data = d.replace(ctrl=ctrl)

    def reset(self, mask, rng):
        """Reset actuator states for masked envs."""
        st = self.ctx.entity_states[self.name]
        keys = jax.random.split(rng, max(len(self.actuators), 1))
        new_states = dict(st.actuator_states)
        for i, act in enumerate(self.actuators):
            new_states[str(i)] = act.reset(new_states[str(i)], mask, keys[i])
        self.ctx.entity_states[self.name] = st.replace(actuator_states=new_states)

    def update(self, dt: float):
        """Per-control-step bookkeeping (none needed currently)."""
