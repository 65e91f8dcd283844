"""Builtin sensors: the full MuJoCo sensor surface evaluated in JAX.

API mirror of the reference's BuiltinSensorCfg/ObjRef surface
(/root/reference/src/mjlab/sensor/builtin_sensor.py:59-340). The reference
adds mjSENS_* elements to the spec and slices sensordata computed by
mujoco_warp; this engine's Data does not carry sensordata, so every type
is computed directly from the batched physics state — same outputs,
TPU-native evaluation (fused into the jitted env step, no extra passes
over HBM beyond the shared rne-post computation, which is cached per
physics step across all acc/force sensors).

Supported types (33): accelerometer, velocimeter, gyro, force, torque,
magnetometer, rangefinder; jointpos, jointvel, jointlimitpos,
jointlimitvel, jointlimitfrc, jointactuatorfrc; actuatorpos, actuatorvel,
actuatorfrc; framepos, framequat, framexaxis, frameyaxis, framezaxis,
framelinvel, frameangvel, framelinacc, frameangacc; subtreecom,
subtreelinvel, subtreeangmom; e_potential, e_kinetic, clock; upvector
(alias for framezaxis, kept for back-compat); tendonpos, tendonvel,
tendonactuatorfrc (fixed tendons).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.sensor.sensor import Sensor, SensorCfg
from mjlab_tpu.phys.rne_post import (
    object_acceleration, object_velocity, rne_postconstraint, transform_force,
)
from mjlab_tpu.phys import ray as phys_ray
from mjlab_tpu.phys import math

SensorType = Literal[
    "accelerometer", "velocimeter", "gyro", "force", "torque",
    "magnetometer", "rangefinder",
    "jointpos", "jointvel", "jointlimitpos", "jointlimitvel",
    "jointlimitfrc", "jointactuatorfrc",
    "tendonpos", "tendonvel", "tendonactuatorfrc",
    "actuatorpos", "actuatorvel", "actuatorfrc",
    "framepos", "framequat", "framexaxis", "frameyaxis", "framezaxis",
    "framelinvel", "frameangvel", "framelinacc", "frameangacc",
    "subtreecom", "subtreelinvel", "subtreeangmom",
    "e_potential", "e_kinetic", "clock", "upvector",
]

_SITE_SENSORS = {
    "accelerometer", "velocimeter", "gyro", "force", "torque",
    "magnetometer", "rangefinder",
}
_FRAME_SENSORS = {
    "framepos", "framequat", "framexaxis", "frameyaxis", "framezaxis",
    "framelinvel", "frameangvel", "framelinacc", "frameangacc", "upvector",
}
_BODY_SENSORS = {"subtreecom", "subtreelinvel", "subtreeangmom"}
_OBJ_REQUIREMENTS = {
    "jointpos": "joint", "jointvel": "joint", "jointlimitpos": "joint",
    "jointlimitvel": "joint", "jointlimitfrc": "joint",
    "jointactuatorfrc": "joint",
    "actuatorpos": "actuator", "actuatorvel": "actuator",
    "actuatorfrc": "actuator",
    "tendonpos": "tendon", "tendonvel": "tendon",
    "tendonactuatorfrc": "tendon",
}
_SPATIAL_FRAME_TYPES = {"body", "xbody", "geom", "site"}
_SENSORS_ALLOWING_REF = _FRAME_SENSORS - {"upvector"}
_GLOBAL_SENSORS = {"e_potential", "e_kinetic", "clock"}

_SENSOR_DIM = {
    "accelerometer": 3, "velocimeter": 3, "gyro": 3, "force": 3,
    "torque": 3, "magnetometer": 3, "rangefinder": 1,
    "jointpos": 1, "jointvel": 1, "jointlimitpos": 1, "jointlimitvel": 1,
    "jointlimitfrc": 1, "jointactuatorfrc": 1,
    "actuatorpos": 1, "actuatorvel": 1, "actuatorfrc": 1,
    "tendonpos": 1, "tendonvel": 1, "tendonactuatorfrc": 1,
    "framepos": 3, "framequat": 4, "framexaxis": 3, "frameyaxis": 3,
    "framezaxis": 3, "framelinvel": 3, "frameangvel": 3,
    "framelinacc": 3, "frameangacc": 3,
    "subtreecom": 3, "subtreelinvel": 3, "subtreeangmom": 3,
    "e_potential": 1, "e_kinetic": 1, "clock": 1, "upvector": 3,
}

# mjtSensor -> (our type, obj kind) for auto-wrapping XML-declared sensors
_SPEC_SENSOR_TYPES = {
    mujoco.mjtSensor.mjSENS_ACCELEROMETER: ("accelerometer", "site"),
    mujoco.mjtSensor.mjSENS_VELOCIMETER: ("velocimeter", "site"),
    mujoco.mjtSensor.mjSENS_GYRO: ("gyro", "site"),
    mujoco.mjtSensor.mjSENS_FORCE: ("force", "site"),
    mujoco.mjtSensor.mjSENS_TORQUE: ("torque", "site"),
    mujoco.mjtSensor.mjSENS_MAGNETOMETER: ("magnetometer", "site"),
    mujoco.mjtSensor.mjSENS_RANGEFINDER: ("rangefinder", "site"),
    mujoco.mjtSensor.mjSENS_JOINTPOS: ("jointpos", "joint"),
    mujoco.mjtSensor.mjSENS_JOINTVEL: ("jointvel", "joint"),
    mujoco.mjtSensor.mjSENS_JOINTLIMITPOS: ("jointlimitpos", "joint"),
    mujoco.mjtSensor.mjSENS_JOINTLIMITVEL: ("jointlimitvel", "joint"),
    mujoco.mjtSensor.mjSENS_JOINTLIMITFRC: ("jointlimitfrc", "joint"),
    mujoco.mjtSensor.mjSENS_JOINTACTFRC: ("jointactuatorfrc", "joint"),
    mujoco.mjtSensor.mjSENS_ACTUATORPOS: ("actuatorpos", "actuator"),
    mujoco.mjtSensor.mjSENS_ACTUATORVEL: ("actuatorvel", "actuator"),
    mujoco.mjtSensor.mjSENS_ACTUATORFRC: ("actuatorfrc", "actuator"),
    mujoco.mjtSensor.mjSENS_TENDONPOS: ("tendonpos", "tendon"),
    mujoco.mjtSensor.mjSENS_TENDONVEL: ("tendonvel", "tendon"),
    mujoco.mjtSensor.mjSENS_TENDONACTFRC: ("tendonactuatorfrc", "tendon"),
    mujoco.mjtSensor.mjSENS_FRAMEPOS: ("framepos", None),
    mujoco.mjtSensor.mjSENS_FRAMEQUAT: ("framequat", None),
    mujoco.mjtSensor.mjSENS_FRAMEXAXIS: ("framexaxis", None),
    mujoco.mjtSensor.mjSENS_FRAMEYAXIS: ("frameyaxis", None),
    mujoco.mjtSensor.mjSENS_FRAMEZAXIS: ("framezaxis", None),
    mujoco.mjtSensor.mjSENS_FRAMELINVEL: ("framelinvel", None),
    mujoco.mjtSensor.mjSENS_FRAMEANGVEL: ("frameangvel", None),
    mujoco.mjtSensor.mjSENS_FRAMELINACC: ("framelinacc", None),
    mujoco.mjtSensor.mjSENS_FRAMEANGACC: ("frameangacc", None),
    mujoco.mjtSensor.mjSENS_SUBTREECOM: ("subtreecom", "body"),
    mujoco.mjtSensor.mjSENS_SUBTREELINVEL: ("subtreelinvel", "body"),
    mujoco.mjtSensor.mjSENS_SUBTREEANGMOM: ("subtreeangmom", "body"),
    mujoco.mjtSensor.mjSENS_E_POTENTIAL: ("e_potential", None),
    mujoco.mjtSensor.mjSENS_E_KINETIC: ("e_kinetic", None),
    mujoco.mjtSensor.mjSENS_CLOCK: ("clock", None),
}

_MJ_OBJTYPE = {
    mujoco.mjtObj.mjOBJ_BODY: "body",
    mujoco.mjtObj.mjOBJ_XBODY: "xbody",
    mujoco.mjtObj.mjOBJ_GEOM: "geom",
    mujoco.mjtObj.mjOBJ_SITE: "site",
    mujoco.mjtObj.mjOBJ_JOINT: "joint",
    mujoco.mjtObj.mjOBJ_ACTUATOR: "actuator",
    mujoco.mjtObj.mjOBJ_TENDON: "tendon",
}


@dataclass
class ObjRef:
    """Reference to a MuJoCo object (reference builtin_sensor.py:171)."""

    type: Literal["body", "xbody", "joint", "geom", "site", "actuator",
                  "tendon", "camera"]
    name: str
    entity: str | None = None

    def prefixed_name(self) -> str:
        return f"{self.entity}/{self.name}" if self.entity else self.name


@dataclass(kw_only=True)
class BuiltinSensorCfg(SensorCfg):
    sensor_type: SensorType = "gyro"
    obj: ObjRef | None = None
    ref: ObjRef | None = None
    cutoff: float = 0.0
    # back-compat shorthand (pre-ObjRef surface)
    entity: str | None = None
    obj_type: str | None = None
    obj_name: str | None = None
    name: str = ""

    def __post_init__(self):
        if self.obj is None and self.obj_name:
            self.obj = ObjRef(
                type=self.obj_type or "site", name=self.obj_name,
                entity=self.entity,
            )
        t = self.sensor_type
        if t in _GLOBAL_SENSORS:
            return
        if self.obj is None:
            raise ValueError(f"sensor type '{t}' requires obj")
        if t in _SITE_SENSORS and self.obj.type != "site":
            raise ValueError(f"sensor type '{t}' requires obj.type='site'")
        if t in _BODY_SENSORS and self.obj.type != "body":
            raise ValueError(f"sensor type '{t}' requires obj.type='body'")
        if t in _FRAME_SENSORS and self.obj.type not in _SPATIAL_FRAME_TYPES:
            raise ValueError(
                f"sensor type '{t}' requires obj.type in "
                f"{sorted(_SPATIAL_FRAME_TYPES)}, got '{self.obj.type}'"
            )
        req = _OBJ_REQUIREMENTS.get(t)
        if req is not None and self.obj.type != req:
            raise ValueError(
                f"sensor type '{t}' requires obj.type='{req}', "
                f"got '{self.obj.type}'"
            )
        if self.ref is not None and t not in _SENSORS_ALLOWING_REF:
            raise ValueError(f"sensor type '{t}' does not support ref")

    def build(self, scene):
        return BuiltinSensor(self, scene)


class _Frame:
    """Resolved object frame: static ids + accessors into batched Data."""

    def __init__(self, mj_model, obj: ObjRef):
        name = obj.prefixed_name()
        kind = obj.type
        if kind in ("body", "xbody"):
            oid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_BODY, name)
            body = oid
            lquat = (
                np.asarray(mj_model.body_iquat[oid])
                if kind == "body" and oid >= 0 else None
            )
        elif kind == "geom":
            oid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_GEOM, name)
            body = int(mj_model.geom_bodyid[oid]) if oid >= 0 else -1
            lquat = np.asarray(mj_model.geom_quat[oid]) if oid >= 0 else None
        elif kind == "site":
            oid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_SITE, name)
            body = int(mj_model.site_bodyid[oid]) if oid >= 0 else -1
            lquat = np.asarray(mj_model.site_quat[oid]) if oid >= 0 else None
        else:
            raise ValueError(f"unsupported frame object type '{kind}'")
        if oid < 0:
            raise ValueError(f"{kind} '{name}' not found")
        self.kind = kind
        self.oid = oid
        self.body_id = body
        self.root_id = int(mj_model.body_rootid[body])
        # local orientation vs the body frame, for MuJoCo-exact framequat
        # composition (sign included): quat = xquat[body] * local_quat
        self._local_quat = lquat

    def quat(self, d):
        q = d.xquat[:, self.body_id]
        if self._local_quat is not None and not np.allclose(
            self._local_quat, [1.0, 0, 0, 0]
        ):
            q = math.mul_quat(
                q, jnp.asarray(self._local_quat, q.dtype)
            )
        return q

    def pos(self, d):
        if self.kind == "body":
            return d.xipos[:, self.oid]
        if self.kind == "xbody":
            return d.xpos[:, self.oid]
        if self.kind == "geom":
            return d.geom_xpos[:, self.oid]
        return d.site_xpos[:, self.oid]

    def mat(self, d):
        if self.kind == "body":
            return d.ximat[:, self.oid]
        if self.kind == "xbody":
            return d.xmat[:, self.oid]
        if self.kind == "geom":
            return d.geom_xmat[:, self.oid]
        return d.site_xmat[:, self.oid]

    def vel(self, d, local=False):
        O = d.subtree_com[:, self.root_id]
        return object_velocity(
            self.pos(d), O, d.cvel[:, self.body_id],
            self.mat(d) if local else None,
        )

    def acc(self, d, cacc, local=False):
        O = d.subtree_com[:, self.root_id]
        return object_acceleration(
            self.pos(d), O, d.cvel[:, self.body_id], cacc[:, self.body_id],
            self.mat(d) if local else None,
        )


def _rne_post_cached(ctx):
    """rne_postconstraint shared across all sensors for the same Data."""
    key = id(ctx.data)
    cache = getattr(ctx, "_rne_post_cache", None)
    if cache is not None and cache[0] == key:
        return cache[1]
    out = rne_postconstraint(ctx.model, ctx.data)
    ctx._rne_post_cache = (key, out)
    return out


class BuiltinSensor(Sensor):
    def __init__(self, cfg: BuiltinSensorCfg, scene):
        super().__init__(scene)
        self.cfg = cfg

    @classmethod
    def from_spec_sensor(cls, scene, s) -> "BuiltinSensor | None":
        """Wrap an XML-declared sensor (auto-wrap, reference
        scene/scene.py:190-198). Returns None for unsupported types."""
        entry = _SPEC_SENSOR_TYPES.get(s.type)
        if entry is None:
            return None
        stype, kind = entry
        obj = None
        if s.objname:
            okind = kind or _MJ_OBJTYPE.get(s.objtype, "site")
            obj = ObjRef(type=okind, name=s.objname)
        ref = None
        refname = getattr(s, "refname", "") or ""
        # an attached spec prefixes even empty refnames ("robot/"): ignore
        if refname and not refname.endswith("/") and stype in _SENSORS_ALLOWING_REF:
            ref = ObjRef(
                type=_MJ_OBJTYPE.get(s.reftype, "site"), name=refname
            )
        cfg = BuiltinSensorCfg(
            sensor_type=stype, obj=obj, ref=ref,
            cutoff=float(s.cutoff) if s.cutoff else 0.0,
        )
        return cls(cfg, scene)

    # ------------------------------------------------------------------
    def initialize(self, mj_model, num_envs, rng, ctx) -> None:
        self.ctx = ctx
        t = self.cfg.sensor_type
        obj = self.cfg.obj
        self._frame = None
        self._ref = None
        self._joint = None
        self._act_id = None

        if t in _GLOBAL_SENSORS:
            if t == "e_potential":
                self._init_energy_tables(mj_model)
            return

        if t in _SITE_SENSORS or t in _FRAME_SENSORS:
            # site sensors are site-frames; frame sensors resolve per kind
            self._frame = _Frame(mj_model, obj)
            if self.cfg.ref is not None:
                self._ref = _Frame(mj_model, self.cfg.ref)
            return

        if t in _BODY_SENSORS:
            bid = mujoco.mj_name2id(
                mj_model, mujoco.mjtObj.mjOBJ_BODY, obj.prefixed_name()
            )
            if bid < 0:
                raise ValueError(f"body '{obj.prefixed_name()}' not found")
            self.body_id = bid
            self.tree_id = int(mj_model.body_rootid[bid])
            # collect the body's subtree (static topology)
            stack, sub = [bid], []
            while stack:
                b = stack.pop()
                sub.append(b)
                for c in range(mj_model.nbody):
                    if c != b and int(mj_model.body_parentid[c]) == b:
                        stack.append(c)
            self._subtree_bodies = np.array(sorted(sub), np.int32)
            return

        if t in _OBJ_REQUIREMENTS:
            kind = _OBJ_REQUIREMENTS[t]
            name = obj.prefixed_name()
            if kind == "joint":
                jid = mujoco.mj_name2id(
                    mj_model, mujoco.mjtObj.mjOBJ_JOINT, name
                )
                if jid < 0:
                    raise ValueError(f"joint '{name}' not found")
                jt = int(mj_model.jnt_type[jid])
                if t != "jointactuatorfrc" and jt not in (
                    mujoco.mjtJoint.mjJNT_HINGE, mujoco.mjtJoint.mjJNT_SLIDE
                ):
                    raise ValueError(
                        f"sensor '{t}' requires a scalar (hinge/slide) joint"
                    )
                self._joint = jid
                self._jnt_qadr = int(mj_model.jnt_qposadr[jid])
                self._jnt_vadr = int(mj_model.jnt_dofadr[jid])
                self._jnt_range = (
                    float(mj_model.jnt_range[jid, 0]),
                    float(mj_model.jnt_range[jid, 1]),
                )
                self._jnt_limited = bool(mj_model.jnt_limited[jid])
            elif kind == "tendon":
                tid = mujoco.mj_name2id(
                    mj_model, mujoco.mjtObj.mjOBJ_TENDON, name
                )
                if tid < 0:
                    raise ValueError(f"tendon '{name}' not found")
                self._ten_id = tid
                # actuators transmitting to this tendon (tendonactuatorfrc)
                self._ten_actuators = np.array(
                    [
                        u
                        for u in range(mj_model.nu)
                        if int(mj_model.actuator_trntype[u])
                        == int(mujoco.mjtTrn.mjTRN_TENDON)
                        and int(mj_model.actuator_trnid[u, 0]) == tid
                    ],
                    np.int32,
                )
            else:  # actuator
                aid = mujoco.mj_name2id(
                    mj_model, mujoco.mjtObj.mjOBJ_ACTUATOR, name
                )
                if aid < 0:
                    raise ValueError(f"actuator '{name}' not found")
                self._act_id = aid
            return

        raise NotImplementedError(f"sensor type {t}")

    def _init_energy_tables(self, mj_model):
        # joints with springs (hinge/slide only; ball/free quat springs are
        # not supported by the engine's passive stage either)
        springs = []
        for j in range(mj_model.njnt):
            if float(mj_model.jnt_stiffness[j]) == 0.0:
                continue
            jt = int(mj_model.jnt_type[j])
            springs.append(
                (j, jt, int(mj_model.jnt_qposadr[j]),
                 float(mj_model.jnt_stiffness[j]))
            )
        self._springs = springs

    # ------------------------------------------------------------------
    def _limit_terms(self, d):
        """(active, dist, side) for the joint's limit (MuJoCo single
        nearest-side limit row semantics)."""
        q = d.qpos[:, self._jnt_qadr]
        lo, hi = self._jnt_range
        dlo = q - lo
        dhi = hi - q
        lower_closer = dlo < dhi
        dist = jnp.where(lower_closer, dlo, dhi)
        side = jnp.where(lower_closer, 1.0, -1.0)
        active = self._jnt_limited & (dist < 0.0)
        return active, dist, side

    def _limit_row_index(self):
        m = self.ctx.model
        pos = np.nonzero(np.asarray(m.limit_jntid) == self._joint)[0]
        if pos.size == 0:
            return None
        return m.neq_jnt + m.nv + int(pos[0])

    def _compute(self):
        ctx = self.ctx
        d = ctx.data
        m = ctx.model
        t = self.cfg.sensor_type

        if t == "clock":
            # Data.time is per-env (E,) in the batched world
            return jnp.broadcast_to(
                jnp.reshape(d.time, (-1, 1)), (d.qpos.shape[0], 1)
            )
        if t == "e_kinetic":
            ke = 0.5 * jnp.einsum(
                "ebi,ebij,ebj->e", d.cvel, d.cinert, d.cvel
            )
            arm = m.dof_armature  # (nv,) or (E, nv) under DR
            ke = ke + 0.5 * jnp.sum(
                jnp.broadcast_to(arm, d.qvel.shape) * d.qvel**2, axis=-1
            )
            return ke[:, None]
        if t == "e_potential":
            g = jnp.asarray(m.opt.gravity, d.qpos.dtype)
            mass = jnp.broadcast_to(m.body_mass, d.xipos.shape[:2])
            pe = -jnp.sum(mass * jnp.einsum("ebk,k->eb", d.xipos, g), axis=1)
            for (j, jt, qadr, k) in self._springs:
                if jt in (3, 2):  # hinge/slide
                    dq = d.qpos[:, qadr] - m.qpos_spring[..., qadr]
                    pe = pe + 0.5 * k * dq * dq
                elif jt == 0:  # free: translational part only
                    dq = d.qpos[:, qadr:qadr + 3] - jnp.broadcast_to(
                        m.qpos_spring[..., qadr:qadr + 3],
                        d.qpos[:, qadr:qadr + 3].shape,
                    )
                    pe = pe + 0.5 * k * jnp.sum(dq * dq, axis=-1)
            return pe[:, None]

        if t in ("jointpos", "jointvel", "jointlimitpos", "jointlimitvel",
                 "jointlimitfrc", "jointactuatorfrc"):
            if t == "jointpos":
                return d.qpos[:, self._jnt_qadr, None]
            if t == "jointvel":
                return d.qvel[:, self._jnt_vadr, None]
            if t == "jointactuatorfrc":
                return d.qfrc_actuator[:, self._jnt_vadr, None]
            active, dist, side = self._limit_terms(d)
            if t == "jointlimitpos":
                return jnp.where(active, dist, 0.0)[:, None]
            if t == "jointlimitvel":
                return jnp.where(
                    active, side * d.qvel[:, self._jnt_vadr], 0.0
                )[:, None]
            row = self._limit_row_index()
            if row is None:
                return jnp.zeros((d.qpos.shape[0], 1), d.qpos.dtype)
            return jnp.where(active, d.efc_force[:, row], 0.0)[:, None]

        if t in ("tendonpos", "tendonvel"):
            src = d.ten_length if t == "tendonpos" else d.ten_velocity
            return src[:, self._ten_id, None]
        if t == "tendonactuatorfrc":
            # sum of scalar actuator forces acting on this tendon,
            # unscaled by gear (mj_sensorAcc mjSENS_TENDONACTFRC)
            ua = self._ten_actuators
            if ua.size == 0:
                return jnp.zeros((d.qpos.shape[0], 1), d.qpos.dtype)
            return jnp.sum(d.actuator_force[:, ua], axis=1, keepdims=True)

        if t in ("actuatorpos", "actuatorvel", "actuatorfrc"):
            src = {
                "actuatorpos": d.actuator_length,
                "actuatorvel": d.actuator_velocity,
                "actuatorfrc": d.actuator_force,
            }[t]
            return src[:, self._act_id, None]

        if t in _BODY_SENSORS:
            sub = self._subtree_bodies
            if t == "subtreecom":
                mass = jnp.broadcast_to(m.body_mass, d.xipos.shape[:2])[:, sub]
                msum = jnp.sum(mass, axis=1, keepdims=True)
                com = jnp.sum(
                    mass[..., None] * d.xipos[:, sub], axis=1
                ) / jnp.maximum(msum, 1e-12)
                return com
            h = jnp.einsum(
                "ebij,ebj->ebi", d.cinert[:, sub], d.cvel[:, sub]
            )
            h_tot = jnp.sum(h, axis=1)  # (E, 6) about subtree_com[root]
            if t == "subtreelinvel":
                mass = jnp.broadcast_to(m.body_mass, d.xipos.shape[:2])[:, sub]
                msum = jnp.sum(mass, axis=1)
                return h_tot[:, 3:6] / jnp.maximum(msum, 1e-12)[:, None]
            # subtreeangmom: shift angular momentum to the subtree's own CoM
            mass = jnp.broadcast_to(m.body_mass, d.xipos.shape[:2])[:, sub]
            msum = jnp.sum(mass, axis=1, keepdims=True)
            com = jnp.sum(
                mass[..., None] * d.xipos[:, sub], axis=1
            ) / jnp.maximum(msum, 1e-12)
            O = d.subtree_com[:, self.tree_id]
            return h_tot[:, 0:3] + jnp.cross(O - com, h_tot[:, 3:6])

        fr = self._frame
        if t in ("gyro", "velocimeter"):
            v = fr.vel(d, local=True)
            return v[:, 0:3] if t == "gyro" else v[:, 3:6]
        if t == "magnetometer":
            mag = jnp.asarray(m.opt.magnetic, d.qpos.dtype)
            return jnp.einsum(
                "eij,j->ei", jnp.swapaxes(fr.mat(d), -1, -2), mag
            )
        if t == "rangefinder":
            pnt = fr.pos(d)
            vec = fr.mat(d)[..., :, 2]  # site z axis
            return phys_ray.raycast(m, d, pnt, vec, fr.body_id)[:, None]
        if t == "accelerometer":
            cacc, _, _ = _rne_post_cached(ctx)
            return fr.acc(d, cacc, local=True)[:, 3:6]
        if t in ("force", "torque"):
            _, cfrc_int, _ = _rne_post_cached(ctx)
            O = d.subtree_com[:, fr.root_id]
            frc = transform_force(cfrc_int[:, fr.body_id], fr.pos(d), O)
            matT = jnp.swapaxes(fr.mat(d), -1, -2)
            part = frc[:, 3:6] if t == "force" else frc[:, 0:3]
            return jnp.einsum("eij,ej->ei", matT, part)

        if t in _FRAME_SENSORS:
            if t == "framepos":
                p = fr.pos(d)
                if self._ref is not None:
                    rmatT = jnp.swapaxes(self._ref.mat(d), -1, -2)
                    return jnp.einsum(
                        "eij,ej->ei", rmatT, p - self._ref.pos(d)
                    )
                return p
            if t == "framequat":
                q = fr.quat(d)
                if self._ref is not None:
                    qr = self._ref.quat(d)
                    return math.mul_quat(math.conj_quat(qr), q)
                return q
            if t in ("framexaxis", "frameyaxis", "framezaxis", "upvector"):
                col = {"framexaxis": 0, "frameyaxis": 1}.get(t, 2)
                axis = fr.mat(d)[..., :, col]
                if self._ref is not None:
                    rmatT = jnp.swapaxes(self._ref.mat(d), -1, -2)
                    return jnp.einsum("eij,ej->ei", rmatT, axis)
                return axis
            if t in ("framelinvel", "frameangvel"):
                v = fr.vel(d, local=False)
                part = slice(3, 6) if t == "framelinvel" else slice(0, 3)
                if self._ref is None:
                    return v[:, part]
                vr = self._ref.vel(d, local=False)
                rmatT = jnp.swapaxes(self._ref.mat(d), -1, -2)
                if t == "frameangvel":
                    rel = v[:, 0:3] - vr[:, 0:3]
                else:
                    # transport term for the rotating reference frame
                    rel = (
                        v[:, 3:6] - vr[:, 3:6]
                        - jnp.cross(
                            vr[:, 0:3], fr.pos(d) - self._ref.pos(d)
                        )
                    )
                return jnp.einsum("eij,ej->ei", rmatT, rel)
            # framelinacc / frameangacc (ref not applied, as in MuJoCo)
            cacc, _, _ = _rne_post_cached(ctx)
            a = fr.acc(d, cacc, local=False)
            return a[:, 3:6] if t == "framelinacc" else a[:, 0:3]

        raise NotImplementedError(f"sensor type {t}")

    @property
    def data(self):
        out = self._compute()
        if self.cfg.cutoff > 0:
            out = jnp.clip(out, -self.cfg.cutoff, self.cfg.cutoff)
        return out
