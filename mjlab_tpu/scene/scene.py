"""Scene: MjSpec composition of terrain + entities + sensors, and runtime
fan-out to the composed parts.

Host side mirrors reference src/mjlab/scene/scene.py:29-198: entities attach
under a "{name}/" prefix, terrain under "terrain/", sensors edit the merged
spec. Runtime fan-out (initialize / reset / update / write_data_to_sim) runs
inside the jitted env step through the shared simulation context.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.entity.entity import Entity, EntityCfg

if TYPE_CHECKING:
    from mjlab_tpu.terrains.importer import TerrainImporterCfg


_SCENE_VISUAL_XML = """
<mujoco>
  <visual>
    <headlight diffuse="0.6 0.6 0.6" ambient="0.3 0.3 0.3" specular="0 0 0"/>
    <rgba haze="0.15 0.25 0.35 1"/>
    <global offwidth="1280" offheight="720"/>
    <quality shadowsize="8192"/>
  </visual>
</mujoco>
"""


@dataclass
class SceneCfg:
    num_envs: int = 1
    env_spacing: float = 2.0
    terrain: "TerrainImporterCfg | None" = None
    entities: dict[str, EntityCfg] = field(default_factory=dict)
    sensors: dict[str, object] = field(default_factory=dict)
    extent: float | None = None
    spec_fn: object | None = None  # optional callable mutating the root spec


class SimContext:
    """Mutable trace-time container threading (data, entity/sensor states)
    through the composed scene during one jitted step."""

    def __init__(self, model, data, entity_states=None, sensor_states=None):
        self.model = model
        self.data = data
        self.entity_states = dict(entity_states or {})
        self.sensor_states = dict(sensor_states or {})


class Scene:
    def __init__(self, cfg: SceneCfg, device=None):
        self.cfg = cfg
        self.num_envs = cfg.num_envs
        self.spec = mujoco.MjSpec.from_string(_SCENE_VISUAL_XML)

        self.terrain = None
        if cfg.terrain is not None:
            from mjlab_tpu.terrains.importer import TerrainImporter

            self.terrain = TerrainImporter(cfg.terrain, self.num_envs)
            frame = self.spec.worldbody.add_frame()
            self.spec.attach(self.terrain.spec, frame=frame, prefix="terrain/")

        self.entities: dict[str, Entity] = {}
        for name, ecfg in cfg.entities.items():
            entity = ecfg.build()
            entity.name = name
            frame = self.spec.worldbody.add_frame()
            self.spec.attach(entity.spec, frame=frame, prefix=f"{name}/")
            self.entities[name] = entity

        self.sensors: dict[str, object] = {}
        sensor_items = (
            cfg.sensors.items()
            if isinstance(cfg.sensors, dict)
            else [(s.name, s) for s in cfg.sensors]
        )
        for name, scfg in sensor_items:
            sensor = scfg.build(self)
            sensor.name = name
            sensor.edit_spec(self.spec)
            self.sensors[name] = sensor

        # auto-wrap builtin sensors already present in entity XMLs
        # (reference scene/scene.py:190-198): expose them by their prefixed
        # name, e.g. scene["robot/imu_ang_vel"].
        from mjlab_tpu.sensor.builtin_sensor import BuiltinSensor

        for s in self.spec.sensors:
            wrapped = BuiltinSensor.from_spec_sensor(self, s)
            if wrapped is not None and s.name not in self.sensors:
                wrapped.name = s.name
                self.sensors[s.name] = wrapped

        if cfg.spec_fn is not None:
            cfg.spec_fn(self.spec)

        self._mj_model: mujoco.MjModel | None = None

    def __getitem__(self, key: str):
        if key in self.entities:
            return self.entities[key]
        if key in self.sensors:
            return self.sensors[key]
        if key == "terrain" and self.terrain is not None:
            return self.terrain
        raise KeyError(
            f"'{key}' not in scene; entities={list(self.entities)}, "
            f"sensors={list(self.sensors)}"
        )

    def compile(self) -> mujoco.MjModel:
        self._mj_model = self.spec.compile()
        return self._mj_model

    @property
    def mj_model(self) -> mujoco.MjModel:
        assert self._mj_model is not None, "call compile() first"
        return self._mj_model

    # -- runtime --

    def initialize(self, mj_model: mujoco.MjModel, ctx, rng) -> None:
        keys = jax.random.split(rng, len(self.entities) + len(self.sensors) + 1)
        i = 0
        for entity in self.entities.values():
            entity.initialize(mj_model, self.num_envs, keys[i], ctx)
            i += 1
        for sensor in self.sensors.values():
            sensor.initialize(mj_model, self.num_envs, keys[i], ctx)
            i += 1
        if self.terrain is not None:
            self.terrain.initialize(self.num_envs, ctx)

    @property
    def env_origins(self) -> jax.Array:
        """(num_envs, 3) world origin of each env."""
        if self.terrain is not None:
            return self.terrain.env_origins
        n = self.num_envs
        side = int(np.ceil(np.sqrt(n)))
        idx = np.arange(n)
        row, col = idx // side, idx % side
        origins = np.zeros((n, 3), np.float32)
        origins[:, 0] = (row - (side - 1) / 2) * self.cfg.env_spacing
        origins[:, 1] = (col - (side - 1) / 2) * self.cfg.env_spacing
        return jnp.asarray(origins)

    def reset(self, ctx, mask, rng) -> None:
        keys = jax.random.split(rng, max(len(self.entities) + len(self.sensors), 1))
        i = 0
        for entity in self.entities.values():
            entity.data.clear_state(mask)
            entity.reset(mask, keys[i])
            i += 1
        for sensor in self.sensors.values():
            sensor.reset(ctx, mask)
            i += 1

    def update(self, ctx, dt: float) -> None:
        for entity in self.entities.values():
            entity.update(dt)
        for sensor in self.sensors.values():
            sensor.update(ctx, dt)

    def write_data_to_sim(self) -> None:
        for entity in self.entities.values():
            entity.apply_actuator_controls()
