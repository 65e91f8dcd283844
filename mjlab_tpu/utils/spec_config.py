"""Declarative MjSpec editors (host-side).

Equivalents of reference src/mjlab/utils/spec_config.py: dataclass configs
applied to an entity's MjSpec before scene attach — collision properties by
regex, lights, cameras, textures, materials.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Sequence

import mujoco
import numpy as np


@dataclass
class SpecCfg:
    def edit_spec(self, spec: mujoco.MjSpec) -> None:  # pragma: no cover
        raise NotImplementedError


def _match(expr_tuple: Sequence[str], name: str) -> bool:
    return any(re.fullmatch(e, name) for e in expr_tuple)


def _resolve_value(value, name: str, default=None):
    """value may be a scalar or a dict of regex->scalar (first match wins)."""
    if isinstance(value, dict):
        for k, v in value.items():
            if re.fullmatch(k, name):
                return v
        return default
    return value


@dataclass
class CollisionCfg(SpecCfg):
    """Enable/configure collision on geoms selected by regex
    (reference spec_config.py:137). Geoms NOT matching geom_names_expr get
    their collisions disabled (contype=conaffinity=0)."""

    geom_names_expr: tuple[str, ...] = (".*",)
    contype: int | dict[str, int] = 1
    conaffinity: int | dict[str, int] = 1
    condim: int | dict[str, int] | None = None
    priority: int | dict[str, int] | None = None
    friction: tuple | dict[str, tuple] | None = None
    solref: tuple | dict[str, tuple] | None = None
    solimp: tuple | dict[str, tuple] | None = None
    disable_other_geoms: bool = True

    def edit_spec(self, spec: mujoco.MjSpec) -> None:
        for g in spec.geoms:
            name = g.name or ""
            if not _match(self.geom_names_expr, name):
                if self.disable_other_geoms:
                    g.contype = 0
                    g.conaffinity = 0
                continue
            g.contype = int(_resolve_value(self.contype, name, 1))
            g.conaffinity = int(_resolve_value(self.conaffinity, name, 1))
            condim = _resolve_value(self.condim, name)
            if condim is not None:
                g.condim = int(condim)
            priority = _resolve_value(self.priority, name)
            if priority is not None:
                g.priority = int(priority)
            friction = _resolve_value(self.friction, name)
            if friction is not None:
                fr = np.array(g.friction)
                fr[: len(friction)] = friction
                g.friction = fr
            solref = _resolve_value(self.solref, name)
            if solref is not None:
                sr = np.array(g.solref)
                sr[: len(solref)] = solref
                g.solref = sr
            solimp = _resolve_value(self.solimp, name)
            if solimp is not None:
                si = np.array(g.solimp)
                si[: len(solimp)] = solimp
                g.solimp = si


@dataclass
class TextureCfg(SpecCfg):
    name: str = "tex"
    type: str = "2d"
    builtin: str = "checker"
    rgb1: tuple[float, float, float] = (0.2, 0.3, 0.4)
    rgb2: tuple[float, float, float] = (0.1, 0.15, 0.2)
    width: int = 300
    height: int = 300

    def edit_spec(self, spec: mujoco.MjSpec) -> None:
        tex = spec.add_texture(name=self.name)
        tex.type = getattr(mujoco.mjtTexture, f"mjTEXTURE_{self.type.upper()}")
        tex.builtin = getattr(
            mujoco.mjtBuiltin, f"mjBUILTIN_{self.builtin.upper()}"
        )
        tex.rgb1[:] = self.rgb1
        tex.rgb2[:] = self.rgb2
        tex.width = self.width
        tex.height = self.height


@dataclass
class MaterialCfg(SpecCfg):
    name: str = "mat"
    texture: str | None = None
    texrepeat: tuple[float, float] = (1.0, 1.0)
    rgba: tuple[float, float, float, float] | None = None
    reflectance: float = 0.0

    def edit_spec(self, spec: mujoco.MjSpec) -> None:
        mat = spec.add_material(name=self.name)
        if self.texture is not None:
            mat.textures[mujoco.mjtTextureRole.mjTEXROLE_RGB] = self.texture
        mat.texrepeat[:] = self.texrepeat
        if self.rgba is not None:
            mat.rgba[:] = self.rgba
        mat.reflectance = self.reflectance


@dataclass
class LightCfg(SpecCfg):
    name: str = "light"
    body: str = "world"
    pos: tuple[float, float, float] = (0, 0, 3)
    dir: tuple[float, float, float] = (0, 0, -1)
    directional: bool = False
    castshadow: bool = True

    def edit_spec(self, spec: mujoco.MjSpec) -> None:
        body = (
            spec.worldbody if self.body == "world" else spec.body(self.body)
        )
        light = body.add_light(pos=self.pos, dir=self.dir)
        light.name = self.name
        light.type = (
            mujoco.mjtLightType.mjLIGHT_DIRECTIONAL
            if self.directional
            else mujoco.mjtLightType.mjLIGHT_SPOT
        )
        light.castshadow = self.castshadow


@dataclass
class CameraCfg(SpecCfg):
    name: str = "camera"
    body: str = "world"
    pos: tuple[float, float, float] = (0, -2, 1)
    quat: tuple[float, float, float, float] | None = None
    fovy: float = 45.0
    mode: str = "fixed"

    def edit_spec(self, spec: mujoco.MjSpec) -> None:
        body = (
            spec.worldbody if self.body == "world" else spec.body(self.body)
        )
        cam = body.add_camera(pos=self.pos, fovy=self.fovy)
        cam.name = self.name
        if self.quat is not None:
            cam.quat[:] = self.quat
        cam.mode = getattr(mujoco.mjtCamLight, f"mjCAMLIGHT_{self.mode.upper()}")
