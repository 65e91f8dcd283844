"""SceneEntityCfg: regex-bearing reference to scene elements, resolved once
at manager construction into static index arrays
(reference src/mjlab/managers/scene_entity_config.py:32-188)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class SceneEntityCfg:
    name: str = "robot"
    joint_names: tuple[str, ...] | str | None = None
    joint_ids: object = slice(None)
    body_names: tuple[str, ...] | str | None = None
    body_ids: object = slice(None)
    geom_names: tuple[str, ...] | str | None = None
    geom_ids: object = slice(None)
    site_names: tuple[str, ...] | str | None = None
    site_ids: object = slice(None)
    actuator_names: tuple[str, ...] | str | None = None
    actuator_ids: object = slice(None)
    preserve_order: bool = False

    def resolve(self, scene) -> None:
        entity = scene[self.name]
        for kind in ("joint", "body", "geom", "site", "actuator"):
            names = getattr(self, f"{kind}_names")
            if names is None:
                continue
            if isinstance(names, str):
                names = (names,)
            plural = "bodies" if kind == "body" else f"{kind}s"
            finder = getattr(entity, f"find_{plural}")
            ids, matched = finder(list(names), preserve_order=self.preserve_order)
            all_names = getattr(
                entity,
                {"actuator": "actuator_joint_names"}.get(kind, f"{kind}_names"),
            )
            if len(ids) == len(all_names):
                # slice optimization: everything matched in order
                if ids == list(range(len(all_names))):
                    setattr(self, f"{kind}_ids", slice(None))
                    setattr(self, f"{kind}_names", tuple(matched))
                    continue
            setattr(self, f"{kind}_ids", np.array(ids, np.int32))
            setattr(self, f"{kind}_names", tuple(matched))
