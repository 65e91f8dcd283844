"""RGBA helpers (reference src/mjlab/utils/color.py)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class RGBA:
    r: float
    g: float
    b: float
    a: float = 1.0

    def as_tuple(self) -> tuple[float, float, float, float]:
        return (self.r, self.g, self.b, self.a)

    @staticmethod
    def random(rng: np.random.Generator, alpha: float = 1.0) -> "RGBA":
        c = rng.uniform(0.2, 0.9, 3)
        return RGBA(float(c[0]), float(c[1]), float(c[2]), alpha)


RED = RGBA(0.9, 0.2, 0.2)
GREEN = RGBA(0.2, 0.8, 0.2)
BLUE = RGBA(0.2, 0.4, 0.9)
GRAY = RGBA(0.5, 0.5, 0.5)
