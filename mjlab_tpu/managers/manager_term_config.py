"""Manager term configuration dataclasses.

Config surface mirrors reference src/mjlab/managers/manager_term_config.py
so task definitions port over unchanged. Term functions take (env, **params)
and return batched jnp arrays; class terms subclass ManagerTermBase.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Literal

from mjlab_tpu.utils.noise import NoiseCfg, NoiseModelCfg


@dataclass
class ManagerTermBaseCfg:
    func: Callable = None
    params: dict[str, Any] = field(default_factory=dict)


@dataclass
class ActionTermCfg:
    class_type: type = None
    asset_name: str = "robot"
    clip: dict[str, tuple] | None = None
    debug_vis: bool = False


@dataclass
class CommandTermCfg:
    class_type: type = None
    resampling_time_range: tuple[float, float] = (10.0, 10.0)
    debug_vis: bool = False


@dataclass
class CurriculumTermCfg(ManagerTermBaseCfg):
    pass


@dataclass
class EventTermCfg(ManagerTermBaseCfg):
    mode: Literal["startup", "reset", "interval"] = "reset"
    interval_range_s: tuple[float, float] | None = None
    is_global_time: bool = False
    min_step_count_between_reset: int = 0
    domain_randomization: bool = False
    """Marks terms whose params['field'] names a Model field that must get a
    leading env axis (reference manager_term_config.py:73)."""


@dataclass
class ObservationTermCfg(ManagerTermBaseCfg):
    """Pipeline per step: func -> noise -> clip -> scale -> delay -> history
    (reference manager_term_config.py:87-121)."""

    noise: NoiseCfg | NoiseModelCfg | None = None
    clip: tuple[float, float] | None = None
    scale: float | tuple | None = None
    # delay
    delay_min_lag: int = 0
    delay_max_lag: int = 0
    delay_update_period: int = 0
    delay_hold_prob: float = 0.0
    delay_per_env_phase: bool = True
    # history
    history_length: int = 0
    flatten_history_dim: bool = True


@dataclass
class ObservationGroupCfg:
    concatenate_terms: bool = True
    concatenate_dim: int = -1
    enable_corruption: bool = False
    history_length: int | None = None
    flatten_history_dim: bool = True
    # term cfgs are the dataclass's extra attributes (set by task cfgs); a
    # dict form is also accepted:
    terms: dict[str, ObservationTermCfg] = field(default_factory=dict)

    def term_items(self):
        """Yield (name, ObservationTermCfg) from both the dict and any extra
        dataclass attributes (matching the reference's attribute style)."""
        out = list(self.terms.items())
        for k, v in vars(self).items():
            if isinstance(v, ObservationTermCfg):
                out.append((k, v))
        return out


@dataclass
class RewardTermCfg(ManagerTermBaseCfg):
    weight: float = 0.0


@dataclass
class TerminationTermCfg(ManagerTermBaseCfg):
    time_out: bool = False
