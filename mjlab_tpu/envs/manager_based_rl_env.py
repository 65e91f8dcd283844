"""ManagerBasedRlEnv: the manager-based RL environment.

Public API mirrors reference src/mjlab/envs/manager_based_rl_env.py:42-417
(cfg surface, manager load order, step/reset semantics). TPU-native
execution model: the ENTIRE control step — decimation x (actuators ->
physics step -> sensor update), terminations, rewards, masked resets,
command/event updates and the observation pipeline — is ONE jitted pure
function over an EnvState pytree. No per-step host sync; resets are boolean
masks (the reference's nonzero() env-id sync at manager_based_rl_env.py:294
is deliberately NOT replicated).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.action_manager import ActionManager, ActionState
from mjlab_tpu.managers.command_manager import CommandManager, NullCommandManager
from mjlab_tpu.managers.curriculum_manager import (
    CurriculumManager,
    NullCurriculumManager,
)
from mjlab_tpu.managers.event_manager import EventManager
from mjlab_tpu.managers.manager_term_config import EventTermCfg
from mjlab_tpu.managers.observation_manager import ObservationManager
from mjlab_tpu.managers.reward_manager import RewardManager
from mjlab_tpu.managers.termination_manager import TerminationManager
from mjlab_tpu.phys import forward as phys_fwd
from mjlab_tpu.phys.kinematics import com_pos, kinematics
from mjlab_tpu.phys.smooth import com_vel
from mjlab_tpu.scene.scene import Scene, SceneCfg, SimContext
from mjlab_tpu.sim.sim import Simulation, SimulationCfg
from mjlab_tpu.utils.struct import pytree
from mjlab_tpu.utils.spaces import Box, DictSpace
from mjlab_tpu.envs.types import VecEnvStepReturn


@dataclass
class DefaultEventsCfg:
    """Default event set (reference manager_based_rl_env.py:52-59)."""

    reset_scene_to_default: EventTermCfg = field(
        default_factory=lambda: EventTermCfg(func=None, mode="reset")
    )

    def __post_init__(self):
        if self.reset_scene_to_default.func is None:
            from mjlab_tpu.envs.mdp.events import reset_scene_to_default

            self.reset_scene_to_default.func = reset_scene_to_default


@dataclass
class ViewerConfig:
    origin_type: str = "world"
    asset_name: str | None = None
    distance: float = 5.0
    azimuth: float = 90.0
    elevation: float = -30.0
    width: int = 1280
    height: int = 720


@dataclass(kw_only=True)
class ManagerBasedRlEnvCfg:
    decimation: int = 1
    scene: SceneCfg = field(default_factory=SceneCfg)
    observations: Any = None
    actions: Any = None
    events: Any = field(default_factory=DefaultEventsCfg)
    seed: int | None = None
    sim: SimulationCfg = field(default_factory=SimulationCfg)
    viewer: ViewerConfig = field(default_factory=ViewerConfig)
    episode_length_s: float = 0.0
    rewards: Any = None
    terminations: Any = None
    commands: Any = None
    curriculum: Any = None
    is_finite_horizon: bool = False


@pytree
class EnvState:
    model: Any  # phys.Model (DR-able traced fields may be per-env)
    data: Any
    entity_states: dict
    sensor_states: dict
    action_state: Any
    obs_state: dict
    reward_state: dict
    termination_state: dict
    event_state: dict
    command_state: dict
    curriculum_state: dict
    terrain_state: dict
    episode_length: jax.Array  # (E,) int32
    common_step: jax.Array  # () int32
    rng: jax.Array


class Ctx(SimContext):
    """The single mutable trace-time context owned by the env."""

    def __init__(self, model, data):
        super().__init__(model, data)
        self.action_state = None
        self.obs_state = {}
        self.reward_state = {}
        self.termination_state = {}
        self.event_state = {}
        self.command_state = {}
        self.curriculum_state = {}
        self.terrain_state = {}
        self.episode_length = None
        self.common_step = None
        self.rng = None
        self.reward_step_values = {}
        self.extras_log = {}

    def next_key(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def load(self, s: EnvState):
        self.model = s.model
        self.data = s.data
        self.entity_states = dict(s.entity_states)
        self.sensor_states = dict(s.sensor_states)
        self.action_state = s.action_state
        self.obs_state = dict(s.obs_state)
        self.reward_state = dict(s.reward_state)
        self.termination_state = dict(s.termination_state)
        self.event_state = dict(s.event_state)
        self.command_state = dict(s.command_state)
        self.curriculum_state = dict(s.curriculum_state)
        self.terrain_state = dict(s.terrain_state)
        self.episode_length = s.episode_length
        self.common_step = s.common_step
        self.rng = s.rng
        self.extras_log = {}

    def freeze(self) -> EnvState:
        return EnvState(
            model=self.model,
            data=self.data,
            entity_states=dict(self.entity_states),
            sensor_states=dict(self.sensor_states),
            action_state=self.action_state,
            obs_state=dict(self.obs_state),
            reward_state=dict(self.reward_state),
            termination_state=dict(self.termination_state),
            event_state=dict(self.event_state),
            command_state=dict(self.command_state),
            curriculum_state=dict(self.curriculum_state),
            terrain_state=dict(self.terrain_state),
            episode_length=self.episode_length,
            common_step=self.common_step,
            rng=self.rng,
        )


class ManagerBasedRlEnv:
    is_vector_env = True
    metadata = {"render_modes": [None, "rgb_array"]}

    def __init__(self, cfg: ManagerBasedRlEnvCfg, device=None, render_mode=None):
        self.cfg = cfg
        self.device = device
        self.render_mode = render_mode
        seed = cfg.seed if cfg.seed is not None else 0
        self._init_rng = jax.random.PRNGKey(seed)

        # 1. scene composition + model compile (host)
        self.scene = Scene(cfg.scene, device)
        mj_model = self.scene.compile()
        self.sim = Simulation(cfg.scene.num_envs, cfg.sim, mj_model, device)
        self.mj_model = self.sim.mj_model

        # 2. context + scene runtime init
        self.ctx = Ctx(self.sim.model, self.sim.data)
        self._init_rng, k = jax.random.split(self._init_rng)
        self.scene.initialize(self.mj_model, self.ctx, k)

        # NaN guard (reference sim/sim.py:269 + utils/nan_guard.py): ring
        # buffer of physics state recorded inside the jitted step; host
        # dump via debug.callback on first detection.
        self.nan_guard = None
        if cfg.sim.nan_guard is not None and cfg.sim.nan_guard.enabled:
            from mjlab_tpu.utils.nan_guard import NanGuard

            self.nan_guard = NanGuard(cfg.sim.nan_guard, self.mj_model)
            m = self.sim.model
            self.ctx.sensor_states["_nan_guard"] = self.nan_guard.make_state(
                self.num_envs, m.nq, m.nv, m.nu
            )

        # 3. initial kinematic refresh so manager dry-runs (shape
        # inference) see valid positions/velocities. This is the SAME
        # refresh the production reset path uses (_refresh_kinematics);
        # the full forward (constraint solve) was compiled here until
        # round 3 — a multi-minute XLA compile on cold start that no
        # dry-run output depends on (contact fields keep their make_data
        # defaults until the first real step).
        model_axes = self.sim.model_axes

        def _init_refresh(m, d):
            d = kinematics(m, d)
            d = com_pos(m, d)
            d = com_vel(m, d)
            return d

        self.ctx.data = jax.jit(
            jax.vmap(_init_refresh, in_axes=(model_axes, 0))
        )(self.sim.model, self.ctx.data)

        # 4. managers, reference load order (manager_based_rl_env.py:209-252)
        self.ctx.rng = self._next_init_key()
        self.ctx.episode_length = jnp.zeros((self.num_envs,), jnp.int32)
        self.ctx.common_step = jnp.zeros((), jnp.int32)

        if self.scene.terrain is not None:
            self.ctx.terrain_state = self.scene.terrain.init_state(
                self.num_envs, self._next_init_key()
            )

        self.event_manager = EventManager(cfg.events, self)
        dr_fields = self.event_manager.domain_randomization_fields
        if dr_fields:
            self.sim.expand_model_fields(dr_fields)
            self.ctx.model = self.sim.model
        self.ctx.event_state = self.event_manager.init_state(
            self.num_envs, self._next_init_key()
        )

        if cfg.commands is not None:
            self.command_manager = CommandManager(cfg.commands, self)
        else:
            self.command_manager = NullCommandManager(self)
        self.ctx.command_state = self.command_manager.init_state(
            self.num_envs, self._next_init_key()
        )

        self.action_manager = ActionManager(cfg.actions, self)
        self.ctx.action_state = self.action_manager.init_state(self.num_envs)

        self.observation_manager = ObservationManager(cfg.observations, self)
        self.ctx.obs_state = self.observation_manager.init_state(
            self.num_envs, self._next_init_key()
        )

        self.termination_manager = TerminationManager(cfg.terminations, self)
        self.ctx.termination_state = self.termination_manager.init_state(
            self.num_envs
        )

        self.reward_manager = RewardManager(cfg.rewards, self)
        self.ctx.reward_state = self.reward_manager.init_state(self.num_envs)

        if cfg.curriculum is not None:
            self.curriculum_manager = CurriculumManager(cfg.curriculum, self)
        else:
            self.curriculum_manager = NullCurriculumManager(self)
        self.ctx.curriculum_state = self.curriculum_manager.init_state(
            self.num_envs
        )

        # 5. startup events (domain randomization over expanded fields).
        # Model fields mutated in-place via ctx.model.
        self.event_manager.apply_startup()
        self.sim.model = self.ctx.model

        # 6. startup introspection: dump every manager's active terms
        # (reference prints PrettyTable summaries at env init, e.g.
        # observation_manager.py:44-70); silence with MJLAB_QUIET=1
        if not os.environ.get("MJLAB_QUIET"):
            self._print_manager_tables()

        # 7. spaces
        self._build_spaces()

        # 7. compile step/reset
        self._step_fn = None
        self._reset_fn = None
        self._state: EnvState = self.ctx.freeze()

    # -- helpers --

    def _next_init_key(self):
        self._init_rng, k = jax.random.split(self._init_rng)
        return k

    @property
    def num_envs(self) -> int:
        return self.cfg.scene.num_envs

    @property
    def physics_dt(self) -> float:
        return self.cfg.sim.mujoco.timestep

    @property
    def step_dt(self) -> float:
        return self.cfg.sim.mujoco.timestep * self.cfg.decimation

    @property
    def max_episode_length_s(self) -> float:
        return self.cfg.episode_length_s

    @property
    def max_episode_length(self) -> int:
        # play variants disable the timeout with episode_length_s=1e9
        # (reference tracking play cfg); clamp to int32 so comparisons
        # against the int32 episode_length_buf can't overflow under jit
        n = int(np.ceil(self.cfg.episode_length_s / self.step_dt))
        return min(n, np.iinfo(np.int32).max)

    @property
    def episode_length_buf(self):
        return self.ctx.episode_length

    @property
    def common_step_counter(self):
        return self.ctx.common_step

    @property
    def extras(self):
        """Trace-time side-channel for Metrics/ logs written by terms
        (reference terms write env.extras['log'][...])."""
        return {"log": self.ctx.extras_log}

    @property
    def state(self) -> EnvState:
        return self._state

    def _print_manager_tables(self) -> None:
        from mjlab_tpu.utils.logging import print_table

        def rows_of(terms):
            if isinstance(terms, dict):
                return [(g, ", ".join(ts)) for g, ts in terms.items()]
            return [(t, "") for t in terms]

        for name, mgr in (
            ("Observations", self.observation_manager),
            ("Actions", self.action_manager),
            ("Rewards", self.reward_manager),
            ("Terminations", self.termination_manager),
            ("Events", self.event_manager),
            ("Commands", self.command_manager),
            ("Curriculum", self.curriculum_manager),
        ):
            terms = mgr.active_terms
            terms = terms() if callable(terms) else terms
            if not terms:
                continue
            if name == "Observations":
                rows = [
                    (g, f"dim={self.observation_manager.group_obs_dim(g)}",
                     ", ".join(ts))
                    for g, ts in terms.items()
                ]
                print_table(rows, ("group", "shape", "terms"),
                            title=f"[{name}]")
            elif name == "Rewards":
                rows = [
                    (t, f"{self.reward_manager.get_term_cfg(t).weight:+.3g}")
                    for t in terms
                ]
                print_table(rows, ("term", "weight"), title=f"[{name}]")
            else:
                rows = rows_of(terms)
                print_table(rows, ("term", "detail"), title=f"[{name}]")

    def _build_spaces(self):
        self.single_action_space = Box(
            -np.inf, np.inf, (self.action_manager.total_action_dim,)
        )
        obs_spaces = {}
        for g in self.observation_manager.active_terms:
            obs_spaces[g] = Box(
                -np.inf, np.inf, (self.observation_manager.group_obs_dim(g),)
            )
        self.single_observation_space = DictSpace(obs_spaces)

    # -- traced bodies --

    def _refresh_kinematics(self):
        """Post-reset kinematic refresh: positions/velocities of all envs
        (the reference calls full sim.forward when any env resets).
        Engine-selected: the env-last kernel path when available, else
        the vmapped kinematics+com_pos+com_vel stages (sim.refresh_fn)."""
        self.ctx.data = self.sim.refresh_fn()(self.ctx.model, self.ctx.data)

    def _reset_masked(self, mask) -> dict:
        """Masked reset of all composed state, reference order
        (manager_based_rl_env.py:381-416)."""
        logs = {}
        logs.update(self.curriculum_manager.compute(mask))
        self.scene.reset(self.ctx, mask, self.ctx.next_key())
        self.event_manager.apply_reset(mask)
        logs.update(self.observation_manager.reset(mask))
        logs.update(self.action_manager.reset(mask))
        logs.update(self.reward_manager.reset(mask))
        logs.update(self.command_manager.reset(mask))
        logs.update(self.termination_manager.reset(mask))
        # episode length stats for logging
        n = jnp.maximum(jnp.sum(mask), 1)
        logs["Episode/length"] = (
            jnp.sum(jnp.where(mask, self.ctx.episode_length, 0)) / n
        )
        self.ctx.episode_length = jnp.where(mask, 0, self.ctx.episode_length)
        return logs

    def _traced_step(self, state: EnvState, action: jax.Array):
        ctx = self.ctx
        ctx.load(state)
        step_phys = self.sim.step_fn()

        self.action_manager.process_action(action)

        # decimation loop as lax.scan: one copy of the physics substep in
        # the compiled program instead of `decimation` unrolled copies.
        def substep(carry, _):
            ctx.data, ctx.entity_states, ctx.sensor_states, ctx.rng = carry
            self.action_manager.apply_action()
            self.scene.write_data_to_sim()
            ctx.data = step_phys(ctx.model, ctx.data)
            self.scene.update(ctx, self.physics_dt)
            return (
                ctx.data,
                dict(ctx.entity_states),
                dict(ctx.sensor_states),
                ctx.rng,
            ), None

        carry0 = (ctx.data, dict(ctx.entity_states), dict(ctx.sensor_states), ctx.rng)
        carry, _ = jax.lax.scan(substep, carry0, None, length=self.cfg.decimation)
        ctx.data, ctx.entity_states, ctx.sensor_states, ctx.rng = carry
        ctx.entity_states = dict(ctx.entity_states)
        ctx.sensor_states = dict(ctx.sensor_states)

        if self.nan_guard is not None:
            gstate = self.nan_guard.record(
                ctx.sensor_states["_nan_guard"], ctx.data
            )
            self.nan_guard.check_and_dump(gstate, ctx.data)
            ctx.sensor_states["_nan_guard"] = gstate

        ctx.episode_length = ctx.episode_length + 1
        ctx.common_step = ctx.common_step + 1

        terminated, truncated = self.termination_manager.compute()
        reward = self.reward_manager.compute(self.step_dt)
        done = terminated | truncated

        logs = self._reset_masked(done)
        self._refresh_kinematics()

        self.command_manager.compute(self.step_dt)
        self.event_manager.apply_interval(self.step_dt)
        obs = self.observation_manager.compute(update_history=True)

        logs.update(ctx.extras_log)
        return ctx.freeze(), obs, reward, terminated, truncated, logs

    def _traced_reset(self, state: EnvState):
        ctx = self.ctx
        ctx.load(state)
        mask = jnp.ones((self.num_envs,), bool)
        logs = self._reset_masked(mask)
        self._refresh_kinematics()
        self.command_manager.compute(self.step_dt)
        obs = self.observation_manager.compute(update_history=True)
        return ctx.freeze(), obs, logs

    # -- public API --

    def step(self, action: jax.Array) -> VecEnvStepReturn:
        if self._step_fn is None:
            self._step_fn = jax.jit(self._traced_step, donate_argnums=0)
        self._state, obs, reward, terminated, truncated, logs = self._step_fn(
            self._state, action
        )
        self.ctx.load(self._state)
        extras = {"log": logs, "time_outs": truncated}
        return obs, reward, terminated, truncated, extras

    def reset(self, seed=None, options=None):
        if seed is not None:
            self._state = self._state.replace(rng=jax.random.PRNGKey(seed))
        if self._reset_fn is None:
            self._reset_fn = jax.jit(self._traced_reset)
        self._state, obs, logs = self._reset_fn(self._state)
        self.ctx.load(self._state)
        return obs, {"log": logs}

    def seed(self, seed: int):
        self._state = self._state.replace(rng=jax.random.PRNGKey(seed))
        return seed

    def render(self):
        if self.render_mode != "rgb_array":
            return None
        from mjlab_tpu.viewer.offscreen_renderer import OffscreenRenderer

        if not hasattr(self, "_renderer"):
            self._renderer = OffscreenRenderer(
                self.mj_model, self.cfg.viewer
            )
        return self._renderer.render(self)

    def close(self):
        pass
