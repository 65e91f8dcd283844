"""Simulation: batched physics over a device-resident (Model, Data) pair.

TPU-native analog of the reference Simulation (reference
src/mjlab/sim/sim.py:100): where the reference uploads to GPU via
mjwarp.put_model/put_data and captures CUDA graphs, here the model is
converted once to a JAX pytree, Data carries a leading num_envs axis, and
``jax.jit`` of the vmapped step IS the graph capture.

Domain randomization: ``expand_model_fields`` gives selected Model fields a
leading env axis (reference sim/randomization.py:20); the vmap in_axes
pytree is updated accordingly — no recompilation churn at runtime, one
retrace when the randomized field set changes (startup only).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Literal

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.phys import forward as _fwd
from mjlab_tpu.phys.data import Data, make_data
from mjlab_tpu.phys.model import Model, put_model

_INTEGRATOR_MAP = {
    "euler": mujoco.mjtIntegrator.mjINT_EULER,
    "implicitfast": mujoco.mjtIntegrator.mjINT_IMPLICITFAST,
}
_CONE_MAP = {
    "pyramidal": mujoco.mjtCone.mjCONE_PYRAMIDAL,
    "elliptic": mujoco.mjtCone.mjCONE_ELLIPTIC,
}
_SOLVER_MAP = {
    "newton": mujoco.mjtSolver.mjSOL_NEWTON,
}


@dataclass
class MujocoCfg:
    """MuJoCo option configuration (reference sim/sim.py:42-80)."""

    timestep: float = 0.002
    integrator: Literal["euler", "implicitfast"] = "implicitfast"
    impratio: float = 1.0
    cone: Literal["pyramidal", "elliptic"] = "pyramidal"
    jacobian: Literal["auto", "dense", "sparse"] = "auto"  # dense always (TPU)
    solver: Literal["newton"] = "newton"
    iterations: int = 100
    tolerance: float = 1e-8
    ls_iterations: int = 50
    ls_tolerance: float = 0.01
    ccd_iterations: int = 50  # unused (no convex-convex CCD yet)
    gravity: tuple[float, float, float] = (0, 0, -9.81)

    def apply(self, model: mujoco.MjModel) -> None:
        model.opt.cone = _CONE_MAP[self.cone]
        model.opt.integrator = _INTEGRATOR_MAP[self.integrator]
        model.opt.solver = _SOLVER_MAP[self.solver]
        model.opt.timestep = self.timestep
        model.opt.impratio = self.impratio
        model.opt.gravity[:] = self.gravity
        model.opt.iterations = self.iterations
        model.opt.tolerance = self.tolerance
        model.opt.ls_iterations = self.ls_iterations
        model.opt.ls_tolerance = self.ls_tolerance


@dataclass(kw_only=True)
class SimulationCfg:
    """Simulation configuration (reference sim/sim.py:82-98).

    nconmax bounds the compacted contact-slot count K (the top-K capacity
    the solver allocates per env — drives Hessian size and compaction
    cost; lower it for flat-terrain tasks). njmax is accepted for
    config-surface parity but unused: constraint rows are statically laid
    out from the model's pair table instead of heuristic per-world
    allocation.
    """

    nconmax: int | None = None
    njmax: int | None = None
    ls_parallel: bool = True  # parity field; every env is a batch lane here
    contact_sensor_maxmatch: int = 64
    mujoco: MujocoCfg = field(default_factory=MujocoCfg)
    dtype: str = "float32"
    nan_guard: "NanGuardCfg | None" = None  # rolling-history NaN dump


def model_in_axes(m: Model, batched_fields: frozenset[str]):
    """Model-shaped vmap in_axes: 0 for DR-batched fields, None otherwise.

    Only traced (pytree child) fields are replaced with axis specs; static
    aux fields keep their values so the axes tree stays a valid prefix of
    the Model treedef."""
    import jax.numpy as _jnp

    updates = {}
    for f in dataclasses.fields(Model):
        val = getattr(m, f.name)
        if isinstance(val, jax.Array) or isinstance(val, _jnp.ndarray):
            updates[f.name] = 0 if f.name in batched_fields else None
    opt_axes = m.opt.replace(
        timestep=None, gravity=None, magnetic=None, impratio=None
    )
    return m.replace(**updates, opt=opt_axes)


class Simulation:
    """Holds the batched (Model, Data) pair and compiled step/forward/reset.

    The env layer normally inlines these pure functions inside ONE jitted
    control step; this class is the standalone API for tests, benchmarks and
    interactive use.
    """

    def __init__(
        self,
        num_envs: int,
        cfg: SimulationCfg,
        model: mujoco.MjModel,
        device=None,
    ):
        self.cfg = cfg
        self.num_envs = num_envs
        cfg.mujoco.apply(model)
        self.mj_model = model
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        self.model: Model = put_model(model, dtype=self.dtype, nconmax=cfg.nconmax)
        self._batched_fields: frozenset[str] = frozenset()
        self._default_fields: dict[str, jax.Array] = {}

        d0 = make_data(self.model, dtype=self.dtype)
        self.data: Data = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), d0
        )
        self._compiled = {}

    # -- model field expansion (domain randomization) --

    def expand_model_fields(self, field_names: list[str]) -> None:
        """Give the named Model fields a leading num_envs axis (reference
        sim/sim.py:226, sim/randomization.py:20)."""
        updates = {}
        for name in field_names:
            val = getattr(self.model, name)
            if not isinstance(val, jax.Array):
                raise ValueError(f"field {name} is not a traced model field")
            if name in self._batched_fields:
                continue
            updates[name] = jnp.broadcast_to(
                val, (self.num_envs,) + val.shape
            )
        if updates:
            for name in updates:
                self._default_fields.setdefault(name, getattr(self.model, name))
            self.model = self.model.replace(**updates)
            self._batched_fields = self._batched_fields | frozenset(updates)
            self._compiled.clear()

    def get_default_field(self, name: str) -> jax.Array:
        """Pre-expansion default value of a (possibly expanded) model field
        (reference sim/sim.py:242): DR ops apply to defaults to avoid
        accumulation across resets."""
        if name in self._default_fields:
            return self._default_fields[name]
        return getattr(self.model, name)

    @property
    def model_axes(self):
        return model_in_axes(self.model, self._batched_fields)

    # -- pure building blocks (for the env-level single jit) --

    def engine(self) -> str:
        """Select the batched physics engine: MJLAB_TPU_ENGINE=vmap|hybrid|auto.

        auto (default) uses the hybrid env-last step on accelerator
        backends when the model is supported (phys/hybrid.py), and the
        reference vmapped step on CPU (tests compare against it)."""
        import os

        mode = os.environ.get("MJLAB_TPU_ENGINE", "auto")
        if mode == "vmap":
            return "vmap"
        from mjlab_tpu.phys.hybrid import hybrid_supported

        if not hybrid_supported(self.model):
            return "vmap"
        if mode == "hybrid":
            return "hybrid"
        return "hybrid" if jax.default_backend() != "cpu" else "vmap"

    def step_fn(self):
        if self.engine() == "hybrid":
            from mjlab_tpu.phys.hybrid import step_hybrid

            bf = self._batched_fields
            axes = self.model_axes
            return lambda mm, dd: step_hybrid(mm, bf, dd, axes)
        return jax.vmap(_fwd.step, in_axes=(self.model_axes, 0))

    def forward_fn(self):
        if self.engine() == "hybrid":
            from mjlab_tpu.phys.hybrid import forward_hybrid

            bf = self._batched_fields
            axes = self.model_axes
            return lambda mm, dd: forward_hybrid(mm, bf, dd, axes)
        return jax.vmap(_fwd.forward, in_axes=(self.model_axes, 0))

    def refresh_fn(self):
        """Per-control-step kinematic refresh (all envs): positions +
        velocities of every frame the manager/observation layer reads
        (the reference calls full mjwarp forward after resets,
        reference src/mjlab/envs/manager_based_rl_env.py:267-268). On
        the env-last kernel path this reuses the kin_com Pallas kernel
        (phys/hybrid.refresh_envlast) instead of the vmapped stages."""
        from mjlab_tpu.phys.kinematics import com_pos, kinematics
        from mjlab_tpu.phys.smooth import com_vel

        if self.engine() == "hybrid":
            from mjlab_tpu.phys.hybrid import _use_smooth_pallas, refresh_envlast

            bf = self._batched_fields
            if _use_smooth_pallas(self.model, bf, self.data, self.num_envs):
                return lambda mm, dd: refresh_envlast(mm, bf, dd)

        def refresh(mm, dd):
            dd = kinematics(mm, dd)
            dd = com_pos(mm, dd)
            dd = com_vel(mm, dd)
            return dd

        return jax.vmap(refresh, in_axes=(self.model_axes, 0))

    # -- eager convenience API --

    def _get(self, name, fn):
        if name not in self._compiled:
            self._compiled[name] = jax.jit(fn)
        return self._compiled[name]

    def step(self) -> None:
        f = self._get("step", self.step_fn())
        self.data = f(self.model, self.data)

    def forward(self) -> None:
        f = self._get("forward", self.forward_fn())
        self.data = f(self.model, self.data)

    def reset(self, mask: np.ndarray | jax.Array | None = None) -> None:
        """Reset masked envs to defaults (qpos0, zero velocity)."""
        if mask is None:
            mask = jnp.ones((self.num_envs,), bool)
        mask = jnp.asarray(mask, bool)

        def reset_fn(model, data, mask):
            d0 = make_data(model_unbatched, dtype=self.dtype)
            fresh = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (self.num_envs,) + x.shape), d0
            )
            def sel(new, old):
                m = mask.reshape((-1,) + (1,) * (old.ndim - 1))
                return jnp.where(m, new, old)
            return jax.tree_util.tree_map(sel, fresh, data)

        model_unbatched = self.model  # make_data only uses static fields + qpos0
        f = self._get("reset", reset_fn)
        self.data = f(self.model, self.data, mask)
