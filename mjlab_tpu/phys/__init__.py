"""Batched MuJoCo-semantics physics engine in JAX.

This package is the TPU-native replacement for the reference's external
mujoco_warp dependency (reference SURVEY.md §2.1): a (Model, Data) pytree
pair where physics is a pure function ``step: (Model, Data) -> Data`` written
for a single world and batched with ``jax.vmap`` (selective Model batching
for domain randomization), compiled once with ``jax.jit``.

Pipeline structure follows MuJoCo's documented computation pipeline
(kinematics -> com quantities -> CRB -> collision -> constraints ->
velocity/bias -> actuation -> acceleration -> constraint solve -> integrate),
with all shapes static and all per-world heterogeneity handled by masking.
"""

from mjlab_tpu.phys.model import Model, Option, put_model  # noqa: F401
from mjlab_tpu.phys.data import Data, Contact, make_data, put_data  # noqa: F401
from mjlab_tpu.phys.forward import step  # noqa: F401
# NOTE: the forward-dynamics function lives at mjlab_tpu.phys.forward.forward;
# it is intentionally not re-exported here so the submodule name stays usable.
