"""Device-mesh env sharding: the TPU replacement for the reference's
torchrunx + NCCL data parallelism (reference scripts/train.py:216-221,
docs/api/distributed_training.md).

Design: one 'data' mesh axis over all chips (all hosts). Every env-state
leaf with a leading num_envs axis is sharded along 'data'; learner
parameters and optimizer state are replicated. The SAME jitted train step
runs under these shardings — XLA inserts psum/all-gather for the gradient
reduction over ICI/DCN automatically. No per-rank processes, no explicit
collectives in user code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(devices=None) -> Mesh:
    """1-D mesh over all available chips with a single 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("data",))


def _shard_leaf(mesh: Mesh, num_envs: int):
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def f(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, data_sharding)
        return jax.device_put(x, replicated)

    return f

def shard_env_state(state, mesh: Mesh, num_envs: int):
    """Shard every (num_envs, ...) leaf along 'data'; replicate the rest.

    DR-expanded model fields (leading env axis) shard automatically."""
    return jax.tree_util.tree_map(_shard_leaf(mesh, num_envs), state)


def shard_train_state(ppo_state, mesh: Mesh):
    """Replicate learner params/optimizer/normalizers across the mesh."""
    replicated = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated), ppo_state
    )
