"""Multi-device env sharding (SURVEY §4.6 gap: the reference has NO
distributed tests; here the 8-virtual-CPU-device mesh from conftest
exercises the real sharding path end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mjlab_tpu.parallel import make_env_mesh, shard_env_state


def test_mesh_spans_all_devices():
    mesh = make_env_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("data",)


@pytest.mark.slow
def test_env_step_sharded_over_mesh():
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv

    n = len(jax.devices())
    num_envs = 2 * n
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = num_envs
    env = ManagerBasedRlEnv(cfg)
    env.reset()

    mesh = make_env_mesh()
    state = shard_env_state(env._state, mesh, num_envs)
    # env-batched leaves sharded along data, rest replicated
    qpos_sh = state.data.qpos.sharding
    assert qpos_sh.spec == P("data")

    A = env.action_manager.total_action_dim
    action = jax.device_put(
        jnp.zeros((num_envs, A), jnp.float32), NamedSharding(mesh, P("data"))
    )
    out = jax.jit(env._traced_step)(state, action)
    obs = out[1]["policy"]
    jax.block_until_ready(obs)
    # outputs stay sharded along data — no resharding inserted
    assert obs.sharding.spec == P("data")
    assert bool(jnp.isfinite(obs).all())
    env.close()
