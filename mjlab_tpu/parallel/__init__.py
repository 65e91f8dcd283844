from mjlab_tpu.parallel.mesh import (  # noqa: F401
    env_sharding_tree,
    make_env_mesh,
    shard_env_state,
    shard_train_state,
    train_sharding_tree,
)
