from mjlab_tpu.parallel.mesh import (  # noqa: F401
    make_env_mesh,
    shard_env_state,
    shard_train_state,
)
