from mjlab_tpu.tasks.jumping.config import g1  # noqa: F401
