from mjlab_tpu.tasks.velocity.config import g1, go1  # noqa: F401
