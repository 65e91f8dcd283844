from mjlab_tpu.tasks.jump.config import g1  # noqa: F401
