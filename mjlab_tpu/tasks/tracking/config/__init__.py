from mjlab_tpu.tasks.tracking.config import g1  # noqa: F401
