from mjlab_tpu.tasks.manipulation.config import yam  # noqa: F401
