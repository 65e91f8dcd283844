"""Motion-tracking (imitation) task family."""

from mjlab_tpu.tasks.tracking import config  # noqa: F401
