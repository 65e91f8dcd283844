"""Velocity-tracking task family."""

from mjlab_tpu.tasks.velocity import config  # noqa: F401  (registers tasks)
