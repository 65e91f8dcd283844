"""Viewer configuration (reference src/mjlab/viewer/viewer_config.py)."""

from mjlab_tpu.envs.manager_based_rl_env import ViewerConfig  # noqa: F401
