"""Task zoo. Importing this package registers all built-in tasks."""

from mjlab_tpu.tasks.registry import (  # noqa: F401
    list_tasks,
    load_env_cfg,
    load_rl_cfg,
    load_runner_cls,
    register_mjlab_task,
)

# task packages register on import
from mjlab_tpu.tasks import velocity  # noqa: F401
from mjlab_tpu.tasks import tracking  # noqa: F401
from mjlab_tpu.tasks import jump  # noqa: F401
from mjlab_tpu.tasks import jumping  # noqa: F401
from mjlab_tpu.tasks import manipulation  # noqa: F401
