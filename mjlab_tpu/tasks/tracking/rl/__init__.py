from mjlab_tpu.tasks.tracking.rl.runner import (  # noqa: F401
    MotionTrackingOnPolicyRunner,
)
