from mjlab_tpu.tasks.velocity.rl.runner import VelocityOnPolicyRunner  # noqa: F401
