"""Tracking-task runner: checkpoints export motion-embedded deployment ONNX
(reference src/mjlab/tasks/tracking/rl/runner.py:14)."""

from __future__ import annotations

import os

from mjlab_tpu.rl.exporter import get_base_metadata
from mjlab_tpu.rl.runner import OnPolicyRunner
from mjlab_tpu.tasks.tracking.rl.exporter import export_motion_policy_as_onnx


class MotionTrackingOnPolicyRunner(OnPolicyRunner):
    def __init__(self, env, cfg, log_dir=None, device=None,
                 registry_name: str | None = None):
        super().__init__(env, cfg, log_dir=log_dir, device=device)
        # W&B motion-artifact registry this run consumes (reference
        # tracking/rl/runner.py:23-56): linked once on first save
        self.registry_name = registry_name

    def save(self, path: str):
        super().save(path)
        policy_dir = os.path.dirname(path)
        filename = os.path.basename(policy_dir) + ".onnx"
        metadata = get_base_metadata(self.env, run_path=self.cfg.run_name)
        onnx_path = os.path.join(policy_dir, filename)
        export_motion_policy_as_onnx(
            self.env,
            self.ppo.ac,
            self.ppo_state,
            onnx_path,
            metadata=metadata,
        )
        if self._writer == "wandb":
            import wandb

            wandb.save(onnx_path, base_path=policy_dir)
            if self.registry_name is not None:
                wandb.run.use_artifact(self.registry_name)
                self.registry_name = None
