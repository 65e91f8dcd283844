"""Tracking-task runner: checkpoints export motion-embedded deployment ONNX
(reference src/mjlab/tasks/tracking/rl/runner.py:14)."""

from __future__ import annotations

import os

from mjlab_tpu.rl.exporter import get_base_metadata
from mjlab_tpu.rl.runner import OnPolicyRunner
from mjlab_tpu.tasks.tracking.rl.exporter import export_motion_policy_as_onnx


class MotionTrackingOnPolicyRunner(OnPolicyRunner):
    def save(self, path: str):
        super().save(path)
        policy_dir = os.path.dirname(path)
        filename = os.path.basename(policy_dir) + ".onnx"
        metadata = get_base_metadata(self.env, run_path=self.cfg.run_name)
        export_motion_policy_as_onnx(
            self.env,
            self.ppo.ac,
            self.ppo_state,
            os.path.join(policy_dir, filename),
            metadata=metadata,
        )
