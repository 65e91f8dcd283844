"""Velocity-task runner: checkpoints also export deployment ONNX with
metadata (reference src/mjlab/tasks/velocity/rl/runner.py:13-38)."""

from __future__ import annotations

import os

from mjlab_tpu.rl.exporter import export_policy_as_onnx, get_base_metadata
from mjlab_tpu.rl.runner import OnPolicyRunner


class VelocityOnPolicyRunner(OnPolicyRunner):
    def save(self, path: str):
        super().save(path)
        policy_dir = os.path.dirname(path)
        filename = os.path.basename(policy_dir) + ".onnx"
        metadata = get_base_metadata(self.env, run_path=self.cfg.run_name)
        export_policy_as_onnx(
            self.ppo.ac,
            self.ppo_state,
            os.path.join(policy_dir, filename),
            metadata=metadata,
        )
