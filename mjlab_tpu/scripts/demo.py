"""Demo CLI (reference src/mjlab/scripts/demo.py): pretrained G1 motion
tracking in the web viewer with 8 envs.

Downloads the reference's public pretrained checkpoint + demo motion from
GCS (sha256-verified cache, scripts/gcs.py), converts the rsl-rl torch
checkpoint into the JAX policy (rl/interop.py), and runs play on the
tracking task in viser. Local --checkpoint-file/--motion-file override the
download for air-gapped machines.
"""

from __future__ import annotations

import argparse

DEMO_TASK = "Mjlab-Tracking-Flat-Unitree-G1"


def run_demo(
    checkpoint_file: str | None = None,
    motion_file: str | None = None,
    num_envs: int = 8,
    num_steps: int = 1000,
    viewer: str = "viser",
    task: str = DEMO_TASK,
):
    from mjlab_tpu.utils.device import apply_platform_env

    apply_platform_env()

    from mjlab_tpu.scripts import gcs

    if checkpoint_file is None:
        checkpoint_file = gcs.ensure_asset("demo_ckpt.pt")
    if motion_file is None:
        motion_file = gcs.ensure_asset("demo_motion.npz")

    import numpy as np

    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv
    from mjlab_tpu.rl import OnPolicyRunner, RslRlVecEnvWrapper

    env_cfg = tasks.load_env_cfg(task, play=True)
    env_cfg.scene.num_envs = num_envs
    if isinstance(env_cfg.commands, dict) and "motion" in env_cfg.commands:
        env_cfg.commands["motion"].motion_file = motion_file
    env = ManagerBasedRlEnv(env_cfg)
    wrapped = RslRlVecEnvWrapper(env)
    agent_cfg = tasks.load_rl_cfg(task)
    runner = OnPolicyRunner(wrapped, agent_cfg)

    if checkpoint_file.endswith(".pt"):
        # reference rsl-rl torch checkpoint
        from mjlab_tpu.rl.interop import load_rslrl_checkpoint

        load_rslrl_checkpoint(checkpoint_file, runner)
    else:
        runner.load(checkpoint_file, load_optimizer=False)
    policy = runner.get_inference_policy()

    if viewer == "headless":
        obs = wrapped.get_observations()
        for t in range(num_steps):
            obs, reward, dones, extras = wrapped.step(policy(obs))
            if t % 100 == 0:
                print(
                    f"t={t} reward={float(np.asarray(reward).mean()):.4f}"
                )
        return

    if viewer == "native":
        from mjlab_tpu.viewer.native import NativeMujocoViewer

        NativeMujocoViewer(env, policy).run()
        return

    from mjlab_tpu.viewer.viser import ViserPlayViewer

    ViserPlayViewer(env, policy).run()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-file", default=None)
    p.add_argument("--motion-file", default=None)
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument(
        "--viewer", choices=("viser", "native", "headless"), default="viser"
    )
    p.add_argument("--task", default=DEMO_TASK)
    args = p.parse_args()
    run_demo(
        checkpoint_file=args.checkpoint_file,
        motion_file=args.motion_file,
        num_envs=args.num_envs,
        num_steps=args.num_steps,
        viewer=args.viewer,
        task=args.task,
    )


if __name__ == "__main__":
    main()
