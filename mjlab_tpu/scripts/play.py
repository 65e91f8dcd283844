"""Play CLI: roll out a zero / random / trained policy
(reference src/mjlab/scripts/play.py). Headless by default; viser viewer
integration is a follow-up."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def run_play(
    task: str,
    agent: str = "zero",
    checkpoint_file: str | None = None,
    num_envs: int = 1,
    num_steps: int = 200,
    viewer: str = "headless",
    wandb_run_path: str | None = None,
    motion_file: str | None = None,
):
    from mjlab_tpu.utils.device import apply_platform_env

    apply_platform_env()

    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv
    from mjlab_tpu.rl import OnPolicyRunner, RslRlVecEnvWrapper

    env_cfg = tasks.load_env_cfg(task, play=True)
    env_cfg.scene.num_envs = num_envs
    # tracking tasks need a reference motion (reference play.py resolves
    # it next to the wandb checkpoint; offline, pass --motion-file)
    if (
        motion_file is not None
        and isinstance(env_cfg.commands, dict)
        and "motion" in env_cfg.commands
    ):
        env_cfg.commands["motion"].motion_file = motion_file
    env = ManagerBasedRlEnv(env_cfg)
    wrapped = RslRlVecEnvWrapper(env)
    A = env.action_manager.total_action_dim

    if agent == "trained":
        agent_cfg = tasks.load_rl_cfg(task)
        runner = OnPolicyRunner(wrapped, agent_cfg)
        if checkpoint_file is None and wandb_run_path is not None:
            from mjlab_tpu.utils.os import get_wandb_checkpoint_path

            checkpoint_file = get_wandb_checkpoint_path(wandb_run_path)
        if checkpoint_file is None:
            # latest local run/checkpoint by the agent cfg regexes
            # (reference play.py:51-133, utils/os.py:52-90)
            import os as _os

            from mjlab_tpu.utils.os import get_checkpoint_path

            checkpoint_file = get_checkpoint_path(
                _os.path.join("logs", agent_cfg.experiment_name),
                agent_cfg.load_run,
                agent_cfg.load_checkpoint,
            )
            print(f"[play] using latest checkpoint {checkpoint_file}")
        runner.load(checkpoint_file, load_optimizer=False)
        policy = runner.get_inference_policy()
    elif agent == "random":
        rng = [jax.random.PRNGKey(0)]

        def policy(obs):
            rng[0], k = jax.random.split(rng[0])
            return jax.random.uniform(k, (num_envs, A), minval=-1, maxval=1)
    else:

        def policy(obs):
            return jnp.zeros((num_envs, A))

    if viewer in ("native", "viser", "auto"):
        # interactive viewers (reference play.py:186-198): auto prefers the
        # native GLFW window, falling back to the viser web UI
        def launch(kind):
            if kind == "native":
                from mjlab_tpu.viewer.native import NativeMujocoViewer

                return NativeMujocoViewer(env, lambda o: policy(o))
            from mjlab_tpu.viewer.viser import ViserPlayViewer

            return ViserPlayViewer(env, lambda o: policy(o))

        if viewer == "auto":
            try:
                launch("native").run()
                return
            except RuntimeError:
                launch("viser").run()
                return
        launch(viewer).run()
        return

    obs = wrapped.get_observations()
    for t in range(num_steps):
        action = policy(obs)
        obs, reward, dones, extras = wrapped.step(action)
        if t % 50 == 0:
            print(
                f"t={t} reward={np.asarray(reward).mean():.4f} "
                f"dones={int(np.asarray(dones).sum())}"
            )
    print("done")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task")
    p.add_argument("--agent", choices=["zero", "random", "trained"], default="zero")
    p.add_argument("--checkpoint-file", default=None)
    p.add_argument("--num-envs", type=int, default=1)
    p.add_argument("--num-steps", type=int, default=200)
    p.add_argument(
        "--viewer",
        choices=["headless", "native", "viser", "auto"],
        default="headless",
    )
    p.add_argument(
        "--wandb-run-path", default=None,
        help="resolve the checkpoint from a W&B run (entity/project/run_id)",
    )
    p.add_argument(
        "--motion-file", default=None,
        help="reference motion npz for tracking tasks",
    )
    a = p.parse_args()
    run_play(
        a.task, a.agent, a.checkpoint_file, a.num_envs, a.num_steps, a.viewer,
        wandb_run_path=a.wandb_run_path, motion_file=a.motion_file,
    )


if __name__ == "__main__":
    main()
