"""Evaluate a trained tracking policy
(reference src/mjlab/tasks/tracking/scripts/evaluate.py:33-...):
rolls out N parallel episodes and reports the motion-imitation metrics
(mpkpe, root-relative mpkpe, joint velocity error, EE pos/ori errors) as
JSON.
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np


def run_evaluate(
    task_id: str,
    checkpoint_file: str | None,
    num_envs: int = 1024,
    num_steps: int | None = None,
    output_file: str | None = None,
    motion_file: str | None = None,
    ee_body_names: tuple = (
        "left_ankle_roll_link",
        "right_ankle_roll_link",
        "left_wrist_yaw_link",
        "right_wrist_yaw_link",
    ),
) -> dict:
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.envs import ManagerBasedRlEnv
    from mjlab_tpu.rl import OnPolicyRunner, RslRlVecEnvWrapper
    from mjlab_tpu.tasks.tracking.mdp import metrics as M

    env_cfg = tasks.load_env_cfg(task_id, play=True)
    env_cfg.scene.num_envs = num_envs
    if motion_file is not None:
        env_cfg.commands["motion"].motion_file = motion_file
    env = ManagerBasedRlEnv(env_cfg)
    wrapped = RslRlVecEnvWrapper(env)

    if checkpoint_file:
        agent_cfg = tasks.load_rl_cfg(task_id)
        runner = OnPolicyRunner(wrapped, agent_cfg)
        runner.load(checkpoint_file)
        policy = runner.get_inference_policy()
    else:
        A = env.action_manager.total_action_dim

        def policy(obs):
            return jnp.zeros((num_envs, A))

    cmd = env.command_manager.get_term("motion")
    T = num_steps or int(cmd.motion.joint_pos.shape[0])

    sums = {
        "mpkpe": 0.0,
        "root_relative_mpkpe": 0.0,
        "joint_velocity_error": 0.0,
        "ee_position_error": 0.0,
        "ee_orientation_error": 0.0,
    }
    obs = wrapped.get_observations()
    for t in range(T):
        action = policy(obs)
        obs, reward, dones, extras = wrapped.step(action)
        sums["mpkpe"] += float(jnp.mean(M.mpkpe(env, "motion")))
        sums["root_relative_mpkpe"] += float(
            jnp.mean(M.root_relative_mpkpe(env, "motion"))
        )
        sums["joint_velocity_error"] += float(
            jnp.mean(M.joint_velocity_error(env, "motion"))
        )
        sums["ee_position_error"] += float(
            jnp.mean(M.ee_position_error(env, "motion", ee_body_names))
        )
        sums["ee_orientation_error"] += float(
            jnp.mean(M.ee_orientation_error(env, "motion", ee_body_names))
        )

    result = {k: v / T for k, v in sums.items()}
    result["num_envs"] = num_envs
    result["num_steps"] = T
    print(json.dumps(result, indent=2))
    if output_file:
        with open(output_file, "w") as f:
            json.dump(result, f, indent=2)
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", nargs="?", default="Mjlab-Tracking-Flat-Unitree-G1")
    p.add_argument("--checkpoint-file", default=None)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--output-file", default=None)
    p.add_argument("--motion-file", default=None)
    a = p.parse_args()
    run_evaluate(
        a.task, a.checkpoint_file, a.num_envs, a.num_steps, a.output_file,
        motion_file=a.motion_file,
    )


if __name__ == "__main__":
    main()
