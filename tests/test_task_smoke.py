"""Task-family smoke tests: every registered task id builds its env cfg;
the non-velocity families (rough terrain, jump, jumping, manipulation)
build + step a tiny env end-to-end (reference tests/smoke_test.py:12-23 and
test_task_configs.py)."""

import copy

import jax.numpy as jnp
import numpy as np
import pytest

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv

ALL_TASKS = [
    "Mjlab-Velocity-Flat-Unitree-G1",
    "Mjlab-Velocity-Rough-Unitree-G1",
    "Mjlab-Velocity-Flat-Unitree-Go1",
    "Mjlab-Velocity-Rough-Unitree-Go1",
    "Mjlab-Tracking-Flat-Unitree-G1",
    "Mjlab-Tracking-Flat-Unitree-G1-No-State-Estimation",
    "Mjlab-Jump-Flat-Unitree-G1",
    "Mjlab-Jumping-Flat-Unitree-G1",
    "Mjlab-Lift-Cube-Yam",
]


def test_registry_complete():
    registered = set(tasks.list_tasks())
    assert set(ALL_TASKS) <= registered


@pytest.mark.parametrize("task_id", ALL_TASKS)
def test_cfg_loads_and_deepcopies(task_id):
    cfg = tasks.load_env_cfg(task_id)
    cfg2 = tasks.load_env_cfg(task_id)
    assert cfg is not cfg2  # registry must hand out fresh configs
    play = tasks.load_env_cfg(task_id, play=True)
    assert play is not cfg
    rl = tasks.load_rl_cfg(task_id)
    assert rl.num_steps_per_env > 0


def _step_env(cfg, n=2, num_envs=2):
    cfg.scene.num_envs = num_envs
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    A = env.action_manager.total_action_dim
    act = jnp.zeros((num_envs, A))
    for _ in range(n):
        obs, rew, term, trunc, extras = env.step(act)
    q = np.asarray(env.state.data.qpos)
    assert np.isfinite(q).all()
    return env, obs, rew


@pytest.mark.slow
def test_rough_velocity_env_steps():
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Rough-Unitree-Go1")
    gen = cfg.scene.terrain.terrain_generator
    gen.num_rows, gen.num_cols, gen.border_width, gen.seed = 2, 2, 2.0, 0
    env, obs, rew = _step_env(cfg)
    assert "levels" in env.state.terrain_state


@pytest.mark.slow
def test_tracking_env_steps(tmp_path):
    """The tracking env must be constructible and steppable out of the box
    given a motion artifact — the reference benchmark wires one in before
    measuring (reference scripts/benchmarks/measure_throughput.py:128-135);
    offline, make_test_motion.py is the artifact source (VERDICT r3 #2)."""
    from mjlab_tpu.tasks.tracking.scripts.make_test_motion import (
        make_g1_test_motion,
    )

    motion = str(tmp_path / "motion.npz")
    make_g1_test_motion(motion, seconds=2.0, fps=50.0)
    cfg = tasks.load_env_cfg("Mjlab-Tracking-Flat-Unitree-G1")
    cfg.commands["motion"].motion_file = motion
    env, obs, rew = _step_env(cfg)
    # motion command metrics must be finite and the RSI write must have
    # placed envs near the reference motion (anchor height is ~0.72 in
    # the knees-bent squat motion, never at the 1.5m+ of a bad state)
    root_z = np.asarray(env.state.data.qpos[:, 2])
    assert (root_z > 0.2).all() and (root_z < 1.2).all()


@pytest.mark.slow
def test_jump_env_steps():
    cfg = tasks.load_env_cfg("Mjlab-Jump-Flat-Unitree-G1")
    _step_env(cfg)


@pytest.mark.slow
def test_jumping_env_steps():
    cfg = tasks.load_env_cfg("Mjlab-Jumping-Flat-Unitree-G1")
    _step_env(cfg)


@pytest.mark.slow
def test_lift_cube_env_steps():
    cfg = tasks.load_env_cfg("Mjlab-Lift-Cube-Yam")
    env, obs, rew = _step_env(cfg)
    # the equality-coupled gripper must mirror: right = -left
    robot = env.scene["robot"]
    jp = np.asarray(robot.data.joint_pos)
    names = robot.joint_names
    li, ri = names.index("left_finger"), names.index("right_finger")
    assert abs(jp[0, li] + jp[0, ri]) < 5e-3
