"""Task-config wiring validation without stepping (reference
tests/test_velocity_task.py:41-95, test_tracking_task.py:23-103,
test_task_configs.py): required commands/sensors/obs terms present, play
overrides applied, reward weights sane."""

import math

import pytest

import mjlab_tpu.tasks as tasks

VELOCITY_TASKS = [
    "Mjlab-Velocity-Flat-Unitree-G1",
    "Mjlab-Velocity-Rough-Unitree-G1",
    "Mjlab-Velocity-Flat-Unitree-Go1",
    "Mjlab-Velocity-Rough-Unitree-Go1",
]


@pytest.mark.parametrize("task_id", VELOCITY_TASKS)
def test_velocity_obs_pipeline(task_id):
    cfg = tasks.load_env_cfg(task_id)
    policy = cfg.observations["policy"]
    for term in (
        "base_ang_vel",
        "projected_gravity",
        "joint_pos",
        "joint_vel",
        "actions",
        "command",
    ):
        assert term in policy.terms, f"{task_id} missing policy obs {term}"
    # policy obs are corrupted during training, critic obs never are
    assert policy.enable_corruption
    critic = cfg.observations["critic"]
    assert not critic.enable_corruption
    # twist command registered
    assert "twist" in cfg.commands
    # velocity task uses PD position actions at the robot
    assert "joint_pos" in cfg.actions


@pytest.mark.parametrize("task_id", VELOCITY_TASKS)
def test_velocity_play_overrides(task_id):
    play = tasks.load_env_cfg(task_id, play=True)
    # play mode: no corruption, effectively infinite episodes
    assert not play.observations["policy"].enable_corruption
    assert play.episode_length_s > 1e6 or math.isinf(play.episode_length_s)


@pytest.mark.parametrize("task_id", VELOCITY_TASKS)
def test_velocity_core_rewards(task_id):
    cfg = tasks.load_env_cfg(task_id)
    names = set(cfg.rewards)
    assert {"track_linear_velocity", "track_angular_velocity"} <= names, names
    # tracking rewards positive, regularizers negative
    assert cfg.rewards["track_linear_velocity"].weight > 0
    for reg in ("action_rate_l2", "foot_slip", "dof_pos_limits"):
        if reg in cfg.rewards:
            assert cfg.rewards[reg].weight <= 0


def test_rough_variants_have_terrain_curriculum():
    rough = tasks.load_env_cfg("Mjlab-Velocity-Rough-Unitree-G1")
    flat = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    assert rough.scene.terrain is not None
    assert rough.curriculum and "terrain_levels" in rough.curriculum
    assert not (flat.curriculum and "terrain_levels" in flat.curriculum)


def test_tracking_task_wiring():
    cfg = tasks.load_env_cfg("Mjlab-Tracking-Flat-Unitree-G1")
    assert "motion" in cfg.commands
    mc = cfg.commands["motion"]
    # RSI noise active in train
    assert mc.pose_range or mc.velocity_range
    play = tasks.load_env_cfg("Mjlab-Tracking-Flat-Unitree-G1", play=True)
    pc = play.commands["motion"]
    # play: deterministic start, no RSI randomization
    assert not pc.pose_range and not pc.velocity_range


def test_tracking_no_state_estimation_variant():
    base = tasks.load_env_cfg("Mjlab-Tracking-Flat-Unitree-G1")
    nse = tasks.load_env_cfg("Mjlab-Tracking-Flat-Unitree-G1-No-State-Estimation")
    base_terms = set(base.observations["policy"].terms)
    nse_terms = set(nse.observations["policy"].terms)
    assert nse_terms < base_terms  # strictly fewer privileged obs
    # critic keeps the full set in both variants
    assert set(nse.observations["critic"].terms) == set(
        base.observations["critic"].terms
    )


def test_rl_cfgs_have_ppo_surface():
    for task_id in VELOCITY_TASKS + ["Mjlab-Tracking-Flat-Unitree-G1"]:
        rl = tasks.load_rl_cfg(task_id)
        assert rl.algorithm.gamma > 0.9
        assert rl.algorithm.clip_param > 0
        assert rl.policy.actor_hidden_dims
        assert rl.num_steps_per_env >= 16
