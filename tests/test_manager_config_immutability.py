"""Registry hand-out isolation (reference
tests/test_manager_config_immutability.py): mutating a loaded cfg must
never leak into the registry or later loads."""

import mjlab_tpu.tasks as tasks

TASK = "Mjlab-Velocity-Flat-Unitree-G1"


def test_env_cfg_mutation_does_not_leak():
    a = tasks.load_env_cfg(TASK)
    a.scene.num_envs = 123456
    a.decimation = 99
    a.rewards["track_linear_velocity"].weight = -77.0
    a.observations["policy"].enable_corruption = False
    b = tasks.load_env_cfg(TASK)
    assert b.scene.num_envs != 123456
    assert b.decimation != 99
    assert b.rewards["track_linear_velocity"].weight != -77.0
    assert b.observations["policy"].enable_corruption is True


def test_play_and_train_cfgs_are_independent():
    train = tasks.load_env_cfg(TASK)
    play = tasks.load_env_cfg(TASK, play=True)
    train.episode_length_s = 1.0
    assert play.episode_length_s != 1.0
    play2 = tasks.load_env_cfg(TASK, play=True)
    assert play2.episode_length_s == play.episode_length_s


def test_rl_cfg_mutation_does_not_leak():
    a = tasks.load_rl_cfg(TASK)
    a.algorithm.gamma = 0.0
    a.policy.actor_hidden_dims = (1,)
    b = tasks.load_rl_cfg(TASK)
    assert b.algorithm.gamma != 0.0
    assert b.policy.actor_hidden_dims != (1,)


def test_nested_event_params_are_deep_copied():
    a = tasks.load_env_cfg(TASK)
    ev = a.events["foot_friction"]
    ev.params["ranges"] = (0.0, 0.0)
    b = tasks.load_env_cfg(TASK)
    assert b.events["foot_friction"].params["ranges"] != (0.0, 0.0)
