"""Play CLI smoke tests (reference src/mjlab/scripts/play.py:43-198):
zero/random/trained agent paths, latest-checkpoint resolution from the
local logs tree, and argv parsing. Uses a registered miniature pendulum
task so the full play pipeline (registry -> env -> wrapper -> policy ->
rollout) runs in seconds on CPU."""

import os
import sys

import numpy as np
import pytest

import mjlab_tpu.scripts.play as play_mod
import mjlab_tpu.tasks as tasks
from mjlab_tpu.tasks import registry
from tests.mini_env import make_pendulum_cfg

from mjlab_tpu.rl.config import (
    RslRlOnPolicyRunnerCfg,
    RslRlPpoActorCriticCfg,
    RslRlPpoAlgorithmCfg,
)

TASK = "Mjlab-Test-Pendulum-PlayCli"


def _mini_rl_cfg():
    return RslRlOnPolicyRunnerCfg(
        seed=0,
        num_steps_per_env=4,
        max_iterations=2,
        save_interval=1,
        experiment_name="play_cli_test",
        logger="stdout",
        policy=RslRlPpoActorCriticCfg(
            actor_hidden_dims=(16,), critic_hidden_dims=(16,)
        ),
        algorithm=RslRlPpoAlgorithmCfg(
            num_learning_epochs=1, num_mini_batches=1
        ),
    )


@pytest.fixture(scope="module", autouse=True)
def registered_task():
    play_cfg = make_pendulum_cfg(num_envs=2)
    play_cfg.episode_length_s = 10.0  # distinct play-variant value
    registry.register_mjlab_task(
        TASK,
        env_cfg=make_pendulum_cfg(num_envs=2),
        rl_cfg=_mini_rl_cfg(),
        play_env_cfg=play_cfg,
    )
    yield
    registry._REGISTRY.pop(TASK, None)


def test_play_zero_agent(capsys):
    play_mod.run_play(TASK, agent="zero", num_envs=2, num_steps=4)
    out = capsys.readouterr().out
    assert "done" in out
    assert "t=0" in out


def test_play_random_agent(capsys):
    play_mod.run_play(TASK, agent="random", num_envs=2, num_steps=4)
    assert "done" in capsys.readouterr().out


def test_play_uses_play_variant_cfg():
    cfg = tasks.load_env_cfg(TASK, play=True)
    assert cfg.episode_length_s == 10.0
    cfg_train = tasks.load_env_cfg(TASK, play=False)
    assert cfg_train.episode_length_s == 1000.0


def test_play_trained_latest_checkpoint_resolution(tmp_path, monkeypatch, capsys):
    """agent=trained with no --checkpoint-file must resolve the newest
    run dir + checkpoint under logs/<experiment_name> (reference
    play.py:51-133, utils/os.py:52-90)."""
    from mjlab_tpu.envs import ManagerBasedRlEnv
    from mjlab_tpu.rl.runner import OnPolicyRunner
    from mjlab_tpu.rl.vecenv_wrapper import RslRlVecEnvWrapper

    exp_dir = tmp_path / "logs" / "play_cli_test"
    old_run = exp_dir / "2020-01-01_00-00-00"
    old_run.mkdir(parents=True)
    # decoy: an OLDER run dir with a stale marker file (no checkpoints);
    # resolution must pick the newer run below, never this one
    (old_run / "not_a_checkpoint.txt").write_text("stale")

    run_dir = exp_dir / "2024-01-01_00-00-00"
    run_dir.mkdir(parents=True)
    env = ManagerBasedRlEnv(tasks.load_env_cfg(TASK))
    env.reset()
    runner = OnPolicyRunner(
        RslRlVecEnvWrapper(env), _mini_rl_cfg(), log_dir=str(run_dir)
    )
    runner.learn(2)
    ckpts = [f for f in os.listdir(run_dir) if f.startswith("model_")]
    assert ckpts, "trained runner wrote no checkpoints"

    monkeypatch.chdir(tmp_path)
    play_mod.run_play(TASK, agent="trained", num_envs=2, num_steps=4)
    out = capsys.readouterr().out
    assert "using latest checkpoint" in out
    assert "2024-01-01_00-00-00" in out
    assert "done" in out


def test_play_trained_explicit_checkpoint(tmp_path, capsys):
    from mjlab_tpu.envs import ManagerBasedRlEnv
    from mjlab_tpu.rl.runner import OnPolicyRunner
    from mjlab_tpu.rl.vecenv_wrapper import RslRlVecEnvWrapper

    env = ManagerBasedRlEnv(tasks.load_env_cfg(TASK))
    env.reset()
    runner = OnPolicyRunner(
        RslRlVecEnvWrapper(env), _mini_rl_cfg(), log_dir=str(tmp_path)
    )
    runner.learn(1)
    ckpt = sorted(
        f for f in os.listdir(tmp_path) if f.startswith("model_")
    )[-1]
    play_mod.run_play(
        TASK, agent="trained", checkpoint_file=str(tmp_path / ckpt),
        num_envs=2, num_steps=4,
    )
    assert "done" in capsys.readouterr().out


def test_play_main_argv_routing(monkeypatch):
    import inspect

    real_sig = inspect.signature(play_mod.run_play)
    captured = {}
    # capture via *args/**kwargs and normalize against the REAL run_play
    # signature so a keyword-vs-positional or reorder refactor of main()
    # can't silently mis-bind (advisor r3)
    monkeypatch.setattr(
        play_mod, "run_play",
        lambda *a, **k: captured.update(
            real_sig.bind(*a, **k).arguments
        ),
    )
    monkeypatch.setattr(sys, "argv", [
        "play", TASK, "--agent", "random", "--num-envs", "3",
        "--num-steps", "7", "--viewer", "headless",
    ])
    play_mod.main()
    assert captured["task"] == TASK
    assert captured["agent"] == "random"
    assert captured["num_envs"] == 3
    assert captured["num_steps"] == 7
    assert captured["viewer"] == "headless"
    assert captured.get("checkpoint_file") is None
    assert captured.get("wandb_run_path") is None


def test_play_unknown_task_raises():
    with pytest.raises(KeyError, match="unknown task"):
        play_mod.run_play("Mjlab-Does-Not-Exist", num_steps=1)


def test_play_rollout_determinism_zero_agent(capsys):
    """Two zero-agent rollouts from the same registered cfg must print
    identical reward traces (registry deepcopy + seeded env RNG).

    play prints every 50 steps, so 101 steps yields t=0/50/100 — a real
    multi-point trace, not just the initial reward (advisor r3)."""
    play_mod.run_play(TASK, agent="zero", num_envs=2, num_steps=101)
    first = capsys.readouterr().out
    play_mod.run_play(TASK, agent="zero", num_envs=2, num_steps=101)
    second = capsys.readouterr().out
    r1 = [ln for ln in first.splitlines() if ln.startswith("t=")]
    r2 = [ln for ln in second.splitlines() if ln.startswith("t=")]
    assert len(r1) >= 3 and r1 == r2
