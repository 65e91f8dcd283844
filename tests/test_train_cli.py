"""Train CLI override surface (reference uses tyro's dotted dataclass
flags, reference scripts/train.py:236-245; here argparse + a dotted
override parser provide the same surface)."""

import sys

import mjlab_tpu.scripts.train as T
import mjlab_tpu.tasks as tasks


def test_dotted_flags_route_to_overrides(monkeypatch):
    captured = {}
    monkeypatch.setattr(
        T, "run_train", lambda task, **kw: captured.update(kw, task=task)
    )
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train",
            "Mjlab-Velocity-Flat-Unitree-G1",
            "--env.scene.num-envs",
            "4096",
            "--agent.algorithm.gamma=0.97",
            "--max-iterations",
            "3",
        ],
    )
    T.main()
    assert captured["env_overrides"] == ["scene.num-envs=4096"]
    assert captured["agent_overrides"] == ["algorithm.gamma=0.97"]
    assert captured["max_iterations"] == 3


def test_apply_overrides_nested_dataclasses():
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    T._apply_overrides(cfg, ["scene.num-envs=512", "decimation=2"])
    assert cfg.scene.num_envs == 512
    assert cfg.decimation == 2
    rl = tasks.load_rl_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    T._apply_overrides(rl, ["algorithm.gamma=0.97", "policy.init-noise-std=0.5"])
    assert abs(rl.algorithm.gamma - 0.97) < 1e-9
    assert abs(rl.policy.init_noise_std - 0.5) < 1e-9


def test_bool_and_dict_overrides():
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    # dict navigation: observation groups are a dict
    T._apply_overrides(cfg, ["observations.policy.enable-corruption=false"])
    assert cfg.observations["policy"].enable_corruption is False
