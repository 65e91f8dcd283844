"""rsl-rl torch checkpoint -> JAX policy conversion: inference parity with
the torch network (demo CLI dependency, reference scripts/demo.py)."""

import numpy as np
import pytest
import torch

from tests.mini_env import make_pendulum_env
from mjlab_tpu.rl.config import (
    RslRlOnPolicyRunnerCfg, RslRlPpoActorCriticCfg, RslRlPpoAlgorithmCfg,
)
from mjlab_tpu.rl.interop import load_rslrl_checkpoint
from mjlab_tpu.rl.runner import OnPolicyRunner
from mjlab_tpu.rl.vecenv_wrapper import RslRlVecEnvWrapper

HID = (16, 8)


def _torch_actor(obs_dim, act_dim):
    return torch.nn.Sequential(
        torch.nn.Linear(obs_dim, HID[0]), torch.nn.ELU(),
        torch.nn.Linear(HID[0], HID[1]), torch.nn.ELU(),
        torch.nn.Linear(HID[1], act_dim),
    )


@pytest.mark.slow
def test_rslrl_checkpoint_inference_parity(tmp_path):
    env = make_pendulum_env()
    cfg = RslRlOnPolicyRunnerCfg(
        seed=0, num_steps_per_env=4, max_iterations=1, save_interval=100,
        experiment_name="interop", logger="stdout",
        policy=RslRlPpoActorCriticCfg(
            actor_hidden_dims=HID, critic_hidden_dims=HID,
            activation="elu",
        ),
        algorithm=RslRlPpoAlgorithmCfg(),
    )
    runner = OnPolicyRunner(RslRlVecEnvWrapper(env), cfg, log_dir=None)
    obs_dim = runner.ppo.ac.actor_obs_dim
    act_dim = runner.ppo.ac.num_actions

    torch.manual_seed(0)
    actor = _torch_actor(obs_dim, act_dim)
    critic = _torch_actor(obs_dim, 1)
    sd = {}
    for i, layer in enumerate(actor):
        if isinstance(layer, torch.nn.Linear):
            sd[f"actor.{i}.weight"] = layer.weight.data
            sd[f"actor.{i}.bias"] = layer.bias.data
    for i, layer in enumerate(critic):
        if isinstance(layer, torch.nn.Linear):
            sd[f"critic.{i}.weight"] = layer.weight.data
            sd[f"critic.{i}.bias"] = layer.bias.data
    sd["std"] = torch.full((act_dim,), 0.7)
    mean = torch.randn(obs_dim)
    var = torch.rand(obs_dim) + 0.5
    payload = {
        "model_state_dict": sd,
        "obs_norm_state_dict": {
            "mean": mean, "var": var, "count": torch.tensor([1234.0]),
        },
        "iter": 777,
    }
    path = tmp_path / "model_777.pt"
    torch.save(payload, path)

    load_rslrl_checkpoint(str(path), runner)
    assert runner.iteration == 777

    policy = runner.get_inference_policy()
    rng = np.random.default_rng(0)
    raw = rng.standard_normal((5, obs_dim)).astype(np.float32)
    got = np.asarray(policy({"policy": raw}))

    # torch-side reference: normalize then actor forward
    with torch.no_grad():
        x = (torch.tensor(raw) - mean) / torch.sqrt(var + 1e-8)
        x = torch.clamp(x, -10, 10)
        want = actor(x).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
