"""Learned MLP actuator: TorchScript weight extraction + jnp inference parity
(reference test_actuator_learned coverage)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from mjlab_tpu.actuator.actuator import ActuatorCmd  # noqa: E402
from mjlab_tpu.actuator.learned import (  # noqa: E402
    LearnedMlpActuatorCfg,
    load_torchscript_mlp,
)


@pytest.fixture(scope="module")
def net_file(tmp_path_factory):
    torch.manual_seed(0)
    net = torch.nn.Sequential(
        torch.nn.Linear(6, 16), torch.nn.ELU(), torch.nn.Linear(16, 1)
    )
    path = tmp_path_factory.mktemp("nets") / "mlp.pt"
    torch.jit.script(net).save(str(path))
    return str(path)


def test_load_torchscript_mlp(net_file):
    layers, act = load_torchscript_mlp(net_file)
    assert len(layers) == 2
    assert layers[0][0].shape == (16, 6)
    assert layers[1][0].shape == (1, 16)
    assert act == "elu"


class _FakeEntity:
    name = "robot"


def make_actuator(net_file):
    cfg = LearnedMlpActuatorCfg(
        joint_names_expr=("j1", "j2"),
        network_file=net_file,
        pos_scale=2.0,
        vel_scale=0.5,
        torque_scale=3.0,
        history_length=3,
        effort_limit=10.0,
        saturation_effort=12.0,
        velocity_limit=20.0,
    )
    return cfg.build(_FakeEntity(), [0, 1], ["j1", "j2"])


def test_inference_matches_torch(net_file):
    act = make_actuator(net_file)
    import jax

    state = act.initialize(4, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    net = torch.jit.load(net_file)

    pos_hist = np.zeros((4, 3, 2), np.float32)
    vel_hist = np.zeros((4, 3, 2), np.float32)
    for step in range(4):
        q = rng.normal(size=(4, 2)).astype(np.float32) * 0.1
        qd = rng.normal(size=(4, 2)).astype(np.float32) * 0.1
        tgt = rng.normal(size=(4, 2)).astype(np.float32) * 0.1
        cmd = ActuatorCmd(
            position_target=jnp.asarray(tgt),
            velocity_target=jnp.zeros((4, 2)),
            effort_target=jnp.zeros((4, 2)),
            joint_pos=jnp.asarray(q),
            joint_vel=jnp.asarray(qd),
        )
        state, tau = act.compute(state, cmd)

        # torch-side reference computation
        pos_hist = np.concatenate([(tgt - q)[:, None], pos_hist[:, :-1]], 1)
        vel_hist = np.concatenate([qd[:, None], vel_hist[:, :-1]], 1)
        pos_flat = pos_hist.transpose(0, 2, 1).reshape(8, 3)
        vel_flat = vel_hist.transpose(0, 2, 1).reshape(8, 3)
        x = np.concatenate([pos_flat * 2.0, vel_flat * 0.5], 1)
        with torch.inference_mode():
            ref = net(torch.from_numpy(x)).numpy().reshape(4, 2) * 3.0
        # apply the same DC clip
        ratio = qd / 20.0
        tmax = np.clip(12.0 * (1 - ratio), -10, 10)
        tmin = np.clip(12.0 * (-1 - ratio), -10, 10)
        ref = np.clip(ref, tmin, tmax)
        np.testing.assert_allclose(np.asarray(tau), ref, atol=1e-5)


def test_reset_clears_history(net_file):
    act = make_actuator(net_file)
    import jax

    state = act.initialize(2, jax.random.PRNGKey(0))
    cmd = ActuatorCmd(
        position_target=jnp.ones((2, 2)),
        velocity_target=jnp.zeros((2, 2)),
        effort_target=jnp.zeros((2, 2)),
        joint_pos=jnp.zeros((2, 2)),
        joint_vel=jnp.ones((2, 2)),
    )
    state, _ = act.compute(state, cmd)
    assert float(jnp.abs(state.pos_err_hist).max()) > 0
    state = act.reset(state, jnp.asarray([True, False]), jax.random.PRNGKey(1))
    assert float(jnp.abs(state.pos_err_hist[0]).max()) == 0
    assert float(jnp.abs(state.pos_err_hist[1]).max()) > 0
