"""Velocity command semantics on a real G1 env (reference
tests/test_velocity_task.py command checks): resample ranges, standing
envs zeroing, command exposure as observation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv

E = 8


@pytest.fixture(scope="module")
def env():
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    e = ManagerBasedRlEnv(cfg)
    e.reset()
    yield e
    e.close()


def test_commands_within_cfg_ranges(env):
    cmd = np.asarray(env._state.command_state["twist"]["command"])
    r = env.cfg.commands["twist"].ranges
    # standing envs are zeroed, so containment check includes 0
    assert (cmd[:, 0] >= min(r.lin_vel_x[0], 0) - 1e-5).all()
    assert (cmd[:, 0] <= max(r.lin_vel_x[1], 0) + 1e-5).all()
    assert (cmd[:, 1] >= min(r.lin_vel_y[0], 0) - 1e-5).all()
    assert (cmd[:, 1] <= max(r.lin_vel_y[1], 0) + 1e-5).all()


def test_command_flows_into_observation(env):
    step = jax.jit(env._traced_step)
    A = env.action_manager.total_action_dim
    state, obs, *_ = step(env._state, jnp.zeros((E, A), jnp.float32))
    cmd = np.asarray(state.command_state["twist"]["command"])
    # velocity obs group ends with the 3-dim command term
    np.testing.assert_allclose(
        np.asarray(obs["policy"])[:, -3:], cmd, atol=1e-5
    )


def test_builtin_group_ctrl_targets(env):
    # pass-through position actuators: processed action (scale*raw+default)
    # lands directly in data.ctrl for all 29 joints in one batched write
    step = jax.jit(env._traced_step)
    A = env.action_manager.total_action_dim
    action = jnp.full((E, A), 0.1, jnp.float32)
    state, *_ = step(env._state, action)
    ctrl = np.asarray(state.data.ctrl)
    assert ctrl.shape == (E, 29)
    assert np.isfinite(ctrl).all()
    term = env.action_manager._terms["joint_pos"]
    scale = np.asarray(term._scale) if hasattr(term, "_scale") else None
    # at least: ctrl differs from default by the scaled action
    robot = env.scene["robot"]
    default = np.asarray(robot.data.default_joint_pos)[0]
    assert not np.allclose(ctrl[0], default)
