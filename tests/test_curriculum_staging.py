"""Command-velocity curriculum staging (reference
src/mjlab/tasks/velocity/mdp/curriculums.py:66): the staged widening of
command ranges must flip exactly at the configured global step counts,
inside the traced state (no recompile), and the resampled commands must
respect the widened ranges (VERDICT r3 #10: staging had no direct test)."""

import jax.numpy as jnp
import numpy as np
import pytest

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.tasks.velocity import mdp as vmdp

E = 2


@pytest.fixture(scope="module")
def env():
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    e = ManagerBasedRlEnv(cfg)
    e.reset()
    yield e
    e.close()


def _ranges(env):
    st = env.command_manager.get_term("twist").state
    return {k: np.asarray(v) for k, v in st["ranges"].items()}


def _stages(env):
    return env.cfg.curriculum["command_vel"].params["velocity_stages"]


def test_stage_boundaries_widen_ranges(env):
    stages = _stages(env)
    mask = jnp.ones((E,), bool)

    # stage 0 applies from the start (step > 0 after the first steps)
    env.ctx.common_step = jnp.asarray(1, jnp.int32)
    prog = vmdp.commands_vel(env, mask, "twist", stages)
    r = _ranges(env)
    np.testing.assert_allclose(r["lin_vel_x"], stages[0]["lin_vel_x"])
    np.testing.assert_allclose(r["ang_vel_z"], stages[0]["ang_vel_z"])
    assert float(prog) == stages[0]["lin_vel_x"][1]

    # just BELOW the second boundary: still stage 0
    env.ctx.common_step = jnp.asarray(stages[1]["step"], jnp.int32)
    vmdp.commands_vel(env, mask, "twist", stages)
    np.testing.assert_allclose(
        _ranges(env)["lin_vel_x"], stages[0]["lin_vel_x"]
    )

    # past the second boundary: stage 1 ranges
    env.ctx.common_step = jnp.asarray(stages[1]["step"] + 1, jnp.int32)
    prog = vmdp.commands_vel(env, mask, "twist", stages)
    r = _ranges(env)
    np.testing.assert_allclose(r["lin_vel_x"], stages[1]["lin_vel_x"])
    np.testing.assert_allclose(r["ang_vel_z"], stages[1]["ang_vel_z"])
    assert float(prog) == stages[1]["lin_vel_x"][1]

    # past the third boundary: lin_vel_x widens again; ang_vel_z KEEPS
    # the stage-1 value (stage 2 leaves it unset)
    env.ctx.common_step = jnp.asarray(stages[2]["step"] + 1, jnp.int32)
    vmdp.commands_vel(env, mask, "twist", stages)
    r = _ranges(env)
    np.testing.assert_allclose(r["lin_vel_x"], stages[2]["lin_vel_x"])
    np.testing.assert_allclose(r["ang_vel_z"], stages[1]["ang_vel_z"])


def test_resampled_commands_respect_widened_ranges(env):
    stages = _stages(env)
    mask = jnp.ones((E,), bool)
    env.ctx.common_step = jnp.asarray(stages[2]["step"] + 1, jnp.int32)
    vmdp.commands_vel(env, mask, "twist", stages)
    term = env.command_manager.get_term("twist")
    lo, hi = stages[2]["lin_vel_x"]
    samples = []
    for _ in range(40):
        st = dict(term.state)
        st2 = term._resample(st, mask, env.ctx.next_key())
        term.state = st2
        samples.append(np.asarray(term.command)[:, 0])
    s = np.concatenate(samples)
    assert (s >= lo - 1e-6).all() and (s <= hi + 1e-6).all()
    # the widened band is actually used (not stuck at the stage-0 range)
    assert s.max() > stages[0]["lin_vel_x"][1] + 0.2
    assert s.min() < stages[0]["lin_vel_x"][0] - 0.1
