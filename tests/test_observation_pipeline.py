"""Observation pipeline at the env level: scale -> delay -> history
(reference tests/test_observation_delay.py, test_observation_history.py).
A minimal pendulum env with deterministic dynamics makes the expected
values computable by hand."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.actuator.builtin import BuiltinPositionActuatorCfg
from mjlab_tpu.entity.entity import EntityArticulationInfoCfg, EntityCfg
from mjlab_tpu.envs.manager_based_rl_env import (
    ManagerBasedRlEnv,
    ManagerBasedRlEnvCfg,
)
from mjlab_tpu.envs.mdp.actions import JointPositionActionCfg
from mjlab_tpu.managers.manager_term_config import (
    ObservationGroupCfg,
    ObservationTermCfg,
    RewardTermCfg,
    TerminationTermCfg,
)
from mjlab_tpu.scene.scene import SceneCfg
from mjlab_tpu.envs import mdp

E = 2


def _pend_spec():
    return mujoco.MjSpec.from_string(
        """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <body name="arm" pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" range="-3 3"/>
      <geom name="rod" type="capsule" size="0.02" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
</mujoco>
"""
    )


def _env(history_length=0, delay=0):
    cfg = ManagerBasedRlEnvCfg(
        decimation=1,
        episode_length_s=1000.0,
        scene=SceneCfg(
            num_envs=E,
            entities={
                "robot": EntityCfg(
                    spec_fn=_pend_spec,
                    articulation=EntityArticulationInfoCfg(
                        actuators=(
                            BuiltinPositionActuatorCfg(
                                joint_names_expr=("hinge",),
                                stiffness=50.0,
                                damping=5.0,
                                effort_limit=100.0,
                            ),
                        )
                    ),
                )
            },
        ),
        observations={
            "policy": ObservationGroupCfg(
                terms={
                    "joint_pos": ObservationTermCfg(
                        func=mdp.joint_pos_rel,
                        scale=2.0,
                        history_length=history_length,
                        delay_min_lag=delay,
                        delay_max_lag=delay,
                    )
                }
            )
        },
        actions={
            "joint_pos": JointPositionActionCfg(
                actuator_names=("hinge",), scale=1.0
            )
        },
        rewards={"alive": RewardTermCfg(func=mdp.is_alive, weight=1.0)},
        terminations={
            "time_out": TerminationTermCfg(func=mdp.time_out, time_out=True)
        },
    )
    cfg.sim.mujoco.timestep = 0.01
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    return env


def _rollout(env, n):
    """Step with a constant position command; return per-step (raw joint
    pos, obs vector)."""
    step = jax.jit(env._traced_step)
    state = env._state
    action = jnp.full((E, 1), 0.5, jnp.float32)
    out = []
    for _ in range(n):
        state, obs, *_ = step(state, action)
        raw = np.asarray(state.data.qpos)[:, 0]  # single hinge
        out.append((raw.copy(), np.asarray(obs["policy"]).copy()))
    env._state = state
    return out


@pytest.mark.slow
def test_scale_applied():
    env = _env()
    steps = _rollout(env, 3)
    for raw, obs in steps:
        np.testing.assert_allclose(obs[:, 0], 2.0 * raw, atol=1e-5)
    env.close()


@pytest.mark.slow
def test_history_stacking_order():
    H = 3
    env = _env(history_length=H)
    assert env.observation_manager.group_obs_dim("policy") == H
    steps = _rollout(env, 5)
    raws = [r for r, _ in steps]
    obs_last = steps[-1][1]
    # oldest -> newest flattening (chronological window)
    want = 2.0 * np.stack([raws[-3], raws[-2], raws[-1]], axis=1)
    np.testing.assert_allclose(obs_last, want, atol=1e-5)
    env.close()


@pytest.mark.slow
def test_fixed_delay():
    D = 2
    env = _env(delay=D)
    steps = _rollout(env, 6)
    raws = [r for r, _ in steps]
    obs_last = steps[-1][1]
    # obs lags the raw signal by exactly D control steps
    np.testing.assert_allclose(obs_last[:, 0], 2.0 * raws[-1 - D], atol=1e-5)
    env.close()
