"""Shared miniature pendulum env for component tests."""

import mujoco

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


def pend_spec():
    return mujoco.MjSpec.from_string(
        """
<mujoco>
  <compiler angle="radian"/>
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


def make_pendulum_cfg(history_length=0, delay=0, action_scale=1.0,
                      action_offset=0.0, num_envs=E,
                      soft_joint_pos_limit_factor=1.0,
                      group_history_length=None,
                      flatten_history_dim=True,
                      group_flatten_history_dim=True):
    cfg = ManagerBasedRlEnvCfg(
        decimation=1,
        episode_length_s=1000.0,
        scene=SceneCfg(
            num_envs=num_envs,
            entities={
                "robot": EntityCfg(
                    spec_fn=pend_spec,
                    articulation=EntityArticulationInfoCfg(
                        actuators=(
                            BuiltinPositionActuatorCfg(
                                joint_names_expr=("hinge",),
                                stiffness=50.0,
                                damping=5.0,
                                effort_limit=100.0,
                            ),
                        ),
                        soft_joint_pos_limit_factor=soft_joint_pos_limit_factor,
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
                        flatten_history_dim=flatten_history_dim,
                        delay_min_lag=delay,
                        delay_max_lag=delay,
                    )
                },
                history_length=group_history_length,
                flatten_history_dim=group_flatten_history_dim,
            )
        },
        actions={
            "joint_pos": JointPositionActionCfg(
                actuator_names=("hinge",), scale=action_scale,
                offset=action_offset,
            )
        },
        rewards={"alive": RewardTermCfg(func=mdp.is_alive, weight=1.0)},
        terminations={
            "time_out": TerminationTermCfg(func=mdp.time_out, time_out=True)
        },
    )
    cfg.sim.mujoco.timestep = 0.01
    return cfg


def make_pendulum_env(history_length=0, delay=0, action_scale=1.0,
                      action_offset=0.0, num_envs=E,
                      soft_joint_pos_limit_factor=1.0, **kw):
    cfg = make_pendulum_cfg(
        history_length=history_length, delay=delay, action_scale=action_scale,
        action_offset=action_offset, num_envs=num_envs,
        soft_joint_pos_limit_factor=soft_joint_pos_limit_factor, **kw,
    )
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    return env
