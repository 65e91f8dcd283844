"""Unitree G1 humanoid constants (reference
src/mjlab/asset_zoo/robots/unitree_g1/g1_constants.py).

Armatures are derived from the published rotor inertias of the G1's
two-stage planetary gearboxes; PD gains follow the critical-ish tuning rule
k = I*w^2, d = 2*zeta*I*w with natural frequency 10 Hz and zeta = 2. All
motor spec values are Unitree-published hardware facts.
"""

from __future__ import annotations

import os
from pathlib import Path

import mujoco

from mjlab_tpu.actuator import BuiltinPositionActuatorCfg
from mjlab_tpu.entity import EntityArticulationInfoCfg, EntityCfg
from mjlab_tpu.utils.actuator import (
    ElectricActuator,
    reflected_inertia_from_two_stage_planetary,
)
from mjlab_tpu.utils.spec_config import CollisionCfg

G1_XML: Path = Path(__file__).parent / "xmls" / "g1.xml"
assert G1_XML.exists()


def get_assets() -> dict[str, bytes]:
    assets = {}
    d = G1_XML.parent / "assets"
    for f in os.listdir(d):
        assets[os.path.join("assets", f)] = (d / f).read_bytes()
    return assets


def get_spec() -> mujoco.MjSpec:
    spec = mujoco.MjSpec.from_file(str(G1_XML))
    spec.assets = get_assets()
    return spec


# -- motor classes: (rotor inertias per stage, gear ratios per stage) --

ARMATURE_5020 = reflected_inertia_from_two_stage_planetary(
    (0.139e-4, 0.017e-4, 0.169e-4), (1, 1 + 46 / 18, 1 + 56 / 16)
)
ARMATURE_7520_14 = reflected_inertia_from_two_stage_planetary(
    (0.489e-4, 0.098e-4, 0.533e-4), (1, 4.5, 1 + 48 / 22)
)
ARMATURE_7520_22 = reflected_inertia_from_two_stage_planetary(
    (0.489e-4, 0.109e-4, 0.738e-4), (1, 4.5, 5)
)
ARMATURE_4010 = reflected_inertia_from_two_stage_planetary(
    (0.068e-4, 0.0, 0.0), (1, 5, 5)
)

ACTUATOR_5020 = ElectricActuator(ARMATURE_5020, 37.0, 25.0)
ACTUATOR_7520_14 = ElectricActuator(ARMATURE_7520_14, 32.0, 88.0)
ACTUATOR_7520_22 = ElectricActuator(ARMATURE_7520_22, 20.0, 139.0)
ACTUATOR_4010 = ElectricActuator(ARMATURE_4010, 22.0, 5.0)

NATURAL_FREQ = 10 * 2.0 * 3.1415926535  # 10 Hz
DAMPING_RATIO = 2.0


def _pd(armature: float) -> tuple[float, float]:
    return (
        armature * NATURAL_FREQ**2,
        2.0 * DAMPING_RATIO * armature * NATURAL_FREQ,
    )


STIFFNESS_5020, DAMPING_5020 = _pd(ARMATURE_5020)
STIFFNESS_7520_14, DAMPING_7520_14 = _pd(ARMATURE_7520_14)
STIFFNESS_7520_22, DAMPING_7520_22 = _pd(ARMATURE_7520_22)
STIFFNESS_4010, DAMPING_4010 = _pd(ARMATURE_4010)

G1_ACTUATOR_5020 = BuiltinPositionActuatorCfg(
    joint_names_expr=(
        ".*_elbow_joint",
        ".*_shoulder_pitch_joint",
        ".*_shoulder_roll_joint",
        ".*_shoulder_yaw_joint",
        ".*_wrist_roll_joint",
    ),
    stiffness=STIFFNESS_5020,
    damping=DAMPING_5020,
    effort_limit=ACTUATOR_5020.effort_limit,
    armature=ACTUATOR_5020.reflected_inertia,
)
G1_ACTUATOR_7520_14 = BuiltinPositionActuatorCfg(
    joint_names_expr=(".*_hip_pitch_joint", ".*_hip_yaw_joint", "waist_yaw_joint"),
    stiffness=STIFFNESS_7520_14,
    damping=DAMPING_7520_14,
    effort_limit=ACTUATOR_7520_14.effort_limit,
    armature=ACTUATOR_7520_14.reflected_inertia,
)
G1_ACTUATOR_7520_22 = BuiltinPositionActuatorCfg(
    joint_names_expr=(".*_hip_roll_joint", ".*_knee_joint"),
    stiffness=STIFFNESS_7520_22,
    damping=DAMPING_7520_22,
    effort_limit=ACTUATOR_7520_22.effort_limit,
    armature=ACTUATOR_7520_22.reflected_inertia,
)
G1_ACTUATOR_4010 = BuiltinPositionActuatorCfg(
    joint_names_expr=(".*_wrist_pitch_joint", ".*_wrist_yaw_joint"),
    stiffness=STIFFNESS_4010,
    damping=DAMPING_4010,
    effort_limit=ACTUATOR_4010.effort_limit,
    armature=ACTUATOR_4010.reflected_inertia,
)
# Waist pitch/roll and ankles: 4-bar linkages driven by two 5020 motors;
# nominal 1:1 linkage -> double everything.
G1_ACTUATOR_WAIST = BuiltinPositionActuatorCfg(
    joint_names_expr=("waist_pitch_joint", "waist_roll_joint"),
    stiffness=STIFFNESS_5020 * 2,
    damping=DAMPING_5020 * 2,
    effort_limit=ACTUATOR_5020.effort_limit * 2,
    armature=ACTUATOR_5020.reflected_inertia * 2,
)
G1_ACTUATOR_ANKLE = BuiltinPositionActuatorCfg(
    joint_names_expr=(".*_ankle_pitch_joint", ".*_ankle_roll_joint"),
    stiffness=STIFFNESS_5020 * 2,
    damping=DAMPING_5020 * 2,
    effort_limit=ACTUATOR_5020.effort_limit * 2,
    armature=ACTUATOR_5020.reflected_inertia * 2,
)

# -- keyframes --

HOME_KEYFRAME = EntityCfg.InitialStateCfg(
    pos=(0, 0, 0.783675),
    joint_pos={
        ".*_hip_pitch_joint": -0.1,
        ".*_knee_joint": 0.3,
        ".*_ankle_pitch_joint": -0.2,
        ".*_shoulder_pitch_joint": 0.2,
        ".*_elbow_joint": 1.28,
        "left_shoulder_roll_joint": 0.2,
        "right_shoulder_roll_joint": -0.2,
    },
    joint_vel={".*": 0.0},
)

KNEES_BENT_KEYFRAME = EntityCfg.InitialStateCfg(
    pos=(0, 0, 0.76),
    joint_pos={
        ".*_hip_pitch_joint": -0.312,
        ".*_knee_joint": 0.669,
        ".*_ankle_pitch_joint": -0.363,
        ".*_elbow_joint": 0.6,
        "left_shoulder_roll_joint": 0.2,
        "left_shoulder_pitch_joint": 0.2,
        "right_shoulder_roll_joint": -0.2,
        "right_shoulder_pitch_joint": 0.2,
    },
    joint_vel={".*": 0.0},
)

# -- collision presets --

FULL_COLLISION = CollisionCfg(
    geom_names_expr=(".*_collision",),
    condim={r"^(left|right)_foot[1-7]_collision$": 3, ".*_collision": 1},
    priority={r"^(left|right)_foot[1-7]_collision$": 1},
    friction={r"^(left|right)_foot[1-7]_collision$": (0.6,)},
)

FULL_COLLISION_WITHOUT_SELF = CollisionCfg(
    geom_names_expr=(".*_collision",),
    contype=0,
    conaffinity=1,
    condim={r"^(left|right)_foot[1-7]_collision$": 3, ".*_collision": 1},
    priority={r"^(left|right)_foot[1-7]_collision$": 1},
    friction={r"^(left|right)_foot[1-7]_collision$": (0.6,)},
)

FEET_ONLY_COLLISION = CollisionCfg(
    geom_names_expr=(r"^(left|right)_foot[1-7]_collision$",),
    contype=0,
    conaffinity=1,
    condim=3,
    priority=1,
    friction=(0.6,),
)

G1_ARTICULATION = EntityArticulationInfoCfg(
    actuators=(
        G1_ACTUATOR_5020,
        G1_ACTUATOR_7520_14,
        G1_ACTUATOR_7520_22,
        G1_ACTUATOR_4010,
        G1_ACTUATOR_WAIST,
        G1_ACTUATOR_ANKLE,
    ),
    soft_joint_pos_limit_factor=0.9,
)


def get_g1_robot_cfg() -> EntityCfg:
    """Fresh G1 EntityCfg (new instance to avoid shared-mutation issues)."""
    return EntityCfg(
        init_state=KNEES_BENT_KEYFRAME,
        collisions=(FULL_COLLISION,),
        spec_fn=get_spec,
        articulation=G1_ARTICULATION,
    )


# action scale rule: 0.25 * effort_limit / stiffness per motor class
G1_ACTION_SCALE: dict[str, float] = {}
for _a in G1_ARTICULATION.actuators:
    for _n in _a.joint_names_expr:
        G1_ACTION_SCALE[_n] = 0.25 * _a.effort_limit / _a.stiffness
