"""MjSpec editing helpers (host-side model compilation).

Equivalents of reference src/mjlab/utils/spec.py: programmatic creation of
MuJoCo builtin actuators (<motor>/<position>/<velocity>) and the fixed-base
mocap auto-wrap. All host-only; runs once at scene build time.
"""

from __future__ import annotations

from typing import Callable

import mujoco
import numpy as np


def is_joint_limited(jnt: mujoco.MjsJoint) -> bool:
    if jnt.limited == mujoco.mjtLimited.mjLIMITED_TRUE:
        return True
    if jnt.limited == mujoco.mjtLimited.mjLIMITED_AUTO:
        return bool(jnt.range[0] < jnt.range[1])
    return False


def _set_joint_props(spec, joint_name, armature, frictionloss):
    j = spec.joint(joint_name)
    j.armature = armature
    j.frictionloss = frictionloss


def create_motor_actuator(
    spec: mujoco.MjSpec,
    joint_name: str,
    *,
    effort_limit: float,
    gear: float = 1.0,
    armature: float = 0.0,
    frictionloss: float = 0.0,
) -> mujoco.MjsActuator:
    """Direct-torque <motor> actuator on a joint."""
    a = spec.add_actuator(name=joint_name, target=joint_name)
    a.trntype = mujoco.mjtTrn.mjTRN_JOINT
    a.dyntype = mujoco.mjtDyn.mjDYN_NONE
    a.gaintype = mujoco.mjtGain.mjGAIN_FIXED
    a.biastype = mujoco.mjtBias.mjBIAS_NONE
    a.gear[0] = gear
    a.forcelimited = True
    a.forcerange[:] = (-effort_limit, effort_limit)
    a.ctrllimited = True
    a.ctrlrange[:] = (-effort_limit, effort_limit)
    _set_joint_props(spec, joint_name, armature, frictionloss)
    return a


def create_position_actuator(
    spec: mujoco.MjSpec,
    joint_name: str,
    *,
    stiffness: float,
    damping: float,
    effort_limit: float | None = None,
    armature: float = 0.0,
    frictionloss: float = 0.0,
) -> mujoco.MjsActuator:
    """Affine PD <position> actuator: the PD law lives INSIDE the implicit
    solver (gainprm kp; biasprm -kp, -kd), which is what makes the builtin
    position actuator stable at large gains. ctrl is deliberately unlimited
    so policies can command setpoints beyond the joint range."""
    a = spec.add_actuator(name=joint_name, target=joint_name)
    a.trntype = mujoco.mjtTrn.mjTRN_JOINT
    a.dyntype = mujoco.mjtDyn.mjDYN_NONE
    a.gaintype = mujoco.mjtGain.mjGAIN_FIXED
    a.biastype = mujoco.mjtBias.mjBIAS_AFFINE
    a.gainprm[0] = stiffness
    a.biasprm[1] = -stiffness
    a.biasprm[2] = -damping
    a.ctrllimited = False
    if effort_limit is not None:
        a.forcelimited = True
        a.forcerange[:] = (-effort_limit, effort_limit)
    else:
        a.forcelimited = False
    _set_joint_props(spec, joint_name, armature, frictionloss)
    return a


def create_velocity_actuator(
    spec: mujoco.MjSpec,
    joint_name: str,
    *,
    damping: float,
    effort_limit: float | None = None,
    armature: float = 0.0,
    frictionloss: float = 0.0,
    inheritrange: float = 1.0,
) -> mujoco.MjsActuator:
    a = spec.add_actuator(name=joint_name, target=joint_name)
    a.trntype = mujoco.mjtTrn.mjTRN_JOINT
    a.dyntype = mujoco.mjtDyn.mjDYN_NONE
    a.gaintype = mujoco.mjtGain.mjGAIN_FIXED
    a.biastype = mujoco.mjtBias.mjBIAS_AFFINE
    a.gainprm[0] = damping
    a.biasprm[2] = -damping
    # The reference (utils/spec.py:186) sets inheritrange, but MuJoCo
    # doesn't support inheritrange for the velocity gain/bias pattern
    # (schema rejects it; spec.compile leaves ctrlrange empty and errors).
    # Resolve the range explicitly from the joint range instead.
    jnt = spec.joint(joint_name)
    if is_joint_limited(jnt):
        a.ctrllimited = True
        a.ctrlrange[:] = (
            inheritrange * jnt.range[0],
            inheritrange * jnt.range[1],
        )
    else:
        a.ctrllimited = False
    if effort_limit is not None:
        a.forcelimited = True
        a.forcerange[:] = (-effort_limit, effort_limit)
    else:
        a.forcelimited = False
    _set_joint_props(spec, joint_name, armature, frictionloss)
    return a


def auto_wrap_fixed_base_mocap(
    spec_fn: Callable[[], mujoco.MjSpec],
) -> Callable[[], mujoco.MjSpec]:
    """If the spec's single root body has no joints and mocap is requested
    implicitly (fixed, non-articulated entity), mark it mocap so its pose can
    be written each step (reference utils/spec.py:9)."""

    def wrapped() -> mujoco.MjSpec:
        spec = spec_fn()
        has_free = any(
            j.type == mujoco.mjtJoint.mjJNT_FREE for j in spec.joints
        )
        if has_free:
            return spec
        bodies = [b for b in spec.worldbody.bodies]
        if bodies and bodies[0].mocap:
            return spec
        if len(bodies) == 1 and not spec.joints:
            bodies[0].mocap = True
            return spec
        # articulated fixed-base: wrap the whole entity in a mocap parent
        # body so its base pose is writable per env (reference
        # utils/spec.py:26-50). Keyframes are re-created on the wrapper.
        import numpy as np

        keyframes = [
            (np.array(k.qpos), np.array(k.ctrl), k.name) for k in spec.keys
        ]
        for k in list(spec.keys):
            spec.delete(k)
        wrapper = mujoco.MjSpec()
        mocap_body = wrapper.worldbody.add_body(name="mocap_base", mocap=True)
        frame = mocap_body.add_frame()
        wrapper.attach(child=spec, prefix="", frame=frame)
        for qpos, ctrl, name in keyframes:
            wrapper.add_key(name=name, qpos=qpos, ctrl=ctrl)
        return wrapper

    return wrapped
