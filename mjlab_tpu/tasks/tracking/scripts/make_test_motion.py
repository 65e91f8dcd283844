"""Generate a synthetic reference motion npz for the tracking task.

The reference pipeline retargets mocap CSVs to npz via forward kinematics
(reference src/mjlab/scripts/csv_to_npz.py); in an offline environment this
script synthesizes a physically-plausible squat/sway motion for the G1 by
scripting a joint trajectory and running host-side MuJoCo FK, producing the
same npz schema: joint_pos, joint_vel, body_pos_w, body_quat_w,
body_lin_vel_w, body_ang_vel_w (body arrays in entity body order), fps.
"""

from __future__ import annotations

import argparse

import mujoco
import numpy as np


def make_g1_test_motion(out_path: str, seconds: float = 4.0, fps: float = 50.0):
    from mjlab_tpu.asset_zoo.robots.unitree_g1.g1_constants import (
        KNEES_BENT_KEYFRAME,
        get_spec,
    )
    from mjlab_tpu.utils.string import resolve_matching_names_values

    spec = get_spec()
    model = spec.compile()
    data = mujoco.MjData(model)

    joint_names = [
        mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_JOINT, j)
        for j in range(model.njnt)
        if model.jnt_type[j] != mujoco.mjtJoint.mjJNT_FREE
    ]
    jq = np.array(
        [
            model.jnt_qposadr[mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_JOINT, n)]
            for n in joint_names
        ]
    )
    J = len(joint_names)

    # default joint pose from the knees-bent keyframe
    q_default = np.zeros(J)
    ids, _, vals = resolve_matching_names_values(
        KNEES_BENT_KEYFRAME.joint_pos, joint_names
    )
    q_default[ids] = vals
    base_z = KNEES_BENT_KEYFRAME.pos[2]

    def idxs(expr):
        import re

        return [i for i, n in enumerate(joint_names) if re.fullmatch(expr, n)]

    hip_p = idxs(".*_hip_pitch_joint")
    knee = idxs(".*_knee_joint")
    ankle_p = idxs(".*_ankle_pitch_joint")
    sh_p = idxs(".*_shoulder_pitch_joint")
    elbow = idxs(".*_elbow_joint")

    T = int(seconds * fps)
    dt = 1.0 / fps
    joint_pos = np.tile(q_default, (T, 1))
    t = np.arange(T) * dt

    # squat: sinusoidal crouch synchronised across hip/knee/ankle
    squat = 0.25 * (1 - np.cos(2 * np.pi * 0.5 * t))  # 0..0.5, 0.5 Hz
    joint_pos[:, hip_p] = q_default[hip_p][None] - squat[:, None]
    joint_pos[:, knee] = q_default[knee][None] + 2 * squat[:, None]
    joint_pos[:, ankle_p] = q_default[ankle_p][None] - squat[:, None]
    # arm wave
    wave = 0.3 * np.sin(2 * np.pi * 1.0 * t)
    joint_pos[:, sh_p] = q_default[sh_p][None] + wave[:, None]
    joint_pos[:, elbow] = q_default[elbow][None] + 0.5 * wave[:, None]

    # root bobs down as the legs fold (rough kinematic consistency)
    root_z = base_z - 0.22 * squat

    nbody = model.nbody - 1  # exclude world; entity order = model order 1..
    body_pos = np.zeros((T, nbody, 3))
    body_quat = np.zeros((T, nbody, 4))
    joint_vel = np.zeros((T, J))

    for k in range(T):
        data.qpos[:] = 0
        data.qpos[0:3] = (0.0, 0.0, root_z[k])
        data.qpos[3:7] = (1.0, 0, 0, 0)
        data.qpos[jq] = joint_pos[k]
        mujoco.mj_kinematics(model, data)
        body_pos[k] = data.xpos[1:]
        body_quat[k] = data.xquat[1:]

    # finite-difference velocities
    joint_vel[1:] = (joint_pos[1:] - joint_pos[:-1]) / dt
    body_lin_vel = np.zeros_like(body_pos)
    body_lin_vel[1:] = (body_pos[1:] - body_pos[:-1]) / dt
    body_ang_vel = np.zeros((T, nbody, 3))
    # ang vel from quaternion differences (world frame)
    q1 = body_quat[:-1]
    q2 = body_quat[1:]
    dq = np.empty_like(q2)
    # dq = q2 * conj(q1)
    w1, x1, y1, z1 = q1[..., 0], -q1[..., 1], -q1[..., 2], -q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    dq[..., 0] = w2 * w1 - x2 * x1 - y2 * y1 - z2 * z1
    dq[..., 1] = w2 * x1 + x2 * w1 + y2 * z1 - z2 * y1
    dq[..., 2] = w2 * y1 - x2 * z1 + y2 * w1 + z2 * x1
    dq[..., 3] = w2 * z1 + x2 * y1 - y2 * x1 + z2 * w1
    sin_half = np.linalg.norm(dq[..., 1:], axis=-1)
    angle = 2 * np.arctan2(sin_half, np.abs(dq[..., 0]))
    axis = dq[..., 1:] / np.maximum(sin_half, 1e-12)[..., None]
    sign = np.sign(dq[..., 0])[..., None]
    body_ang_vel[1:] = sign * axis * (angle / dt)[..., None]

    np.savez(
        out_path,
        joint_pos=joint_pos.astype(np.float32),
        joint_vel=joint_vel.astype(np.float32),
        body_pos_w=body_pos.astype(np.float32),
        body_quat_w=body_quat.astype(np.float32),
        body_lin_vel_w=body_lin_vel.astype(np.float32),
        body_ang_vel_w=body_ang_vel.astype(np.float32),
        fps=np.float32(fps),
        joint_names=np.array(joint_names),
    )
    print(f"wrote {out_path}: {T} frames, {J} joints, {nbody} bodies")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/g1_test_motion.npz")
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--fps", type=float, default=50.0)
    a = p.parse_args()
    make_g1_test_motion(a.out, a.seconds, a.fps)
