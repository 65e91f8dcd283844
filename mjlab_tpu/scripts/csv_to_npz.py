"""Motion retarget pipeline: CSV keyframes -> tracking-ready npz
(reference src/mjlab/scripts/csv_to_npz.py, 431 LoC).

Input CSV rows: [root_pos(3), root_quat wxyz(4), joint_pos(J)] at input_fps.
Pipeline: linear/slerp interpolation to output_fps, finite-difference
velocities, forward kinematics through the framework's own physics
(kinematics + com_vel) to recover world-frame body poses/velocities, then
np.savez with the MotionLoader keys (fps, joint_pos, joint_vel, body_pos_w,
body_quat_w, body_lin_vel_w, body_ang_vel_w).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def _slerp(q0, q1, t):
    d = np.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = np.where(d < 0, -q1, q1)
    d = np.abs(d).clip(0, 1)
    theta = np.arccos(d)
    sin = np.sin(theta)
    small = sin < 1e-6
    w0 = np.where(small, 1 - t, np.sin((1 - t) * theta) / np.where(small, 1, sin))
    w1 = np.where(small, t, np.sin(t * theta) / np.where(small, 1, sin))
    q = w0 * q0 + w1 * q1
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def interpolate_motion(frames: np.ndarray, input_fps: int, output_fps: int):
    """frames (T, 7+J) -> (T', 7+J) resampled."""
    T = frames.shape[0]
    dur = (T - 1) / input_fps
    T_out = int(np.floor(dur * output_fps)) + 1
    t_out = np.arange(T_out) / output_fps * input_fps
    i0 = np.clip(np.floor(t_out).astype(int), 0, T - 2)
    frac = (t_out - i0)[:, None]
    pos = frames[i0, :3] * (1 - frac) + frames[i0 + 1, :3] * frac
    quat = _slerp(frames[i0, 3:7], frames[i0 + 1, 3:7], frac)
    joints = frames[i0, 7:] * (1 - frac) + frames[i0 + 1, 7:] * frac
    return np.concatenate([pos, quat, joints], axis=1), T_out


def run(
    input_file: str,
    output_file: str,
    input_fps: int = 30,
    output_fps: int = 50,
    robot: str = "unitree_g1",
    render: bool = False,
    render_file: str = "motion.mp4",
    wandb_registry: str | None = None,
):
    from mjlab_tpu.entity.entity import Entity
    from mjlab_tpu.phys.data import make_data
    from mjlab_tpu.phys.kinematics import com_pos, kinematics
    from mjlab_tpu.phys.model import put_model
    from mjlab_tpu.phys.smooth import com_vel

    if robot == "unitree_g1":
        from mjlab_tpu.asset_zoo.robots.unitree_g1.g1_constants import (
            get_g1_robot_cfg,
        )

        entity = Entity(get_g1_robot_cfg())
    else:
        raise ValueError(f"unknown robot {robot}")

    raw = np.loadtxt(input_file, delimiter=",")
    frames, T = interpolate_motion(raw, input_fps, output_fps)
    dt = 1.0 / output_fps

    mj = entity.spec.compile()
    m = put_model(mj)
    d0 = make_data(m)

    qpos = jnp.asarray(frames, jnp.float32)  # (T, nq) free joint + joints
    assert qpos.shape[1] == mj.nq, f"csv gives nq={qpos.shape[1]}, model {mj.nq}"

    # finite-difference velocities (linear part world, angular via quat diff)
    from mjlab_tpu.utils import math as mmath

    lin_vel = jnp.gradient(qpos[:, :3], dt, axis=0)
    q = qpos[:, 3:7]
    q_next = jnp.roll(q, -1, axis=0)
    dq = mmath.quat_mul(q_next, mmath.quat_inv(q))
    ang_vel = 2.0 * dq[:, 1:] / dt
    ang_vel = ang_vel.at[-1].set(ang_vel[-2])
    joint_vel = jnp.gradient(qpos[:, 7:], dt, axis=0)
    qvel = jnp.concatenate([lin_vel, ang_vel, joint_vel], axis=1)

    def fk(qp, qv):
        d = d0.replace(qpos=qp, qvel=qv)
        d = kinematics(m, d)
        d = com_pos(m, d)
        d = com_vel(m, d)
        return d.xpos, d.xquat, d.cvel

    def fk2(qp, qv):
        d = d0.replace(qpos=qp, qvel=qv)
        d = kinematics(m, d)
        d = com_pos(m, d)
        d = com_vel(m, d)
        # cvel is referenced at the subtree CoM of each body's root; shift
        # the linear part to the BODY ORIGIN (reference FK semantics)
        O = d.subtree_com[m.body_rootid]  # (nbody, 3)
        ang = d.cvel[:, :3]
        lin = d.cvel[:, 3:] + jnp.cross(ang, d.xpos - O)
        return d.xpos, d.xquat, ang, lin

    xpos, xquat, body_ang, body_lin = jax.jit(jax.vmap(fk2))(qpos, qvel)

    np.savez(
        output_file,
        fps=np.asarray([output_fps]),
        joint_pos=np.asarray(qpos[:, 7:]),
        joint_vel=np.asarray(joint_vel),
        body_pos_w=np.asarray(xpos),
        body_quat_w=np.asarray(xquat),
        body_lin_vel_w=np.asarray(body_lin),
        body_ang_vel_w=np.asarray(body_ang),
    )
    print(f"wrote {output_file}: {T} frames @ {output_fps} fps")

    if render:
        _render_motion(mj, np.asarray(qpos), output_fps, render_file)
    if wandb_registry:
        _upload_to_wandb(output_file, wandb_registry, render_file if render else None)


def _render_motion(mj, qpos: np.ndarray, fps: int, out_file: str) -> None:
    """Offscreen-render the retargeted motion to mp4 (reference
    csv_to_npz.py render path). Needs a MuJoCo GL backend."""
    import mujoco

    from mjlab_tpu.utils.wrappers.video_recorder import encode_video

    renderer = mujoco.Renderer(mj, height=480, width=640)
    cam = mujoco.MjvCamera()
    cam.distance, cam.azimuth, cam.elevation = 4.0, 90.0, -20.0
    dmj = mujoco.MjData(mj)
    frames = []
    for t in range(qpos.shape[0]):
        dmj.qpos[:] = qpos[t]
        mujoco.mj_kinematics(mj, dmj)
        cam.lookat[:] = dmj.qpos[:3]
        renderer.update_scene(dmj, camera=cam)
        frames.append(renderer.render())
    renderer.close()
    out = encode_video(frames, out_file, fps)
    print(f"rendered {len(frames)} frames to {out}")


def _upload_to_wandb(npz_file: str, registry: str, video_file: str | None):
    """Log the motion npz (and optional video) to a W&B artifact registry
    (reference csv_to_npz.py:311-334)."""
    import os

    import wandb

    collection = os.path.splitext(os.path.basename(npz_file))[0]
    run = wandb.init(project="csv_to_npz", name=collection)
    artifact = wandb.Artifact(name=collection, type="motion")
    artifact.add_file(npz_file)
    logged = run.log_artifact(artifact)
    run.link_artifact(
        logged, target_path=f"wandb-registry-{registry}/{collection}"
    )
    print(f"motion saved to wandb registry {registry}/{collection}")
    if video_file:
        wandb.log({"motion_video": wandb.Video(video_file, format="mp4")})
    run.finish()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input_file")
    p.add_argument("output_file")
    p.add_argument("--input-fps", type=int, default=30)
    p.add_argument("--output-fps", type=int, default=50)
    p.add_argument("--robot", default="unitree_g1")
    p.add_argument("--render", action="store_true",
                   help="offscreen-render the motion to mp4")
    p.add_argument("--render-file", default="motion.mp4")
    p.add_argument("--wandb-registry", default=None,
                   help="link the npz into this W&B artifact registry")
    a = p.parse_args()
    run(
        a.input_file, a.output_file, a.input_fps, a.output_fps, a.robot,
        render=a.render, render_file=a.render_file,
        wandb_registry=a.wandb_registry,
    )


if __name__ == "__main__":
    main()
