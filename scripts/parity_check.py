"""Stage-by-stage parity diff of mjlab_tpu.phys against CPU MuJoCo.

Usage: JAX_PLATFORMS=cpu python scripts/parity_check.py [--model g1|toy|ball]
"""

import os
import sys

# ground truth is CPU MuJoCo; force the CPU backend unless explicitly
# overridden (the ambient JAX_PLATFORMS may point at a hardware plugin
# whose tunnel can be down, which hangs backend init)
if os.environ.get("MJLAB_PARITY_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["MJLAB_PARITY_PLATFORM"]
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# a sitecustomize may import jax (and pick a hardware plugin) before the
# env var above is seen — force the platform through jax.config too
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import mujoco
import numpy as np

import mjlab_tpu.phys.forward as fwd
from mjlab_tpu.phys import kinematics as kin
from mjlab_tpu.phys import smooth
from mjlab_tpu.phys.collision import collision
from mjlab_tpu.phys.constraint import make_constraint
from mjlab_tpu.phys.solver import solve
from mjlab_tpu.phys.model import put_model
from mjlab_tpu.phys.data import put_data

TOY = """
<mujoco>
  <option timestep="0.002" integrator="Euler"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body name="base" pos="0 0 0.30">
      <freejoint/>
      <geom type="sphere" size="0.1" pos="0.02 0.01 0.0"/>
      <body name="leg" pos="0.1 0 0">
        <joint name="hip" type="hinge" axis="0 1 0" pos="0 0 0.05" range="-1 1"
               damping="0.1" armature="0.01" frictionloss="0.2"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0 0 -0.3"/>
        <body name="foot" pos="0 0 -0.3">
          <joint name="knee" type="hinge" axis="0 1 0" range="-2 0.5" damping="0.05"/>
          <geom type="sphere" size="0.04"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position name="hip_act" joint="hip" kp="30" kv="2"/>
    <motor name="knee_act" joint="knee" gear="1.5"/>
  </actuator>
</mujoco>
"""

BALL = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint type="ball" damping="0.02"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0"/>
      <body pos="0.3 0 0">
        <joint type="slide" axis="1 0 0" range="-0.2 0.2"/>
        <geom type="sphere" size="0.05"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def load_g1():
    xml = "/root/reference/src/mjlab/asset_zoo/robots/unitree_g1/xmls/g1.xml"
    spec = mujoco.MjSpec.from_file(xml)
    d = os.path.join(os.path.dirname(xml), "assets")
    spec.assets = {
        os.path.join("assets", f): open(os.path.join(d, f), "rb").read()
        for f in os.listdir(d)
    }
    # add a plane for contacts
    spec.worldbody.add_geom(
        type=mujoco.mjtGeom.mjGEOM_PLANE, size=[10, 10, 0.1], name="floor"
    )
    return spec.compile()


def diff(name, a, b, tol=1e-9):
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        print(f"  {name:24s} SHAPE MISMATCH {a.shape} vs {b.shape}")
        return False
    err = np.max(np.abs(a - b)) if a.size else 0.0
    ok = err < tol
    print(f"  {name:24s} max|err| = {err:.3e} {'OK' if ok else '** FAIL **'}")
    return ok


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "toy"
    if which == "g1":
        mj = load_g1()
    elif which == "ball":
        mj = mujoco.MjModel.from_xml_string(BALL)
    else:
        mj = mujoco.MjModel.from_xml_string(TOY)

    rng = np.random.default_rng(0)
    dmj = mujoco.MjData(mj)
    # randomize state a bit
    dmj.qpos[:] = mj.qpos0 + 0.05 * rng.standard_normal(mj.nq)
    # renormalize quats
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:
            a = mj.jnt_qposadr[j] + 3
            dmj.qpos[a : a + 4] /= np.linalg.norm(dmj.qpos[a : a + 4])
        elif mj.jnt_type[j] == 1:
            a = mj.jnt_qposadr[j]
            dmj.qpos[a : a + 4] /= np.linalg.norm(dmj.qpos[a : a + 4])
    dmj.qvel[:] = 0.2 * rng.standard_normal(mj.nv)
    dmj.ctrl[:] = 0.3 * rng.standard_normal(mj.nu)
    mujoco.mj_forward(mj, dmj)

    m = put_model(mj, dtype=jnp.float64)
    d = put_data(m, dmj, dtype=jnp.float64)
    d = d.replace(qacc_warmstart=jnp.zeros(mj.nv))  # no warmstart for determinism

    d = kin.kinematics(m, d)
    print("== kinematics ==")
    diff("xpos", d.xpos, dmj.xpos)
    diff("xquat(abs)", np.abs(d.xquat), np.abs(dmj.xquat))
    diff("xipos", d.xipos, dmj.xipos)
    diff("geom_xpos", d.geom_xpos, dmj.geom_xpos)
    diff("geom_xmat", d.geom_xmat, dmj.geom_xmat.reshape(-1, 3, 3))
    diff("xanchor", d.xanchor, dmj.xanchor)
    diff("xaxis", d.xaxis, dmj.xaxis, tol=1e-8)

    d = kin.com_pos(m, d)
    print("== com_pos ==")
    diff("subtree_com", d.subtree_com, dmj.subtree_com)
    diff("cdof", d.cdof, dmj.cdof, tol=1e-8)
    # cinert comparison via action on random motion vectors
    v6 = rng.standard_normal((6,))
    ours = np.asarray(d.cinert) @ v6
    # mujoco cinert: 10 = [IXX IYY IZZ IXY IXZ IYZ? -> full], h=mass*c, m
    cin = dmj.cinert
    theirs = np.zeros((mj.nbody, 6))
    for b in range(mj.nbody):
        I = np.array(
            [
                [cin[b, 0], cin[b, 3], cin[b, 4]],
                [cin[b, 3], cin[b, 1], cin[b, 5]],
                [cin[b, 4], cin[b, 5], cin[b, 2]],
            ]
        )
        h = cin[b, 6:9]
        mass = cin[b, 9]
        w, lin = v6[:3], v6[3:]
        theirs[b, :3] = I @ w + np.cross(h, lin)
        theirs[b, 3:] = mass * lin - np.cross(h, w)
    diff("cinert(action)", ours, theirs, tol=1e-8)

    d = smooth.crb(m, d)
    print("== crb ==")
    fullM = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, dmj, fullM)
    diff("qM", d.qM, fullM, tol=1e-8)

    d = collision(m, d)
    print("== collision ==")
    print(f"  mj ncon={dmj.ncon}  ours(active)={int(np.sum(np.asarray(d.contact.dist) < np.asarray(d.contact.includemargin)))} (slots={d.contact.dist.shape[0]})")
    # match contacts by geom pair
    ours_by_pair = {}
    pt = m.pairs
    for c in range(pt.ncon):
        key = (int(pt.con_geom1[c]), int(pt.con_geom2[c]))
        ours_by_pair.setdefault(key, []).append(c)
    all_ok = True
    for i in range(dmj.ncon):
        con = dmj.contact[i]
        key = (con.geom1, con.geom2)
        cands = ours_by_pair.get(key) or ours_by_pair.get((con.geom2, con.geom1))
        if not cands:
            print(f"  MISSING contact for pair {key}")
            all_ok = False
            continue
        dists = np.asarray(d.contact.dist)[cands]
        poss = np.asarray(d.contact.pos)[cands]
        kbest = int(np.argmin(np.linalg.norm(poss - con.pos, axis=-1)))
        c = cands[kbest]
        e_d = abs(dists[kbest] - con.dist)
        e_p = np.max(np.abs(poss[kbest] - con.pos))
        e_f = np.max(np.abs(np.asarray(d.contact.frame)[c] - con.frame.reshape(3, 3)))
        ok = e_d < 1e-9 and e_p < 1e-9 and e_f < 1e-9
        all_ok &= ok
        print(
            f"  pair {key}: d_err={e_d:.2e} pos_err={e_p:.2e} frame_err={e_f:.2e} {'OK' if ok else '** FAIL **'}"
        )

    d = smooth.transmission(m, d)
    print("== transmission ==")
    diff("actuator_length", d.actuator_length, dmj.actuator_length)
    moment = np.zeros((mj.nu, mj.nv))
    mujoco.mju_sparse2dense(
        moment, dmj.actuator_moment, dmj.moment_rownnz, dmj.moment_rowadr,
        dmj.moment_colind,
    )
    diff("actuator_moment", d.actuator_moment, moment)

    d = make_constraint(m, d)
    d = smooth.com_vel(m, d)
    print("== com_vel ==")
    diff("cvel", d.cvel, dmj.cvel, tol=1e-8)
    diff("cdof_dot", d.cdof_dot, dmj.cdof_dot, tol=1e-8)

    d = smooth.rne(m, d)
    print("== rne ==")
    diff("qfrc_bias", d.qfrc_bias, dmj.qfrc_bias, tol=1e-8)

    d = smooth.passive(m, d)
    diff("qfrc_passive", d.qfrc_passive, dmj.qfrc_passive, tol=1e-10)

    d = smooth.fwd_actuation(m, d)
    print("== actuation ==")
    diff("actuator_force", d.actuator_force, dmj.actuator_force)
    diff("qfrc_actuator", d.qfrc_actuator, dmj.qfrc_actuator)

    d = fwd.fwd_acceleration(m, d)
    print("== acceleration ==")
    diff("qfrc_smooth", d.qfrc_smooth, dmj.qfrc_smooth, tol=1e-8)
    diff("qacc_smooth", d.qacc_smooth, dmj.qacc_smooth, tol=1e-7)

    # efc comparison: by row content is hard (ordering); compare solve outputs
    d = solve(m, d)
    print("== solve ==")
    print(f"  mj nefc={dmj.nefc} ours nefc={m.nefc} active={int(np.asarray(d.efc_active).sum())}")
    diff("qfrc_constraint", d.qfrc_constraint, dmj.qfrc_constraint, tol=1e-6)
    diff("qacc", d.qacc, dmj.qacc, tol=1e-6)

    # full step trajectory drift
    print("== trajectory (200 steps, zero ctrl) ==")
    import copy

    dmj2 = mujoco.MjData(mj)
    dmj2.qpos[:] = np.asarray(dmj.qpos)
    dmj2.qvel[:] = np.asarray(dmj.qvel)
    dmj2.ctrl[:] = np.asarray(dmj.ctrl)
    d2 = put_data(m, dmj2, dtype=jnp.float64)
    step_j = jax.jit(fwd.step)
    for t in range(200):
        mujoco.mj_step(mj, dmj2)
        d2 = step_j(m, d2)
        if t in (0, 1, 4, 19, 49, 99, 199):
            e = np.max(np.abs(np.asarray(d2.qpos) - dmj2.qpos))
            print(f"  step {t+1:4d}: max|qpos err| = {e:.3e}")


if __name__ == "__main__":
    main()
