"""Per-stage jaxpr op-count profile of the lane-major engine at G1 scale.

Compile cost on TPU scales with jaxpr size; this pinpoints which lm stage
contributes the equations. Usage: python scripts/lm_opcount.py [g1|toy]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.phys.model import put_model
from mjlab_tpu.phys.data import make_data
from mjlab_tpu.phys.lm import step_lm
from mjlab_tpu.phys.lm.base import Params
from mjlab_tpu.phys.lm import step as lm_step_mod
from mjlab_tpu.phys.lm.kinematics import kinematics_lm, com_pos_lm
from mjlab_tpu.phys.lm.smooth import (
    actuation_lm, com_vel_lm, crb_lm, passive_lm, rne_lm,
)
from mjlab_tpu.phys.lm.collision import collision_lm
from mjlab_tpu.phys.lm.constraint import make_constraint_lm
from mjlab_tpu.phys.lm.solver import solve_lm


def total_eqns(jx):
    def count(j):
        c = len(j.eqns)
        for e in j.eqns:
            for v in e.params.values():
                if hasattr(v, "jaxpr"):
                    c += count(v.jaxpr)
                if isinstance(v, (list, tuple)):
                    for vv in v:
                        if hasattr(vv, "jaxpr"):
                            c += count(vv.jaxpr)
        return c

    return count(jx.jaxpr)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "g1"
    if which == "g1":
        import mjlab_tpu.tasks as tasks
        from mjlab_tpu.scene.scene import Scene

        cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
        cfg.scene.num_envs = 1
        scene = Scene(cfg.scene)
        mj = scene.compile()
        cfg.sim.mujoco.apply(mj)
    else:
        from scripts.check_lm import TOY_XML

        mj = mujoco.MjModel.from_xml_string(TOY_XML)

    m = put_model(mj, dtype=jnp.float32, nconmax=35)
    d0 = make_data(m, dtype=jnp.float32)
    E = 256
    dB = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), d0
    )
    dtype = jnp.float32
    bf = frozenset()

    # build stage inputs once (concrete), then trace each stage standalone
    P = Params(m, bf, E)
    q = lm_step_mod._planes(dB.qpos)
    qvel = lm_step_mod._planes(dB.qvel)
    ctrl = lm_step_mod._planes(dB.ctrl)
    mocap_pos = lm_step_mod._vec_list(dB.mocap_pos, m.nmocap, 3)
    mocap_quat = lm_step_mod._vec_list(dB.mocap_quat, m.nmocap, 4)

    stages = [
        ("kinematics", lambda: kinematics_lm(m, P, q, mocap_pos, mocap_quat)),
    ]

    k = kinematics_lm(m, P, q, mocap_pos, mocap_quat)
    stages.append(("com_pos", lambda: com_pos_lm(m, P, dict(k))))
    k = com_pos_lm(m, P, k)
    stages.append(("crb", lambda: crb_lm(m, P, dict(k))))
    k = crb_lm(m, P, k)
    stages.append(("collision", lambda: collision_lm(m, P, dict(k), dtype)))
    k = collision_lm(m, P, k, dtype)
    stages.append(
        ("constraint", lambda: make_constraint_lm(m, P, dict(k), q, qvel, dtype))
    )
    k = make_constraint_lm(m, P, k, q, qvel, dtype)
    stages.append(("com_vel", lambda: com_vel_lm(m, P, dict(k), qvel)))
    k = com_vel_lm(m, P, k, qvel)
    stages.append(("rne", lambda: rne_lm(m, P, dict(k), qvel)))
    k = rne_lm(m, P, k, qvel)
    stages.append(("passive", lambda: passive_lm(m, P, dict(k), q, qvel)))
    k = passive_lm(m, P, k, q, qvel)
    stages.append(
        ("actuation", lambda: actuation_lm(m, P, dict(k), q, qvel, ctrl))
    )
    k = actuation_lm(m, P, k, q, qvel, ctrl)

    from mjlab_tpu.phys.lm.solver import _chol_solve_envlast

    k["qM_dense"] = lm_step_mod._qM_dense(k["qM"], m.nv, E, dtype)
    qfs = jnp.stack(
        [jnp.broadcast_to(k["qfrc_bias"][i], (E,)) for i in range(m.nv)]
    )
    a_smooth = _chol_solve_envlast(k["qM_dense"], qfs, m.nv)
    x_ws = dB.qacc_warmstart.T
    stages.append(
        ("solver", lambda: solve_lm(m, P, dict(k), a_smooth, x_ws, dtype))
    )

    tot = 0
    for name, fn in stages:
        # close over concrete values; trace the stage body
        jx = jax.make_jaxpr(lambda _: fn())(0.0)
        n = total_eqns(jx)
        tot += n
        print(f"{name:12s} {n:7d} eqns")
    print(f"{'sum':12s} {tot:7d}")

    jx = jax.make_jaxpr(lambda dd: step_lm(m, bf, dd))(dB)
    print(f"{'full step':12s} {total_eqns(jx):7d} eqns (incl. write-back)")


if __name__ == "__main__":
    main()
