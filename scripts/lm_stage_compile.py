"""Per-stage trace/lower/compile cost of the lane-major engine on G1.

The full step_lm at G1 scale exceeded 50 min compile on CPU; this
isolates which stage owns the blowup (jaxpr size ~ trace cost ~ XLA
frontend cost). Each stage is traced with concrete-shaped dummy inputs
derived from running the previous stages once (eagerly, tiny E).

Usage: python scripts/lm_stage_compile.py [E]
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from mjlab_tpu.phys.model import put_model
from mjlab_tpu.phys.data import make_data
from mjlab_tpu.phys.lm.base import Params
from mjlab_tpu.phys.lm.kinematics import kinematics_lm, com_pos_lm
from mjlab_tpu.phys.lm.smooth import (
    actuation_lm, com_vel_lm, crb_lm, passive_lm, rne_lm,
)
from mjlab_tpu.phys.lm.collision import collision_lm
from mjlab_tpu.phys.lm.constraint import make_constraint_lm
from mjlab_tpu.phys.lm.solver import solve_lm, _chol_solve_envlast
from mjlab_tpu.phys.lm.step import _planes, _vec_list, _qM_dense

E = int(sys.argv[1]) if len(sys.argv) > 1 else 256
DTYPE = jnp.float32


def get_g1():
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.scene.scene import Scene

    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = 1
    scene = Scene(cfg.scene)
    mj = scene.compile()
    cfg.sim.mujoco.apply(mj)
    return mj


def report(name, fn, *args):
    t0 = time.perf_counter()
    closed = jax.make_jaxpr(fn)(*args)
    n_eqns = len(closed.jaxpr.eqns)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    try:
        lowered.compile()
        t_comp = time.perf_counter() - t0
        comp = f"{t_comp:8.1f}s"
    except Exception as e:  # noqa: BLE001
        comp = f"FAIL {type(e).__name__}"
    print(
        f"{name:22s} eqns={n_eqns:7d} trace={t_trace:6.1f}s "
        f"lower={t_lower:6.1f}s compile={comp}",
        flush=True,
    )
    return jax.eval_shape(fn, *args)


def main():
    mj = get_g1()
    m = put_model(mj, dtype=DTYPE, nconmax=35)
    bf = frozenset()
    P = Params(m, bf, E)
    nv, nu = m.nv, m.nu

    d0 = make_data(m, dtype=DTYPE)
    dB = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), d0
    )
    rng = np.random.default_rng(0)
    qpos = np.tile(np.asarray(m.qpos0, np.float64), (E, 1))
    qpos += 0.01 * rng.standard_normal(qpos.shape)
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    dB = dB.replace(
        qpos=jnp.asarray(qpos, DTYPE),
        qvel=jnp.asarray(0.1 * rng.standard_normal((E, nv)), DTYPE),
        ctrl=jnp.asarray(0.1 * rng.standard_normal((E, nu)), DTYPE),
    )

    q = _planes(dB.qpos)
    qvel = _planes(dB.qvel)
    ctrl = _planes(dB.ctrl)
    mocap_pos = _vec_list(dB.mocap_pos, m.nmocap, 3)
    mocap_quat = _vec_list(dB.mocap_quat, m.nmocap, 4)

    print(f"G1: nv={nv} nu={nu} nbody={m.nbody} ngeom={m.ngeom} "
          f"ncon={m.pairs.ncon} nefc={m.nefc} E={E}", flush=True)

    t0 = time.perf_counter()
    k = kinematics_lm(m, P, q, mocap_pos, mocap_quat)
    report("kinematics", lambda qq: kinematics_lm(m, P, qq, mocap_pos, mocap_quat), q)
    k = com_pos_lm(m, P, k)
    report("com_pos(+kin)", lambda qq: com_pos_lm(m, P, kinematics_lm(m, P, qq, mocap_pos, mocap_quat)), q)
    k = crb_lm(m, P, k)
    report("crb", lambda kk: crb_lm(m, P, kk)["qM"], dict(k))
    k = collision_lm(m, P, k, DTYPE)
    report("collision", lambda kk: collision_lm(m, P, kk, DTYPE)["con_dist"], dict(k))
    k = make_constraint_lm(m, P, k, q, qvel, DTYPE)
    report(
        "constraint",
        lambda kk: make_constraint_lm(m, P, kk, q, qvel, DTYPE)["efc_D"],
        dict(k),
    )
    k = com_vel_lm(m, P, k, qvel)
    report("com_vel", lambda vv: com_vel_lm(m, P, dict(k), vv)["cvel"], qvel)
    k = rne_lm(m, P, k, qvel)
    report("rne", lambda vv: rne_lm(m, P, dict(k), vv)["qfrc_bias"], qvel)
    k = passive_lm(m, P, k, q, qvel)
    report("passive", lambda vv: passive_lm(m, P, dict(k), q, vv)["qfrc_passive"], qvel)
    k = actuation_lm(m, P, k, q, qvel, ctrl)
    report("actuation", lambda cc: actuation_lm(m, P, dict(k), q, qvel, cc)["qfrc_actuator"], ctrl)

    k["qM_dense"] = _qM_dense(k["qM"], nv, E, DTYPE)
    report("qM_dense", lambda kk: _qM_dense(kk["qM"], nv, E, DTYPE), dict(k))
    qfs = jnp.stack(
        [jnp.broadcast_to(
            k["qfrc_passive"][i] - k["qfrc_bias"][i] + k["qfrc_actuator"][i],
            (E,),
        ) for i in range(nv)]
    )
    report("chol_smooth", lambda M, g: _chol_solve_envlast(M, g, nv), k["qM_dense"], qfs)
    a_smooth = _chol_solve_envlast(k["qM_dense"], qfs, nv)
    x_ws = dB.qacc_warmstart.T
    report(
        "solver",
        lambda kk, a, w: solve_lm(m, P, kk, a, w, DTYPE)["qacc"],
        dict(k), a_smooth, x_ws,
    )
    print(f"total wall {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
