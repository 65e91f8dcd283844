"""Quick lane-major engine parity check vs the vmapped engine (CPU).

Usage: python scripts/check_lm.py [toy|g1]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.phys.model import put_model
from mjlab_tpu.phys.data import make_data
import mjlab_tpu.phys.forward as fwd
from mjlab_tpu.phys.lm import step_lm

TOY_XML = """
<mujoco>
  <option timestep="0.002" integrator="implicitfast" iterations="8" ls_iterations="12"/>
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
          <geom type="box" size="0.05 0.03 0.02"/>
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

DTYPE = jnp.float64 if os.environ.get("CHECK_F32") != "1" else jnp.float32


def get_model(which):
    if which == "g1":
        import mjlab_tpu.tasks as tasks
        from mjlab_tpu.scene.scene import Scene

        cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
        cfg.scene.num_envs = 1
        scene = Scene(cfg.scene)
        mj = scene.compile()
        cfg.sim.mujoco.apply(mj)
        return mj
    return mujoco.MjModel.from_xml_string(TOY_XML)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "toy"
    mj = get_model(which)
    m = put_model(mj, dtype=DTYPE, nconmax=35)
    E = 4
    rng = np.random.default_rng(0)

    d0 = make_data(m, dtype=DTYPE)
    dB = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), d0
    )
    qpos = np.tile(np.asarray(m.qpos0, np.float64), (E, 1))
    qpos += 0.03 * rng.standard_normal(qpos.shape)
    # normalize free-joint quats
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:
            a = mj.jnt_qposadr[j] + 3
            qpos[:, a : a + 4] /= np.linalg.norm(
                qpos[:, a : a + 4], axis=1, keepdims=True
            )
    qvel = 0.3 * rng.standard_normal((E, m.nv))
    ctrl = 0.2 * rng.standard_normal((E, m.nu))
    dB = dB.replace(
        qpos=jnp.asarray(qpos, DTYPE),
        qvel=jnp.asarray(qvel, DTYPE),
        ctrl=jnp.asarray(ctrl, DTYPE),
    )

    maxes = None  # no DR
    from mjlab_tpu.sim.sim import model_in_axes

    axes = model_in_axes(m, frozenset())
    step_v = jax.jit(jax.vmap(fwd.step, in_axes=(axes, 0)))
    # the lm engine treats shared model fields as host-static: close over m
    step_l = jax.jit(lambda dd: step_lm(m, frozenset(), dd))

    da = dB
    db = dB
    for it in range(10):
        da = step_v(m, da)
        db = step_l(db)

    fields = [
        "qpos", "qvel", "qacc", "xpos", "xquat", "geom_xpos", "subtree_com",
        "cvel", "qfrc_bias", "qfrc_passive", "qfrc_actuator", "qfrc_smooth",
        "qacc_smooth", "qfrc_constraint", "qacc_warmstart", "cinert",
        "actuator_force", "condist", "connormal", "con_force_c",
    ]
    tol = 1e-7 if DTYPE == jnp.float64 else 2e-3
    worst = 0.0
    for f in fields:
        a = np.asarray(getattr(da, f))
        b = np.asarray(getattr(db, f))
        if a.size == 0:
            continue
        scale = np.maximum(1.0, np.abs(a).max())
        err = np.abs(a - b).max() / scale
        worst = max(worst, err)
        flag = "OK " if err < tol else "FAIL"
        print(f"{flag} {f:18s} max rel err {err:.3e}")
    print("worst:", worst)
    sys.exit(0 if worst < tol else 1)


if __name__ == "__main__":
    main()
