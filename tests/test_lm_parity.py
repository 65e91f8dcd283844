"""Lane-major engine parity vs the vmapped engine and CPU MuJoCo.

The lm engine (mjlab_tpu/phys/lm/) re-derives the whole substep with the
env axis minor (TPU lane axis). Semantics must match phys/forward.step
bit-for-bit at f64 tolerances; this gate mirrors scripts/check_lm.py toy
mode. Reference anchor: mujoco_warp keeps one engine; we keep two layouts
of one engine, so equivalence is load-bearing.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest


@pytest.fixture
def x64():
    with jax.enable_x64(True):
        yield

import mjlab_tpu.phys.forward as fwd
from mjlab_tpu.phys.data import make_data
from mjlab_tpu.phys.lm import forward_lm, step_lm
from mjlab_tpu.phys.model import put_model
from mjlab_tpu.sim.sim import model_in_axes

TOY_XML = """
<mujoco>
  <option timestep="0.002" integrator="implicitfast" iterations="8"
          ls_iterations="12"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body name="base" pos="0 0 0.30">
      <freejoint/>
      <geom type="sphere" size="0.1" pos="0.02 0.01 0.0"/>
      <body name="leg" pos="0.1 0 0">
        <joint name="hip" type="hinge" axis="0 1 0" pos="0 0 0.05"
               range="-1 1" damping="0.1" armature="0.01"
               frictionloss="0.2"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0 0 -0.3"/>
        <body name="foot" pos="0 0 -0.3">
          <joint name="knee" type="hinge" axis="0 1 0" range="-2 0.5"
                 damping="0.05"/>
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

FIELDS = [
    "qpos", "qvel", "qacc", "xpos", "xquat", "geom_xpos", "subtree_com",
    "cvel", "qfrc_bias", "qfrc_passive", "qfrc_actuator", "qfrc_smooth",
    "qacc_smooth", "qfrc_constraint", "qacc_warmstart", "cinert",
    "actuator_force", "condist", "connormal", "con_force_c",
]


def _batched_state(m, mj, E, seed=0):
    rng = np.random.default_rng(seed)
    d0 = make_data(m, dtype=jnp.float64)
    dB = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), d0
    )
    qpos = np.tile(np.asarray(m.qpos0, np.float64), (E, 1))
    qpos += 0.03 * rng.standard_normal(qpos.shape)
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:  # free: renormalize the quaternion
            a = mj.jnt_qposadr[j] + 3
            qpos[:, a : a + 4] /= np.linalg.norm(
                qpos[:, a : a + 4], axis=1, keepdims=True
            )
    return dB.replace(
        qpos=jnp.asarray(qpos, jnp.float64),
        qvel=jnp.asarray(0.3 * rng.standard_normal((E, m.nv)), jnp.float64),
        ctrl=jnp.asarray(0.2 * rng.standard_normal((E, m.nu)), jnp.float64),
    )


@pytest.mark.slow
def test_lm_matches_vmapped_engine_toy(x64):
    mj = mujoco.MjModel.from_xml_string(TOY_XML)
    m = put_model(mj, dtype=jnp.float64, nconmax=12)
    E = 4
    dB = _batched_state(m, mj, E)

    axes = model_in_axes(m, frozenset())
    step_v = jax.jit(jax.vmap(fwd.step, in_axes=(axes, 0)))
    step_l = jax.jit(lambda dd: step_lm(m, frozenset(), dd))

    da, db = dB, dB
    for _ in range(10):
        da = step_v(m, da)
        db = step_l(db)

    worst = 0.0
    for f in FIELDS:
        a, b = np.asarray(getattr(da, f)), np.asarray(getattr(db, f))
        if a.size == 0:
            continue
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(a - b).max()) / scale
        worst = max(worst, err)
        assert err < 1e-9, f"{f}: max rel err {err:.3e}"
    assert worst < 1e-9


@pytest.mark.slow
def test_lm_forward_matches_vmapped_forward_toy(x64):
    mj = mujoco.MjModel.from_xml_string(TOY_XML)
    m = put_model(mj, dtype=jnp.float64, nconmax=12)
    E = 4
    dB = _batched_state(m, mj, E, seed=3)

    axes = model_in_axes(m, frozenset())
    fwd_v = jax.jit(jax.vmap(fwd.forward, in_axes=(axes, 0)))
    fwd_l = jax.jit(lambda dd: forward_lm(m, frozenset(), dd))

    da = fwd_v(m, dB)
    db = fwd_l(dB)
    for f in ("qacc", "qfrc_constraint", "qacc_smooth", "condist"):
        a, b = np.asarray(getattr(da, f)), np.asarray(getattr(db, f))
        if a.size == 0:
            continue
        scale = max(1.0, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) / scale < 1e-9, f
