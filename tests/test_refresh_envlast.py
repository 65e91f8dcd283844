"""Env-last kinematic refresh (phys/hybrid.refresh_envlast) parity.

The env calls a full-surface kinematic refresh once per control step
(reference calls full mjwarp forward after resets, reference
src/mjlab/envs/manager_based_rl_env.py:267-268,297-298). On the kernel
path the refresh reuses kin_com and expands the remaining fields —
frames, cinert, cvel, cdof_dot — in env-last XLA. These gates diff every
written field against the vmapped kinematics+com_pos+com_vel stages the
env uses everywhere else.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.phys.hybrid import refresh_envlast
from mjlab_tpu.phys.kinematics import com_pos, kinematics
from mjlab_tpu.phys.model import put_model
from mjlab_tpu.phys.smooth import com_vel
from mjlab_tpu.phys.smooth_pallas import smooth_pallas_supported
from mjlab_tpu.sim.sim import model_in_axes

E = 128

# free + ball + hinge + slide joints, a site, a multi-geom body and a
# mocap body: every cdof_dot accumulation case in smooth.com_vel
XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body name="base" pos="0 0 0.5">
      <freejoint/>
      <geom type="sphere" size="0.08" pos="0.02 0.01 0"/>
      <geom type="box" size="0.04 0.03 0.02" pos="-0.05 0 0.03"
            quat="0.97 0.1 0.2 0.05"/>
      <site name="imu" pos="0.01 0.02 0.03" quat="0.9 0.1 0.3 0.2"/>
      <body name="arm" pos="0.1 0 0">
        <joint name="shoulder" type="ball" damping="0.1"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.2 0 0"/>
        <body name="wrist" pos="0.2 0 0">
          <joint name="flex" type="hinge" axis="0 1 0" damping="0.05"/>
          <joint name="ext" type="slide" axis="1 0 0" damping="0.05"/>
          <geom type="sphere" size="0.03"/>
          <site name="tip" pos="0.03 0 0"/>
        </body>
      </body>
    </body>
    <body name="target" mocap="true" pos="0.5 0 0.4">
      <geom type="sphere" size="0.02" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""

FIELDS = (
    "xpos", "xquat", "xmat", "xipos", "ximat", "geom_xpos", "geom_xmat",
    "site_xpos", "site_xmat", "subtree_com", "cinert", "cdof", "cvel",
    "cdof_dot",
)


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(1.0, float(np.abs(a).max()))
    return float(np.abs(a - b).max()) / scale


def _state(m, mj, E, seed=0):
    from mjlab_tpu.phys.data import make_data

    rng = np.random.default_rng(seed)
    d0 = make_data(m, dtype=jnp.float32)
    dB = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), d0
    )
    qpos = np.tile(np.asarray(m.qpos0, np.float32), (E, 1))
    qpos += 0.05 * rng.standard_normal(qpos.shape).astype(np.float32)
    for j in range(mj.njnt):
        if mj.jnt_type[j] == 0:
            a = mj.jnt_qposadr[j] + 3
            qpos[:, a:a + 4] /= np.linalg.norm(
                qpos[:, a:a + 4], axis=1, keepdims=True
            )
        elif mj.jnt_type[j] == 1:
            a = mj.jnt_qposadr[j]
            qpos[:, a:a + 4] /= np.linalg.norm(
                qpos[:, a:a + 4], axis=1, keepdims=True
            )
    mq = rng.standard_normal((E, m.nmocap, 4)).astype(np.float32)
    mq /= np.linalg.norm(mq, axis=-1, keepdims=True)
    return dB.replace(
        qpos=jnp.asarray(qpos),
        qvel=jnp.asarray(0.5 * rng.standard_normal((E, m.nv)), jnp.float32),
        mocap_pos=jnp.asarray(
            rng.uniform(-1, 1, (E, m.nmocap, 3)), jnp.float32
        ),
        mocap_quat=jnp.asarray(mq),
    )


def _vmapped_refresh(m, d, bf=frozenset()):
    axes = model_in_axes(m, bf)

    def refresh(mm, dd):
        dd = kinematics(mm, dd)
        dd = com_pos(mm, dd)
        dd = com_vel(mm, dd)
        return dd

    return jax.jit(jax.vmap(refresh, in_axes=(axes, 0)))(m, d)


def _diff_fields(ref, out):
    for f in FIELDS:
        err = _rel_err(getattr(ref, f), getattr(out, f))
        assert err < 5e-6, f"{f}: rel err {err:.2e}"


@pytest.mark.slow
def test_refresh_envlast_matches_vmapped(monkeypatch):
    monkeypatch.setenv("MJLAB_TPU_SOLVER_INTERPRET", "1")
    mj = mujoco.MjModel.from_xml_string(XML)
    m = put_model(mj, dtype=jnp.float32, nconmax=8)
    assert m.nmocap == 1 and m.nsite == 2
    assert smooth_pallas_supported(m, frozenset(), E, jnp.float32)
    d = _state(m, mj, E)

    ref = _vmapped_refresh(m, d)
    out = jax.jit(lambda dd: refresh_envlast(m, frozenset(), dd))(d)
    _diff_fields(ref, out)


@pytest.mark.slow
def test_refresh_envlast_dr_batched_fields(monkeypatch):
    """DR-batched body_ipos (kernel-side planes) and body_mass /
    geom_pos (XLA-side _mfld expansion) per-env values land in the
    refreshed frames."""
    monkeypatch.setenv("MJLAB_TPU_SOLVER_INTERPRET", "1")
    mj = mujoco.MjModel.from_xml_string(XML)
    m = put_model(mj, dtype=jnp.float32, nconmax=8)
    rng = np.random.default_rng(7)

    bf = frozenset({"body_ipos", "body_mass", "geom_pos"})
    ipos = np.tile(np.asarray(m.body_ipos, np.float32), (E, 1, 1))
    ipos += 0.02 * rng.standard_normal(ipos.shape).astype(np.float32)
    mass = np.tile(np.asarray(m.body_mass, np.float32), (E, 1))
    mass *= rng.uniform(0.8, 1.2, mass.shape).astype(np.float32)
    gpos = np.tile(np.asarray(m.geom_pos, np.float32), (E, 1, 1))
    gpos += 0.01 * rng.standard_normal(gpos.shape).astype(np.float32)
    mB = m.replace(
        body_ipos=jnp.asarray(ipos), body_mass=jnp.asarray(mass),
        geom_pos=jnp.asarray(gpos),
    )
    assert smooth_pallas_supported(mB, bf, E, jnp.float32)
    d = _state(m, mj, E, seed=1)

    ref = _vmapped_refresh(mB, d, bf)
    out = jax.jit(lambda dd: refresh_envlast(mB, bf, dd))(d)
    _diff_fields(ref, out)
