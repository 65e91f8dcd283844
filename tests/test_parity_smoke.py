"""FAST-LANE engine parity smoke (round-5, VERDICT #7): a sub-minute f64
single-step + 20-step strict trajectory gate vs ground-truth CPU MuJoCo
on the toy model, so engine regressions fail `pytest -m "not slow"`
per-commit instead of only in the hour-long slow lane.

Mirrors tests/test_full_robot_parity.py's STRICT_STEPS gate (same
tolerances) on the small free+hinge+contact model."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjlab_tpu.phys.forward as fwd
from mjlab_tpu.phys.data import put_data
from mjlab_tpu.phys.model import put_model

from test_hybrid_parity import TOY_XML

STRICT_STEPS = 20
STRICT_TOL = 1e-6


def test_toy_strict_parity_smoke():
    mj = mujoco.MjModel.from_xml_string(TOY_XML)
    with jax.enable_x64(True):
        m = put_model(mj, dtype=jnp.float64)
        dmj = mujoco.MjData(mj)
        mujoco.mj_resetData(mj, dmj)
        mujoco.mj_forward(mj, dmj)
        d = put_data(m, dmj, dtype=jnp.float64)
        step_j = jax.jit(fwd.step)

        rng = np.random.default_rng(0)
        errs = []
        for _ in range(STRICT_STEPS):
            ctrl = 0.3 * rng.standard_normal(mj.nu)
            dmj.ctrl[:] = ctrl
            d = d.replace(ctrl=jnp.asarray(ctrl, jnp.float64))
            mujoco.mj_step(mj, dmj)
            d = step_j(m, d)
            errs.append(
                float(np.max(np.abs(np.asarray(d.qpos) - dmj.qpos)))
            )
        assert max(errs) < STRICT_TOL, f"qpos drift {max(errs):.3e}"
