"""SimulationCfg piping into the compiled model and the phys Model
(reference tests/test_sim.py:20-60)."""

import mujoco
import numpy as np
import pytest

from mjlab_tpu.sim.sim import MujocoCfg, Simulation, SimulationCfg

_XML = """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="b" pos="0 0 0.3">
      <freejoint name="f"/>
      <geom name="ball" type="sphere" size="0.1" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def _model():
    return mujoco.MjModel.from_xml_string(_XML)


def test_mujoco_cfg_applied_to_model():
    cfg = SimulationCfg(
        mujoco=MujocoCfg(
            timestep=0.002,
            iterations=7,
            ls_iterations=11,
            impratio=3.0,
            gravity=(0.0, 0.0, -5.0),
        )
    )
    sim = Simulation(2, cfg, _model())
    assert sim.mj_model.opt.timestep == pytest.approx(0.002)
    assert sim.mj_model.opt.iterations == 7
    assert sim.mj_model.opt.ls_iterations == 11
    assert sim.mj_model.opt.impratio == pytest.approx(3.0)
    np.testing.assert_allclose(sim.mj_model.opt.gravity, [0, 0, -5.0])
    # and into the device-side model
    assert float(sim.model.opt.timestep) == pytest.approx(0.002)
    assert sim.model.opt.iterations == 7
    np.testing.assert_allclose(np.asarray(sim.model.opt.gravity), [0, 0, -5.0])


def test_nconmax_controls_compaction():
    cfg = SimulationCfg(nconmax=3)
    sim = Simulation(2, cfg, _model())
    assert sim.model.ncon_max <= 3


def test_data_batched_over_envs():
    sim = Simulation(4, SimulationCfg(), _model())
    assert sim.data.qpos.shape[0] == 4
    assert sim.data.qvel.shape == (4, sim.model.nv)
