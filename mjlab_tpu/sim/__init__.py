from mjlab_tpu.sim.sim import MujocoCfg, Simulation, SimulationCfg  # noqa: F401
