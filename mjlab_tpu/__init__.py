"""mjlab_tpu: TPU-native vectorized robotics RL framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of mjlab
(reference: geopti/mjlab-1): batched MuJoCo-semantics rigid-body physics,
Isaac-Lab-style manager-based RL environments, an in-repo PPO learner, and
multi-host environment sharding over TPU device meshes.

Layering (cf. reference SURVEY.md §1):
  phys      - batched physics engine (the mujoco_warp replacement)
  sim       - Simulation wrapper: jitted step/forward/reset(mask)
  entity    - Entity/EntityData (articulated robots and objects)
  scene     - MjSpec composition + Scene runtime fan-out
  actuator  - builtin / ideal-PD / DC-motor / delayed / learned actuators
  sensor    - builtin + contact sensors
  managers  - action/observation/reward/termination/event/command/curriculum
  envs      - ManagerBasedRlEnv + mdp term libraries
  rl        - PPO learner, configs, export
  tasks     - task zoo (velocity, tracking, jump, manipulation) + registry
  parallel  - device-mesh / sharding utilities
  utils     - buffers, noise, math, string resolution, spec editors
"""

from importlib import metadata as _metadata

__version__ = "0.1.0"


def _import_registered_packages() -> None:
    """Import third-party task packages registered under 'mjlab_tpu.tasks'.

    Plugin discovery mirroring the reference package-init side effect
    (reference src/mjlab/__init__.py:20-36).
    """
    try:
        eps = _metadata.entry_points(group="mjlab_tpu.tasks")
    except Exception:
        return
    for ep in eps:
        try:
            ep.load()
        except Exception as exc:  # pragma: no cover
            import warnings

            warnings.warn(f"Failed to load task plugin {ep.name}: {exc}")


_import_registered_packages()
