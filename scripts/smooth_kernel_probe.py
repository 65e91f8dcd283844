"""Compile+runtime probe for the env-last smooth Pallas kernels on the
real backend, one kernel at a time (isolates Mosaic compile cost)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.utils.device import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import mjlab_tpu.tasks as tasks
from mjlab_tpu.scene.scene import Scene
from mjlab_tpu.phys.model import put_model
from mjlab_tpu.phys import smooth_pallas as sp

E = int(os.environ.get("PROBE_E", 4096))
WHICH = os.environ.get("PROBE_KERNEL", "kin")


def fetch(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:2]))


def main():
    print("backend:", jax.default_backend(), "E:", E, "kernel:", WHICH,
          flush=True)
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = 1
    scene = Scene(cfg.scene)
    mj = scene.compile()
    cfg.sim.mujoco.apply(mj)
    m = put_model(mj, dtype=jnp.float32, nconmax=35)

    rng = np.random.default_rng(0)
    qT = jnp.asarray(
        np.tile(np.asarray(m.host_consts["qpos0"], np.float32)[:, None], (1, E))
        + 0.02 * rng.standard_normal((m.nq, E)).astype(np.float32)
    )
    vT = jnp.asarray(0.1 * rng.standard_normal((m.nv, E)), jnp.float32)
    ctrlT = jnp.asarray(0.1 * rng.standard_normal((m.nu, E)), jnp.float32)

    t0 = time.perf_counter()
    kin = jax.jit(lambda q: sp.kin_com(m, q))
    out = kin(qT)
    fetch(out)
    print(f"kin_com compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        out = kin(qT)
        fetch(out)
    print(f"kin_com 3x run: {(time.perf_counter() - t0) / 3 * 1e3:.2f} ms",
          flush=True)
    gxpos, gxmat, subcom, cdof, cinA, cinc, xipos, _, _ = out

    if WHICH in ("all", "crb"):
        t0 = time.perf_counter()
        crb = jax.jit(lambda a, b, c: sp.crb_packed(m, a, b, c))
        qm = crb(cdof, cinA, cinc)
        fetch(qm)
        print(f"crb compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            qm = crb(cdof, cinA, cinc)
            fetch(qm)
        print(f"crb 3x run: {(time.perf_counter() - t0) / 3 * 1e3:.2f} ms",
              flush=True)

    if WHICH in ("all", "vel"):
        xfrcT = jnp.zeros((m.nbody, 6, E), jnp.float32)
        qfaT = jnp.zeros((m.nv, E), jnp.float32)
        t0 = time.perf_counter()
        vel = jax.jit(
            lambda q, v, c, cd, a, ci, sc, xp: sp.vel_smooth(
                m, q, v, c, cd, a, ci, (sc, xp, xfrcT, qfaT)
            )
        )
        vout = vel(qT, vT, ctrlT, cdof, cinA, cinc, subcom, xipos)
        fetch(vout)
        print(f"vel_smooth compile+run: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            vout = vel(qT, vT, ctrlT, cdof, cinA, cinc, subcom, xipos)
            fetch(vout)
        print(f"vel_smooth 3x run: {(time.perf_counter() - t0) / 3 * 1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
