"""Compile the full physics step, dump optimized HLO, and print the
definition + JAX source metadata of named fusions (from the latest trace)."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.phys import forward as fwd

E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
NAMES = sys.argv[1:] or [
    "fusion.4667", "fusion.4717", "slice_reduce_fusion.104",
    "fusion.4659", "fusion.4428", "broadcast_in_dim.9377",
    "fusion.4462", "fusion.4453", "fusion.4429", "fusion.4424",
    "multiply_reduce_fusion.246", "multiply_multiply_fusion.21",
]


def main():
    cfg = tasks.load_env_cfg("Mjlab-Velocity-Flat-Unitree-G1")
    cfg.scene.num_envs = E
    env = ManagerBasedRlEnv(cfg)
    m = env.sim.model
    maxes = env.sim.model_axes

    @jax.jit
    def run(d):
        def body(d, _):
            return jax.vmap(fwd.step, in_axes=(maxes, 0))(m, d), None

        d, _ = jax.lax.scan(body, d, None, length=5)
        return d

    txt = run.lower(env._state.data).compile().as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO dumped to /tmp/step_hlo.txt,", len(txt.splitlines()), "lines")
    for name in NAMES:
        # find the instruction line defining this op
        pat = re.compile(rf"%?{re.escape(name)} = .*")
        for ln in txt.splitlines():
            s = ln.strip()
            if s.startswith(f"%{name} = ") or s.startswith(f"{name} = "):
                print("=" * 100)
                print(s[:600])
                break


if __name__ == "__main__":
    main()
