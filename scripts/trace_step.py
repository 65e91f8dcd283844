"""Capture a profiler trace of the fused full physics step and print the
top ops by self time (parses the xplane protobuf via the trace-json)."""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.phys import forward as fwd

E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
TRACE_DIR = "/tmp/jaxtrace"


def main():
    cfg = tasks.load_env_cfg(os.environ.get("TRACE_TASK", "Mjlab-Velocity-Flat-Unitree-G1"))
    cfg.scene.num_envs = E
    env = ManagerBasedRlEnv(cfg)
    env.reset()
    state = env._state
    m = env.sim.model
    maxes = env.sim.model_axes

    import jax.numpy as jnp

    mode = os.environ.get("TRACE_MODE", "phys")
    if mode == "phys":
        # engine-selected step (vmap or hybrid, same as bench.py)
        step_phys = env.sim.step_fn()

        @jax.jit
        def run(d):
            def body(d, _):
                return step_phys(m, d), None

            d, _ = jax.lax.scan(body, d, None, length=5)
            return d

        arg = state.data
        get = lambda out: out.qpos
    else:
        A = env.action_manager.total_action_dim
        action = jnp.zeros((E, A), jnp.float32)

        @jax.jit
        def run(s):
            def body(s, _):
                s2, *_ = env._traced_step(s, action)
                return s2, None

            s, _ = jax.lax.scan(body, s, None, length=3)
            return s

        arg = state
        get = lambda out: out.data.qpos

    d = run(arg)
    jax.block_until_ready(get(d))

    os.system(f"rm -rf {TRACE_DIR}")
    jax.profiler.start_trace(TRACE_DIR)
    d = run(arg)
    jax.block_until_ready(get(d))
    jax.profiler.stop_trace()

    # find trace json
    files = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = [
        e
        for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("dur", 0) > 0
    ]
    # keep only TPU device lane events (pid heuristics: names w/ fusion etc.)
    agg = {}
    for e in events:
        name = e["name"]
        agg.setdefault(name, [0, 0])
        agg[name][0] += e["dur"]
        agg[name][1] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]
    total = sum(v[0] for v in agg.values())
    print(f"total traced us: {total}")
    for name, (dur, cnt) in top:
        print(f"{dur/1e3:9.2f} ms  x{cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
