"""Worker for tests/test_distributed.py: one process of a 2-process
jax.distributed CPU cluster running the REAL training path (mini env +
OnPolicyRunner) over a global 'data' mesh.

Run (per process):
  python tests/distributed_worker.py <process_id> <num_processes> <port> <outdir>
"""

import os
import sys

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax

# sitecustomize imports jax before this script runs, so the env var above
# can be too late — force the platform through the config as well
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 4)
except AttributeError:
    pass  # older jax: the XLA_FLAGS path handles it

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

from tests.mini_env import make_pendulum_env
from mjlab_tpu.rl.config import (
    RslRlOnPolicyRunnerCfg, RslRlPpoActorCriticCfg, RslRlPpoAlgorithmCfg,
)
from mjlab_tpu.rl.runner import OnPolicyRunner
from mjlab_tpu.rl.vecenv_wrapper import RslRlVecEnvWrapper

NUM_ENVS = 16  # divisible by the 8 global devices

env = make_pendulum_env(num_envs=NUM_ENVS)
agent = RslRlOnPolicyRunnerCfg(
    seed=0,
    num_steps_per_env=4,
    max_iterations=2,
    save_interval=1000,
    experiment_name="dist_test",
    logger="stdout",
    policy=RslRlPpoActorCriticCfg(actor_hidden_dims=(16,), critic_hidden_dims=(16,)),
    algorithm=RslRlPpoAlgorithmCfg(num_learning_epochs=1, num_mini_batches=1),
)
log_dir = os.path.join(outdir, "logs") if pid == 0 else os.path.join(
    outdir, f"logs_p{pid}"
)
runner = OnPolicyRunner(RslRlVecEnvWrapper(env), agent, log_dir=log_dir)
runner.learn(2)

# every process must end with identical (replicated) learner params
leaves = jax.tree_util.tree_leaves(jax.device_get(runner.ppo_state.params))
digest = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))

# per-env RNG streams must be distinct across the global batch: fold the
# state rng per env the way managers do and check uniqueness
keys = jax.vmap(lambda i: jax.random.fold_in(runner.ppo_state.rng, i))(
    np.arange(NUM_ENVS)
)
keys = np.asarray(jax.device_get(keys))
unique = len({tuple(k) for k in keys})

with open(os.path.join(outdir, f"result_{pid}.txt"), "w") as f:
    f.write(f"{digest:.10e} {unique} {jax.process_index()}\n")
print(f"[worker {pid}] done digest={digest:.6e} unique_keys={unique}")
