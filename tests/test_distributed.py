"""Multi-PROCESS distributed training path (2x CPU processes via
jax.distributed): closes SURVEY §4.6's "reference has no distributed
tests" gap with a real multi-host-shaped test (the 8-virtual-device mesh
tests in test_parallel.py are single-process only).

Exercises: jax.distributed.initialize, global 'data' mesh over both
processes' devices, the real OnPolicyRunner.learn sharded iteration,
process-0-only checkpoint I/O, and per-env RNG stream uniqueness.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    port = _free_port()
    nproc = 2
    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    for pid in range(nproc):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(ROOT, "tests", "distributed_worker.py"),
                    str(pid), str(nproc), str(port), str(tmp_path),
                ],
                cwd=ROOT,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    results = {}
    for pid in range(nproc):
        with open(tmp_path / f"result_{pid}.txt") as f:
            digest, unique, pidx = f.read().split()
        results[pid] = (float(digest), int(unique), int(pidx))

    # learner replicas identical across processes
    assert abs(results[0][0] - results[1][0]) < 1e-6, results
    # every env has a distinct RNG stream across the GLOBAL batch
    assert results[0][1] == 16
    assert results[0][2] == 0 and results[1][2] == 1

    # process-0-only checkpoint I/O: runner.save gates on process_index
    ckpts_p0 = list((tmp_path / "logs").glob("model_*.ckpt"))
    ckpts_p1 = (
        list((tmp_path / "logs_p1").glob("model_*.ckpt"))
        if (tmp_path / "logs_p1").exists()
        else []
    )
    assert ckpts_p0, "process 0 wrote no checkpoint"
    assert not ckpts_p1, "process 1 must not write checkpoints"
