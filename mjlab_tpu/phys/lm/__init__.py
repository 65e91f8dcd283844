"""Lane-major (env-last) batched physics engine.

The vmapped single-world engine (phys/forward.py) is semantically exact but
lets vmap choose array layouts: every intermediate gets the env axis MAJOR,
so small trailing feature dims (3, 4, 35, 140) land on the TPU lane/sublane
axes and pad up to the (8, 128) tile — measured 2-4x physical HBM traffic
on the hot arrays and thousands of tiny padded fusions (PERF_NOTES.md).

This engine is written directly batched with the OPPOSITE convention:
component axes lead, the env axis is always LAST (minor) — every
elementwise op vectorizes across envs on the 128-lane axis at full
utilization, and feature dims pad at most to the 8-sublane tile. The
design mirrors how one would write a CUDA kernel per env; here the "thread
index" is the lane.

Semantics match phys/forward.py (same formulas, same row layout, same
solver); parity is enforced by tests/test_lm_parity.py against both the
vmapped engine and CPU MuJoCo.
"""

from mjlab_tpu.phys.lm.step import step_lm, forward_lm  # noqa: F401
