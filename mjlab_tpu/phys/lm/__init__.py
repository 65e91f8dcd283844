"""Lane-major (env-last) batched physics stages consumed by the hybrid engine.

The vmapped single-world engine (phys/forward.py) is semantically exact but
lets vmap choose array layouts: every intermediate gets the env axis MAJOR,
so small trailing feature dims (3, 4, 35, 140) land on the TPU lane/sublane
axes and pad up to the (8, 128) tile — measured 2-4x physical HBM traffic
on the hot arrays and thousands of tiny padded fusions (PERF_NOTES.md).

These modules implement the contact/constraint stack with the OPPOSITE
convention: component axes lead, the env axis is always LAST (minor) —
every elementwise op vectorizes across envs on the 128-lane axis at full
utilization. phys/hybrid.py composes them with the vmapped smooth stages
(a full lane-major step was built, measured, and deleted: its scalar-plane
kinematics/RNE/Cholesky stages blew XLA compile past 50 min at robot scale
— see PERF_NOTES.md round 2 — while the contact stack kept all the win).

Modules: base (layout helpers), collision (narrowphase + top-K compaction),
constraint (row assembly), solver (env-last Newton). Parity is enforced by
tests/test_hybrid_parity.py against the vmapped engine.
"""
