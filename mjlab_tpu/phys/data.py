"""Data pytree: the complete dynamic state of one world.

Batched simulation = vmap over Data (and selectively over Model for domain
randomization). Mirrors the useful subset of mjData; every field is a fixed-
shape jnp array so the whole step compiles to one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.utils.struct import pytree
from mjlab_tpu.phys.model import Model


@pytree
class Contact:
    """Contact slots (static count; inactive slots masked by dist).

    All per-slot fields live in ONE packed (ncon, 26) array so the
    solver's top-K compaction is a single gather instead of seven (TPU
    gathers are expensive); the named accessors are zero-cost views.
    Column layout: [dist, includemargin, pos(3), friction(5), solref(2),
    solimp(5), frame(9 row-major)]."""

    packed: jax.Array  # (ncon, 26)

    @property
    def dist(self) -> jax.Array:
        return self.packed[..., 0]

    @property
    def includemargin(self) -> jax.Array:
        return self.packed[..., 1]

    @property
    def pos(self) -> jax.Array:
        return self.packed[..., 2:5]

    @property
    def friction(self) -> jax.Array:
        return self.packed[..., 5:10]

    @property
    def solref(self) -> jax.Array:
        return self.packed[..., 10:12]

    @property
    def solimp(self) -> jax.Array:
        return self.packed[..., 12:17]

    @property
    def frame(self) -> jax.Array:
        # rows: [normal, tangent1, tangent2]
        return self.packed[..., 17:26].reshape(*self.packed.shape[:-1], 3, 3)


@pytree
class Data:
    # ----- inputs / state -----
    time: jax.Array
    ncheck_reset: jax.Array  # () int32: mj_check* auto-reset count (this
    # world); nonzero means a diverged state was silently re-seeded —
    # benches/tests assert it stays 0
    qpos: jax.Array  # (nq,)
    qvel: jax.Array  # (nv,)
    ctrl: jax.Array  # (nu,)
    act: jax.Array  # (na,) actuator activation states
    act_dot: jax.Array  # (na,)
    qfrc_applied: jax.Array  # (nv,)
    xfrc_applied: jax.Array  # (nbody, 6) [torque? mujoco: (force(3), torque(3))]
    mocap_pos: jax.Array  # (nmocap, 3)
    mocap_quat: jax.Array  # (nmocap, 4)
    qacc_warmstart: jax.Array  # (nv,)

    # ----- position stage -----
    xpos: jax.Array  # (nbody, 3)
    xquat: jax.Array  # (nbody, 4)
    xmat: jax.Array  # (nbody, 3, 3)
    xipos: jax.Array  # (nbody, 3)
    ximat: jax.Array  # (nbody, 3, 3)
    xanchor: jax.Array  # (njnt, 3)
    xaxis: jax.Array  # (njnt, 3)
    geom_xpos: jax.Array  # (ngeom, 3)
    geom_xmat: jax.Array  # (ngeom, 3, 3)
    site_xpos: jax.Array  # (nsite, 3)
    site_xmat: jax.Array  # (nsite, 3, 3)
    subtree_com: jax.Array  # (nbody, 3)
    cinert: jax.Array  # (nbody, 6, 6) spatial inertia in c-frame
    cdof: jax.Array  # (nv, 6)
    qM: jax.Array  # (nv, nv) dense
    qLD: jax.Array  # (nv, nv) cholesky factor (lower)
    qLDinv: jax.Array  # (nv, nv) inverse of qLD (solves become matvecs)
    contact: Contact

    # ----- velocity stage -----
    cvel: jax.Array  # (nbody, 6)
    cdof_dot: jax.Array  # (nv, 6)
    qfrc_bias: jax.Array  # (nv,)
    qfrc_passive: jax.Array  # (nv,)

    # ----- tendons (fixed; lengths/velocities of the static coef rows) -----
    ten_length: jax.Array  # (ntendon,)
    ten_velocity: jax.Array  # (ntendon,)

    # ----- actuation -----
    actuator_length: jax.Array  # (nu,)
    actuator_velocity: jax.Array  # (nu,)
    actuator_moment: jax.Array  # (nu, nv)
    actuator_force: jax.Array  # (nu,)
    qfrc_actuator: jax.Array  # (nv,)

    # ----- acceleration / constraints -----
    qfrc_smooth: jax.Array  # (nv,)
    qacc_smooth: jax.Array  # (nv,)
    # Structured constraint Jacobian, by row class (row layout
    # [eq][dof friction][limits][contacts] as in constraint.py). The
    # friction block is implicitly the identity; the limit block is
    # one nonzero (the side sign) per row at a static dof address —
    # only the equality and contact blocks are materialized. This keeps
    # the solver's matvecs/Hessian on the dense contact block only.
    efc_Jeq: jax.Array  # (neq_jnt, nv)
    efc_lim_side: jax.Array  # (nlimit+nlimit_ten,) +-1 active side, 0 inactive
    efc_Jc: jax.Array  # (ncon_max * rows_per_con, nv)
    efc_D: jax.Array  # (nefc,)
    efc_aref: jax.Array  # (nefc,)
    efc_pos: jax.Array  # (nefc,)
    efc_margin: jax.Array  # (nefc,)
    efc_frictionloss: jax.Array  # (nefc,)
    efc_active: jax.Array  # (nefc,) bool: row participates this step
    efc_force: jax.Array  # (nefc,)
    qfrc_constraint: jax.Array  # (nv,)
    qacc: jax.Array  # (nv,)
    # full-slot contact summaries for sensors (cheap; the packed table may
    # be absent in the lane-major engine's slim Data)
    condist: jax.Array  # (ncon,) signed distance per slot
    con_found: jax.Array  # (ncon,) bool: dist < includemargin per slot —
    # the contact sensors' activity source (kept full-width even when the
    # hybrid step skips the big packed-table writeback)
    connormal: jax.Array  # (ncon, 3) contact normal per slot
    con_sel: jax.Array  # (ncon_max,) int32: compacted contact slot ids
    con_packed_c: jax.Array  # (ncon_max, 27): packed record + condim of
    # the selected slots (cached by make_constraint so the solver's force
    # decode needs no gathers)
    con_sel_active: jax.Array  # (ncon_max,) bool
    con_force_c: jax.Array  # (ncon_max, 3) world force per COMPACTED slot
    # (on geom2; expand to full slots with phys.solver.decode_con_force)
    con_torque_c: jax.Array  # (ncon_max, 3) world contact torque about the
    # contact point (nonzero only for condim>3: torsional/rolling friction)
    ncon_overflow: jax.Array  # () int32: cumulative count of found contacts
    # that did NOT fit in the ncon_max compacted slots (top-K overflow).
    # Nonzero means solver forces and sensor geometry silently dropped
    # contacts — raise SimulationCfg.nconmax (advisor r2: overflow must be
    # observable, not silent).


def make_data(m: Model, dtype=jnp.float32) -> Data:
    """Fresh Data at qpos0 (positions not yet propagated — call forward)."""
    ncon = m.pairs.ncon

    def z(*shape):
        return jnp.zeros(shape, dtype)

    eye_b = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.nbody, 3, 3))
    return Data(
        time=z(),
        ncheck_reset=jnp.zeros((), jnp.int32),
        qpos=jnp.asarray(m.qpos0, dtype),
        qvel=z(m.nv),
        ctrl=z(m.nu),
        act=z(m.na),
        act_dot=z(m.na),
        qfrc_applied=z(m.nv),
        xfrc_applied=z(m.nbody, 6),
        mocap_pos=z(m.nmocap, 3),
        mocap_quat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (m.nmocap, 1)),
        qacc_warmstart=z(m.nv),
        xpos=z(m.nbody, 3),
        xquat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (m.nbody, 1)),
        xmat=eye_b,
        xipos=z(m.nbody, 3),
        ximat=eye_b,
        xanchor=z(m.njnt, 3),
        xaxis=z(m.njnt, 3),
        geom_xpos=z(m.ngeom, 3),
        geom_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.ngeom, 3, 3)),
        site_xpos=z(m.nsite, 3),
        site_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.nsite, 3, 3)),
        subtree_com=z(m.nbody, 3),
        cinert=z(m.nbody, 6, 6),
        cdof=z(m.nv, 6),
        qM=z(m.nv, m.nv),
        qLD=z(m.nv, m.nv),
        qLDinv=z(m.nv, m.nv),
        contact=Contact(
            packed=jnp.tile(
                jnp.concatenate(
                    [
                        jnp.array([1e10, 0.0], dtype),  # dist, includemargin
                        jnp.zeros(3, dtype),  # pos
                        jnp.array([1.0, 1.0, 0.005, 1e-4, 1e-4], dtype),
                        jnp.array([0.02, 1.0], dtype),  # solref
                        jnp.array([0.9, 0.95, 0.001, 0.5, 2.0], dtype),
                        jnp.eye(3, dtype=dtype).reshape(9),  # frame
                    ]
                ),
                (ncon, 1),
            ),
        ),
        cvel=z(m.nbody, 6),
        cdof_dot=z(m.nv, 6),
        qfrc_bias=z(m.nv),
        qfrc_passive=z(m.nv),
        ten_length=z(m.ntendon),
        ten_velocity=z(m.ntendon),
        actuator_length=z(m.nu),
        actuator_velocity=z(m.nu),
        actuator_moment=z(m.nu, m.nv),
        actuator_force=z(m.nu),
        qfrc_actuator=z(m.nv),
        qfrc_smooth=z(m.nv),
        qacc_smooth=z(m.nv),
        efc_Jeq=z(m.neq_jnt, m.nv),
        efc_lim_side=z(m.nlimit + m.nlimit_ten),
        efc_Jc=z(m.ncon_max * m.rows_per_con, m.nv),
        efc_D=z(m.nefc),
        efc_aref=z(m.nefc),
        efc_pos=z(m.nefc),
        efc_margin=z(m.nefc),
        efc_frictionloss=z(m.nefc),
        efc_active=jnp.zeros((m.nefc,), bool),
        efc_force=z(m.nefc),
        qfrc_constraint=z(m.nv),
        qacc=z(m.nv),
        condist=jnp.full((ncon,), 1e10, dtype),
        con_found=jnp.zeros((ncon,), bool),
        connormal=jnp.tile(jnp.array([0.0, 0, 1.0], dtype), (ncon, 1)),
        con_sel=jnp.zeros((m.ncon_max,), jnp.int32),
        con_packed_c=z(m.ncon_max, 27),
        con_sel_active=jnp.zeros((m.ncon_max,), bool),
        con_force_c=z(m.ncon_max, 3),
        con_torque_c=z(m.ncon_max, 3),
        ncon_overflow=jnp.zeros((), jnp.int32),
    )


def put_data(m: Model, d_mj: mujoco.MjData, dtype=jnp.float32) -> Data:
    """Copy state (qpos/qvel/ctrl/applied/mocap/warmstart) from an mjData."""
    d = make_data(m, dtype)
    return d.replace(
        time=jnp.asarray(d_mj.time, dtype),
        ncheck_reset=jnp.zeros((), jnp.int32),
        qpos=jnp.asarray(np.array(d_mj.qpos), dtype),
        qvel=jnp.asarray(np.array(d_mj.qvel), dtype),
        ctrl=jnp.asarray(np.array(d_mj.ctrl), dtype),
        act=jnp.asarray(np.array(d_mj.act), dtype),
        qfrc_applied=jnp.asarray(np.array(d_mj.qfrc_applied), dtype),
        xfrc_applied=jnp.asarray(np.array(d_mj.xfrc_applied), dtype),
        mocap_pos=jnp.asarray(np.array(d_mj.mocap_pos).reshape(m.nmocap, 3), dtype),
        mocap_quat=jnp.asarray(np.array(d_mj.mocap_quat).reshape(m.nmocap, 4), dtype),
        qacc_warmstart=jnp.asarray(np.array(d_mj.qacc_warmstart), dtype),
    )
