"""Model pytree and host-side conversion from mujoco.MjModel.

The host keeps MuJoCo's MjSpec/MjModel pipeline as the model *compiler*
(reference SURVEY.md §7.0); ``put_model`` converts the compiled MjModel into
a JAX pytree. Structural tables (tree topology, joint types, constraint
layout, contact pair table) are static numpy aux data — available for
Python-level indexing at trace time and hashed into the jit cache key.
Physical parameters (masses, gains, friction, ...) are traced jnp arrays so
domain randomization can give any of them a leading env axis without
recompilation (vmap with a Model-pytree of in_axes).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.utils.struct import Static, pytree

# mjtDisableBit subset we honor.
DSBL_EULERDAMP = mujoco.mjtDisableBit.mjDSBL_EULERDAMP.value
DSBL_GRAVITY = mujoco.mjtDisableBit.mjDSBL_GRAVITY.value
DSBL_CONTACT = mujoco.mjtDisableBit.mjDSBL_CONTACT.value
DSBL_LIMIT = mujoco.mjtDisableBit.mjDSBL_LIMIT.value
DSBL_FRICTIONLOSS = mujoco.mjtDisableBit.mjDSBL_FRICTIONLOSS.value

# Joint types (match mujoco.mjtJoint)
JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE = 0, 1, 2, 3

# Integrators
INT_EULER, INT_RK4, INT_IMPLICIT, INT_IMPLICITFAST = 0, 1, 2, 3

# Cones
CONE_PYRAMIDAL, CONE_ELLIPTIC = 0, 1

# Actuator activation dynamics (match mujoco.mjtDyn)
DYN_NONE, DYN_INTEGRATOR, DYN_FILTER, DYN_FILTEREXACT = 0, 1, 2, 3

# efc row types (our layout, not mujoco's enum)
EFC_FRICTION_DOF = 0
EFC_LIMIT_JOINT = 1
EFC_CONTACT = 2
EFC_EQUALITY = 3
EFC_LIMIT_TENDON = 4

# Transmission types (match mujoco.mjtTrn)
TRN_JOINT, TRN_JOINTINPARENT, TRN_SLIDERCRANK, TRN_TENDON, TRN_SITE = 0, 1, 2, 3, 4

# model fields snapshotted into Model.host_consts for the Pallas smooth
# kernels (phys/smooth_pallas.py); any of these being DR-batched disables
# that fast path
SMOOTH_HOST_FIELDS = (
    "qpos0", "body_pos", "body_quat", "jnt_pos", "jnt_axis",
    "body_ipos", "body_iquat", "geom_pos", "geom_quat",
    "body_mass", "body_inertia", "dof_armature", "dof_damping",
    "jnt_stiffness", "qpos_spring",
    "actuator_gear", "actuator_ctrlrange", "actuator_gainprm",
    "actuator_biasprm", "actuator_forcerange",
)


@pytree
class Option:
    """Physics options. Mirrors mjModel.opt for the supported feature set."""

    timestep: jax.Array
    gravity: jax.Array  # (3,)
    magnetic: jax.Array  # (3,) global magnetic flux (magnetometer sensors)
    impratio: jax.Array

    # static solver configuration
    integrator: Static[int]
    cone: Static[int]
    iterations: Static[int]
    ls_iterations: Static[int]
    tolerance: Static[float]
    ls_tolerance: Static[float]
    disableflags: Static[int]


@pytree
class PairTable:
    """Static candidate contact-pair table (host-precomputed broadphase).

    Pairs are grouped by (type1, type2) narrowphase function; each pair
    owns a fixed number of contact slots. ``ncon`` is the static total.
    All fields are numpy aux data.
    """

    geom1: Static[np.ndarray]  # (npair,) geom ids
    geom2: Static[np.ndarray]
    pair_condim: Static[np.ndarray]  # (npair,)
    pair_ncon: Static[np.ndarray]  # (npair,) contact slots for this pair
    pair_conadr: Static[np.ndarray]  # (npair,) first contact slot index
    # explicit <pair> overrides (zeros + mask False on dynamic pairs);
    # compile-time constants matching MuJoCo (geom DR never affects them)
    ex_mask: Static[np.ndarray]  # (npair,) bool
    ex_friction5: Static[np.ndarray]  # (npair, 5)
    ex_solref: Static[np.ndarray]  # (npair, 2)
    ex_solimp: Static[np.ndarray]  # (npair, 5)
    ex_margin: Static[np.ndarray]  # (npair,)
    ex_gap: Static[np.ndarray]  # (npair,)
    ncon: Static[int]  # total contact slots
    # per contact slot (length ncon):
    con_pairid: Static[np.ndarray]
    con_geom1: Static[np.ndarray]
    con_geom2: Static[np.ndarray]
    con_dim: Static[np.ndarray]  # condim per slot
    con_efcadr: Static[np.ndarray]  # first efc row of this contact


@pytree
class Model:
    """Physics model. A single-world description; fields listed under
    'traced' may carry a leading env axis for domain randomization."""

    # ----- static structural data (numpy aux) -----
    nq: Static[int]
    nv: Static[int]
    nu: Static[int]
    nbody: Static[int]
    njnt: Static[int]
    ngeom: Static[int]
    nsite: Static[int]
    nmocap: Static[int]

    body_parentid: Static[np.ndarray]
    body_rootid: Static[np.ndarray]
    body_jntadr: Static[np.ndarray]
    body_jntnum: Static[np.ndarray]
    body_dofadr: Static[np.ndarray]
    body_dofnum: Static[np.ndarray]
    body_mocapid: Static[np.ndarray]

    jnt_type: Static[np.ndarray]
    jnt_qposadr: Static[np.ndarray]
    jnt_dofadr: Static[np.ndarray]
    jnt_bodyid: Static[np.ndarray]
    jnt_limited: Static[np.ndarray]

    dof_bodyid: Static[np.ndarray]
    dof_jntid: Static[np.ndarray]

    geom_bodyid: Static[np.ndarray]
    geom_type: Static[np.ndarray]
    geom_condim: Static[np.ndarray]
    geom_priority: Static[np.ndarray]
    geom_dataid: Static[np.ndarray]

    # heightfield terrain (at most one hfield; see terrains/)
    nhfield: Static[int]
    hfield_nrow: Static[int]
    hfield_ncol: Static[int]

    # convex mesh hulls for the mesh narrowphase: vertices of each mesh's
    # qhull graph when present (else all verts), padded to the model-wide
    # max. Static numpy — per-vertex DR has no reference analog.
    nmesh: Static[int]
    mesh_hull_vert: Static[np.ndarray]  # (nmesh, Vmax, 3)
    mesh_hull_mask: Static[np.ndarray]  # (nmesh, Vmax) bool

    site_bodyid: Static[np.ndarray]

    actuator_trntype: Static[np.ndarray]
    actuator_gaintype: Static[np.ndarray]
    actuator_biastype: Static[np.ndarray]
    actuator_trnid: Static[np.ndarray]  # (nu, 2)
    actuator_ctrllimited: Static[np.ndarray]
    actuator_forcelimited: Static[np.ndarray]
    # activation dynamics (mjtDyn integrator/filter/filterexact; muscle
    # and plugin dyntypes are rejected at load)
    na: Static[int]  # total activation states
    actuator_dyntype: Static[np.ndarray]  # (nu,)
    actuator_actadr: Static[np.ndarray]  # (nu,) act slot, -1 stateless
    actuator_actlimited: Static[np.ndarray]  # (nu,)
    actuator_actearly: Static[np.ndarray]  # (nu,)
    act_actuatorid: Static[np.ndarray]  # (na,) owning actuator per slot

    # fixed tendons (linear joint couplings; spatial tendons rejected at
    # load). The coefficient rows are STATIC — a fixed tendon's Jacobian
    # does not depend on state (mj_tendon, engine_core_smooth.c), so both
    # matrices live as numpy aux data and fold into compile-time constants.
    ntendon: Static[int]
    ten_J: Static[np.ndarray]  # (ntendon, nv) dof coefficient rows
    ten_Lq: Static[np.ndarray]  # (ntendon, nq) qpos coefficient rows
    tendon_names: Static[tuple]

    # constraint layout: [equality][dof friction][jnt limits][ten limits][contacts]
    nefc: Static[int]
    nlimit: Static[int]
    nlimit_ten: Static[int]
    limit_tenid: Static[np.ndarray]  # (nlimit_ten,) tendon ids with limits
    ncon_max: Static[int]
    rows_per_con: Static[int]  # 2*(max condim - 1) pyramidal rows per slot
    limit_jntid: Static[np.ndarray]  # (nlimit,) joint ids with limits
    efc_type: Static[np.ndarray]  # (nefc,)
    pairs: PairTable

    # joint equality constraints (mjEQ_JOINT; reference gripper coupling)
    neq_jnt: Static[int]
    eq_j1_qadr: Static[np.ndarray]  # (neq_jnt,)
    eq_j1_dofadr: Static[np.ndarray]
    eq_j2_qadr: Static[np.ndarray]  # -1 when single-joint equality
    eq_j2_dofadr: Static[np.ndarray]

    # names
    body_names: Static[tuple]
    joint_names: Static[tuple]
    geom_names: Static[tuple]
    site_names: Static[tuple]
    actuator_names: Static[tuple]

    # ----- traced physical parameters (jnp; DR-able) -----
    qpos0: jax.Array
    qpos_spring: jax.Array
    body_pos: jax.Array
    body_quat: jax.Array
    body_ipos: jax.Array
    body_iquat: jax.Array
    body_mass: jax.Array
    body_inertia: jax.Array
    body_invweight0: jax.Array
    jnt_axis: jax.Array
    jnt_pos: jax.Array
    jnt_range: jax.Array
    jnt_solref: jax.Array
    jnt_solimp: jax.Array
    jnt_stiffness: jax.Array
    jnt_margin: jax.Array
    dof_armature: jax.Array
    dof_damping: jax.Array
    dof_frictionloss: jax.Array
    dof_invweight0: jax.Array
    dof_solref: jax.Array
    dof_solimp: jax.Array
    geom_pos: jax.Array
    geom_quat: jax.Array
    geom_size: jax.Array
    geom_friction: jax.Array
    geom_solref: jax.Array
    geom_solimp: jax.Array
    geom_solmix: jax.Array
    geom_margin: jax.Array
    geom_gap: jax.Array
    site_pos: jax.Array
    site_quat: jax.Array
    hfield_size: jax.Array  # (nhfield, 4): rx, ry, z_top, z_bottom
    hfield_data: jax.Array  # (nrow, ncol) normalized [0, 1]
    eq_polycoef: jax.Array  # (neq_jnt, 5)
    eq_solref: jax.Array  # (neq_jnt, 2)
    eq_solimp: jax.Array  # (neq_jnt, 5)
    eq_q0_1: jax.Array  # (neq_jnt,) qpos0 of joint 1
    eq_q0_2: jax.Array  # (neq_jnt,) qpos0 of joint 2
    actuator_gainprm: jax.Array
    actuator_biasprm: jax.Array
    actuator_ctrlrange: jax.Array
    actuator_forcerange: jax.Array
    actuator_gear: jax.Array
    actuator_dynprm: jax.Array  # (nu, 10) (dynprm[0] = filter tau)
    actuator_actrange: jax.Array  # (nu, 2)
    tendon_range: jax.Array  # (ntendon, 2)
    tendon_solref_lim: jax.Array  # (ntendon, 2)
    tendon_solimp_lim: jax.Array  # (ntendon, 5)
    tendon_margin: jax.Array  # (ntendon,)
    tendon_stiffness: jax.Array  # (ntendon,)
    tendon_damping: jax.Array  # (ntendon,)
    tendon_lengthspring: jax.Array  # (ntendon, 2) deadband [lo, hi]
    tendon_invweight0: jax.Array  # (ntendon,)

    opt: Option

    # CONCRETE host copies of the model constants the Pallas smooth
    # kernels bake in (phys/smooth_pallas.HostParams). When the model
    # travels inside a traced pytree (the env state carries it for DR),
    # its jax.Array fields are tracers at step-trace time — this static
    # dict keeps the single-world values reachable. Keys: field names
    # plus "opt_gravity"/"opt_timestep". None on models built by tests
    # that bypass put_model (HostParams then falls back to np.asarray).
    host_consts: Static[dict | None] = None


def limit_rows_static(m: Model) -> np.ndarray:
    """Static ((nlimit + nlimit_ten), nv) limit-row Jacobian pattern:
    one-hot rows for joint limits, fixed-tendon coefficient rows for
    tendon limits. Signs are applied at runtime via efc_lim_side."""
    P = np.zeros((m.nlimit + m.nlimit_ten, m.nv))
    if m.nlimit:
        P[np.arange(m.nlimit), m.jnt_dofadr[m.limit_jntid]] = 1.0
    if m.nlimit_ten:
        P[m.nlimit :] = m.ten_J[m.limit_tenid]
    return P


def _names(mj: mujoco.MjModel, objtype, n) -> tuple:
    return tuple(
        mujoco.mj_id2name(mj, objtype, i) or f"_{i}" for i in range(n)
    )


def put_model(
    mj: mujoco.MjModel, dtype: Any = jnp.float32, nconmax: int | None = None
) -> Model:
    """Convert a compiled mujoco.MjModel into the JAX Model pytree.

    Replaces the reference's mjwarp.put_model host->device upload
    (reference src/mjlab/sim/sim.py:139-149) — here the 'upload' is just
    array conversion; device placement happens at first jit call.
    """
    from mjlab_tpu.phys.collision import make_pair_table

    if mj.ntendon:
        WRAP_JOINT = int(mujoco.mjtWrap.mjWRAP_JOINT)
        if set(mj.wrap_type.tolist()) - {WRAP_JOINT}:
            raise NotImplementedError(
                "spatial tendons (site/geom wraps) not yet supported"
            )
        if np.any(mj.tendon_frictionloss > 0):
            raise NotImplementedError("tendon frictionloss not yet supported")
        if hasattr(mj, "tendon_armature") and np.any(mj.tendon_armature > 0):
            raise NotImplementedError("tendon armature not yet supported")
    eq_types = set(mj.eq_type.tolist()) if mj.neq else set()
    if eq_types - {int(mujoco.mjtEq.mjEQ_JOINT)}:
        raise NotImplementedError(
            f"only joint equality constraints supported, got {eq_types}"
        )
    dyn_types = set(mj.actuator_dyntype.tolist()) if mj.nu else set()
    if dyn_types - {DYN_NONE, DYN_INTEGRATOR, DYN_FILTER, DYN_FILTEREXACT}:
        raise NotImplementedError(
            f"actuator dyntype {dyn_types} (muscle/user/plugin) not supported"
        )
    if mj.nu and np.any(mj.actuator_actnum > 1):
        raise NotImplementedError("actuators with actnum > 1 not supported")
    unsupported_jnt = set(mj.jnt_type.tolist()) - {JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE}
    if unsupported_jnt:
        raise NotImplementedError(f"joint types {unsupported_jnt}")
    if mj.nhfield > 1:
        raise NotImplementedError("at most one hfield (the terrain) is supported")

    def f(x):
        return jnp.asarray(np.asarray(x), dtype=dtype)

    opt = Option(
        timestep=f(mj.opt.timestep),
        gravity=f(mj.opt.gravity),
        magnetic=f(mj.opt.magnetic),
        impratio=f(mj.opt.impratio),
        integrator=int(mj.opt.integrator),
        cone=int(mj.opt.cone),
        iterations=int(mj.opt.iterations),
        ls_iterations=int(mj.opt.ls_iterations),
        tolerance=float(mj.opt.tolerance),
        ls_tolerance=float(mj.opt.ls_tolerance),
        disableflags=int(mj.opt.disableflags),
    )

    pairs = make_pair_table(mj)

    # act slot -> owning actuator (actnum is 1 for supported dyntypes)
    act_actuatorid = np.zeros(int(mj.na), np.int32)
    for u in range(mj.nu):
        if mj.actuator_actnum[u] > 0:
            act_actuatorid[int(mj.actuator_actadr[u])] = u

    # fixed-tendon coefficient rows (static; see Model docstring)
    ntendon = int(mj.ntendon)
    ten_J = np.zeros((ntendon, mj.nv))
    ten_Lq = np.zeros((ntendon, mj.nq))
    for t in range(ntendon):
        adr, num = int(mj.tendon_adr[t]), int(mj.tendon_num[t])
        for w in range(adr, adr + num):
            j = int(mj.wrap_objid[w])
            coef = float(mj.wrap_prm[w])
            ten_J[t, int(mj.jnt_dofadr[j])] += coef
            ten_Lq[t, int(mj.jnt_qposadr[j])] += coef
    limit_tenid = (
        np.nonzero(mj.tendon_limited)[0].astype(np.int32)
        if ntendon
        else np.zeros(0, np.int32)
    )
    nlimit_ten = len(limit_tenid)

    # convex hull vertices per mesh (qhull graph verts when present)
    nmesh = int(mj.nmesh)
    if nmesh:
        hulls = []
        for i in range(nmesh):
            va, vn = int(mj.mesh_vertadr[i]), int(mj.mesh_vertnum[i])
            verts = np.asarray(mj.mesh_vert[va : va + vn], np.float64)
            ga = int(mj.mesh_graphadr[i])
            if ga >= 0:
                g = mj.mesh_graph
                numvert = int(g[ga])
                vgid = np.asarray(g[ga + 2 + numvert : ga + 2 + 2 * numvert])
                verts = verts[vgid]
            hulls.append(verts)
        vmax = max(len(h) for h in hulls)
        mesh_hull_vert = np.zeros((nmesh, vmax, 3))
        mesh_hull_mask = np.zeros((nmesh, vmax), bool)
        for i, h in enumerate(hulls):
            mesh_hull_vert[i, : len(h)] = h
            mesh_hull_vert[i, len(h) :] = h[0]
            mesh_hull_mask[i, : len(h)] = True
    else:
        mesh_hull_vert = np.zeros((0, 1, 3))
        mesh_hull_mask = np.zeros((0, 1), bool)

    # --- constraint row layout (static) ---
    # order: [dof friction (nv)] [joint limits] [4 rows per compacted contact]
    limit_jntid = np.nonzero(mj.jnt_limited)[0].astype(np.int32)
    nlimit = len(limit_jntid)
    if nconmax is None:
        # heuristic ~ mjwarp's default regime; reference tasks set 35
        nconmax = 64
    ncon_max = int(min(pairs.ncon, nconmax))
    maxdim = int(max(3, pairs.pair_condim.max() if len(pairs.pair_condim) else 3))
    if int(mj.opt.cone) == CONE_PYRAMIDAL:
        # pyramidal rows per compacted slot: 2*(condim-1), condim >= 3
        rows_per_con = 2 * (maxdim - 1)
    else:
        # elliptic rows per compacted slot: one per contact dim
        # [normal, t1, t2, torsion, roll1, roll2][:condim]
        rows_per_con = maxdim

    # joint equality constraints
    neq_jnt = int(mj.neq)
    if neq_jnt:
        eq_j1 = mj.eq_obj1id.astype(np.int32)
        eq_j2 = mj.eq_obj2id.astype(np.int32)
        single = eq_j2 < 0
        eq_j1_qadr = mj.jnt_qposadr[eq_j1].astype(np.int32)
        eq_j1_dofadr = mj.jnt_dofadr[eq_j1].astype(np.int32)
        eq_j2_qadr = np.where(single, -1, mj.jnt_qposadr[np.maximum(eq_j2, 0)]).astype(np.int32)
        eq_j2_dofadr = np.where(single, -1, mj.jnt_dofadr[np.maximum(eq_j2, 0)]).astype(np.int32)
        eq_polycoef = mj.eq_data[:, :5].astype(np.float64)
        eq_q0_1 = mj.qpos0[eq_j1_qadr]
        eq_q0_2 = np.where(single, 0.0, mj.qpos0[np.maximum(eq_j2_qadr, 0)])
        eq_solref_np = mj.eq_solref
        eq_solimp_np = mj.eq_solimp
    else:
        eq_j1_qadr = eq_j1_dofadr = eq_j2_qadr = eq_j2_dofadr = np.zeros(0, np.int32)
        eq_polycoef = np.zeros((0, 5))
        eq_q0_1 = eq_q0_2 = np.zeros(0)
        eq_solref_np = np.zeros((0, 2))
        eq_solimp_np = np.zeros((0, 5))

    nefc = neq_jnt + mj.nv + nlimit + nlimit_ten + rows_per_con * ncon_max
    efc_type = np.concatenate([
        np.full(neq_jnt, EFC_EQUALITY, np.int32),
        np.full(mj.nv, EFC_FRICTION_DOF, np.int32),
        np.full(nlimit, EFC_LIMIT_JOINT, np.int32),
        np.full(nlimit_ten, EFC_LIMIT_TENDON, np.int32),
        np.full(rows_per_con * ncon_max, EFC_CONTACT, np.int32),
    ])

    m = Model(
        nq=mj.nq, nv=mj.nv, nu=mj.nu, nbody=mj.nbody, njnt=mj.njnt,
        ngeom=mj.ngeom, nsite=mj.nsite, nmocap=mj.nmocap,
        body_parentid=mj.body_parentid.astype(np.int32),
        body_rootid=mj.body_rootid.astype(np.int32),
        body_jntadr=mj.body_jntadr.astype(np.int32),
        body_jntnum=mj.body_jntnum.astype(np.int32),
        body_dofadr=mj.body_dofadr.astype(np.int32),
        body_dofnum=mj.body_dofnum.astype(np.int32),
        body_mocapid=mj.body_mocapid.astype(np.int32),
        jnt_type=mj.jnt_type.astype(np.int32),
        jnt_qposadr=mj.jnt_qposadr.astype(np.int32),
        jnt_dofadr=mj.jnt_dofadr.astype(np.int32),
        jnt_bodyid=mj.jnt_bodyid.astype(np.int32),
        jnt_limited=mj.jnt_limited.astype(np.int32),
        dof_bodyid=mj.dof_bodyid.astype(np.int32),
        dof_jntid=mj.dof_jntid.astype(np.int32),
        geom_bodyid=mj.geom_bodyid.astype(np.int32),
        geom_type=mj.geom_type.astype(np.int32),
        geom_condim=mj.geom_condim.astype(np.int32),
        geom_priority=mj.geom_priority.astype(np.int32),
        geom_dataid=mj.geom_dataid.astype(np.int32),
        nhfield=int(mj.nhfield),
        hfield_nrow=int(mj.hfield_nrow[0]) if mj.nhfield else 0,
        hfield_ncol=int(mj.hfield_ncol[0]) if mj.nhfield else 0,
        nmesh=nmesh,
        mesh_hull_vert=mesh_hull_vert,
        mesh_hull_mask=mesh_hull_mask,
        site_bodyid=mj.site_bodyid.astype(np.int32),
        actuator_trntype=mj.actuator_trntype.astype(np.int32),
        actuator_gaintype=mj.actuator_gaintype.astype(np.int32),
        actuator_biastype=mj.actuator_biastype.astype(np.int32),
        actuator_trnid=mj.actuator_trnid.astype(np.int32).reshape(mj.nu, 2),
        actuator_ctrllimited=mj.actuator_ctrllimited.astype(np.int32),
        actuator_forcelimited=mj.actuator_forcelimited.astype(np.int32),
        na=int(mj.na),
        actuator_dyntype=mj.actuator_dyntype.astype(np.int32),
        actuator_actadr=mj.actuator_actadr.astype(np.int32),
        actuator_actlimited=mj.actuator_actlimited.astype(np.int32),
        actuator_actearly=mj.actuator_actearly.astype(np.int32),
        act_actuatorid=act_actuatorid,
        ntendon=ntendon,
        ten_J=ten_J,
        ten_Lq=ten_Lq,
        tendon_names=_names(mj, mujoco.mjtObj.mjOBJ_TENDON, ntendon),
        nefc=nefc,
        nlimit=nlimit,
        nlimit_ten=nlimit_ten,
        limit_tenid=limit_tenid,
        ncon_max=ncon_max,
        rows_per_con=rows_per_con,
        limit_jntid=limit_jntid,
        efc_type=efc_type,
        pairs=pairs,
        neq_jnt=neq_jnt,
        eq_j1_qadr=eq_j1_qadr,
        eq_j1_dofadr=eq_j1_dofadr,
        eq_j2_qadr=eq_j2_qadr,
        eq_j2_dofadr=eq_j2_dofadr,
        body_names=_names(mj, mujoco.mjtObj.mjOBJ_BODY, mj.nbody),
        joint_names=_names(mj, mujoco.mjtObj.mjOBJ_JOINT, mj.njnt),
        geom_names=_names(mj, mujoco.mjtObj.mjOBJ_GEOM, mj.ngeom),
        site_names=_names(mj, mujoco.mjtObj.mjOBJ_SITE, mj.nsite),
        actuator_names=_names(mj, mujoco.mjtObj.mjOBJ_ACTUATOR, mj.nu),
        qpos0=f(mj.qpos0),
        qpos_spring=f(mj.qpos_spring),
        body_pos=f(mj.body_pos),
        body_quat=f(mj.body_quat),
        body_ipos=f(mj.body_ipos),
        body_iquat=f(mj.body_iquat),
        body_mass=f(mj.body_mass),
        body_inertia=f(mj.body_inertia),
        body_invweight0=f(mj.body_invweight0),
        jnt_axis=f(mj.jnt_axis),
        jnt_pos=f(mj.jnt_pos),
        jnt_range=f(mj.jnt_range),
        jnt_solref=f(mj.jnt_solref),
        jnt_solimp=f(mj.jnt_solimp),
        jnt_stiffness=f(mj.jnt_stiffness),
        jnt_margin=f(mj.jnt_margin),
        dof_armature=f(mj.dof_armature),
        dof_damping=f(mj.dof_damping),
        dof_frictionloss=f(mj.dof_frictionloss),
        dof_invweight0=f(mj.dof_invweight0),
        dof_solref=f(mj.dof_solref),
        dof_solimp=f(mj.dof_solimp),
        geom_pos=f(mj.geom_pos),
        geom_quat=f(mj.geom_quat),
        geom_size=f(mj.geom_size),
        geom_friction=f(mj.geom_friction),
        geom_solref=f(mj.geom_solref),
        geom_solimp=f(mj.geom_solimp),
        geom_solmix=f(mj.geom_solmix),
        geom_margin=f(mj.geom_margin),
        geom_gap=f(mj.geom_gap),
        site_pos=f(mj.site_pos),
        site_quat=f(mj.site_quat),
        eq_polycoef=f(eq_polycoef),
        eq_solref=f(eq_solref_np),
        eq_solimp=f(eq_solimp_np),
        eq_q0_1=f(eq_q0_1),
        eq_q0_2=f(eq_q0_2),
        hfield_size=f(mj.hfield_size.reshape(-1, 4)),
        hfield_data=(
            f(mj.hfield_data.reshape(mj.hfield_nrow[0], mj.hfield_ncol[0]))
            if mj.nhfield
            else f(np.zeros((0, 0)))
        ),
        actuator_gainprm=f(mj.actuator_gainprm),
        actuator_biasprm=f(mj.actuator_biasprm),
        actuator_ctrlrange=f(mj.actuator_ctrlrange),
        actuator_forcerange=f(mj.actuator_forcerange),
        actuator_gear=f(mj.actuator_gear),
        actuator_dynprm=f(mj.actuator_dynprm),
        actuator_actrange=f(mj.actuator_actrange),
        tendon_range=f(mj.tendon_range.reshape(ntendon, 2)),
        tendon_solref_lim=f(mj.tendon_solref_lim.reshape(ntendon, 2)),
        tendon_solimp_lim=f(mj.tendon_solimp_lim.reshape(ntendon, 5)),
        tendon_margin=f(mj.tendon_margin.reshape(ntendon)),
        tendon_stiffness=f(mj.tendon_stiffness.reshape(ntendon)),
        tendon_damping=f(mj.tendon_damping.reshape(ntendon)),
        tendon_lengthspring=f(mj.tendon_lengthspring.reshape(ntendon, 2)),
        tendon_invweight0=f(mj.tendon_invweight0.reshape(ntendon)),
        opt=opt,
    )
    hc = {name: np.asarray(getattr(m, name)) for name in SMOOTH_HOST_FIELDS}
    hc["opt_gravity"] = np.asarray(opt.gravity)
    hc["opt_timestep"] = np.asarray(opt.timestep)
    return m.replace(host_consts=hc)
