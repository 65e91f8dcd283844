"""Fused Pallas TPU kernels for the smooth stages, env-last.

Round-4 trace (PERF_NOTES.md): after the fused assembly+solve kernel
(solver_pallas2.py) the remaining ~7 ms of every 10.4 ms substep at 4096
envs is ~40 small XLA fusions + layout copies from the vmapped
kinematics/CRB/RNE/passive/actuation stages and their env-first->env-last
boundary transposes. These kernels run the SAME stage code (the
resurrected scalar-plane implementations in phys/lm/stages.py) inside
pallas_call with every plane an (8, 128) VMEM tile — 1024 envs per grid
step, full VPU lanes, zero layout padding, and one kernel launch per
stage group instead of dozens of fusions:

    kin_com    qpos -> geom/site frames, subtree com, cdof, cinert
    crb        cdof+cinert -> ancestor-pair mass-matrix planes (packed)
    vel_smooth qvel+ctrl -> qfrc_smooth, actuator force, Mh diag planes

The contact stack (narrowphase, top-K compaction, constraint rows) stays
in env-last XLA (phys/lm/{collision,constraint}.py) and the Newton solve
in solver_pallas2.py — this module feeds them env-last planes directly,
so the gxT/gmT/scT/cdT boundary transposes of phys/hybrid.py disappear.

Semantics match the vmapped stages exactly (same formulas via the shared
lm/stages.py code); parity gated by tests/test_smooth_pallas.py in
interpret mode. Model fields consumed here must not be DR-batched
(smooth_pallas_supported guards; the velocity tasks batch only
geom_friction, which is consumed by the narrowphase, not these stages).

Reference behavior: mj_kinematics/mj_comPos/mj_crb/mj_rne/mj_passive/
mj_fwdActuation (consumed by the reference via mujoco_warp at
/root/reference/src/mjlab/sim/sim.py:184-190).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mjlab_tpu.phys.lm.base import Params
from mjlab_tpu.phys.lm import stages
from mjlab_tpu.phys.model import (
    DSBL_EULERDAMP, INT_EULER, INT_IMPLICITFAST, SMOOTH_HOST_FIELDS,
    TRN_JOINT, Model,
)

SYM6 = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def _sublanes(E: int) -> int:
    """Env-block sublane count: (8, 128) full f32 tiles per plane at
    production batch sizes; smaller batches (tests) use fewer sublanes."""
    return 8 if E % 1024 == 0 else E // 128


def _block_ok(E: int) -> bool:
    return E % 128 == 0 and (E % 1024 == 0 or E // 128 <= 8)


class HostParams(Params):
    """Params view that returns CONCRETE numpy scalars for .plane().

    Inside a Pallas kernel every model constant must be a trace-time
    constant (a traced jnp value would be a leaked tracer). When the
    model travels inside a traced pytree (the env state carries it for
    DR) its jax.Array fields ARE tracers, so values come from the static
    Model.host_consts snapshot; eager models fall back to np.asarray.
    Only valid when none of the consumed fields are DR-batched."""

    def __init__(self, m, num_envs):
        super().__init__(m, frozenset(), num_envs)
        self._cache: dict[str, np.ndarray] = {}

    def _np(self, name):
        if name not in self._cache:
            hc = self.m.host_consts
            if hc is not None and name in hc:
                self._cache[name] = hc[name]
            else:
                self._cache[name] = np.asarray(getattr(self.m, name))
        return self._cache[name]

    def plane(self, name, *idx):
        v = self._np(name)
        return float(v[idx]) if idx else float(v)


# model fields the smooth kernels consume: shared values are baked in as
# trace-time constants (HostParams); DR-batched ones ride in as per-env
# plane inputs (KernelParams refs)
SMOOTH_CONST_FIELDS = frozenset(SMOOTH_HOST_FIELDS)


class KernelParams(HostParams):
    """HostParams plus per-env planes for DR-batched model fields.

    refs maps field name -> kernel ref of shape (prod(rest), sub, 128)
    (the field env-blocked with the component index flattened row-major);
    shapes maps field name -> the per-env component shape `rest`. Fields
    with a ref return (sub, 128) tiles from .plane(); everything else
    falls back to the concrete host constant."""

    def __init__(self, m, num_envs, refs, shapes):
        super().__init__(m, num_envs)
        self.refs = refs
        self.shapes = shapes
        self.batched = frozenset(refs)

    def plane(self, name, *idx):
        if name in self.refs:
            rest = self.shapes[name]
            flat = 0
            for i, s in zip(idx, rest):
                flat = flat * int(s) + int(i)
            return self.refs[name][flat]
        return super().plane(name, *idx)


def dr_smooth_plan(m: Model, bf: frozenset):
    """Static plan for DR-batched smooth fields: (names, shapes) where
    names is the sorted tuple of batched SMOOTH_CONST_FIELDS and shapes
    maps each to its per-env component shape."""
    names = tuple(sorted(SMOOTH_CONST_FIELDS & bf))
    shapes = {n: tuple(getattr(m, n).shape[1:]) for n in names}
    return names, shapes


def dr_smooth_inputs(m: Model, bf: frozenset, dtype):
    """Env-last (rows, E) arrays for the DR-batched smooth fields, in
    dr_smooth_plan order (the kernels' trailing inputs)."""
    names, shapes = dr_smooth_plan(m, bf)
    arrs = []
    for n in names:
        v = getattr(m, n)  # (E, *rest)
        rows = int(np.prod(shapes[n])) if shapes[n] else 1
        arrs.append(
            jnp.moveaxis(v.reshape(v.shape[0], rows), 0, -1).astype(dtype)
        )
    return arrs


def _dr_wire(m: Model, bf: frozenset, sub: int, E: int, dr):
    """Shared kernel-wiring for DR fields: returns (names, shapes,
    extra in_specs, extra blocked operands, make_params(refs))."""
    names, shapes = dr_smooth_plan(m, bf)
    if dr is None:
        dr = dr_smooth_inputs(m, bf, jnp.float32)
    assert len(dr) == len(names)
    specs = [
        _spec((a.shape[0],), sub) for a in dr
    ]
    ops = [_env_blocks(a) for a in dr]

    def make_params(refs_list):
        if not names:
            return HostParams(m, E)
        return KernelParams(
            m, E, dict(zip(names, refs_list)), shapes
        )

    return names, specs, ops, make_params


def smooth_pallas_supported(m: Model, bf: frozenset, E: int, dtype) -> bool:
    """The env-last smooth kernels cover this model/batch configuration."""
    return (
        _block_ok(E)
        and dtype == jnp.float32
        and m.na == 0
        and m.ntendon == 0
        and m.nv > 0
        and all(int(t) == TRN_JOINT for t in np.asarray(m.actuator_trntype))
    )


def _crb_pairs(m: Model):
    """Static ancestor-pair list [(i, j), ...] with i <= j (the nonzero
    upper-triangle structure of qM)."""
    from mjlab_tpu.phys.smooth import _crb_static

    _, _, U = _crb_static(m)
    return [
        (i, j)
        for i in range(m.nv)
        for j in range(i, m.nv)
        if U[i, j] or i == j
    ]


def _env_blocks(x):
    """(rows..., E) -> (rows..., E // 128, 128) free reshape."""
    return x.reshape(x.shape[:-1] + (x.shape[-1] // 128, 128))


def _unblocks(x):
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def _spec(rows, sub):
    """BlockSpec for a (rows..., E//128, 128) array: full row dims, a
    `sub`-sublane env block per grid step."""
    nrow = len(rows)
    zeros = (0,) * nrow

    def imap(i):
        return zeros + (i, 0)

    return pl.BlockSpec(
        tuple(rows) + (sub, 128), imap, memory_space=pltpu.VMEM
    )


def _out_sd(rows, E, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(tuple(rows) + (E // 128, 128), dtype)


# ---------------------------------------------------------------------------
# kernel 1: kinematics + com quantities
# ---------------------------------------------------------------------------


def collision_geoms(m: Model) -> tuple[int, ...]:
    """Static ids of geoms that participate in narrowphase pairs — the
    only geom frames the per-substep contact stack consumes (the full
    geom_xpos surface is refreshed env-first once per control step by
    the env's kinematic refresh)."""
    pt = m.pairs
    if not pt.ncon:
        return ()
    return tuple(
        sorted({int(g) for g in np.asarray(pt.geom1)}
               | {int(g) for g in np.asarray(pt.geom2)})
    )


def kin_com(m: Model, qT: jax.Array, mocapT: jax.Array | None = None,
            mocapqT: jax.Array | None = None, interpret: bool = False,
            bf: frozenset = frozenset(), dr=None):
    """qT: (nq, E) f32; mocapT (nmocap, 3, E) / mocapqT (nmocap, 4, E)
    mocap body frames (required when m.nmocap > 0); bf/dr wire DR-batched
    smooth fields in as per-env planes (dr_smooth_inputs). Returns
    env-last: gxpos (Gc, 3, E), gxmat (Gc, 9, E) for the
    collision_geoms(m) subset, subcom (nbody, 3, E), cdof (nv, 6, E),
    cinA (nbody, 6, E), cinc (nbody, 3, E), xipos (nbody, 3, E),
    xpos (nbody, 3, E), xquat (nbody, 4, E). The body frames feed the
    env layer's per-control-step kinematic refresh (refresh_envlast);
    the extra writes are ~0.1 MB/substep at 4096 envs."""
    E = qT.shape[-1]
    sub = _sublanes(E)
    nb, nv, nq = m.nbody, m.nv, m.nq
    nmc = m.nmocap
    cg = collision_geoms(m)
    G = max(len(cg), 1)
    _, dr_specs, dr_ops, make_params = _dr_wire(m, bf, sub, E, dr)
    if nmc:
        assert mocapT is not None and mocapqT is not None
    else:  # zero-row pallas operands are unsupported: one dummy row
        mocapT = jnp.zeros((1, 3, E), qT.dtype)
        mocapqT = jnp.zeros((1, 4, E), qT.dtype)

    def kernel(q_ref, mc_ref, mcq_ref, *rest):
        dr_refs = rest[: len(dr_specs)]
        (gxpos_ref, gxmat_ref, subcom_ref, cdof_ref, cinA_ref, cinc_ref,
         xipos_ref, xpos_ref, xquat_ref) = rest[len(dr_specs):]
        P = make_params(dr_refs)
        q = tuple(q_ref[i] for i in range(nq))
        mpos = [tuple(mc_ref[i, c] for c in range(3)) for i in range(nmc)]
        mquat = [tuple(mcq_ref[i, c] for c in range(4)) for i in range(nmc)]
        k = stages.kinematics_lm(m, P, q, mpos, mquat, geoms=cg, sites=())
        k = stages.com_pos_lm(m, P, k)
        for o, g in enumerate(cg):
            for c in range(3):
                gxpos_ref[o, c] = k["geom_xpos"][g][c]
            for c in range(9):
                gxmat_ref[o, c] = k["geom_xmat"][g][c]
        zero = jnp.zeros_like(q[0])
        for b in range(nb):
            for c in range(3):
                subcom_ref[b, c] = zero + k["subtree_com"][b][c]
                xipos_ref[b, c] = zero + k["xipos"][b][c]
                cinc_ref[b, c] = zero + k["cinert"][b]["c"][c]
            for s, ij in enumerate(SYM6):
                cinA_ref[b, s] = zero + k["cinert"][b]["A"][ij]
        for i in range(nv):
            for c in range(6):
                cdof_ref[i, c] = zero + k["cdof"][i][c]
        for b in range(nb):
            for c in range(3):
                xpos_ref[b, c] = zero + k["xpos"][b][c]
            for c in range(4):
                xquat_ref[b, c] = zero + k["xquat"][b][c]

    out = pl.pallas_call(
        kernel,
        grid=(E // (sub * 128),),
        in_specs=[
            _spec((nq,), sub),
            _spec((max(nmc, 1), 3), sub), _spec((max(nmc, 1), 4), sub),
        ] + dr_specs,
        out_specs=(
            _spec((G, 3), sub), _spec((G, 9), sub), _spec((nb, 3), sub),
            _spec((nv, 6), sub), _spec((nb, 6), sub), _spec((nb, 3), sub),
            _spec((nb, 3), sub), _spec((nb, 3), sub), _spec((nb, 4), sub),
        ),
        out_shape=(
            _out_sd((G, 3), E), _out_sd((G, 9), E), _out_sd((nb, 3), E),
            _out_sd((nv, 6), E), _out_sd((nb, 6), E), _out_sd((nb, 3), E),
            _out_sd((nb, 3), E), _out_sd((nb, 3), E), _out_sd((nb, 4), E),
        ),
        interpret=interpret,
    )(_env_blocks(qT), _env_blocks(mocapT), _env_blocks(mocapqT), *dr_ops)
    return tuple(_unblocks(o) for o in out)


# ---------------------------------------------------------------------------
# kernel 2: CRB mass matrix (packed ancestor pairs)
# ---------------------------------------------------------------------------


def crb_packed(m: Model, cdof, cinA, cinc, interpret: bool = False,
               bf: frozenset = frozenset(), dr=None):
    """-> qM_pairs (npairs, E): ancestor-pair planes of the CRB mass
    matrix in _crb_pairs(m) order (armature included on the diagonal)."""
    E = cdof.shape[-1]
    sub = _sublanes(E)
    nb, nv = m.nbody, m.nv
    _, dr_specs, dr_ops, make_params = _dr_wire(m, bf, sub, E, dr)
    pairs = _crb_pairs(m)

    def kernel(cdof_ref, cinA_ref, cinc_ref, *rest):
        dr_refs = rest[: len(dr_specs)]
        (out_ref,) = rest[len(dr_specs):]
        P = make_params(dr_refs)
        k = {
            "cdof": [
                tuple(cdof_ref[i, c] for c in range(6)) for i in range(nv)
            ],
            "cinert": [
                dict(
                    A={ij: cinA_ref[b, s] for s, ij in enumerate(SYM6)},
                    c=tuple(cinc_ref[b, c] for c in range(3)),
                    m=P.plane("body_mass", b),
                )
                for b in range(nb)
            ],
        }
        k = stages.crb_lm(m, P, k)
        for p, ij in enumerate(pairs):
            out_ref[p] = k["qM"][ij]

    out = pl.pallas_call(
        kernel,
        grid=(E // (sub * 128),),
        in_specs=[_spec((nv, 6), sub), _spec((nb, 6), sub),
                  _spec((nb, 3), sub)] + dr_specs,
        out_specs=_spec((len(pairs),), sub),
        out_shape=_out_sd((len(pairs),), E),
        interpret=interpret,
    )(_env_blocks(cdof), _env_blocks(cinA), _env_blocks(cinc), *dr_ops)
    return _unblocks(out)


def qm_dense_cm(m: Model, qM_pairs: jax.Array) -> jax.Array:
    """(npairs, E) packed pairs -> (nv*nv, E) dense symmetric, the
    column-major layout newton_assemble_solve consumes (qM is symmetric,
    so row-major == column-major)."""
    nv = m.nv
    E = qM_pairs.shape[-1]
    pairs = _crb_pairs(m)
    rows, vals_idx = [], []
    for p, (i, j) in enumerate(pairs):
        rows.append(i * nv + j)
        vals_idx.append(p)
        if i != j:
            rows.append(j * nv + i)
            vals_idx.append(p)
    rows = jnp.asarray(np.array(rows, np.int32))
    gathered = qM_pairs[jnp.asarray(np.array(vals_idx, np.int32))]
    dense = jnp.zeros((nv * nv, E), qM_pairs.dtype)
    return dense.at[rows].set(gathered)


# ---------------------------------------------------------------------------
# kernel 3: velocity smooth stages -> qfrc_smooth, actuator force, Mh diag
# ---------------------------------------------------------------------------


def vel_smooth(m: Model, qT, vT, ctrlT, cdof, cinA, cinc, xq,
               interpret: bool = False, bf: frozenset = frozenset(),
               dr=None):
    """xq = (subcom (nb,3,E), xipos (nb,3,E), xfrcT (nb,6,E), qfaT (nv,E)).

    Returns (qfrc_smooth (nv, E), actuator_force (nu, E),
    actuator_velocity (nu, E), mh_diag (nv, E)) where mh_diag are the
    integrator's implicit diagonal additions (h*damping [- h*dfdv*gear^2
    for implicitfast]); zero when the velocity update is explicit."""
    subcom, xipos, xfrcT, qfaT = xq
    E = vT.shape[-1]
    sub = _sublanes(E)
    nb, nv, nu, nq = m.nbody, m.nv, m.nu, m.nq
    _, dr_specs, dr_ops, make_params = _dr_wire(m, bf, sub, E, dr)
    hc = m.host_consts or {}
    # NOTE: don't use hc.get(k, np.asarray(...)) — the default evaluates
    # eagerly and m.opt.* are tracers when the model rides in env state
    grav = (
        hc["opt_gravity"] if "opt_gravity" in hc
        else np.asarray(m.opt.gravity)
    )
    grav3 = tuple(float(g) for g in grav)
    h = float(
        hc["opt_timestep"] if "opt_timestep" in hc
        else np.asarray(m.opt.timestep)
    )
    integ = int(m.opt.integrator)
    eulerdamp = not (int(m.opt.disableflags) & DSBL_EULERDAMP)
    implicit = integ == INT_IMPLICITFAST or (
        integ == INT_EULER and eulerdamp
    )

    def kernel(q_ref, v_ref, ctrl_ref, cdof_ref, cinA_ref, cinc_ref,
               subcom_ref, xipos_ref, xfrc_ref, qfa_ref, *rest):
        dr_refs = rest[: len(dr_specs)]
        qfs_ref, afrc_ref, avel_ref, diag_ref = rest[len(dr_specs):]
        P = make_params(dr_refs)
        q = tuple(q_ref[i] for i in range(nq))
        qvel = tuple(v_ref[i] for i in range(nv))
        ctrl = tuple(ctrl_ref[u] for u in range(nu))
        zero = jnp.zeros_like(qvel[0])
        k = {
            "cdof": [
                tuple(cdof_ref[i, c] for c in range(6)) for i in range(nv)
            ],
            "cinert": [
                dict(
                    A={ij: cinA_ref[b, s] for s, ij in enumerate(SYM6)},
                    c=tuple(cinc_ref[b, c] for c in range(3)),
                    m=P.plane("body_mass", b),
                )
                for b in range(nb)
            ],
            "subtree_com": [
                tuple(subcom_ref[b, c] for c in range(3)) for b in range(nb)
            ],
            "xipos": [
                tuple(xipos_ref[b, c] for c in range(3)) for b in range(nb)
            ],
            "xpos": [(zero, zero, zero)],  # only zeros_like source
        }
        k = stages.com_vel_lm(m, P, k, qvel)
        k = stages.rne_lm(m, P, k, qvel, grav3)
        k = stages.passive_lm(m, P, k, q, qvel)
        k = stages.actuation_lm(m, P, k, q, qvel, ctrl)
        xfrc = [tuple(xfrc_ref[b, c] for c in range(6)) for b in range(nb)]
        qfx = stages.xfrc_lm(m, P, k, xfrc)
        for i in range(nv):
            qfs_ref[i] = (
                k["qfrc_passive"][i]
                - k["qfrc_bias"][i]
                + k["qfrc_actuator"][i]
                + qfa_ref[i]
                + qfx[i]
            )
        for u in range(nu):
            afrc_ref[u] = zero + k["actuator_force"][u]
            avel_ref[u] = zero + k["actuator_velocity"][u]
        # integrator implicit diagonal (see phys/forward.integrator_mh)
        if not implicit:
            for i in range(nv):
                diag_ref[i] = zero
        else:
            diag = [zero + h * P.plane("dof_damping", i) for i in range(nv)]
            if integ == INT_IMPLICITFAST and nu:
                dfdv = stages.actuator_vel_deriv_lm(
                    m, P, ctrl, k["actuator_force"]
                )
                for u in range(nu):
                    if dfdv[u] is None:
                        continue
                    j = int(m.actuator_trnid[u, 0])
                    vadr = int(m.jnt_dofadr[j])
                    gear = P.plane("actuator_gear", u, 0)
                    diag[vadr] = diag[vadr] - h * dfdv[u] * gear * gear
            for i in range(nv):
                diag_ref[i] = diag[i]

    out = pl.pallas_call(
        kernel,
        grid=(E // (sub * 128),),
        in_specs=[
            _spec((nq,), sub), _spec((nv,), sub), _spec((nu,), sub),
            _spec((nv, 6), sub), _spec((nb, 6), sub), _spec((nb, 3), sub),
            _spec((nb, 3), sub), _spec((nb, 3), sub), _spec((nb, 6), sub),
            _spec((nv,), sub),
        ] + dr_specs,
        out_specs=(
            _spec((nv,), sub), _spec((nu,), sub), _spec((nu,), sub),
            _spec((nv,), sub),
        ),
        out_shape=(
            _out_sd((nv,), E), _out_sd((nu,), E), _out_sd((nu,), E),
            _out_sd((nv,), E),
        ),
        interpret=interpret,
    )(
        _env_blocks(qT), _env_blocks(vT), _env_blocks(ctrlT),
        _env_blocks(cdof), _env_blocks(cinA), _env_blocks(cinc),
        _env_blocks(subcom), _env_blocks(xipos), _env_blocks(xfrcT),
        _env_blocks(qfaT), *dr_ops,
    )
    return tuple(_unblocks(o) for o in out)


# ---------------------------------------------------------------------------
# env-last integration (XLA: ~100 small full-lane ops, no kernel needed)
# ---------------------------------------------------------------------------


def integrate_envlast(m: Model, qT, vT, qacc_int):
    """Env-last mj_step integration tail (phys/forward.integrate without
    activation states — smooth_pallas_supported requires na == 0).

    qT (nq, E), vT (nv, E), qacc_int (nv, E). Returns
    (qposT', qvelT', bad (E,)); the caller counts ncon overflow from the
    written-back con_found like phys/forward.integrate does."""
    from mjlab_tpu.phys.lm.base import quat_integrate
    from mjlab_tpu.phys.model import JNT_BALL, JNT_FREE

    h = m.opt.timestep
    vT_new = vT + h * qacc_int
    q = tuple(qT[i] for i in range(m.nq))
    qv = tuple(vT_new[i] for i in range(m.nv))
    qpos_new = list(q)
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        qadr = int(m.jnt_qposadr[j])
        vadr = int(m.jnt_dofadr[j])
        if jtype == JNT_FREE:
            for i in range(3):
                qpos_new[qadr + i] = q[qadr + i] + h * qv[vadr + i]
            qq = quat_integrate(
                tuple(q[qadr + 3 + i] for i in range(4)),
                tuple(qv[vadr + 3 + i] for i in range(3)),
                h,
            )
            for i in range(4):
                qpos_new[qadr + 3 + i] = qq[i]
        elif jtype == JNT_BALL:
            qq = quat_integrate(
                tuple(q[qadr + i] for i in range(4)),
                tuple(qv[vadr + i] for i in range(3)),
                h,
            )
            for i in range(4):
                qpos_new[qadr + i] = qq[i]
        else:
            qpos_new[qadr] = q[qadr] + h * qv[vadr]
    qT_new = jnp.stack(qpos_new)

    # mj_checkPos/Vel/Acc parity (phys/forward.integrate)
    MAXVAL = 1e10

    def bad_of(x):
        return jnp.any(~jnp.isfinite(x) | (jnp.abs(x) > MAXVAL), axis=0)

    bad = bad_of(qT_new) | bad_of(vT_new) | bad_of(qacc_int)
    qpos0 = jnp.asarray(m.qpos0, qT.dtype)
    qpos0 = qpos0.T if qpos0.ndim == 2 else qpos0[:, None]  # DR-batched
    qT_new = jnp.where(bad, qpos0, qT_new)
    vT_new = jnp.where(bad, 0.0, vT_new)
    return qT_new, vT_new, bad
