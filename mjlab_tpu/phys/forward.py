"""Forward dynamics pipeline and integrators (mj_forward / mj_step
semantics for Euler and implicitfast).

Single-world pure functions; batch with vmap, compile with jit. The whole
step is the TPU analog of the reference's captured CUDA step graph
(reference src/mjlab/sim/sim.py:164-191) — XLA compiles it once and replays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.phys import math
from mjlab_tpu.phys.model import (
    DSBL_EULERDAMP,
    DYN_FILTEREXACT,
    INT_EULER,
    INT_IMPLICITFAST,
    JNT_BALL,
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
    Model,
)
from mjlab_tpu.phys.data import Data
from mjlab_tpu.phys.kinematics import com_pos, kinematics
from mjlab_tpu.phys.collision import collision
from mjlab_tpu.phys.constraint import make_constraint
from mjlab_tpu.phys.solver import solve
from mjlab_tpu.phys import linalg
from mjlab_tpu.phys import smooth


def fwd_position(m: Model, d: Data) -> Data:
    d = kinematics(m, d)
    d = com_pos(m, d)
    d = smooth.crb(m, d)
    d = collision(m, d)
    d = smooth.tendon(m, d)
    d = smooth.transmission(m, d)
    d = make_constraint(m, d)
    return d


def fwd_velocity(m: Model, d: Data) -> Data:
    d = smooth.com_vel(m, d)
    d = smooth.rne(m, d)
    d = smooth.passive(m, d)
    return d


def fwd_acceleration(m: Model, d: Data) -> Data:
    qfrc_smooth = (
        d.qfrc_passive
        - d.qfrc_bias
        + d.qfrc_actuator
        + d.qfrc_applied
        + smooth.xfrc_accumulate(m, d)
    )
    qacc_smooth = smooth.solve_m(d, qfrc_smooth)
    return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def forward(m: Model, d: Data) -> Data:
    d = fwd_position(m, d)
    d = fwd_velocity(m, d)
    d = smooth.fwd_actuation(m, d)
    d = fwd_acceleration(m, d)
    d = solve(m, d)
    return d


def _actuator_vel_deriv(m: Model, d: Data) -> jax.Array:
    """d(actuator force)/d(actuator velocity) per actuator.

    Force-saturated actuators contribute ZERO derivative (the clamp is
    flat), matching mjd_smooth_vel — without this the implicitfast update
    diverges from MuJoCo whenever random/aggressive ctrl saturates
    forcerange (measured 2 rad/s qvel error in one G1 step)."""
    dfdv = jnp.zeros(m.nu, d.qpos.dtype)
    if m.nu == 0:
        return dfdv
    affine_bias = jnp.asarray(m.actuator_biastype == 1)
    dfdv = jnp.where(affine_bias, m.actuator_biasprm[:, 2], dfdv)
    affine_gain = jnp.asarray(m.actuator_gaintype == 1)
    inp, _ = smooth.actuation_input(m, d)
    dfdv = dfdv + jnp.where(affine_gain, m.actuator_gainprm[:, 2] * inp, 0.0)
    limited = jnp.asarray(m.actuator_forcelimited.astype(bool))
    saturated = limited & (
        (d.actuator_force <= m.actuator_forcerange[:, 0])
        | (d.actuator_force >= m.actuator_forcerange[:, 1])
    )
    return jnp.where(saturated, 0.0, dfdv)


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    out = qpos
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        qadr = int(m.jnt_qposadr[j])
        vadr = int(m.jnt_dofadr[j])
        if jtype == JNT_FREE:
            out = out.at[qadr : qadr + 3].set(
                qpos[qadr : qadr + 3] + dt * qvel[vadr : vadr + 3]
            )
            q = math.quat_integrate(
                qpos[qadr + 3 : qadr + 7], qvel[vadr + 3 : vadr + 6], dt
            )
            out = out.at[qadr + 3 : qadr + 7].set(q)
        elif jtype == JNT_BALL:
            q = math.quat_integrate(qpos[qadr : qadr + 4], qvel[vadr : vadr + 3], dt)
            out = out.at[qadr : qadr + 4].set(q)
        else:  # hinge / slide
            out = out.at[qadr].set(qpos[qadr] + dt * qvel[vadr])
    return out


def _euler_mh(m: Model, d: Data) -> jax.Array:
    """Implicit-damping Euler system matrix M + h B."""
    return d.qM + m.opt.timestep * jnp.diag(m.dof_damping)


def _euler_qacc(m: Model, d: Data) -> jax.Array:
    """Implicit-in-damping velocity update: (M + h B) a' = M a."""
    if (m.opt.disableflags & DSBL_EULERDAMP):
        return d.qacc
    Mh = _euler_mh(m, d)
    Li = linalg.tri_inv(linalg.chol_factor_blocked(Mh))
    return linalg.chol_solve_inv(Li, d.qM @ d.qacc, Mh)


def integrator_mh(m: Model, d: Data) -> jax.Array | None:
    """System matrix of the integrator's implicit velocity update, or
    None when the update is explicit (plain Euler with damping disabled).
    Exposed so the hybrid fast path can fold the factor+solve into the
    Pallas kernel (hybrid.py) instead of paying a second XLA dense
    factorization per substep."""
    if m.opt.integrator == INT_IMPLICITFAST:
        return _implicitfast_mh(m, d)
    if m.opt.integrator == INT_EULER and not (
        m.opt.disableflags & DSBL_EULERDAMP
    ):
        return _euler_mh(m, d)
    return None


def _implicitfast_mh(m: Model, d: Data) -> jax.Array:
    """(M - h dF/dv) with dF/dv = -diag(damping) + moment^T G moment."""
    h = m.opt.timestep
    Mh = d.qM + h * jnp.diag(m.dof_damping)
    if m.ntendon:
        # tendon damping enters qDeriv in implicitfast (mjd_smooth_vel):
        # dF/dv += -ten_J^T diag(c) ten_J
        Jt = jnp.asarray(m.ten_J, d.qpos.dtype)
        Mh = Mh + h * (Jt.T * m.tendon_damping) @ Jt
    if m.nu:
        dfdv = _actuator_vel_deriv(m, d)
        Mh = Mh - h * (d.actuator_moment.T * dfdv) @ d.actuator_moment
    return Mh


def _implicitfast_qacc(m: Model, d: Data) -> jax.Array:
    Mh = _implicitfast_mh(m, d)
    Li = linalg.tri_inv(linalg.chol_factor_blocked(Mh))
    return linalg.chol_solve_inv(Li, d.qM @ d.qacc, Mh)


def step(m: Model, d: Data) -> Data:
    """One physics step: forward dynamics + integration."""
    d = forward(m, d)
    return integrate(m, d)


def integrate(m: Model, d: Data, qacc_int: jax.Array | None = None) -> Data:
    """Post-solve integration + activation advance + mj_check reset.

    qacc_int: precomputed implicit velocity update (the hybrid fast path
    solves it inside the constraint kernel); None computes it here."""
    h = m.opt.timestep
    if qacc_int is None:
        if m.opt.integrator == INT_EULER:
            qacc_int = _euler_qacc(m, d)
        elif m.opt.integrator == INT_IMPLICITFAST:
            qacc_int = _implicitfast_qacc(m, d)
        else:
            raise NotImplementedError(f"integrator {m.opt.integrator}")
    qvel = d.qvel + h * qacc_int
    qpos = _integrate_pos(m, d.qpos, qvel, h)
    # advance activation states (mj_advance: Euler, exact for filterexact)
    if m.na:
        aid = m.act_actuatorid  # static
        tau_a = jnp.maximum(m.actuator_dynprm[aid, 0], 1e-15)
        fexact = jnp.asarray(m.actuator_dyntype[aid] == DYN_FILTEREXACT)
        act = d.act + h * d.act_dot
        act = jnp.where(fexact, d.act - d.act_dot * tau_a * jnp.expm1(-h / tau_a), act)
        alim = jnp.asarray(m.actuator_actlimited[aid].astype(bool))
        rng = m.actuator_actrange[aid]
        act = jnp.where(alim, jnp.clip(act, rng[:, 0], rng[:, 1]), act)
    else:
        act = d.act
    # mj_checkPos/Vel/Acc parity (engine_forward.c): a diverged world
    # (non-finite or |.| > mjMAXVAL) resets to qpos0 with zero velocity
    # instead of propagating garbage. Per-world, masked, f32-critical.
    MAXVAL = 1e10
    bad = (
        ~jnp.isfinite(qpos).all()
        | ~jnp.isfinite(qvel).all()
        | ~jnp.isfinite(qacc_int).all()
        | ~jnp.isfinite(act).all()
        | (jnp.max(jnp.abs(qpos)) > MAXVAL)
        | (jnp.max(jnp.abs(qvel)) > MAXVAL)
        | (jnp.max(jnp.abs(qacc_int)) > MAXVAL)
    )
    qpos = jnp.where(bad, jnp.asarray(m.qpos0, qpos.dtype), qpos)
    qvel = jnp.where(bad, 0.0, qvel)
    act = jnp.where(bad, 0.0, act)
    d = d.replace(qacc_warmstart=jnp.where(bad, 0.0, d.qacc_warmstart))
    # top-K compaction saturation: found contacts beyond the ncon_max
    # compacted capacity were silently dropped this substep — count them
    # so nconmax tuning has evidence instead of silent corruption.
    n_found = jnp.sum(d.con_found.astype(jnp.int32))
    overflow = jnp.maximum(n_found - m.ncon_max, 0)
    return d.replace(
        qpos=qpos, qvel=qvel, act=act, time=d.time + h,
        ncheck_reset=d.ncheck_reset + bad.astype(jnp.int32),
        ncon_overflow=d.ncon_overflow + overflow,
    )
