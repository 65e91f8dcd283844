"""Actuator torque-model semantics as pure functions (reference
tests/test_pd_actuator.py, test_dc_actuator.py, test_delayed_actuator.py).
No sim needed: build the actuator objects directly and drive compute()."""

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.actuator.actuator import ActuatorCmd
from mjlab_tpu.actuator.dc import DcMotorActuator, DcMotorActuatorCfg
from mjlab_tpu.actuator.delayed import DelayedActuator, DelayedActuatorCfg
from mjlab_tpu.actuator.pd import IdealPdActuator, IdealPdActuatorCfg

J = 2
E = 4


def _cmd(pos_t=0.0, vel_t=0.0, eff_t=0.0, q=0.0, qd=0.0):
    f = lambda v: jnp.full((E, J), float(v), jnp.float32)
    return ActuatorCmd(
        position_target=f(pos_t),
        velocity_target=f(vel_t),
        effort_target=f(eff_t),
        joint_pos=f(q),
        joint_vel=f(qd),
    )


def _pd(stiffness=10.0, damping=2.0, effort_limit=5.0, cls=IdealPdActuator,
        cfg_cls=IdealPdActuatorCfg, **kw):
    cfg = cfg_cls(
        joint_names_expr=("a", "b"),
        stiffness=stiffness,
        damping=damping,
        effort_limit=effort_limit,
        **kw,
    )
    act = cls(cfg, entity=None, joint_ids=[0, 1], joint_names=["a", "b"])
    state = act.initialize(E, jax.random.PRNGKey(0))
    return act, state


def test_pd_torque_law():
    act, st = _pd(stiffness=10.0, damping=2.0, effort_limit=100.0)
    _, tau = act.compute(st, _cmd(pos_t=0.3, q=0.1, qd=-0.5, eff_t=1.0))
    # kp*(0.3-0.1) + kd*(0-(-0.5)) + 1.0 = 2 + 1 + 1 = 4
    np.testing.assert_allclose(np.asarray(tau), 4.0, atol=1e-6)


def test_pd_effort_clip():
    act, st = _pd(stiffness=100.0, damping=0.0, effort_limit=5.0)
    _, tau = act.compute(st, _cmd(pos_t=1.0, q=0.0))
    np.testing.assert_allclose(np.asarray(tau), 5.0)
    _, tau = act.compute(st, _cmd(pos_t=-1.0, q=0.0))
    np.testing.assert_allclose(np.asarray(tau), -5.0)


def test_pd_set_gains_masked():
    act, st = _pd()
    mask = jnp.asarray([True, False, True, False])
    st2 = IdealPdActuator.set_gains(st, mask, stiffness=99.0)
    kp = np.asarray(st2.stiffness)
    np.testing.assert_allclose(kp[0], 99.0)
    np.testing.assert_allclose(kp[1], 10.0)
    # defaults untouched for un-masked envs and stored for restore
    np.testing.assert_allclose(np.asarray(st2.default_stiffness), 10.0)


def test_dc_torque_speed_envelope():
    act, st = _pd(
        stiffness=0.0,
        damping=0.0,
        effort_limit=40.0,
        cls=DcMotorActuator,
        cfg_cls=DcMotorActuatorCfg,
        saturation_effort=40.0,
        velocity_limit=10.0,
    )
    # at qd = +5 (half of limit), max motoring torque = sat * (1 - 0.5) = 20
    _, tau = act.compute(st, _cmd(eff_t=100.0, qd=5.0))
    np.testing.assert_allclose(np.asarray(tau), 20.0, atol=1e-5)
    # braking side: torque at qd=+5 can go to sat*(-1-0.5) clipped at -40
    _, tau = act.compute(st, _cmd(eff_t=-100.0, qd=5.0))
    np.testing.assert_allclose(np.asarray(tau), -40.0, atol=1e-5)
    # at qd = 0 the envelope equals +-sat (clipped by effort limit)
    _, tau = act.compute(st, _cmd(eff_t=100.0, qd=0.0))
    np.testing.assert_allclose(np.asarray(tau), 40.0, atol=1e-5)


def test_delayed_actuator_fixed_lag():
    base_cfg = IdealPdActuatorCfg(
        joint_names_expr=("a", "b"), stiffness=1.0, damping=0.0,
        effort_limit=1e9,
    )
    cfg = DelayedActuatorCfg(
        joint_names_expr=(),
        base_cfg=base_cfg,
        delay_target="position",
        min_lag=2,
        max_lag=2,
    )
    act = DelayedActuator(
        cfg,
        base_cfg.build(None, [0, 1], ["a", "b"]),
        entity=None,
        joint_ids=[0, 1],
        joint_names=["a", "b"],
    )
    st = act.initialize(E, jax.random.PRNGKey(0))
    # push distinct targets; with lag=2 the output sees targets two pushes old
    outs = []
    for t in range(5):
        st, tau = act.compute(st, _cmd(pos_t=float(t + 1), q=0.0))
        outs.append(float(np.asarray(tau)[0, 0]))
    # kp=1, q=0 -> tau equals the delayed position target.
    # first pushes backfill with the first value
    assert outs[0] == 1.0 and outs[1] == 1.0
    assert outs[2:] == [1.0, 2.0, 3.0]


def test_delayed_reset_clears_history():
    base_cfg = IdealPdActuatorCfg(
        joint_names_expr=("a", "b"), stiffness=1.0, damping=0.0,
        effort_limit=1e9,
    )
    cfg = DelayedActuatorCfg(
        joint_names_expr=(), base_cfg=base_cfg, delay_target="position",
        min_lag=1, max_lag=1,
    )
    act = DelayedActuator(
        cfg, base_cfg.build(None, [0, 1], ["a", "b"]),
        entity=None, joint_ids=[0, 1], joint_names=["a", "b"],
    )
    st = act.initialize(E, jax.random.PRNGKey(0))
    for t in range(3):
        st, _ = act.compute(st, _cmd(pos_t=float(t + 1)))
    st = act.reset(st, jnp.asarray([True, False, False, False]), jax.random.PRNGKey(1))
    st, tau = act.compute(st, _cmd(pos_t=50.0))
    tau = np.asarray(tau)
    # env 0 backfills with the new target; env 1 still lags one step behind
    np.testing.assert_allclose(tau[0], 50.0)
    np.testing.assert_allclose(tau[1], 3.0)
