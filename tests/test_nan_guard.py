"""NaN detection (reference tests/test_nan_guard.py): per-env non-finite
state flags drive the quarantine termination."""

import jax.numpy as jnp
import numpy as np

from mjlab_tpu.utils.nan_guard import detect_nans


class _D:
    def __init__(self, qpos, qvel, qacc, ws):
        self.qpos = qpos
        self.qvel = qvel
        self.qacc = qacc
        self.qacc_warmstart = ws


def _data(E=4, nv=3):
    z = jnp.zeros((E, nv))
    return _D(z, z, z, z)


def test_clean_state_no_flags():
    bad = np.asarray(detect_nans(_data()))
    assert not bad.any()


def test_nan_in_qpos_flags_only_that_env():
    d = _data()
    d.qpos = d.qpos.at[2, 1].set(jnp.nan)
    bad = np.asarray(detect_nans(d))
    assert bad.tolist() == [False, False, True, False]


def test_inf_in_qacc_flags_env():
    d = _data()
    d.qacc = d.qacc.at[0, 0].set(jnp.inf)
    bad = np.asarray(detect_nans(d))
    assert bad.tolist() == [True, False, False, False]


def test_warmstart_checked_too():
    d = _data()
    d.qacc_warmstart = d.qacc_warmstart.at[3, 2].set(-jnp.inf)
    bad = np.asarray(detect_nans(d))
    assert bad.tolist() == [False, False, False, True]
