"""Checkpoint save/load round trip incl. optimizer state, latest-run
resolution and the NaN-guard wiring (reference scripts/train.py:96-128,
utils/nan_guard.py, rsl-rl OnPolicyRunner.save/load semantics)."""

import glob
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.mini_env import make_pendulum_env
from mjlab_tpu.rl.config import (
    RslRlOnPolicyRunnerCfg, RslRlPpoActorCriticCfg, RslRlPpoAlgorithmCfg,
)
from mjlab_tpu.rl.runner import OnPolicyRunner
from mjlab_tpu.rl.vecenv_wrapper import RslRlVecEnvWrapper


def _mini_cfg(**kw):
    return RslRlOnPolicyRunnerCfg(
        seed=0,
        num_steps_per_env=4,
        max_iterations=2,
        save_interval=1,
        experiment_name="ckpt_test",
        logger="stdout",
        policy=RslRlPpoActorCriticCfg(
            actor_hidden_dims=(16,), critic_hidden_dims=(16,)
        ),
        algorithm=RslRlPpoAlgorithmCfg(
            num_learning_epochs=1, num_mini_batches=1
        ),
        **kw,
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("run1"))
    env = make_pendulum_env()
    wrapped = RslRlVecEnvWrapper(env)
    runner = OnPolicyRunner(wrapped, _mini_cfg(), log_dir=log_dir)
    runner.learn(2)
    return env, runner, log_dir


def test_save_includes_optimizer_state(trained):
    env, runner, log_dir = trained
    ckpts = sorted(glob.glob(os.path.join(log_dir, "model_*.ckpt")))
    assert ckpts, "no checkpoints written"
    with open(ckpts[-1], "rb") as f:
        payload = pickle.load(f)
    assert "opt_state" in payload
    assert "lr" in payload and "rng" in payload
    # Adam moments should be non-trivial after 2 iterations
    leaves = jax.tree_util.tree_leaves(payload["opt_state"])
    assert any(np.any(np.asarray(l) != 0) for l in leaves if hasattr(l, "shape"))


def test_load_restores_optimizer(trained):
    env, runner, log_dir = trained
    ckpt = sorted(glob.glob(os.path.join(log_dir, "model_*.ckpt")))[-1]

    env2 = make_pendulum_env()
    wrapped2 = RslRlVecEnvWrapper(env2)
    r2 = OnPolicyRunner(wrapped2, _mini_cfg(), log_dir=None)
    r2.load(ckpt, load_optimizer=True)

    for a, b in zip(
        jax.tree_util.tree_leaves(runner.ppo_state.opt_state),
        jax.tree_util.tree_leaves(r2.ppo_state.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(runner.ppo_state.lr), np.asarray(r2.ppo_state.lr)
    )
    assert r2.iteration == runner.iteration

    # without optimizer: params restored, moments stay fresh
    r3 = OnPolicyRunner(
        RslRlVecEnvWrapper(make_pendulum_env()), _mini_cfg(), log_dir=None
    )
    fresh = jax.tree_util.tree_leaves(r3.ppo_state.opt_state)
    r3.load(ckpt, load_optimizer=False)
    after = jax.tree_util.tree_leaves(r3.ppo_state.opt_state)
    for a, b in zip(fresh, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(runner.ppo_state.params),
        jax.tree_util.tree_leaves(r3.ppo_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_resolution(trained, tmp_path):
    env, runner, log_dir = trained
    from mjlab_tpu.utils.os import get_checkpoint_path

    root = str(tmp_path / "logs")
    os.makedirs(os.path.join(root, "2026-01-01_00-00-00"))
    os.makedirs(os.path.join(root, "2026-02-02_00-00-00"))
    for d, its in (("2026-01-01_00-00-00", (5,)), ("2026-02-02_00-00-00", (3, 7))):
        for it in its:
            open(os.path.join(root, d, f"model_{it}.ckpt"), "wb").close()
    p = get_checkpoint_path(root, ".*", r"model_(\d+).*")
    assert p.endswith(os.path.join("2026-02-02_00-00-00", "model_7.ckpt"))


def test_nan_guard_wired_and_dumps(tmp_path):
    from mjlab_tpu.utils.nan_guard import NanGuardCfg

    env = make_pendulum_env()
    # rebuild with the guard enabled
    cfg = env.cfg
    cfg.sim.nan_guard = NanGuardCfg(
        enabled=True, buffer_size=8, output_dir=str(tmp_path / "dumps")
    )
    from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv

    env = ManagerBasedRlEnv(cfg)
    env.reset()
    assert "_nan_guard" in env.ctx.sensor_states
    A = env.action_manager.total_action_dim
    for _ in range(3):
        env.step(jnp.zeros((env.num_envs, A)))
    assert not glob.glob(str(tmp_path / "dumps" / "*.npz")), "no NaN yet"

    # poison the state -> guard must dump on the next step
    st = env._state
    env._state = st.replace(
        data=st.data.replace(qpos=st.data.qpos.at[0, 0].set(jnp.nan))
    )
    env.ctx.load(env._state)
    env.step(jnp.zeros((env.num_envs, A)))
    jax.effects_barrier()
    dumps = glob.glob(str(tmp_path / "dumps" / "*.npz"))
    assert dumps, "NaN guard did not dump"
    z = np.load(dumps[0])
    assert 0 in z["bad_envs"]
    assert z["qpos"].shape[-1] == env.sim.model.nq
