"""On-policy runner: the training loop around the fused PPO iteration.

Equivalent of rsl-rl's OnPolicyRunner as used by the reference
(reference scripts/train.py:148-169): per iteration the ENTIRE
rollout+update executes as one jitted XLA program; the host loop only
logs and checkpoints.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
from mjlab_tpu.rl.ppo import PPO, PPOState


class OnPolicyRunner:
    def __init__(self, env, cfg: RslRlOnPolicyRunnerCfg, log_dir=None, device=None):
        self.env = env.unwrapped if hasattr(env, "unwrapped") else env
        self.cfg = cfg
        self.log_dir = log_dir
        obs_dims = {
            g: self.env.observation_manager.group_obs_dim(g)
            for g in self.env.observation_manager.active_terms
        }
        self.ppo = PPO(
            cfg,
            env_step=self.env._traced_step,
            num_envs=self.env.num_envs,
            num_actions=self.env.action_manager.total_action_dim,
            actor_obs_dim=obs_dims["policy"],
            critic_obs_dim=obs_dims.get("critic", obs_dims["policy"]),
        )
        self.ppo_state: PPOState = self.ppo.init_state(
            jax.random.PRNGKey(cfg.seed)
        )
        self.iteration = 0
        self._learn_jit = None
        self._writer = None

    # -- logging --

    def _log(self, metrics: dict, steps_per_sec: float):
        it = self.iteration
        if self.cfg.logger == "wandb" and self._writer is None:
            try:
                import wandb

                wandb.init(
                    project=self.cfg.wandb_project,
                    name=self.cfg.run_name or None,
                    dir=self.log_dir,
                    tags=list(self.cfg.wandb_tags),
                )
                self._writer = "wandb"
            except Exception:
                self._writer = "stdout"
        if self.cfg.logger == "tensorboard" and self._writer is None:
            # reference rl/config.py:85-90: rsl-rl's tensorboard backend.
            # torch's SummaryWriter when importable, else the in-repo
            # dependency-free event writer (rl/tb_writer.py).
            tb_dir = self.log_dir or "logs/tb"
            try:
                from torch.utils.tensorboard import SummaryWriter
            except Exception:
                from mjlab_tpu.rl.tb_writer import SummaryWriter
            self._tb = SummaryWriter(log_dir=tb_dir)
            self._writer = "tensorboard"
        if self._writer == "wandb":
            import wandb

            wandb.log({**metrics, "perf/steps_per_sec": steps_per_sec}, step=it)
        elif self._writer == "tensorboard":
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), it)
                except (TypeError, ValueError):
                    pass  # non-scalar metric
            self._tb.add_scalar("perf/steps_per_sec", steps_per_sec, it)
            self._tb.flush()
        else:
            keys = [
                "train/mean_reward", "loss/surrogate", "loss/value",
                "train/kl", "train/lr", "Episode/length",
            ]
            parts = [f"it={it}"]
            for k in keys:
                if k in metrics:
                    parts.append(f"{k.split('/')[-1]}={float(metrics[k]):.4f}")
            parts.append(f"sps={steps_per_sec:,.0f}")
            print("  ".join(parts), flush=True)

    # -- training --

    def learn(self, num_learning_iterations: int | None = None):
        n_iter = num_learning_iterations or self.cfg.max_iterations
        env = self.env
        obs, _ = env.reset()
        env_state = env._state

        # multi-chip data parallelism (replaces reference torchrunx + NCCL,
        # scripts/train.py:216-221): env batch sharded along a 'data' mesh
        # axis over all chips, learner replicated; XLA emits the gradient
        # psum over ICI/DCN inside the same jitted iteration.
        devices = jax.devices()
        multichip = len(devices) > 1 and env.num_envs % len(devices) == 0
        if multichip:
            from jax.sharding import NamedSharding, PartitionSpec

            from mjlab_tpu.parallel import (
                env_sharding_tree,
                make_env_mesh,
                shard_env_state,
                shard_train_state,
                train_sharding_tree,
            )

            mode = getattr(self.cfg, "learner_sharding", "replicated")
            mesh = make_env_mesh(devices)
            env_state = shard_env_state(env_state, mesh, env.num_envs)
            obs = shard_env_state(obs, mesh, env.num_envs)
            self.ppo_state = shard_train_state(self.ppo_state, mesh, mode=mode)
            if self._learn_jit is None:
                # explicit out_shardings so the carried state round-trips:
                # GSPMD otherwise returns untouched leaves replicated and
                # every subsequent call RECOMPILES on the changed input
                # shardings (metrics subtree: replicated pytree prefix)
                out_shardings = (
                    (
                        train_sharding_tree(self.ppo_state, mesh, mode),
                        env_sharding_tree(env_state, mesh, env.num_envs),
                        env_sharding_tree(obs, mesh, env.num_envs),
                    ),
                    NamedSharding(mesh, PartitionSpec()),
                )
                self._learn_jit = jax.jit(
                    self.ppo.learn_iteration, donate_argnums=0,
                    out_shardings=out_shardings,
                )
        if self._learn_jit is None:
            self._learn_jit = jax.jit(self.ppo.learn_iteration, donate_argnums=0)

        carry = (self.ppo_state, env_state, obs)
        steps_per_iter = self.cfg.num_steps_per_env * env.num_envs
        for _ in range(n_iter):
            t0 = time.perf_counter()
            carry, metrics = self._learn_jit(carry)
            jax.block_until_ready(carry[0].params)
            dt = time.perf_counter() - t0
            self.iteration += 1
            # keep the live state visible to save()/inference mid-training
            self.ppo_state = carry[0]
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            self._log(metrics, steps_per_iter / dt)
            if self.log_dir and self.iteration % self.cfg.save_interval == 0:
                self.save(
                    os.path.join(self.log_dir, f"model_{self.iteration}.ckpt")
                )
        self.ppo_state, env._state, _ = carry
        env.ctx.load(env._state)
        if self.log_dir:
            self.save(os.path.join(self.log_dir, f"model_{self.iteration}.ckpt"))

    # -- inference / checkpointing --

    def get_inference_policy(self, device=None):
        st = self.ppo_state

        @jax.jit
        def policy(obs):
            return self.ppo.act_inference(st, obs)

        return policy

    def save(self, path: str):
        if jax.process_index() != 0:
            return
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {
            "params": jax.device_get(self.ppo_state.params),
            "opt_state": jax.device_get(self.ppo_state.opt_state),
            "actor_norm": jax.device_get(self.ppo_state.actor_norm),
            "critic_norm": jax.device_get(self.ppo_state.critic_norm),
            "lr": jax.device_get(self.ppo_state.lr),
            "rng": jax.device_get(self.ppo_state.rng),
            "iteration": self.iteration,
            "cfg": self.cfg,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load(self, path: str, load_optimizer: bool = True):
        """Restore params + normalizers; with load_optimizer also the Adam
        moments, adaptive-KL LR and RNG so resume continues the exact
        training dynamics (rsl-rl resume semantics)."""
        with open(path, "rb") as f:
            payload = pickle.load(f)
        updates = dict(
            params=payload["params"],
            actor_norm=payload["actor_norm"],
            critic_norm=payload["critic_norm"],
        )
        if load_optimizer and "opt_state" in payload:
            updates["opt_state"] = payload["opt_state"]
            if "lr" in payload:
                updates["lr"] = jnp.asarray(payload["lr"])
            if "rng" in payload:
                updates["rng"] = jnp.asarray(payload["rng"])
        self.ppo_state = self.ppo_state.replace(**updates)
        self.iteration = payload.get("iteration", 0)
        return payload
