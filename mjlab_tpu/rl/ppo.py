"""In-repo PPO learner (flax/optax), semantics matching rsl-rl 3.1.0 as
configured by the reference (reference src/mjlab/rl/config.py and
docs/api/distributed_training.md):

  - Gaussian MLP actor-critic, scalar or log noise-std head
  - empirical observation normalization (running mean/var)
  - GAE(gamma, lam) with time-out bootstrapping (reference
    rl/vecenv_wrapper.py:86-87)
  - clipped surrogate + clipped value loss + entropy bonus
  - adaptive-KL learning-rate rule (x1.5 / /1.5 around desired_kl)
  - minibatch epochs, global advantage normalization, grad-norm clip

TPU-first: one full PPO iteration (rollout scan + epochs of minibatch
updates) compiles to a single XLA program; multi-chip data parallelism
shards the env batch and relies on jax.sharding to insert gradient
all-reduces (see mjlab_tpu/parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from mjlab_tpu.rl.config import RslRlOnPolicyRunnerCfg
from mjlab_tpu.utils.struct import Static, pytree

_ACT = {
    "elu": nn.elu,
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "gelu": nn.gelu,
    "silu": nn.silu,
}


class MLP(nn.Module):
    hidden: tuple
    out: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for h in self.hidden:
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.out)(x)


@pytree
class NormState:
    mean: jax.Array
    var: jax.Array
    count: jax.Array


def norm_init(dim: int) -> NormState:
    return NormState(
        mean=jnp.zeros((dim,)), var=jnp.ones((dim,)), count=jnp.zeros(())
    )


def norm_update(s: NormState, batch: jax.Array) -> NormState:
    """Batched Welford update of running mean/var. The batch is clipped
    to mean +- 20 sigma first so one diverged env cannot poison the
    running statistics permanently."""
    sigma = jnp.sqrt(s.var + 1e-8)
    b = batch.reshape(-1, batch.shape[-1])
    # (first batch unclipped: the running stats are not meaningful yet)
    b = jnp.where(
        s.count > 0,
        jnp.clip(b, s.mean - 20.0 * sigma, s.mean + 20.0 * sigma),
        b,
    )
    n_b = b.shape[0]
    mean_b = jnp.mean(b, axis=0)
    var_b = jnp.var(b, axis=0)
    n = s.count
    tot = n + n_b
    delta = mean_b - s.mean
    mean = s.mean + delta * (n_b / tot)
    m_a = s.var * n
    m_b = var_b * n_b
    var = (m_a + m_b + jnp.square(delta) * n * n_b / tot) / tot
    return NormState(mean=mean, var=var, count=tot)


def norm_apply(s: NormState, x: jax.Array) -> jax.Array:
    # clip normalized obs: a single diverged env otherwise poisons the
    # whole batch through the policy/value nets (rsl-rl's normalizer has
    # no clip; +-10 sigma leaves healthy observations untouched)
    return jnp.clip((x - s.mean) / jnp.sqrt(s.var + 1e-8), -10.0, 10.0)


@pytree
class PPOState:
    params: Any
    opt_state: Any
    actor_norm: NormState
    critic_norm: NormState
    lr: jax.Array
    rng: jax.Array


@dataclass
class ActorCritic:
    """Host-side bundle of modules + pure apply fns."""

    cfg: RslRlOnPolicyRunnerCfg
    num_actions: int
    actor_obs_dim: int
    critic_obs_dim: int

    def __post_init__(self):
        p = self.cfg.policy
        self.actor = MLP(
            tuple(p.actor_hidden_dims), self.num_actions, p.activation
        )
        self.critic = MLP(tuple(p.critic_hidden_dims), 1, p.activation)

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        p = self.cfg.policy
        params = {
            "actor": self.actor.init(k1, jnp.zeros((1, self.actor_obs_dim))),
            "critic": self.critic.init(k2, jnp.zeros((1, self.critic_obs_dim))),
        }
        # explicit dtype: a weak-typed std (python-scalar fill) comes back
        # strong-typed from the first jitted update, forcing a full
        # retrace+recompile of learn_iteration on its second call
        # (caught by jax_explain_cache_misses in the round-4 multichip
        # dryrun: the 'warm' iteration recompiled for minutes)
        if p.noise_std_type == "scalar":
            params["std"] = jnp.full(
                (self.num_actions,), p.init_noise_std, dtype=jnp.float32
            )
        else:
            params["std"] = jnp.full(
                (self.num_actions,), jnp.log(p.init_noise_std),
                dtype=jnp.float32,
            )
        return params

    def std(self, params):
        if self.cfg.policy.noise_std_type == "scalar":
            return jnp.maximum(params["std"], 1e-6)
        return jnp.exp(params["std"])

    def act_mean(self, params, obs):
        return self.actor.apply(params["actor"], obs)

    def value(self, params, obs):
        return self.critic.apply(params["critic"], obs)[..., 0]

    def logprob(self, params, obs, action):
        mean = self.act_mean(params, obs)
        std = self.std(params)
        lp = -0.5 * jnp.square((action - mean) / std) - jnp.log(std) - 0.5 * jnp.log(
            2 * jnp.pi
        )
        return jnp.sum(lp, -1), mean

    def entropy(self, params):
        std = self.std(params)
        return jnp.sum(0.5 * jnp.log(2 * jnp.pi * jnp.e) + jnp.log(std))


def _critic_obs(obs):
    """Privileged critic group when present, else the policy group
    (rsl-rl obs_groups fallback semantics, reference rl/config.py:76-78)."""
    return obs["critic"] if "critic" in obs else obs["policy"]


class PPO:
    """PPO over a traced env step function.

    env_step: (env_state, action) -> (env_state, obs_dict, reward,
    terminated, truncated, logs). The full learn-iteration is jittable.
    """

    def __init__(
        self,
        cfg: RslRlOnPolicyRunnerCfg,
        env_step: Callable,
        num_envs: int,
        num_actions: int,
        actor_obs_dim: int,
        critic_obs_dim: int,
    ):
        self.cfg = cfg
        self.env_step = env_step
        self.num_envs = num_envs
        self.ac = ActorCritic(cfg, num_actions, actor_obs_dim, critic_obs_dim)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.algorithm.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(
                learning_rate=cfg.algorithm.learning_rate
            ),
        )

    def init_state(self, rng) -> PPOState:
        k1, k2 = jax.random.split(rng)
        params = self.ac.init_params(k1)
        return PPOState(
            params=params,
            opt_state=self.tx.init(params),
            actor_norm=norm_init(self.ac.actor_obs_dim),
            critic_norm=norm_init(self.ac.critic_obs_dim),
            lr=jnp.asarray(self.cfg.algorithm.learning_rate),
            rng=k2,
        )

    # -- policy API --

    def act(self, state: PPOState, obs: dict, rng):
        aobs = norm_apply(state.actor_norm, obs["policy"])
        mean = self.ac.act_mean(state.params, aobs)
        std = self.ac.std(state.params)
        noise = jax.random.normal(rng, mean.shape)
        action = mean + std * noise
        if self.cfg.clip_actions is not None:
            action = jnp.clip(action, -self.cfg.clip_actions, self.cfg.clip_actions)
        return action

    def act_inference(self, state: PPOState, obs: dict):
        aobs = norm_apply(state.actor_norm, obs["policy"])
        return self.ac.act_mean(state.params, aobs)

    # -- one full PPO iteration (rollout + update), jittable --

    def learn_iteration(self, carry):
        ppo, env_state, obs = carry
        alg = self.cfg.algorithm
        T = self.cfg.num_steps_per_env

        def rollout_step(c, _):
            ppo, env_state, obs = c
            rng, k = jax.random.split(ppo.rng)
            actor_norm = norm_update(ppo.actor_norm, obs["policy"])
            critic_norm = norm_update(ppo.critic_norm, _critic_obs(obs))
            aobs = norm_apply(actor_norm, obs["policy"])
            cobs = norm_apply(critic_norm, _critic_obs(obs))
            mean = self.ac.act_mean(ppo.params, aobs)
            std = self.ac.std(ppo.params)
            action = mean + std * jax.random.normal(k, mean.shape)
            if self.cfg.clip_actions is not None:
                action = jnp.clip(
                    action, -self.cfg.clip_actions, self.cfg.clip_actions
                )
            lp = jnp.sum(
                -0.5 * jnp.square((action - mean) / std)
                - jnp.log(std)
                - 0.5 * jnp.log(2 * jnp.pi),
                -1,
            )
            value = self.ac.value(ppo.params, cobs)
            env_state, next_obs, reward, terminated, truncated, logs = (
                self.env_step(env_state, action)
            )
            done = terminated | truncated
            # time-out bootstrap (reference rl/vecenv_wrapper.py:86-87)
            reward_b = reward + alg.gamma * value * truncated.astype(reward.dtype)
            ppo = ppo.replace(
                rng=rng, actor_norm=actor_norm, critic_norm=critic_norm
            )
            out = dict(
                aobs=aobs, cobs=cobs, action=action, logprob=lp, value=value,
                reward=reward_b, done=done, raw_reward=reward,
                old_mean=mean, old_std=jnp.broadcast_to(std, mean.shape),
            )
            return (ppo, env_state, next_obs), (out, logs)

        (ppo, env_state, obs), (traj, logs) = jax.lax.scan(
            rollout_step, (ppo, env_state, obs), None, length=T
        )

        # GAE
        last_cobs = norm_apply(ppo.critic_norm, _critic_obs(obs))
        last_value = self.ac.value(ppo.params, last_cobs)

        def gae_step(carry, t):
            adv_next, v_next = carry
            not_done = 1.0 - traj["done"][t].astype(jnp.float32)
            delta = (
                traj["reward"][t]
                + alg.gamma * v_next * not_done
                - traj["value"][t]
            )
            adv = delta + alg.gamma * alg.lam * not_done * adv_next
            return (adv, traj["value"][t]), adv

        _, advantages = jax.lax.scan(
            gae_step,
            (jnp.zeros_like(last_value), last_value),
            jnp.arange(T - 1, -1, -1),
        )
        advantages = advantages[::-1]
        returns = advantages + traj["value"]
        if not alg.normalize_advantage_per_mini_batch:
            advantages = (advantages - jnp.mean(advantages)) / (
                jnp.std(advantages) + 1e-8
            )

        # flatten batch
        def flat(x):
            return x.reshape((T * self.num_envs,) + x.shape[2:])

        batch = {
            "aobs": flat(traj["aobs"]),
            "cobs": flat(traj["cobs"]),
            "action": flat(traj["action"]),
            "logprob": flat(traj["logprob"]),
            "value": flat(traj["value"]),
            "advantage": flat(advantages),
            "return": flat(returns),
            "old_mean": flat(traj["old_mean"]),
            "old_std": flat(traj["old_std"]),
        }

        B = T * self.num_envs
        mb_size = B // alg.num_mini_batches

        def loss_fn(params, mb):
            lp, mean = self.ac.logprob(params, mb["aobs"], mb["action"])
            std = self.ac.std(params)
            ratio = jnp.exp(lp - mb["logprob"])
            adv = mb["advantage"]
            if alg.normalize_advantage_per_mini_batch:
                adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1 - alg.clip_param, 1 + alg.clip_param) * adv
            # rsl-rl formulates the surrogate as a loss over -advantages
            surrogate_loss = -jnp.mean(jnp.minimum(surr1, surr2))

            value = self.ac.value(params, mb["cobs"])
            if alg.use_clipped_value_loss:
                v_clipped = mb["value"] + jnp.clip(
                    value - mb["value"], -alg.clip_param, alg.clip_param
                )
                v_loss = jnp.maximum(
                    jnp.square(value - mb["return"]),
                    jnp.square(v_clipped - mb["return"]),
                ).mean()
            else:
                v_loss = jnp.mean(jnp.square(value - mb["return"]))

            entropy = self.ac.entropy(params)
            total = (
                surrogate_loss
                + alg.value_loss_coef * v_loss
                - alg.entropy_coef * entropy
            )
            # analytic Gaussian KL(old || new) for the adaptive LR schedule
            old_mean, old_std = mb["old_mean"], mb["old_std"]
            new_std = jnp.broadcast_to(std, mean.shape)
            kl = jnp.mean(
                jnp.sum(
                    jnp.log(new_std / old_std)
                    + (jnp.square(old_std) + jnp.square(old_mean - mean))
                    / (2.0 * jnp.square(new_std))
                    - 0.5,
                    axis=-1,
                )
            )
            aux = {
                "surrogate": surrogate_loss,
                "value_loss": v_loss,
                "entropy": entropy,
                "kl": kl,
            }
            return total, aux

        def minibatch_update(carry, mb_idx):
            ppo, perm = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, mb_idx * mb_size, mb_size)
            mb = {k: v[idx] for k, v in batch.items()}
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ppo.params, mb
            )
            # adaptive KL learning rate (rsl-rl rule, applied per minibatch)
            kl = aux["kl"]
            lr = ppo.lr
            if alg.schedule == "adaptive":
                lr = jnp.where(
                    kl > alg.desired_kl * 2.0, jnp.maximum(lr / 1.5, 1e-5), lr
                )
                lr = jnp.where(
                    (kl < alg.desired_kl / 2.0) & (kl > 0.0),
                    jnp.minimum(lr * 1.5, 1e-2),
                    lr,
                )
            inner = ppo.opt_state[1]
            inner = inner._replace(
                hyperparams={**inner.hyperparams, "learning_rate": lr}
            )
            opt_state = (ppo.opt_state[0], inner)
            updates, opt_state = self.tx.update(grads, opt_state, ppo.params)
            params = optax.apply_updates(ppo.params, updates)
            ppo = ppo.replace(params=params, opt_state=opt_state, lr=lr)
            return (ppo, perm), aux

        def epoch(carry, _):
            ppo = carry
            rng, k = jax.random.split(ppo.rng)
            ppo = ppo.replace(rng=rng)
            perm = jax.random.permutation(k, B)
            (ppo, _), auxes = jax.lax.scan(
                minibatch_update, (ppo, perm), jnp.arange(alg.num_mini_batches)
            )
            return ppo, auxes

        ppo, auxes = jax.lax.scan(
            epoch, ppo, None, length=alg.num_learning_epochs
        )

        metrics = {
            "loss/surrogate": jnp.mean(auxes["surrogate"]),
            "loss/value": jnp.mean(auxes["value_loss"]),
            "loss/entropy": jnp.mean(auxes["entropy"]),
            "train/kl": jnp.mean(auxes["kl"]),
            "train/lr": ppo.lr,
            "train/mean_reward": jnp.mean(traj["raw_reward"]),
            "train/mean_std": jnp.mean(self.ac.std(ppo.params)),
        }
        # episode logs: mean over steps (already masked means per step)
        for k, v in logs.items():
            metrics[k] = jnp.mean(v)
        return (ppo, env_state, obs), metrics
