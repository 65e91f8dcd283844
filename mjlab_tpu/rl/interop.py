"""rsl-rl checkpoint interop: load torch OnPolicyRunner checkpoints into
the JAX PPO state.

The reference trains with rsl-rl and ships ``model_<it>.pt`` torch
checkpoints (actor/critic MLPs, log-std/std head, empirical obs
normalizers). This converter maps those tensors into our flax param tree
so pretrained reference policies (e.g. the GCS demo checkpoint,
/root/reference/src/mjlab/scripts/demo.py + gcs.py) run unchanged for
inference and policy-parity checks.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _mlp_params_from_sequential(state_dict: dict, prefix: str):
    """Collect (weight, bias) pairs of an rsl-rl MLP (torch Sequential
    with interleaved activations) in layer order."""
    layers = {}
    for key, tensor in state_dict.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):].lstrip(".")
        parts = rest.split(".")
        if len(parts) != 2 or parts[1] not in ("weight", "bias"):
            continue
        idx = int(parts[0])
        layers.setdefault(idx, {})[parts[1]] = np.asarray(tensor.cpu())
    out = []
    for idx in sorted(layers):
        lw = layers[idx]
        if "weight" in lw:
            out.append((lw["weight"], lw.get("bias")))
    return out


def _to_flax(layer_pairs) -> dict:
    """(W, b) list -> flax Dense param tree {'params': {'Dense_i': ...}}.
    torch Linear stores W as (out, in); flax kernels are (in, out)."""
    params = {}
    for i, (W, b) in enumerate(layer_pairs):
        params[f"Dense_{i}"] = {
            "kernel": jnp.asarray(W.T),
            "bias": jnp.asarray(b if b is not None else np.zeros(W.shape[0])),
        }
    return {"params": params}


def load_rslrl_checkpoint(path: str, runner) -> None:
    """Load an rsl-rl ``model_*.pt`` into runner.ppo_state (inference
    parity: actor, critic, noise std, obs normalizers)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload["model_state_dict"]

    actor = _to_flax(_mlp_params_from_sequential(sd, "actor"))
    critic = _to_flax(_mlp_params_from_sequential(sd, "critic"))

    params = dict(runner.ppo_state.params)
    params["actor"] = actor
    params["critic"] = critic
    if "std" in sd:
        std = np.asarray(sd["std"].cpu()).reshape(-1)
        if runner.cfg.policy.noise_std_type == "scalar":
            params["std"] = jnp.asarray(std)
        else:
            params["std"] = jnp.log(jnp.asarray(np.maximum(std, 1e-8)))
    elif "log_std" in sd:
        ls = np.asarray(sd["log_std"].cpu()).reshape(-1)
        if runner.cfg.policy.noise_std_type == "scalar":
            params["std"] = jnp.exp(jnp.asarray(ls))
        else:
            params["std"] = jnp.asarray(ls)

    state = runner.ppo_state.replace(params=params)

    # rsl-rl EmpiricalNormalization: obs_normalizer.{mean,var,count} or
    # running_mean_std style keys
    def load_norm(norm_state, prefixes):
        for p in prefixes:
            mean_k, var_k = f"{p}.mean", f"{p}.var"
            if mean_k in sd:
                count = sd.get(f"{p}.count")
                return norm_state.replace(
                    mean=jnp.asarray(np.asarray(sd[mean_k].cpu()).reshape(-1)),
                    var=jnp.asarray(np.asarray(sd[var_k].cpu()).reshape(-1)),
                    count=jnp.asarray(
                        float(np.asarray(count.cpu()).reshape(-1)[0])
                        if count is not None else 1e6
                    ),
                )
        return norm_state

    state = state.replace(
        actor_norm=load_norm(
            state.actor_norm,
            ("obs_normalizer", "actor_obs_normalizer", "empirical_normalization"),
        ),
        critic_norm=load_norm(
            state.critic_norm,
            ("critic_obs_normalizer", "privileged_obs_normalizer"),
        ),
    )

    # rsl-rl with empirical_normalization=True stores the normalizers as
    # separate top-level state dicts next to model_state_dict
    def load_norm_payload(norm_state, key):
        nd = payload.get(key)
        if not nd:
            return norm_state
        mean = nd.get("mean")
        var = nd.get("var")
        if mean is None or var is None:
            return norm_state
        count = nd.get("count")
        return norm_state.replace(
            mean=jnp.asarray(np.asarray(mean.cpu()).reshape(-1)),
            var=jnp.asarray(np.asarray(var.cpu()).reshape(-1)),
            count=jnp.asarray(
                float(np.asarray(count.cpu()).reshape(-1)[0])
                if count is not None else 1e6
            ),
        )

    state = state.replace(
        actor_norm=load_norm_payload(state.actor_norm, "obs_norm_state_dict"),
        critic_norm=load_norm_payload(
            state.critic_norm, "critic_obs_norm_state_dict"
        ),
    )
    runner.ppo_state = state
    runner.iteration = int(payload.get("iter", 0))
