"""Observation manager: per-group term pipeline
func -> noise -> clip -> scale -> delay -> history -> concat
(reference src/mjlab/managers/observation_manager.py:16-307).

Delay/history buffer states are pytrees inside the env state; term shapes
are inferred by one eager dry-run at initialization (the reference does the
same). The whole compute runs inside the jitted env step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, _cfg_items
from mjlab_tpu.managers.manager_term_config import (
    ObservationGroupCfg,
    ObservationTermCfg,
)
from mjlab_tpu.utils.buffers import (
    circular_buffer_append,
    circular_buffer_init,
    circular_buffer_reset,
    circular_buffer_window,
    delay_buffer_init,
    delay_buffer_push,
    delay_buffer_reset,
)
from mjlab_tpu.utils.noise import (
    NoiseCfg,
    NoiseModelCfg,
    NoiseModelWithAdditiveBiasCfg,
    sample_bias,
)


class ObservationManager(ManagerBase):
    def _prepare_terms(self) -> None:
        self._groups: dict[str, ObservationGroupCfg] = {}
        self._group_terms: dict[str, dict[str, ObservationTermCfg]] = {}
        for gname, gcfg in _cfg_items(self.cfg):
            if not isinstance(gcfg, ObservationGroupCfg):
                continue
            self._groups[gname] = gcfg
            terms = {}
            for tname, tcfg in gcfg.term_items():
                self._resolve_common_term_cfg(f"{gname}/{tname}", tcfg)
                terms[tname] = tcfg
            self._group_terms[gname] = terms

    @property
    def active_terms(self) -> dict[str, list[str]]:
        return {g: list(ts) for g, ts in self._group_terms.items()}

    def group_obs_dim(self, group: str):
        return self._dims[group]

    def _history_len(self, gcfg, tcfg) -> int:
        if gcfg.history_length is not None:
            return gcfg.history_length
        return tcfg.history_length

    def _flatten_history(self, gcfg, tcfg) -> bool:
        """Group history_length, when set, REPLACES the term's history
        settings including flatten_history_dim (reference
        observation_manager.py:254-256); otherwise the term's flag rules."""
        if gcfg.history_length is not None:
            return gcfg.flatten_history_dim
        return tcfg.flatten_history_dim

    def init_state(self, num_envs: int, rng) -> dict:
        """Dry-run every term to size delay/history buffers. Must be called
        with a concrete (non-traced) ctx."""
        state: dict = {}
        self._dims: dict[str, int] = {}
        for gname, gcfg in self._groups.items():
            gstate: dict = {}
            dim = 0
            for tname, tcfg in self._group_terms[gname].items():
                val = tcfg.func(self._env, **tcfg.params)
                shape = val.shape[1:]
                tstate: dict = {}
                if tcfg.delay_max_lag > 0:
                    rng, k = jax.random.split(rng)
                    tstate["delay"] = delay_buffer_init(
                        max_lag=tcfg.delay_max_lag,
                        batch=num_envs,
                        shape=shape,
                        min_lag=tcfg.delay_min_lag,
                        update_period=tcfg.delay_update_period,
                        hold_prob=tcfg.delay_hold_prob,
                        per_env_phase=tcfg.delay_per_env_phase,
                        rng=k,
                    )
                hist = self._history_len(gcfg, tcfg)
                if hist > 0:
                    tstate["hist"] = circular_buffer_init(
                        hist, num_envs, shape
                    )
                if isinstance(tcfg.noise, NoiseModelWithAdditiveBiasCfg):
                    rng, k = jax.random.split(rng)
                    tstate["bias"] = sample_bias(
                        tcfg.noise, k, (num_envs,) + shape, val.dtype
                    )
                gstate[tname] = tstate
                tdim = int(val.reshape(val.shape[0], -1).shape[-1])
                if hist > 0 and self._flatten_history(gcfg, tcfg):
                    tdim *= hist
                dim += tdim
            state[gname] = gstate
            self._dims[gname] = dim
        return state

    def compute(self, update_history: bool = True) -> dict:
        ctx = self._env.ctx
        obs = {}
        for gname, gcfg in self._groups.items():
            gstate = dict(ctx.obs_state[gname])
            outs = {}
            for tname, tcfg in self._group_terms[gname].items():
                tstate = dict(gstate[tname])
                val = tcfg.func(self._env, **tcfg.params)
                # noise
                if gcfg.enable_corruption and tcfg.noise is not None:
                    if isinstance(tcfg.noise, NoiseModelWithAdditiveBiasCfg):
                        if tcfg.noise.noise_cfg is not None:
                            val = tcfg.noise.noise_cfg.apply(ctx.next_key(), val)
                        val = val + tstate["bias"]
                    elif isinstance(tcfg.noise, NoiseModelCfg):
                        if tcfg.noise.noise_cfg is not None:
                            val = tcfg.noise.noise_cfg.apply(ctx.next_key(), val)
                    elif isinstance(tcfg.noise, NoiseCfg):
                        val = tcfg.noise.apply(ctx.next_key(), val)
                # clip
                if tcfg.clip is not None:
                    val = jnp.clip(val, tcfg.clip[0], tcfg.clip[1])
                # scale
                if tcfg.scale is not None:
                    val = val * jnp.asarray(tcfg.scale, val.dtype)
                # delay
                if "delay" in tstate:
                    if update_history:
                        tstate["delay"], val = delay_buffer_push(
                            tstate["delay"], val, ctx.next_key()
                        )
                    else:
                        from mjlab_tpu.utils.buffers import circular_buffer_get

                        val = circular_buffer_get(
                            tstate["delay"].hist, tstate["delay"].lag
                        )
                # history
                if "hist" in tstate:
                    if update_history:
                        tstate["hist"] = circular_buffer_append(
                            tstate["hist"], val
                        )
                    win = circular_buffer_window(tstate["hist"])  # (E,T,...)
                    if self._flatten_history(gcfg, tcfg):
                        val = win.reshape(win.shape[0], -1)
                    else:
                        val = win
                outs[tname] = val
                gstate[tname] = tstate
            ctx.obs_state[gname] = gstate
            if gcfg.concatenate_terms:
                # concatenate raw term outputs (reference
                # observation_manager.py:204-208 torch.cat on the
                # configured dim): unflattened-history terms keep their
                # (E, T, ...) window shape in the concatenated group
                obs[gname] = jnp.concatenate(
                    list(outs.values()), axis=gcfg.concatenate_dim
                )
            else:
                obs[gname] = outs
        return obs

    def reset(self, env_mask, ctx=None) -> dict:
        ctx = self._env.ctx
        for gname in self._groups:
            gstate = dict(ctx.obs_state[gname])
            for tname, tcfg in self._group_terms[gname].items():
                tstate = dict(gstate[tname])
                if "delay" in tstate:
                    tstate["delay"] = delay_buffer_reset(
                        tstate["delay"], env_mask, ctx.next_key()
                    )
                if "hist" in tstate:
                    tstate["hist"] = circular_buffer_reset(
                        tstate["hist"], env_mask
                    )
                if "bias" in tstate and isinstance(
                    tcfg.noise, NoiseModelWithAdditiveBiasCfg
                ):
                    new_bias = sample_bias(
                        tcfg.noise,
                        ctx.next_key(),
                        tstate["bias"].shape,
                        tstate["bias"].dtype,
                    )
                    m = env_mask.reshape(
                        (-1,) + (1,) * (tstate["bias"].ndim - 1)
                    )
                    tstate["bias"] = jnp.where(m, new_bias, tstate["bias"])
                gstate[tname] = tstate
            ctx.obs_state[gname] = gstate
        return {}
