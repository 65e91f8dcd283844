"""Learned MLP actuator (reference src/mjlab/actuator/learned_actuator.py).

The trained network (a per-joint MLP over position-error/velocity history)
is loaded from a TorchScript file at build time; its linear-layer weights
are extracted ONCE on the host and baked into the jitted compute as jnp
constants — no torch in the hot path. History buffers live in the actuator
state (E, H, J), updated at physics rate like the reference
(learned_actuator.py:158-163); outputs are scaled and clipped by the DC
motor torque-speed envelope of the parent class.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.actuator.actuator import ActuatorCmd
from mjlab_tpu.actuator.dc import DcMotorActuator, DcMotorActuatorCfg
from mjlab_tpu.utils.struct import pytree

_ACT = {
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "softsign": jax.nn.soft_sign,
    "sigmoid": jax.nn.sigmoid,
}


def load_torchscript_mlp(path: str) -> tuple[list[tuple[np.ndarray, np.ndarray]], str]:
    """Extract (weight, bias) pairs + activation name from a TorchScript MLP."""
    import torch

    net = torch.jit.load(path, map_location="cpu")
    net.eval()
    layers = []
    params = dict(net.named_parameters())
    # group 'xxx.N.weight'/'xxx.N.bias' pairs in order of appearance
    weight_keys = [k for k in params if k.endswith("weight")]
    for wk in weight_keys:
        bk = wk[: -len("weight")] + "bias"
        w = params[wk].detach().numpy()
        b = (
            params[bk].detach().numpy()
            if bk in params
            else np.zeros(w.shape[0], np.float32)
        )
        layers.append((w, b))
    # activation from the graph text (best effort; default elu)
    act = "elu"
    try:
        g = str(net.inlined_graph)
        for name in ("elu", "relu", "tanh", "softsign", "sigmoid"):
            if name in g:
                act = name
                break
    except Exception:
        pass
    return layers, act


@pytree
class LearnedMlpState:
    pd: object  # PdState of the DC parent (gains unused but DR-compatible)
    pos_err_hist: jax.Array  # (E, H, J) most-recent-first
    vel_hist: jax.Array  # (E, H, J)


@dataclass(kw_only=True)
class LearnedMlpActuatorCfg(DcMotorActuatorCfg):
    network_file: str = ""
    pos_scale: float = 1.0
    vel_scale: float = 1.0
    torque_scale: float = 1.0
    input_order: Literal["pos_vel", "vel_pos"] = "pos_vel"
    history_length: int = 3
    activation: str | None = None  # None: infer from the TorchScript graph
    stiffness: float = 0.0
    damping: float = 0.0

    def build(self, entity, joint_ids, joint_names):
        return LearnedMlpActuator(self, entity, joint_ids, joint_names)


class LearnedMlpActuator(DcMotorActuator):
    cfg: LearnedMlpActuatorCfg

    def __init__(self, cfg, entity, joint_ids, joint_names):
        super().__init__(cfg, entity, joint_ids, joint_names)
        layers, act = load_torchscript_mlp(cfg.network_file)
        self._layers = layers
        self._act = _ACT[cfg.activation or act]
        exp_in = 2 * cfg.history_length
        if layers[0][0].shape[1] != exp_in:
            raise ValueError(
                f"network expects input dim {layers[0][0].shape[1]}, actuator "
                f"provides {exp_in} (2 x history_length)"
            )

    def initialize(self, num_envs: int, rng):
        pd = super().initialize(num_envs, rng)
        J = len(self.joint_names)
        H = self.cfg.history_length
        z = jnp.zeros((num_envs, H, J), jnp.float32)
        return LearnedMlpState(pd=pd, pos_err_hist=z, vel_hist=z)

    def reset(self, state: LearnedMlpState, mask, rng):
        m = mask[:, None, None]
        return state.replace(
            pos_err_hist=jnp.where(m, 0.0, state.pos_err_hist),
            vel_hist=jnp.where(m, 0.0, state.vel_hist),
        )

    def compute(self, state: LearnedMlpState, cmd: ActuatorCmd):
        pos_err = cmd.position_target - cmd.joint_pos  # (E, J)
        # push newest frame to slot 0 (LIFO lag indexing like the
        # reference CircularBuffer.__getitem__)
        peh = jnp.concatenate(
            [pos_err[:, None], state.pos_err_hist[:, :-1]], axis=1
        )
        vh = jnp.concatenate(
            [cmd.joint_vel[:, None], state.vel_hist[:, :-1]], axis=1
        )

        E, H, J = peh.shape
        # (E, J, H) -> (E*J, H)
        pos_flat = peh.transpose(0, 2, 1).reshape(E * J, H)
        vel_flat = vh.transpose(0, 2, 1).reshape(E * J, H)
        if self.cfg.input_order == "pos_vel":
            x = jnp.concatenate(
                [pos_flat * self.cfg.pos_scale, vel_flat * self.cfg.vel_scale], 1
            )
        else:
            x = jnp.concatenate(
                [vel_flat * self.cfg.vel_scale, pos_flat * self.cfg.pos_scale], 1
            )
        for i, (w, b) in enumerate(self._layers):
            x = x @ jnp.asarray(w).T + jnp.asarray(b)
            if i < len(self._layers) - 1:
                x = self._act(x)
        tau = x.reshape(E, J) * self.cfg.torque_scale

        # DC motor torque-speed clip (parent semantics)
        sat = self.cfg.saturation_effort
        vmax = max(self.cfg.velocity_limit, 1e-9)
        ratio = cmd.joint_vel / vmax
        tau_max = jnp.clip(
            sat * (1.0 - ratio), -state.pd.effort_limit, state.pd.effort_limit
        )
        tau_min = jnp.clip(
            sat * (-1.0 - ratio), -state.pd.effort_limit, state.pd.effort_limit
        )
        tau = jnp.clip(tau, tau_min, tau_max)
        return state.replace(pos_err_hist=peh, vel_hist=vh), tau
