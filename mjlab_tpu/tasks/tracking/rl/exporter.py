"""Motion-embedded ONNX exporter for tracking policies
(reference src/mjlab/tasks/tracking/rl/exporter.py:29-81).

The exported graph takes (obs, time_step) and returns the action plus the
reference motion frame at that time step — the entire motion is baked into
the graph as initializers, gathered by a clamped int64 index. Deployment
needs no side files.
"""

from __future__ import annotations

import numpy as np

from mjlab_tpu.rl import onnx_proto as op
from mjlab_tpu.rl.exporter import _ACT_ONNX, _dense_layers, _to_meta_str

_MOTION_FIELDS = (
    ("joint_pos", "joint_pos"),
    ("joint_vel", "joint_vel"),
    ("body_pos_w", "body_pos_w"),
    ("body_quat_w", "body_quat_w"),
    ("body_lin_vel_w", "body_lin_vel_w"),
    ("body_ang_vel_w", "body_ang_vel_w"),
)


def export_motion_policy_as_onnx(
    env, actor_critic, ppo_state, path: str, metadata: dict | None = None
) -> None:
    cmd = env.command_manager.get_term("motion")
    motion = cmd.motion

    layers = _dense_layers(ppo_state.params["actor"])
    obs_dim = layers[0][0].shape[0]
    act_name, act_attrs = _ACT_ONNX[actor_critic.cfg.policy.activation]

    nodes = []
    inits = []
    cur = "obs"
    if actor_critic.cfg.policy.actor_obs_normalization:
        mean = np.asarray(ppo_state.actor_norm.mean)
        std = np.sqrt(np.asarray(ppo_state.actor_norm.var) + 1e-8)
        inits += [op.tensor("obs_mean", mean), op.tensor("obs_std", std)]
        nodes.append(op.Node("Sub", [cur, "obs_mean"], ["obs_centered"]))
        nodes.append(op.Node("Div", ["obs_centered", "obs_std"], ["obs_norm"]))
        cur = "obs_norm"

    n = len(layers)
    for i, (kernel, bias) in enumerate(layers):
        inits += [op.tensor(f"w{i}", kernel), op.tensor(f"b{i}", bias)]
        gemm_out = "actions" if i == n - 1 else f"z{i}"
        nodes.append(
            op.Node(
                "Gemm",
                [cur, f"w{i}", f"b{i}"],
                [gemm_out],
                attrs={"alpha": 1.0, "beta": 1.0, "transB": 0},
            )
        )
        if i < n - 1:
            nodes.append(op.Node(act_name, [gemm_out], [f"h{i}"], attrs=act_attrs))
            cur = f"h{i}"

    # motion lookup: cast float time_step -> int64, clamp, gather, squeeze
    T = int(np.asarray(getattr(motion, "joint_pos")).shape[0])
    nodes.append(op.Node("Cast", ["time_step"], ["ts_i64"], attrs={"to": 7}))
    inits.append(op.tensor("ts_max", np.asarray([T - 1], np.int64)))
    nodes.append(op.Node("Min", ["ts_i64", "ts_max"], ["ts_clamped"]))
    nodes.append(op.Node("Squeeze", ["ts_clamped"], ["ts"], attrs={"axes": [1]}))

    outputs = [op.value_info("actions", ["batch", layers[-1][0].shape[1]])]
    for out_name, attr in _MOTION_FIELDS:
        arr = np.asarray(getattr(motion, attr))
        inits.append(op.tensor(f"motion_{attr}", arr))
        nodes.append(
            op.Node(
                "Gather",
                [f"motion_{attr}", "ts"],
                [out_name],
                attrs={"axis": 0},
            )
        )
        outputs.append(
            op.value_info(out_name, ["batch"] + list(arr.shape[1:]))
        )

    g = op.graph(
        nodes,
        name="motion_policy",
        inputs=[
            op.value_info("obs", ["batch", obs_dim]),
            op.value_info("time_step", ["batch", 1]),
        ],
        outputs=outputs,
        initializers=inits,
    )
    meta = {k: _to_meta_str(v) for k, v in (metadata or {}).items()}
    with open(path, "wb") as f:
        f.write(op.model(g, metadata=meta))
