"""Deployment ONNX export of trained policies
(reference src/mjlab/utils/lab_api/rl/exporter.py + rl/exporter_utils.py).

Builds the inference graph — empirical obs normalizer fused in front of the
actor MLP — directly from the flax params via the in-repo ONNX protobuf
writer (rl/onnx_proto.py), with the reference's metadata keys attached as
metadata_props.
"""

from __future__ import annotations

import numpy as np

from mjlab_tpu.rl import onnx_proto as op

_ACT_ONNX = {
    "elu": ("Elu", {"alpha": 1.0}),
    "relu": ("Relu", {}),
    "tanh": ("Tanh", {}),
    "sigmoid": ("Sigmoid", {}),
}


def _dense_layers(flax_params) -> list[tuple[np.ndarray, np.ndarray]]:
    layers = flax_params["params"]
    out = []
    for i in range(len(layers)):
        lyr = layers[f"Dense_{i}"]
        out.append((np.asarray(lyr["kernel"]), np.asarray(lyr["bias"])))
    return out


def export_policy_as_onnx(
    actor_critic,
    ppo_state,
    path: str,
    metadata: dict | None = None,
) -> None:
    """Write <path> with graph: obs -> (obs-mean)/std -> actor MLP -> action."""
    layers = _dense_layers(ppo_state.params["actor"])
    obs_dim = layers[0][0].shape[0]
    act_name, act_attrs = _ACT_ONNX[actor_critic.cfg.policy.activation]

    nodes = []
    inits = []
    cur = "obs"
    if actor_critic.cfg.policy.actor_obs_normalization:
        mean = np.asarray(ppo_state.actor_norm.mean)
        std = np.sqrt(np.asarray(ppo_state.actor_norm.var) + 1e-8)
        inits.append(op.tensor("obs_mean", mean))
        inits.append(op.tensor("obs_std", std))
        nodes.append(op.Node("Sub", [cur, "obs_mean"], ["obs_centered"]))
        nodes.append(op.Node("Div", ["obs_centered", "obs_std"], ["obs_norm"]))
        cur = "obs_norm"

    n = len(layers)
    for i, (kernel, bias) in enumerate(layers):
        wname, bname = f"w{i}", f"b{i}"
        inits.append(op.tensor(wname, kernel))
        inits.append(op.tensor(bname, bias))
        out = "action" if i == n - 1 else f"h{i}"
        gemm_out = out if i == n - 1 else f"z{i}"
        nodes.append(
            op.Node(
                "Gemm",
                [cur, wname, bname],
                [gemm_out],
                attrs={"alpha": 1.0, "beta": 1.0, "transB": 0},
            )
        )
        if i < n - 1:
            nodes.append(op.Node(act_name, [gemm_out], [out], attrs=act_attrs))
        cur = out

    g = op.graph(
        nodes,
        name="policy",
        inputs=[op.value_info("obs", ["batch", obs_dim])],
        outputs=[op.value_info("action", ["batch", layers[-1][0].shape[1]])],
        initializers=inits,
    )
    meta = {k: _to_meta_str(v) for k, v in (metadata or {}).items()}
    data = op.model(g, metadata=meta)
    with open(path, "wb") as f:
        f.write(data)


def _to_meta_str(v) -> str:
    if isinstance(v, (list, tuple)):
        return ",".join(str(x) for x in v)
    return str(v)


def get_base_metadata(env, run_path: str = "") -> dict:
    """Deployment metadata (reference rl/exporter_utils.py:23-64): joint
    names/gains/defaults in the robot's natural joint order + obs/command
    wiring and action scale."""
    robot = env.scene["robot"]
    mj = env.mj_model
    joint_name_to_ctrl = {}
    for a in range(mj.nu):
        import mujoco

        jid = mj.actuator_trnid[a, 0]
        jname = mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_JOINT, jid) or ""
        joint_name_to_ctrl[jname.split("/")[-1]] = a

    ctrl_ids = [
        joint_name_to_ctrl[j]
        for j in robot.joint_names
        if j in joint_name_to_ctrl
    ]
    stiffness = mj.actuator_gainprm[ctrl_ids, 0]
    damping = -mj.actuator_biasprm[ctrl_ids, 2]
    action_term = env.action_manager.get_term("joint_pos")
    scale = np.asarray(action_term.scale)
    if scale.ndim > 1:
        scale = scale[0]
    return {
        "run_path": run_path,
        "joint_names": list(robot.joint_names),
        "joint_stiffness": stiffness.tolist(),
        "joint_damping": damping.tolist(),
        "default_joint_pos": np.asarray(robot.data.default_joint_pos[0]).tolist(),
        "command_names": list(env.command_manager.active_terms),
        "observation_names": list(
            env.observation_manager.active_terms["policy"]
        ),
        "action_scale": scale.tolist() if scale.ndim else float(scale),
    }
