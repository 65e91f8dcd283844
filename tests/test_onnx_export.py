"""ONNX export: wire-format round-trip of the in-repo protobuf writer and
structural checks of the exported policy graph."""

import struct

import numpy as np
import jax
import jax.numpy as jnp

from mjlab_tpu.rl import onnx_proto as op
from mjlab_tpu.rl.config import (
    RslRlOnPolicyRunnerCfg,
    RslRlPpoActorCriticCfg,
    RslRlPpoAlgorithmCfg,
)
from mjlab_tpu.rl.exporter import export_policy_as_onnx
from mjlab_tpu.rl.ppo import ActorCritic, NormState


def _fields(data, num):
    return [v for f, w, v in op.parse_fields(data) if f == num]


def make_state(ac):
    params = ac.init_params(jax.random.PRNGKey(0))

    class S:
        pass

    s = S()
    s.params = params
    s.actor_norm = NormState(
        mean=jnp.arange(ac.actor_obs_dim, dtype=jnp.float32),
        var=jnp.ones((ac.actor_obs_dim,)) * 4.0,
        count=jnp.asarray(100.0),
    )
    return s


def _make_ac():
    cfg = RslRlOnPolicyRunnerCfg(
        policy=RslRlPpoActorCriticCfg(
            actor_hidden_dims=(8, 6),
            critic_hidden_dims=(8,),
            activation="elu",
            actor_obs_normalization=True,
        ),
        algorithm=RslRlPpoAlgorithmCfg(),
    )
    return ActorCritic(cfg, num_actions=3, actor_obs_dim=5, critic_obs_dim=5)


def test_export_roundtrip(tmp_path):
    ac = _make_ac()
    state = make_state(ac)
    path = tmp_path / "policy.onnx"
    export_policy_as_onnx(
        ac, state, str(path), metadata={"joint_names": ["a", "b"], "scale": 0.25}
    )
    data = path.read_bytes()

    # ModelProto: ir_version(1), graph(7), opset(8), metadata_props(14)
    top = op.parse_fields(data)
    ir = [v for f, w, v in top if f == 1]
    assert ir == [8]
    graphs = [v for f, w, v in top if f == 7]
    assert len(graphs) == 1
    metas = [v for f, w, v in top if f == 14]
    meta = {}
    for m in metas:
        kv = op.parse_fields(m)
        meta[kv[0][2].decode()] = kv[1][2].decode()
    assert meta["joint_names"] == "a,b"
    assert meta["scale"] == "0.25"

    g = op.parse_fields(graphs[0])
    nodes = [v for f, w, v in g if f == 1]
    inits = [v for f, w, v in g if f == 5]
    # Sub, Div, Gemm x3, Elu x2 = 7 nodes; mean/std + 3x(w,b) = 8 inits
    assert len(nodes) == 7
    assert len(inits) == 8

    op_types = []
    for n in nodes:
        for f, w, v in op.parse_fields(n):
            if f == 4:
                op_types.append(v.decode())
    assert op_types == ["Sub", "Div", "Gemm", "Elu", "Gemm", "Elu", "Gemm"]

    # check an initializer payload round-trips bit-exact
    for t in inits:
        tf = op.parse_fields(t)
        name = [v for f, w, v in tf if f == 8][0].decode()
        if name == "obs_mean":
            raw = [v for f, w, v in tf if f == 9][0]
            vals = np.frombuffer(raw, np.float32)
            np.testing.assert_array_equal(vals, np.arange(5, dtype=np.float32))


def test_exported_graph_matches_jax(tmp_path):
    """Execute the exported graph manually (host numpy interpretation of
    the node list) and compare against the jax policy."""
    ac = _make_ac()
    state = make_state(ac)
    path = tmp_path / "p.onnx"
    export_policy_as_onnx(ac, state, str(path))
    data = path.read_bytes()
    g = op.parse_fields([v for f, w, v in op.parse_fields(data) if f == 7][0])

    tensors = {}
    for t in [v for f, w, v in g if f == 5]:
        tf = op.parse_fields(t)
        name = [v for f, w, v in tf if f == 8][0].decode()
        dims = [v for f, w, v in tf if f == 1]
        shape = (
            list(np.frombuffer(dims[0], np.uint8))
            if False
            else None
        )
        raw = [v for f, w, v in tf if f == 9][0]
        arr = np.frombuffer(raw, np.float32)
        # decode packed varint dims
        dd = []
        for f, w, v in tf:
            if f == 1:
                i = 0
                while i < len(v):
                    x = 0
                    sh = 0
                    while True:
                        b = v[i]
                        i += 1
                        x |= (b & 0x7F) << sh
                        sh += 7
                        if not b & 0x80:
                            break
                    dd.append(x)
        tensors[name] = arr.reshape(dd)

    obs = np.linspace(-1, 1, 5).astype(np.float32)[None]
    x = obs
    for n in [v for f, w, v in g if f == 1]:
        nf = op.parse_fields(n)
        optype = [v for f, w, v in nf if f == 4][0].decode()
        ins = [v.decode() for f, w, v in nf if f == 1]
        outs = [v.decode() for f, w, v in nf if f == 2]
        get = lambda k: tensors[k] if k in tensors else x
        if optype == "Sub":
            x = get(ins[0]) - tensors[ins[1]]
        elif optype == "Div":
            x = x / tensors[ins[1]]
        elif optype == "Gemm":
            x = x @ tensors[ins[1]] + tensors[ins[2]]
        elif optype == "Elu":
            x = np.where(x > 0, x, np.expm1(x))
        tensors[outs[0]] = x

    from mjlab_tpu.rl.ppo import norm_apply

    ref = ac.act_mean(
        state.params, norm_apply(state.actor_norm, jnp.asarray(obs))
    )
    np.testing.assert_allclose(x, np.asarray(ref), atol=1e-5)
