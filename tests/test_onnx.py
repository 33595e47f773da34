"""ONNX loader tests: hand-encoded protobuf fixture (HF Optimum layout),
external-data support, and logit parity with the same weights via GGUF."""

import json
import os

import numpy as np
import pytest

from fixtures import make_tiny_model
from llama_gguf_tpu.engine.runner import ModelRunner
from llama_gguf_tpu.models.loader import load_model
from llama_gguf_tpu.onnx.loader import OnnxError, load_onnx_model, parse_onnx
from llama_gguf_tpu.onnx.wire import (
    field_bytes, field_str, field_varint, write_varint,
)


def _tensor_proto(name: str, arr: np.ndarray, external: str | None = None,
                  offset: int = 0) -> bytes:
    out = b""
    for d in arr.shape:
        out += field_varint(1, d)
    out += field_varint(2, 1)  # FLOAT
    out += field_str(8, name)
    if external is None:
        out += field_bytes(9, np.ascontiguousarray(arr, np.float32).tobytes())
    else:
        for k, v in (("location", external), ("offset", str(offset)),
                     ("length", str(arr.size * 4))):
            entry = field_str(1, k) + field_str(2, v)
            out += field_bytes(13, entry)
        out += field_varint(14, 1)  # EXTERNAL
    return out


def _node(op: str, name: str, inputs: list[str], outputs: list[str]) -> bytes:
    out = b""
    for i in inputs:
        out += field_str(1, i)
    for o in outputs:
        out += field_str(2, o)
    out += field_str(3, name)
    out += field_str(4, op)
    return out


def build_onnx_fixture(dir_path: str, gguf_weights: dict, cfg: dict,
                       external: bool = False) -> str:
    """Write model.onnx (+ optional model.onnx_data) + config.json whose
    weights equal a GGUF twin's (HF naming/layout)."""
    name_map = {
        "token_embd.weight": "model.embed_tokens.weight",
        "output_norm.weight": "model.norm.weight",
        "output.weight": "lm_head.weight",
    }
    for i in range(cfg["num_hidden_layers"]):
        g, h = f"blk.{i}", f"model.layers.{i}"
        name_map.update({
            f"{g}.attn_norm.weight": f"{h}.input_layernorm.weight",
            f"{g}.ffn_norm.weight": f"{h}.post_attention_layernorm.weight",
            f"{g}.attn_q.weight": f"{h}.self_attn.q_proj.weight",
            f"{g}.attn_q.bias": f"{h}.self_attn.q_proj.bias",
            f"{g}.attn_k.weight": f"{h}.self_attn.k_proj.weight",
            f"{g}.attn_k.bias": f"{h}.self_attn.k_proj.bias",
            f"{g}.attn_v.weight": f"{h}.self_attn.v_proj.weight",
            f"{g}.attn_v.bias": f"{h}.self_attn.v_proj.bias",
            f"{g}.attn_output.weight": f"{h}.self_attn.o_proj.weight",
            f"{g}.ffn_gate.weight": f"{h}.mlp.gate_proj.weight",
            f"{g}.ffn_up.weight": f"{h}.mlp.up_proj.weight",
            f"{g}.ffn_down.weight": f"{h}.mlp.down_proj.weight",
        })
    graph = b""
    ext_blob = b""
    for gname, hname in name_map.items():
        if gname not in gguf_weights:
            continue
        arr = np.asarray(gguf_weights[gname], np.float32)
        if external:
            graph += field_bytes(5, _tensor_proto(
                hname, arr, external="model.onnx_data", offset=len(ext_blob)))
            ext_blob += arr.tobytes()
        else:
            graph += field_bytes(5, _tensor_proto(hname, arr))
    graph += field_bytes(1, _node("MatMul", "/model/layers.0/dummy/MatMul",
                                  ["x"], ["y"]))
    model = field_varint(1, 8) + field_bytes(7, graph)  # ir_version + graph

    onnx_path = os.path.join(dir_path, "model.onnx")
    with open(onnx_path, "wb") as f:
        f.write(model)
    if external:
        with open(os.path.join(dir_path, "model.onnx_data"), "wb") as f:
            f.write(ext_blob)
    with open(os.path.join(dir_path, "config.json"), "w") as f:
        json.dump(cfg, f)
    return onnx_path


@pytest.fixture(scope="module")
def twin(tmp_path_factory):
    d = tmp_path_factory.mktemp("onnx")
    gguf_path = str(d / "twin.gguf")
    weights = make_tiny_model(gguf_path, arch="qwen2", vocab=128, hidden=64,
                              layers=2, heads=4, kv_heads=2, ffn=96, ctx=64,
                              seed=5)
    hf_cfg = {
        "architectures": ["Qwen2ForCausalLM"],
        "vocab_size": 128, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "intermediate_size": 96, "max_position_embeddings": 64,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "attention_bias": True, "tie_word_embeddings": False,
    }
    return str(d), gguf_path, weights, hf_cfg


def test_parse_and_parity_inline(twin, tmp_path):
    d, gguf_path, weights, hf_cfg = twin
    onnx_path = build_onnx_fixture(str(tmp_path), weights, hf_cfg)
    params, cfg = load_onnx_model(onnx_path)
    assert cfg.arch == "qwen2" and cfg.num_layers == 2

    gparams, gcfg, _ = load_model(gguf_path, mode="dequant")
    r1 = ModelRunner(params, cfg, max_batch=1, max_seq=32)
    r2 = ModelRunner(gparams, gcfg, max_batch=1, max_seq=32)
    ids = [3, 17, 42, 9]
    l1, _, _ = r1.prefill(ids, r1.init_kv())
    l2, _, _ = r2.prefill(ids, r2.init_kv())
    assert np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-4), \
        np.abs(np.asarray(l1) - np.asarray(l2)).max()


def test_external_data(twin, tmp_path):
    d, gguf_path, weights, hf_cfg = twin
    onnx_path = build_onnx_fixture(str(tmp_path), weights, hf_cfg,
                                   external=True)
    params, cfg = load_onnx_model(onnx_path)
    gparams, _, _ = load_model(gguf_path, mode="dequant")
    got = np.asarray(params["embed"])
    want = np.asarray(gparams["embed"])
    assert np.allclose(got, want)


def test_parse_onnx_nodes(twin, tmp_path):
    _, _, weights, hf_cfg = twin
    onnx_path = build_onnx_fixture(str(tmp_path), weights, hf_cfg)
    tensors, nodes = parse_onnx(onnx_path)
    assert any(n["op_type"] == "MatMul" for n in nodes)
    assert "model.embed_tokens.weight" in tensors


def test_missing_config_raises(tmp_path):
    p = tmp_path / "model.onnx"
    p.write_bytes(b"")
    with pytest.raises(OnnxError, match="config.json"):
        load_onnx_model(str(p))


def test_llama_onnx_matches_hf(tmp_path, rng):
    """ONNX path applies GGUF conventions (q/k permutation for NORMAL-rope
    archs) to raw HF weights: logits must match transformers directly."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(21)
    with torch.no_grad():
        model = LlamaForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    graph = b""
    for name, arr in sd.items():
        graph += field_bytes(5, _tensor_proto(name, arr))
    model_pb = field_varint(1, 8) + field_bytes(7, graph)
    onnx_path = os.path.join(str(tmp_path), "model.onnx")
    with open(onnx_path, "wb") as f:
        f.write(model_pb)
    with open(os.path.join(str(tmp_path), "config.json"), "w") as f:
        json.dump({
            "architectures": ["LlamaForCausalLM"], "vocab_size": 96,
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "intermediate_size": 96, "max_position_embeddings": 64,
            "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
            "tie_word_embeddings": False, "attention_bias": False,
        }, f)

    params, cfg = load_onnx_model(onnx_path)
    r = ModelRunner(params, cfg, max_batch=1, max_seq=64)
    kv = r.init_kv()
    tokens = rng.integers(0, 96, size=8).tolist()
    import jax.numpy as jnp

    logits, _ = r.step(jnp.asarray([tokens], jnp.int32),
                       jnp.asarray([list(range(8))], jnp.int32),
                       jnp.asarray([8], jnp.int32), kv)
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits[0]), want,
                               rtol=3e-4, atol=3e-4)


def test_opaque_matmul_name_recovery(tmp_path, twin):
    """Slash-style node names with onnx::MatMul_* initializers resolve to
    semantic weight names (Optimum export style)."""
    from llama_gguf_tpu.onnx.loader import OnnxModelLoader

    rng = np.random.default_rng(0)
    w_hf = rng.normal(size=(32, 64)).astype(np.float32)  # HF [out, in]
    graph = b""
    # opaque initializer holds the MatMul B operand = [in, out]
    graph += field_bytes(5, _tensor_proto("onnx::MatMul_123", w_hf.T))
    graph += field_bytes(1, _node(
        "MatMul", "/model/layers.0/self_attn/q_proj/MatMul",
        ["x", "onnx::MatMul_123"], ["y"]))
    tensors = {"onnx::MatMul_123": w_hf.T}
    from llama_gguf_tpu.onnx.loader import parse_onnx

    path = os.path.join(str(tmp_path), "m.onnx")
    with open(path, "wb") as f:
        f.write(field_varint(1, 8) + field_bytes(7, graph))
    tensors, nodes = parse_onnx(path)
    named = OnnxModelLoader._resolve_names(tensors, nodes)
    assert "layers.0.self_attn.q_proj.weight" in named
    np.testing.assert_allclose(named["layers.0.self_attn.q_proj.weight"],
                               w_hf)
