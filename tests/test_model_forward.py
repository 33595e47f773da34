"""Model forward correctness.

Primary oracle: HuggingFace transformers (torch CPU) — a tiny Qwen2 model
with identical weights must produce matching logits. This replaces the
reference's llama.cpp logit-comparison harness
(/root/reference/scripts/compare_with_llama_cpp.py) with an equally
independent implementation.

Secondary: self-consistency — token-by-token cached decode must match
full-sequence prefill logits exactly.
"""

import numpy as np
import pytest

from fixtures import make_tiny_model
from llama_gguf_tpu.gguf.constants import GGMLType
from llama_gguf_tpu.engine.runner import ModelRunner
from llama_gguf_tpu.models.loader import load_model

CFG = dict(vocab=97, hidden=64, layers=2, heads=4, kv_heads=2, ffn=128, ctx=64)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    weights = make_tiny_model(path, arch="qwen2", **CFG, seed=7)
    params, cfg, gguf = load_model(path, mode="dequant")
    return path, weights, params, cfg


def hf_logits(weights, tokens):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=CFG["vocab"],
        hidden_size=CFG["hidden"],
        num_hidden_layers=CFG["layers"],
        num_attention_heads=CFG["heads"],
        num_key_value_heads=CFG["kv_heads"],
        intermediate_size=CFG["ffn"],
        max_position_embeddings=CFG["ctx"],
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    with torch.no_grad():
        model = Qwen2ForCausalLM(cfg)
        model.eval()
        sd = model.state_dict()

        def setw(hf_name, gguf_name):
            sd[hf_name].copy_(torch.from_numpy(weights[gguf_name]))

        setw("model.embed_tokens.weight", "token_embd.weight")
        for i in range(CFG["layers"]):
            setw(f"model.layers.{i}.self_attn.q_proj.weight", f"blk.{i}.attn_q.weight")
            setw(f"model.layers.{i}.self_attn.k_proj.weight", f"blk.{i}.attn_k.weight")
            setw(f"model.layers.{i}.self_attn.v_proj.weight", f"blk.{i}.attn_v.weight")
            setw(f"model.layers.{i}.self_attn.q_proj.bias", f"blk.{i}.attn_q.bias")
            setw(f"model.layers.{i}.self_attn.k_proj.bias", f"blk.{i}.attn_k.bias")
            setw(f"model.layers.{i}.self_attn.v_proj.bias", f"blk.{i}.attn_v.bias")
            setw(f"model.layers.{i}.self_attn.o_proj.weight", f"blk.{i}.attn_output.weight")
            setw(f"model.layers.{i}.input_layernorm.weight", f"blk.{i}.attn_norm.weight")
            setw(f"model.layers.{i}.post_attention_layernorm.weight", f"blk.{i}.ffn_norm.weight")
            setw(f"model.layers.{i}.mlp.gate_proj.weight", f"blk.{i}.ffn_gate.weight")
            setw(f"model.layers.{i}.mlp.up_proj.weight", f"blk.{i}.ffn_up.weight")
            setw(f"model.layers.{i}.mlp.down_proj.weight", f"blk.{i}.ffn_down.weight")
        setw("model.norm.weight", "output_norm.weight")
        setw("lm_head.weight", "output.weight")
        model.load_state_dict(sd)
        out = model(torch.tensor([tokens], dtype=torch.long))
        return out.logits[0].numpy()


def test_logits_match_transformers(tiny_model, rng):
    _, weights, params, cfg = tiny_model
    tokens = rng.integers(0, CFG["vocab"], size=12).tolist()

    want = hf_logits(weights, tokens)  # [T, V]

    runner = ModelRunner(params, cfg, max_batch=1, max_seq=CFG["ctx"])
    kv = runner.init_kv()
    import jax.numpy as jnp

    t = len(tokens)
    logits, _ = runner.step(
        jnp.asarray([tokens], dtype=jnp.int32),
        jnp.asarray([list(range(t))], dtype=jnp.int32),
        jnp.asarray([t], dtype=jnp.int32),
        kv,
    )
    got = np.asarray(logits[0])  # [T, V]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cached_decode_matches_prefill(tiny_model, rng):
    """Greedy invariance: prefill+decode_one must reproduce full-seq logits."""
    _, _, params, cfg = tiny_model
    tokens = rng.integers(0, CFG["vocab"], size=10).tolist()
    t = len(tokens)

    import jax.numpy as jnp

    runner = ModelRunner(params, cfg, max_batch=1, max_seq=CFG["ctx"])

    # full forward
    kv = runner.init_kv()
    full_logits, _ = runner.step(
        jnp.asarray([tokens], dtype=jnp.int32),
        jnp.asarray([list(range(t))], dtype=jnp.int32),
        jnp.asarray([t], dtype=jnp.int32),
        kv,
    )
    full_logits = np.asarray(full_logits[0])

    # prefill first 5, then decode the rest one at a time
    kv = runner.init_kv()
    logits5, kv, _ = runner.prefill(tokens[:5], kv)
    step_logits = [np.asarray(logits5)]
    for i in range(5, t):
        lg, kv = runner.decode_one(tokens[i], i, kv)
        step_logits.append(np.asarray(lg))

    for j, lg in enumerate(step_logits):
        np.testing.assert_allclose(
            lg, full_logits[4 + j], rtol=1e-5, atol=1e-5,
            err_msg=f"position {4 + j}",
        )


def test_quant_mode_close_to_dequant(tmp_path, rng):
    """Quantized weights (XLA fallback path) stay close to the f32 oracle."""
    path = str(tmp_path / "q.gguf")
    make_tiny_model(
        path, arch="qwen2", vocab=97, hidden=256, layers=2, heads=4,
        kv_heads=2, ffn=512, ctx=64, quant=GGMLType.Q4_K, seed=3,
    )
    pd, cfgd, _ = load_model(path, mode="dequant")
    pq, cfgq, _ = load_model(path, mode="quant")

    from llama_gguf_tpu.ops.linear import QuantLinear
    import jax

    leaves = jax.tree_util.tree_leaves(
        pq, is_leaf=lambda x: isinstance(x, QuantLinear)
    )
    assert any(isinstance(l, QuantLinear) for l in leaves), "no quant weights kept"

    tokens = rng.integers(0, 97, size=8).tolist()
    import jax.numpy as jnp

    outs = []
    for params, cfg in ((pd, cfgd), (pq, cfgq)):
        runner = ModelRunner(params, cfg, max_batch=1, max_seq=64)
        kv = runner.init_kv()
        logits, _ = runner.step(
            jnp.asarray([tokens], dtype=jnp.int32),
            jnp.asarray([list(range(len(tokens)))], dtype=jnp.int32),
            jnp.asarray([len(tokens)], dtype=jnp.int32),
            kv,
        )
        outs.append(np.asarray(logits[0]))
    # identical math, different execution order -> tight tolerance
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-4)


def test_batched_isolation(tiny_model, rng):
    """Sequences in different batch slots must not affect each other."""
    _, _, params, cfg = tiny_model
    import jax.numpy as jnp

    runner = ModelRunner(params, cfg, max_batch=2, max_seq=CFG["ctx"])
    toks_a = rng.integers(0, CFG["vocab"], size=6).tolist()
    toks_b = rng.integers(0, CFG["vocab"], size=9).tolist()

    # run A alone in slot 0
    kv = runner.init_kv()
    la, kv, _ = runner.prefill(toks_a, kv, batch_idx=0)
    la = np.asarray(la)

    # run A in slot 0 while B occupies slot 1
    kv = runner.init_kv()
    _, kv, _ = runner.prefill(toks_b, kv, batch_idx=1)
    la2, kv, _ = runner.prefill(toks_a, kv, batch_idx=0)
    np.testing.assert_allclose(np.asarray(la2), la, rtol=1e-6, atol=1e-6)


def test_quant_embedding_bitexact_gather(tmp_path, rng):
    """Untied quant-mode models keep the embedding table quantized in HBM;
    the in-graph row gather+dequant must reproduce the host dequantized
    table exactly (same integer levels x same scales)."""
    import os
    import tempfile

    import jax.numpy as jnp

    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.ops.linear import QuantEmbedding, embedding_lookup
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    path = str(tmp_path / "qe.gguf")
    build_synthetic_gguf(path, preset="tiny", quant=GGMLType.Q4_K)
    pq, cfg, _ = load_model(path, mode="quant")
    pd, _, _ = load_model(path, mode="dequant")
    assert isinstance(pq["embed"], QuantEmbedding)

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 5)),
                       jnp.int32)
    got = np.asarray(embedding_lookup(pq["embed"], toks))
    want = np.asarray(jnp.take(pd["embed"], toks, axis=0))
    np.testing.assert_array_equal(got, want)


def test_tied_quant_output_head(tmp_path, rng):
    """Tied-embedding models in quant mode: the output head is a
    QuantLinear built from the embed data (no dense f32 table resident)
    and logits stay close to the dequant oracle."""
    import jax

    from llama_gguf_tpu.ops.linear import QuantEmbedding, QuantLinear

    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    path = str(tmp_path / "tied.gguf")
    build_synthetic_gguf(path, preset="tiny-tied", quant=GGMLType.Q4_K)
    pd, cfgd, _ = load_model(path, mode="dequant")
    pq, cfgq, _ = load_model(path, mode="quant")
    assert pq.get("output") is not None
    assert isinstance(pq["output"], QuantLinear)

    tokens = rng.integers(0, cfgd.vocab_size, size=8).tolist()
    import jax.numpy as jnp

    outs = []
    for params, cfg in ((pd, cfgd), (pq, cfgq)):
        runner = ModelRunner(params, cfg, max_batch=1, max_seq=64)
        kv = runner.init_kv()
        logits, _ = runner.step(
            jnp.asarray([tokens], jnp.int32),
            jnp.asarray([list(range(len(tokens)))], jnp.int32),
            jnp.asarray([len(tokens)], jnp.int32), kv)
        outs.append(np.asarray(logits[0]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("preset",
                         ["tiny-moe", "tiny-qwen3next", "tiny-falconh1"])
def test_moe_hybrid_quant_close_to_dequant(tmp_path, rng, preset):
    """Quantized MoE expert stacks / DeltaNet projections / Falcon-H1
    parallel attn+mamba2 mixers (XLA fallback path on CPU) stay close to
    the f32 oracle for the synthetic presets."""
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    path = str(tmp_path / f"{preset}.gguf")
    build_synthetic_gguf(path, preset=preset, quant=GGMLType.Q4_K)
    pd, cfgd, _ = load_model(path, mode="dequant")
    pq, cfgq, _ = load_model(path, mode="quant")

    tokens = rng.integers(0, cfgd.vocab_size, size=8).tolist()
    import jax.numpy as jnp

    outs = []
    for params, cfg in ((pd, cfgd), (pq, cfgq)):
        runner = ModelRunner(params, cfg, max_batch=1, max_seq=64)
        kv = runner.init_kv()
        logits, _ = runner.step(
            jnp.asarray([tokens], jnp.int32),
            jnp.asarray([list(range(len(tokens)))], jnp.int32),
            jnp.asarray([len(tokens)], jnp.int32), kv)
        outs.append(np.asarray(logits[0]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-4)
