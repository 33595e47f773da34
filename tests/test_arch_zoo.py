"""Architecture-zoo logit parity vs HuggingFace transformers oracles:
llama (NORMAL rope via the converter's q/k permutation) and gemma2
(NEOX rope, +1-offset norms, softcaps, post-norms, geglu, tied embeddings).

Mirrors the GGUF conversion conventions of llama.cpp's convert_hf_to_gguf:
llama q/k weights are permuted rotate-half -> interleaved; gemma norm
weights are stored with +1 added.
"""

import numpy as np
import pytest

from llama_gguf_tpu.engine.runner import ModelRunner
from llama_gguf_tpu.gguf.writer import GGUFWriter
from llama_gguf_tpu.models.loader import load_model


def permute_llama(w: np.ndarray, n_head: int) -> np.ndarray:
    """convert_hf_to_gguf permute: rotate-half pairing -> interleaved."""
    out_dim, in_dim = w.shape
    return (w.reshape(n_head, 2, out_dim // n_head // 2, in_dim)
            .swapaxes(1, 2).reshape(out_dim, in_dim))


def run_ours(path, tokens, ctx):
    import jax.numpy as jnp

    params, cfg, _ = load_model(path, mode="dequant")
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=ctx)
    kv = runner.init_kv()
    t = len(tokens)
    logits, _ = runner.step(
        jnp.asarray([tokens], jnp.int32),
        jnp.asarray([list(range(t))], jnp.int32),
        jnp.asarray([t], jnp.int32), kv)
    return np.asarray(logits[0])


# -- llama ----------------------------------------------------------------------

LLAMA = dict(vocab=96, hidden=64, layers=2, heads=4, kv_heads=2, ffn=96,
             ctx=64)


@pytest.fixture(scope="module")
def llama_pair(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    c = LLAMA
    hf_cfg = LlamaConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv_heads"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_bias=False, attention_dropout=0.0,
    )
    torch.manual_seed(3)
    with torch.no_grad():
        model = LlamaForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.25)  # keep activations tame
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("llama.embedding_length", c["hidden"])
    w.add_metadata("llama.block_count", c["layers"])
    w.add_metadata("llama.attention.head_count", c["heads"])
    w.add_metadata("llama.attention.head_count_kv", c["kv_heads"])
    w.add_metadata("llama.feed_forward_length", c["ffn"])
    w.add_metadata("llama.context_length", c["ctx"])
    w.add_metadata("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata("llama.rope.freq_base", 10000.0)
    w.add_metadata("llama.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", permute_llama(
            sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight", permute_llama(
            sd[f"{h}.self_attn.k_proj.weight"], c["kv_heads"]))
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("llama") / "llama.gguf")
    w.write_to_path(path)
    return path, model


def test_llama_logits_match_hf(llama_pair, rng):
    import torch

    path, model = llama_pair
    tokens = rng.integers(0, LLAMA["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, LLAMA["ctx"])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


# -- gemma2 ---------------------------------------------------------------------

G2 = dict(vocab=96, hidden=64, layers=2, heads=4, kv_heads=2, ffn=96, ctx=64,
          head_dim=16)


@pytest.fixture(scope="module")
def gemma2_pair(tmp_path_factory):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    c = G2
    hf_cfg = Gemma2Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv_heads"], intermediate_size=c["ffn"],
        head_dim=c["head_dim"], query_pre_attn_scalar=c["head_dim"],
        max_position_embeddings=c["ctx"], rms_norm_eps=1e-6,
        rope_theta=10000.0, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=c["ctx"] * 2,
        hidden_activation="gelu_pytorch_tanh", attention_bias=False,
        attention_dropout=0.0, tie_word_embeddings=True,
    )
    torch.manual_seed(5)
    with torch.no_grad():
        model = Gemma2ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.25)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    def norm_plus1(name):
        return sd[name] + 1.0  # converter convention: gemma norms stored +1

    w = GGUFWriter()
    w.add_metadata("general.architecture", "gemma2")
    w.add_metadata("gemma2.embedding_length", c["hidden"])
    w.add_metadata("gemma2.block_count", c["layers"])
    w.add_metadata("gemma2.attention.head_count", c["heads"])
    w.add_metadata("gemma2.attention.head_count_kv", c["kv_heads"])
    w.add_metadata("gemma2.attention.key_length", c["head_dim"])
    w.add_metadata("gemma2.attention.value_length", c["head_dim"])
    w.add_metadata("gemma2.feed_forward_length", c["ffn"])
    w.add_metadata("gemma2.context_length", c["ctx"])
    w.add_metadata("gemma2.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata("gemma2.rope.freq_base", 10000.0)
    w.add_metadata("gemma2.attn_logit_softcapping", 50.0)
    w.add_metadata("gemma2.final_logit_softcapping", 30.0)
    w.add_metadata("gemma2.attention.sliding_window", c["ctx"] * 2)
    w.add_metadata("gemma2.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        norm_plus1(f"{h}.input_layernorm.weight"))
        w.add_tensor_np(f"{p}.post_attention_norm.weight",
                        norm_plus1(f"{h}.post_attention_layernorm.weight"))
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        norm_plus1(f"{h}.pre_feedforward_layernorm.weight"))
        w.add_tensor_np(f"{p}.post_ffw_norm.weight",
                        norm_plus1(f"{h}.post_feedforward_layernorm.weight"))
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", norm_plus1("model.norm.weight"))
    # tied embeddings: no output.weight
    path = str(tmp_path_factory.mktemp("g2") / "gemma2.gguf")
    w.write_to_path(path)
    return path, model


def test_gemma2_logits_match_hf(gemma2_pair, rng):
    import torch

    path, model = gemma2_pair
    tokens = rng.integers(0, G2["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, G2["ctx"])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_gemma2_quirks_parsed(gemma2_pair):
    params, cfg, _ = load_model(gemma2_pair[0], mode="dequant")
    assert cfg.attn_logit_softcap == 50.0
    assert cfg.final_logit_softcap == 30.0
    assert cfg.embedding_scale == pytest.approx(8.0)  # sqrt(64)
    assert cfg.tie_word_embeddings
    assert "post_attn_norm" in params["layers"][0]
    assert "post_ffn_norm" in params["layers"][0]
