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
        final_logit_softcapping=30.0, sliding_window=8,
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
    w.add_metadata("gemma2.attention.sliding_window", 8)
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
    # 20 tokens > the 8-token window: layer 0 (sliding) and layer 1
    # (global) must mask differently for parity to hold
    tokens = rng.integers(0, G2["vocab"], size=20).tolist()
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


# -- mixtral (MoE) ----------------------------------------------------------------

MX = dict(vocab=96, hidden=64, layers=2, heads=4, kv_heads=2, ffn=96, ctx=64,
          experts=4, topk=2)


@pytest.fixture(scope="module")
def mixtral_pair(tmp_path_factory):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    c = MX
    hf_cfg = MixtralConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv_heads"], intermediate_size=c["ffn"],
        num_local_experts=c["experts"], num_experts_per_tok=c["topk"],
        max_position_embeddings=c["ctx"], rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_dropout=0.0, router_jitter_noise=0.0,
    )
    torch.manual_seed(11)
    with torch.no_grad():
        model = MixtralForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.25)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    w.add_metadata("general.architecture", "llama")  # mixtral converts as llama
    w.add_metadata("llama.embedding_length", c["hidden"])
    w.add_metadata("llama.block_count", c["layers"])
    w.add_metadata("llama.attention.head_count", c["heads"])
    w.add_metadata("llama.attention.head_count_kv", c["kv_heads"])
    w.add_metadata("llama.feed_forward_length", c["ffn"])
    w.add_metadata("llama.context_length", c["ctx"])
    w.add_metadata("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata("llama.rope.freq_base", 10000.0)
    w.add_metadata("llama.expert_count", c["experts"])
    w.add_metadata("llama.expert_used_count", c["topk"])
    # NO expert_weights_norm key on purpose: real Mixtral GGUFs don't carry
    # it (arch="llama" + experts>0); renorm must come from the arch default
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
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                        sd[f"{h}.block_sparse_moe.gate.weight"])
        gate = np.stack([sd[f"{h}.block_sparse_moe.experts.{e}.w1.weight"]
                         for e in range(c["experts"])])
        up = np.stack([sd[f"{h}.block_sparse_moe.experts.{e}.w3.weight"]
                       for e in range(c["experts"])])
        down = np.stack([sd[f"{h}.block_sparse_moe.experts.{e}.w2.weight"]
                         for e in range(c["experts"])])
        w.add_tensor_np(f"{p}.ffn_gate_exps.weight", gate)
        w.add_tensor_np(f"{p}.ffn_up_exps.weight", up)
        w.add_tensor_np(f"{p}.ffn_down_exps.weight", down)
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("mx") / "mixtral.gguf")
    w.write_to_path(path)
    return path, model


def test_mixtral_moe_logits_match_hf(mixtral_pair, rng):
    import torch

    path, model = mixtral_pair
    tokens = rng.integers(0, MX["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, MX["ctx"])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_mixtral_config_parsed(mixtral_pair):
    _, cfg, _ = load_model(mixtral_pair[0], mode="dequant")
    assert cfg.num_experts == MX["experts"]
    assert cfg.num_experts_per_token == MX["topk"]
    assert cfg.expert_weights_norm


# -- qwen3next (hybrid DeltaNet + gated attention) ----------------------------------

QN = dict(vocab=96, hidden=64, layers=4, heads=4, kv_heads=2, head_dim=16,
          ffn=96, ctx=64, hv=4, hk=2, dk=16, dv=16, conv=4)


@pytest.fixture(scope="module")
def qwen3next_pair(tmp_path_factory):
    import torch
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    c = QN
    hf_cfg = Qwen3NextConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv_heads"], head_dim=c["head_dim"],
        intermediate_size=c["ffn"], max_position_embeddings=c["ctx"],
        linear_num_value_heads=c["hv"], linear_num_key_heads=c["hk"],
        linear_key_head_dim=c["dk"], linear_value_head_dim=c["dv"],
        linear_conv_kernel_dim=c["conv"], rms_norm_eps=1e-6,
        rope_theta=10000.0, partial_rotary_factor=0.25,
        tie_word_embeddings=False, num_experts=0, attention_dropout=0.0,
        layer_types=["linear_attention"] * 3 + ["full_attention"],
    )
    torch.manual_seed(13)
    with torch.no_grad():
        model = Qwen3NextForCausalLM(hf_cfg)
        model.eval()
        for name, p in model.named_parameters():
            if "norm" in name:  # zero-init (1+w) norms: randomize for power
                p.uniform_(-0.3, 0.3)
            else:
                p.mul_(0.5)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    # Qwen3NextRMSNorm computes (1 + w) * x_hat with zero-init w; the GGUF
    # convention stores w+1 (gemma-style). The gated deltanet norm is plain.
    def p1(name):
        return sd[name] + 1.0

    rep = c["hv"] // c["hk"]
    w = GGUFWriter()
    a = "qwen3next"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", c["kv_heads"])
    w.add_metadata(f"{a}.attention.key_length", c["head_dim"])
    w.add_metadata(f"{a}.attention.value_length", c["head_dim"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.rope.dimension_count", c["head_dim"] // 4)
    w.add_metadata(f"{a}.ssm.inner_size", c["hv"] * c["dv"])
    w.add_metadata(f"{a}.ssm.state_size", c["dk"])
    w.add_metadata(f"{a}.ssm.group_count", c["hk"])
    w.add_metadata(f"{a}.ssm.time_step_rank", c["hv"])
    w.add_metadata(f"{a}.ssm.conv_kernel", c["conv"])
    w.add_metadata(f"{a}.vocab_size", c["vocab"])

    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        p1(f"{h}.input_layernorm.weight"))
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        p1(f"{h}.post_attention_layernorm.weight"))
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
        if f"{h}.linear_attn.in_proj_qkvz.weight" in sd:
            # de-interleave per k-head: [q dk | k dk | v r*dv | z r*dv]
            qkvz = sd[f"{h}.linear_attn.in_proj_qkvz.weight"]
            grp = qkvz.reshape(c["hk"],
                               2 * c["dk"] + 2 * rep * c["dv"], c["hidden"])
            q = grp[:, :c["dk"]].reshape(-1, c["hidden"])
            k = grp[:, c["dk"]:2 * c["dk"]].reshape(-1, c["hidden"])
            v = grp[:, 2 * c["dk"]:2 * c["dk"] + rep * c["dv"]].reshape(
                -1, c["hidden"])
            z = grp[:, 2 * c["dk"] + rep * c["dv"]:].reshape(-1, c["hidden"])
            w.add_tensor_np(f"{p}.ssm_in.weight",
                            np.concatenate([q, k, v], 0))
            w.add_tensor_np(f"{p}.attn_gate.weight", z)
            w.add_tensor_np(f"{p}.ssm_ba.weight",
                            sd[f"{h}.linear_attn.in_proj_ba.weight"])
            w.add_tensor_np(f"{p}.ssm_conv1d.weight",
                            sd[f"{h}.linear_attn.conv1d.weight"][:, 0, :])
            w.add_tensor_np(f"{p}.ssm_dt.bias",
                            sd[f"{h}.linear_attn.dt_bias"])
            w.add_tensor_np(f"{p}.ssm_a",
                            -np.exp(sd[f"{h}.linear_attn.A_log"]))
            w.add_tensor_np(f"{p}.ssm_norm.weight",
                            sd[f"{h}.linear_attn.norm.weight"])
            w.add_tensor_np(f"{p}.ssm_out.weight",
                            sd[f"{h}.linear_attn.out_proj.weight"])
        else:
            # full attention: split q/gate per head
            qg = sd[f"{h}.self_attn.q_proj.weight"].reshape(
                c["heads"], 2, c["head_dim"], c["hidden"])
            w.add_tensor_np(f"{p}.attn_q.weight",
                            qg[:, 0].reshape(-1, c["hidden"]))
            w.add_tensor_np(f"{p}.attn_gate.weight",
                            qg[:, 1].reshape(-1, c["hidden"]))
            w.add_tensor_np(f"{p}.attn_k.weight",
                            sd[f"{h}.self_attn.k_proj.weight"])
            w.add_tensor_np(f"{p}.attn_v.weight",
                            sd[f"{h}.self_attn.v_proj.weight"])
            w.add_tensor_np(f"{p}.attn_output.weight",
                            sd[f"{h}.self_attn.o_proj.weight"])
            w.add_tensor_np(f"{p}.attn_q_norm.weight",
                            p1(f"{h}.self_attn.q_norm.weight"))
            w.add_tensor_np(f"{p}.attn_k_norm.weight",
                            p1(f"{h}.self_attn.k_norm.weight"))
    w.add_tensor_np("output_norm.weight", p1("model.norm.weight"))
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("qn") / "qwen3next.gguf")
    w.write_to_path(path)
    return path, model


def test_qwen3next_logits_match_hf(qwen3next_pair, rng):
    import torch

    path, model = qwen3next_pair
    tokens = rng.integers(0, QN["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, QN["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_qwen3next_layer_kinds(qwen3next_pair):
    _, cfg, _ = load_model(qwen3next_pair[0], mode="dequant")
    assert cfg.layer_kinds == ("deltanet", "deltanet", "deltanet", "attn")


def test_moe_stats():
    from llama_gguf_tpu.models.moe_stats import MoeStats, route_and_record

    stats = MoeStats(num_experts=4)
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(100, 4)).astype(np.float32)
    top = route_and_record(logits, k=2, stats=stats)
    assert top.shape == (100, 2)
    assert stats.tokens_routed == 200
    assert sum(stats.histogram.values()) == 200
    assert stats.load_balance_factor >= 1.0
    # pathological: every token to expert 0
    stats.reset()
    stats.record(np.zeros((50, 2), np.int64))
    assert stats.load_balance_factor == pytest.approx(4.0)


def test_mixtral_expert_parallel_mesh(mixtral_pair):
    """MoE model sharded over a mesh (experts on the model axis) produces
    the same logits as single-device."""
    import jax.numpy as jnp
    from llama_gguf_tpu.parallel.sharding import (
        make_mesh, replicate_inputs, shard_kv, shard_params,
    )

    path, _ = mixtral_pair
    tokens = [3, 17, 42, 5]
    want = run_ours(path, tokens, MX["ctx"])

    params, cfg, _ = load_model(path, mode="dequant")
    mesh = make_mesh(n_model=4, n_data=2)
    sp = shard_params(params, mesh)
    runner = ModelRunner(sp, cfg, max_batch=1, max_seq=MX["ctx"], mesh=mesh)
    kv = runner.init_kv()
    t = len(tokens)
    logits, _ = runner.step(
        jnp.asarray([tokens], jnp.int32),
        jnp.asarray([list(range(t))], jnp.int32),
        jnp.asarray([t], jnp.int32), kv)
    got = np.asarray(logits[0])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_quantized_expert_stack_matches_dense(tmp_path, rng):
    """MoE with Q8_0-compressed expert stacks (gathered in-graph dequant)
    matches the dense-f32 path logits."""
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.ops.linear import QuantExpertStack
    from llama_gguf_tpu.quant.quantize import quantize

    c = dict(vocab=64, hidden=64, layers=1, heads=4, kv_heads=2, ffn=96,
             ctx=32, experts=4, topk=2)
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
    w.add_metadata("llama.expert_count", c["experts"])
    w.add_metadata("llama.expert_used_count", c["topk"])
    w.add_metadata("llama.vocab_size", c["vocab"])

    def t(name, shape, scale=0.05):
        arr = rng.normal(size=shape).astype(np.float32) * scale
        w.add_tensor_np(name, arr)
        return arr

    t("token_embd.weight", (c["vocab"], c["hidden"]))
    p = "blk.0"
    t(f"{p}.attn_q.weight", (c["hidden"], c["hidden"]))
    t(f"{p}.attn_k.weight", (c["kv_heads"] * 16, c["hidden"]))
    t(f"{p}.attn_v.weight", (c["kv_heads"] * 16, c["hidden"]))
    t(f"{p}.attn_output.weight", (c["hidden"], c["hidden"]))
    w.add_tensor_np(f"{p}.attn_norm.weight", np.ones(c["hidden"], np.float32))
    w.add_tensor_np(f"{p}.ffn_norm.weight", np.ones(c["hidden"], np.float32))
    t(f"{p}.ffn_gate_inp.weight", (c["experts"], c["hidden"]))
    for nm, shape in ((f"{p}.ffn_gate_exps.weight",
                       (c["experts"], c["ffn"], c["hidden"])),
                      (f"{p}.ffn_up_exps.weight",
                       (c["experts"], c["ffn"], c["hidden"])),
                      (f"{p}.ffn_down_exps.weight",
                       (c["experts"], c["hidden"], c["ffn"]))):
        arr = rng.normal(size=shape).astype(np.float32) * 0.05
        raw = quantize(arr, GGMLType.Q8_0)
        w.add_tensor_np  # noqa — keep reference alive
        w.add_tensor_raw(nm, tuple(reversed(shape)), GGMLType.Q8_0,
                         raw.tobytes())
    w.add_tensor_np("output_norm.weight", np.ones(c["hidden"], np.float32))
    t("output.weight", (c["vocab"], c["hidden"]))
    path = str(tmp_path / "moe_q.gguf")
    w.write_to_path(path)

    tokens = [3, 17, 42, 5]
    dense = run_ours(path, tokens, c["ctx"])  # mode=dequant

    params, cfg, _ = load_model(path, mode="quant")
    assert isinstance(params["layers"][0]["ffn"]["experts"]["gate"],
                      QuantExpertStack)
    from llama_gguf_tpu.ops.linear import set_use_pallas

    set_use_pallas(False)  # CPU tests: XLA path for the non-expert weights
    try:
        import jax.numpy as jnp

        r = ModelRunner(params, cfg, max_batch=1, max_seq=c["ctx"])
        kv = r.init_kv()
        logits, _ = r.step(jnp.asarray([tokens], jnp.int32),
                           jnp.asarray([list(range(4))], jnp.int32),
                           jnp.asarray([4], jnp.int32), kv)
        got = np.asarray(logits[0])
    finally:
        set_use_pallas(None)
    np.testing.assert_allclose(got, dense, rtol=2e-4, atol=2e-4)


def test_fused_moe_pallas_path_matches_dense(tmp_path, rng):
    """The FUSED Pallas MoE path of moe_layer (grouped gate/up+GLU kernel
    at prefill slot counts, slot-major kernels + down-combine glue) must
    match the dense-f32 oracle logits. Runs the kernels in interpret mode
    on CPU (tests/test_sharding.py pattern) — without this, the fused
    branch's glue (topv combine, routing) had no CI coverage and was only
    exercised by on-device Mixtral runs (r5 review finding)."""
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.ops import qmatmul as QM
    from llama_gguf_tpu.ops.linear import QuantExpertStack, set_use_pallas
    from llama_gguf_tpu.quant.quantize import quantize

    # shapes sized so every fused kernel TILES (n % 128 == 0 both ways):
    # prefill of 24 tokens x top-2 = 48 slots >= MOE_GROUPED_MIN_SLOTS
    # exercises the grouped-GLU kernel; the follow-up single-token decode
    # (2 slots) exercises the slot-major kernel
    c = dict(vocab=64, hidden=128, layers=1, heads=4, kv_heads=2, ffn=128,
             ctx=64, experts=4, topk=2)
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
    w.add_metadata("llama.expert_count", c["experts"])
    w.add_metadata("llama.expert_used_count", c["topk"])
    w.add_metadata("llama.vocab_size", c["vocab"])

    def t(name, shape, scale=0.05):
        arr = rng.normal(size=shape).astype(np.float32) * scale
        w.add_tensor_np(name, arr)
        return arr

    t("token_embd.weight", (c["vocab"], c["hidden"]))
    p = "blk.0"
    t(f"{p}.attn_q.weight", (c["hidden"], c["hidden"]))
    t(f"{p}.attn_k.weight", (c["kv_heads"] * 32, c["hidden"]))
    t(f"{p}.attn_v.weight", (c["kv_heads"] * 32, c["hidden"]))
    t(f"{p}.attn_output.weight", (c["hidden"], c["hidden"]))
    w.add_tensor_np(f"{p}.attn_norm.weight", np.ones(c["hidden"], np.float32))
    w.add_tensor_np(f"{p}.ffn_norm.weight", np.ones(c["hidden"], np.float32))
    t(f"{p}.ffn_gate_inp.weight", (c["experts"], c["hidden"]))
    for nm, shape in ((f"{p}.ffn_gate_exps.weight",
                       (c["experts"], c["ffn"], c["hidden"])),
                      (f"{p}.ffn_up_exps.weight",
                       (c["experts"], c["ffn"], c["hidden"])),
                      (f"{p}.ffn_down_exps.weight",
                       (c["experts"], c["hidden"], c["ffn"]))):
        arr = rng.normal(size=shape).astype(np.float32) * 0.05
        raw = quantize(arr, GGMLType.Q8_0)
        w.add_tensor_raw(nm, tuple(reversed(shape)), GGMLType.Q8_0,
                         raw.tobytes())
    w.add_tensor_np("output_norm.weight", np.ones(c["hidden"], np.float32))
    t("output.weight", (c["vocab"], c["hidden"]))
    path = str(tmp_path / "moe_fused.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=24).tolist()
    dense = run_ours(path, tokens, c["ctx"])  # mode=dequant oracle

    params, cfg, _ = load_model(path, mode="quant")
    assert isinstance(params["layers"][0]["ffn"]["experts"]["gate"],
                      QuantExpertStack)
    import jax.numpy as jnp

    QM.set_interpret(True)
    set_use_pallas(True)
    try:
        r = ModelRunner(params, cfg, max_batch=1, max_seq=c["ctx"])
        kv = r.init_kv()
        n = len(tokens)
        logits, kv = r.step(jnp.asarray([tokens], jnp.int32),
                            jnp.asarray([list(range(n))], jnp.int32),
                            jnp.asarray([n], jnp.int32), kv)
        got = np.asarray(logits[0])
        # decode step: slot-major kernels (2 slots)
        lg2, kv = r.decode_one(int(np.argmax(got[-1])), n, kv)
        got2 = np.asarray(lg2)
    finally:
        QM.set_interpret(False)
        set_use_pallas(None)
    np.testing.assert_allclose(got, dense, rtol=2e-4, atol=2e-4)
    assert np.isfinite(got2).all()


# -- phi3 (combined QKV projection) -------------------------------------------------

P3 = dict(vocab=96, hidden=64, layers=2, heads=4, kv_heads=2, ffn=96, ctx=64)


def test_phi3_combined_qkv_matches_hf(tmp_path_factory, rng):
    """phi3 GGUFs store one attn_qkv tensor with rows [q|k|v]; the loader
    split (loader._split_qkv) must reproduce HF Phi3 logits."""
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    c = P3
    hf_cfg = Phi3Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv_heads"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(9)
    with torch.no_grad():
        model = Phi3ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    w.add_metadata("general.architecture", "phi3")
    w.add_metadata("phi3.embedding_length", c["hidden"])
    w.add_metadata("phi3.block_count", c["layers"])
    w.add_metadata("phi3.attention.head_count", c["heads"])
    w.add_metadata("phi3.attention.head_count_kv", c["kv_heads"])
    w.add_metadata("phi3.feed_forward_length", c["ffn"])
    w.add_metadata("phi3.context_length", c["ctx"])
    w.add_metadata("phi3.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata("phi3.rope.freq_base", 10000.0)
    w.add_metadata("phi3.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        # phi3 keeps qkv combined in GGUF (rows [q|k|v])
        w.add_tensor_np(f"{p}.attn_qkv.weight",
                        sd[f"{h}.self_attn.qkv_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        # HF gate_up_proj rows are [gate|up]: split like the converter
        gu = sd[f"{h}.mlp.gate_up_proj.weight"]
        w.add_tensor_np(f"{p}.ffn_gate.weight", gu[: c["ffn"]])
        w.add_tensor_np(f"{p}.ffn_up.weight", gu[c["ffn"]:])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("p3") / "phi3.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


# -- gpt2 (learned positions, LayerNorm, no rope, Conv1D weights) -------------------

def test_gpt2_matches_hf(tmp_path_factory, rng):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ffn=128, ctx=64)
    hf_cfg = GPT2Config(
        vocab_size=c["vocab"], n_embd=c["hidden"], n_layer=c["layers"],
        n_head=c["heads"], n_inner=c["ffn"], n_positions=c["ctx"],
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(15)
    with torch.no_grad():
        model = GPT2LMHeadModel(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "gpt2"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["transformer.wte.weight"])
    w.add_tensor_np("position_embd.weight", sd["transformer.wpe.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"transformer.h.{i}"
        # HF GPT2 Conv1D stores [in, out]; GGUF wants [out, in]
        w.add_tensor_np(f"{p}.attn_qkv.weight",
                        sd[f"{h}.attn.c_attn.weight"].T.copy())
        w.add_tensor_np(f"{p}.attn_qkv.bias", sd[f"{h}.attn.c_attn.bias"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.attn.c_proj.weight"].T.copy())
        w.add_tensor_np(f"{p}.attn_output.bias", sd[f"{h}.attn.c_proj.bias"])
        w.add_tensor_np(f"{p}.attn_norm.weight", sd[f"{h}.ln_1.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias", sd[f"{h}.ln_1.bias"])
        w.add_tensor_np(f"{p}.ffn_norm.weight", sd[f"{h}.ln_2.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.bias", sd[f"{h}.ln_2.bias"])
        w.add_tensor_np(f"{p}.ffn_up.weight",
                        sd[f"{h}.mlp.c_fc.weight"].T.copy())
        w.add_tensor_np(f"{p}.ffn_up.bias", sd[f"{h}.mlp.c_fc.bias"])
        w.add_tensor_np(f"{p}.ffn_down.weight",
                        sd[f"{h}.mlp.c_proj.weight"].T.copy())
        w.add_tensor_np(f"{p}.ffn_down.bias", sd[f"{h}.mlp.c_proj.bias"])
    w.add_tensor_np("output_norm.weight", sd["transformer.ln_f.weight"])
    w.add_tensor_np("output_norm.bias", sd["transformer.ln_f.bias"])
    # gpt2 ties lm_head to wte: omit output.weight
    path = str(tmp_path_factory.mktemp("g2p") / "gpt2.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    _, cfg, _ = load_model(path, mode="dequant")
    assert cfg.rope.n_dims == 0 and cfg.uses_layer_norm


# -- gptneox (parallel residual, interleaved QKV, partial rope) ---------------------

def test_gptneox_parallel_residual_matches_hf(tmp_path_factory, rng):
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ffn=128, ctx=64)
    hd = c["hidden"] // c["heads"]
    hf_cfg = GPTNeoXConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        intermediate_size=c["ffn"], max_position_embeddings=c["ctx"],
        rotary_pct=0.25, rotary_emb_base=10000,
        use_parallel_residual=True, layer_norm_eps=1e-5,
        hidden_act="gelu", attention_dropout=0.0, hidden_dropout=0.0,
    )
    torch.manual_seed(23)
    with torch.no_grad():
        model = GPTNeoXForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "gptneox"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.rope.dimension_count", int(hd * 0.25))
    w.add_metadata(f"{a}.use_parallel_residual", True)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["gpt_neox.embed_in.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"gpt_neox.layers.{i}"
        # HF neox qkv is interleaved per head [q_i; k_i; v_i]; GGUF wants
        # flat [q | k | v] (the converter de-interleaves)
        qkv = sd[f"{h}.attention.query_key_value.weight"].reshape(
            c["heads"], 3, hd, c["hidden"])
        bias = sd[f"{h}.attention.query_key_value.bias"].reshape(
            c["heads"], 3, hd)
        w.add_tensor_np(f"{p}.attn_qkv.weight",
                        qkv.transpose(1, 0, 2, 3).reshape(-1, c["hidden"]).copy())
        w.add_tensor_np(f"{p}.attn_qkv.bias",
                        bias.transpose(1, 0, 2).reshape(-1).copy())
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.attention.dense.weight"])
        w.add_tensor_np(f"{p}.attn_output.bias",
                        sd[f"{h}.attention.dense.bias"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias",
                        sd[f"{h}.input_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.bias",
                        sd[f"{h}.post_attention_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_up.weight",
                        sd[f"{h}.mlp.dense_h_to_4h.weight"])
        w.add_tensor_np(f"{p}.ffn_up.bias", sd[f"{h}.mlp.dense_h_to_4h.bias"])
        w.add_tensor_np(f"{p}.ffn_down.weight",
                        sd[f"{h}.mlp.dense_4h_to_h.weight"])
        w.add_tensor_np(f"{p}.ffn_down.bias",
                        sd[f"{h}.mlp.dense_4h_to_h.bias"])
    w.add_tensor_np("output_norm.weight", sd["gpt_neox.final_layer_norm.weight"])
    w.add_tensor_np("output_norm.bias", sd["gpt_neox.final_layer_norm.bias"])
    w.add_tensor_np("output.weight", sd["embed_out.weight"])
    path = str(tmp_path_factory.mktemp("nx") / "neox.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    _, cfg, _ = load_model(path, mode="dequant")
    assert cfg.use_parallel_residual and cfg.rope.n_dims == int(hd * 0.25)


# -- olmo2 (post-norm only, flat QK-norm) --------------------------------------------

def test_olmo2_flat_qknorm_matches_hf(tmp_path_factory, rng):
    import torch
    from transformers import Olmo2Config, Olmo2ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv_heads=2, ffn=96,
             ctx=64)
    hf_cfg = Olmo2Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv_heads"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_bias=False, attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(31)
    with torch.no_grad():
        model = Olmo2ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "olmo2"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", c["kv_heads"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        # olmo2 permutes like llama? NO: olmo2 q/k norm over flat dims +
        # rotate-half rope; the converter permutes q/k AND their norms
        w.add_tensor_np(f"{p}.attn_q.weight", permute_llama(
            sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight", permute_llama(
            sd[f"{h}.self_attn.k_proj.weight"], c["kv_heads"]))
        w.add_tensor_np(f"{p}.attn_q_norm.weight", permute_llama(
            sd[f"{h}.self_attn.q_norm.weight"][:, None], c["heads"])[:, 0])
        w.add_tensor_np(f"{p}.attn_k_norm.weight", permute_llama(
            sd[f"{h}.self_attn.k_norm.weight"][:, None], c["kv_heads"])[:, 0])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.post_attention_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.post_ffw_norm.weight",
                        sd[f"{h}.post_feedforward_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("ol2") / "olmo2.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    params, cfg, _ = load_model(path, mode="dequant")
    assert "attn_norm" not in params["layers"][0]
    assert "post_attn_norm" in params["layers"][0]


# -- bloom (ALiBi, LayerNorm, embed-norm, interleaved QKV) ---------------------------

def test_bloom_alibi_matches_hf(tmp_path_factory, rng):
    import torch
    from transformers import BloomConfig, BloomForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ffn=256, ctx=64)
    hd = c["hidden"] // c["heads"]
    hf_cfg = BloomConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        n_layer=c["layers"], n_head=c["heads"],
        layer_norm_epsilon=1e-5, hidden_dropout=0.0,
        attention_dropout=0.0, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, slow_but_exact=False,
    )
    torch.manual_seed(41)
    with torch.no_grad():
        model = BloomForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "bloom"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight",
                    sd["transformer.word_embeddings.weight"])
    w.add_tensor_np("token_embd_norm.weight",
                    sd["transformer.word_embeddings_layernorm.weight"])
    w.add_tensor_np("token_embd_norm.bias",
                    sd["transformer.word_embeddings_layernorm.bias"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"transformer.h.{i}"
        # bloom qkv interleaved per head [q_i; k_i; v_i] like neox
        qkv = sd[f"{h}.self_attention.query_key_value.weight"].reshape(
            c["heads"], 3, hd, c["hidden"])
        bias = sd[f"{h}.self_attention.query_key_value.bias"].reshape(
            c["heads"], 3, hd)
        w.add_tensor_np(f"{p}.attn_qkv.weight",
                        qkv.transpose(1, 0, 2, 3).reshape(-1, c["hidden"]).copy())
        w.add_tensor_np(f"{p}.attn_qkv.bias",
                        bias.transpose(1, 0, 2).reshape(-1).copy())
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attention.dense.weight"])
        w.add_tensor_np(f"{p}.attn_output.bias",
                        sd[f"{h}.self_attention.dense.bias"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias", sd[f"{h}.input_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.bias",
                        sd[f"{h}.post_attention_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_up.weight",
                        sd[f"{h}.mlp.dense_h_to_4h.weight"])
        w.add_tensor_np(f"{p}.ffn_up.bias", sd[f"{h}.mlp.dense_h_to_4h.bias"])
        w.add_tensor_np(f"{p}.ffn_down.weight",
                        sd[f"{h}.mlp.dense_4h_to_h.weight"])
        w.add_tensor_np(f"{p}.ffn_down.bias",
                        sd[f"{h}.mlp.dense_4h_to_h.bias"])
    w.add_tensor_np("output_norm.weight", sd["transformer.ln_f.weight"])
    w.add_tensor_np("output_norm.bias", sd["transformer.ln_f.bias"])
    # bloom ties lm_head to word embeddings: omit output.weight
    path = str(tmp_path_factory.mktemp("bl") / "bloom.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    _, cfg, _ = load_model(path, mode="dequant")
    assert cfg.uses_alibi and cfg.rope.n_dims == 0


def test_mpt_alibi_matches_hf(tmp_path_factory, rng):
    """MPT: straight-concat Wqkv, bias-free LayerNorm, ALiBi, tied embed.

    HF MPT uses exact GELU while we follow ggml's tanh approximation
    (layers.rs ggml_gelu parity), so the tolerance is looser than the
    other oracles."""
    import torch
    from transformers import MptConfig, MptForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ffn=256, ctx=64)
    hf_cfg = MptConfig(
        vocab_size=c["vocab"], d_model=c["hidden"], n_heads=c["heads"],
        n_layers=c["layers"], max_seq_len=c["ctx"],
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(43)
    with torch.no_grad():
        model = MptForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "mpt"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["transformer.wte.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"transformer.blocks.{i}"
        # MPT Wqkv is a straight [q; k; v] row concat (no interleave)
        w.add_tensor_np(f"{p}.attn_qkv.weight", sd[f"{h}.attn.Wqkv.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.attn.out_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight", sd[f"{h}.norm_1.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight", sd[f"{h}.norm_2.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.ffn.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight",
                        sd[f"{h}.ffn.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["transformer.norm_f.weight"])
    path = str(tmp_path_factory.mktemp("mp") / "mpt.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    # tanh-GELU vs exact GELU: allow a looser absolute band, but require
    # the argmax (greedy token) to match at every position
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    assert (got.argmax(-1) == want.argmax(-1)).all()


def test_opt_matches_hf(tmp_path_factory, rng):
    """OPT: learned positions (HF stores them with a +2 offset — the
    conversion drops the first two rows so raw positions index directly),
    ReLU MLP, LayerNorm with bias, separate biased q/k/v."""
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ffn=256, ctx=64)
    hf_cfg = OPTConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        ffn_dim=c["ffn"], max_position_embeddings=c["ctx"],
        word_embed_proj_dim=c["hidden"], dropout=0.0, attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(47)
    with torch.no_grad():
        model = OPTForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "opt"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight",
                    sd["model.decoder.embed_tokens.weight"])
    # drop the HF offset rows so position p reads row p
    w.add_tensor_np("position_embd.weight",
                    sd["model.decoder.embed_positions.weight"][2:])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.decoder.layers.{i}"
        for ours, theirs in (("attn_q", "self_attn.q_proj"),
                             ("attn_k", "self_attn.k_proj"),
                             ("attn_v", "self_attn.v_proj"),
                             ("attn_output", "self_attn.out_proj"),
                             ("ffn_up", "fc1"), ("ffn_down", "fc2")):
            w.add_tensor_np(f"{p}.{ours}.weight", sd[f"{h}.{theirs}.weight"])
            w.add_tensor_np(f"{p}.{ours}.bias", sd[f"{h}.{theirs}.bias"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.self_attn_layer_norm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias",
                        sd[f"{h}.self_attn_layer_norm.bias"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.final_layer_norm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.bias",
                        sd[f"{h}.final_layer_norm.bias"])
    w.add_tensor_np("output_norm.weight",
                    sd["model.decoder.final_layer_norm.weight"])
    w.add_tensor_np("output_norm.bias",
                    sd["model.decoder.final_layer_norm.bias"])
    # OPT ties lm_head to embed_tokens
    path = str(tmp_path_factory.mktemp("op") / "opt.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_command_r_matches_hf(tmp_path_factory, rng):
    """Cohere Command-R: parallel residual from one pre-norm, bias-free
    mean-centered LayerNorm, interleaved (NORMAL) RoPE, logit_scale,
    tied embeddings."""
    import torch
    from transformers import CohereConfig, CohereForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=128, ctx=64)
    hf_cfg = CohereConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        logit_scale=0.0625, attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(53)
    with torch.no_grad():
        model = CohereForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "command-r"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", c["kv"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.logit_scale", 0.0625)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        # interleaved rope -> weights stored unpermuted (NORMAL rope type)
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    path = str(tmp_path_factory.mktemp("cr") / "commandr.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    _, cfg, _ = load_model(path, mode="dequant")
    assert cfg.logit_scale == 0.0625 and cfg.use_parallel_residual


def test_swa_pattern_indexing():
    """llama.cpp set_swa_pattern semantics: every Nth layer is full."""
    from llama_gguf_tpu.models.config import ModelConfig

    cfg = ModelConfig(sliding_window=8, swa_pattern=4, num_layers=8)
    assert [cfg.layer_is_swa(i) for i in range(8)] == \
        [True, True, True, False] * 2
    cfg = ModelConfig(sliding_window=8, swa_pattern=2, num_layers=4)
    assert [cfg.layer_is_swa(i) for i in range(4)] == [True, False] * 2
    cfg = ModelConfig(sliding_window=8, swa_pattern=1, num_layers=3)
    assert all(cfg.layer_is_swa(i) for i in range(3))
    cfg = ModelConfig(sliding_window=0, swa_pattern=4)
    assert not cfg.layer_is_swa(0)


def test_cohere2_matches_hf(tmp_path_factory, rng):
    """Cohere2 (Command-R7B): 3 sliding(+RoPE) : 1 full(NoPE) layer
    pattern, window smaller than the prompt so both mask shapes and the
    per-layer RoPE gating are actually exercised."""
    import torch
    from transformers import Cohere2Config, Cohere2ForCausalLM

    c = dict(vocab=96, hidden=64, layers=4, heads=4, kv=2, ffn=128,
             ctx=64, win=8)
    hf_cfg = Cohere2Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        logit_scale=0.0625, sliding_window=c["win"],
        attention_dropout=0.0, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(59)
    with torch.no_grad():
        model = Cohere2ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "cohere2"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", c["kv"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.logit_scale", 0.0625)
    w.add_metadata(f"{a}.attention.sliding_window", c["win"])
    w.add_metadata(f"{a}.attention.sliding_window_pattern", 4)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    path = str(tmp_path_factory.mktemp("c2") / "cohere2.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=20).tolist()  # > window
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_gemma3_matches_hf(tmp_path_factory, rng):
    """Gemma3: 5 sliding : 1 full pattern with DIFFERENT RoPE bases per
    layer type (locals 10k, globals 1M), per-head QK-RMSNorm, sandwich
    norms, +1 norm storage convention, tied embeddings."""
    import torch
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    c = dict(vocab=96, hidden=64, layers=6, heads=4, kv=2, ffn=96, ctx=64,
             hd=16, win=8)
    hf_cfg = Gemma3TextConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        head_dim=c["hd"], max_position_embeddings=c["ctx"],
        sliding_window=c["win"], query_pre_attn_scalar=c["hd"],
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        rms_norm_eps=1e-6, attention_dropout=0.0, attention_bias=False,
        hidden_activation="gelu_pytorch_tanh", tie_word_embeddings=True,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(61)
    with torch.no_grad():
        model = Gemma3ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.25)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    plus1 = lambda name: sd[name] + 1.0  # gemma norm storage convention

    w = GGUFWriter()
    a = "gemma3"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", c["kv"])
    w.add_metadata(f"{a}.attention.key_length", c["hd"])
    w.add_metadata(f"{a}.attention.value_length", c["hd"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata(f"{a}.rope.freq_base", 1000000.0)  # global layers
    w.add_metadata(f"{a}.attention.sliding_window", c["win"])
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_q_norm.weight",
                        plus1(f"{h}.self_attn.q_norm.weight"))
        w.add_tensor_np(f"{p}.attn_k_norm.weight",
                        plus1(f"{h}.self_attn.k_norm.weight"))
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        plus1(f"{h}.input_layernorm.weight"))
        w.add_tensor_np(f"{p}.post_attention_norm.weight",
                        plus1(f"{h}.post_attention_layernorm.weight"))
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        plus1(f"{h}.pre_feedforward_layernorm.weight"))
        w.add_tensor_np(f"{p}.post_ffw_norm.weight",
                        plus1(f"{h}.post_feedforward_layernorm.weight"))
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", plus1("model.norm.weight"))
    path = str(tmp_path_factory.mktemp("g3") / "gemma3.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=20).tolist()  # > window
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    _, cfg, _ = load_model(path, mode="dequant")
    assert cfg.swa_pattern == 6 and cfg.rope_freq_base_swa == 10000.0


def test_granite_matches_hf(tmp_path_factory, rng):
    """Granite: llama-like but with four multipliers — embedding,
    attention (replaces head_dim**-0.5), residual, and logits (stored as a
    DIVISOR in the GGUF, llama.cpp convention)."""
    import torch
    from transformers import GraniteConfig, GraniteForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=128, ctx=64)
    hf_cfg = GraniteConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        embedding_multiplier=12.0, attention_multiplier=0.03,
        residual_multiplier=0.22, logits_scaling=8.0,
        rms_norm_eps=1e-5, attention_bias=False, attention_dropout=0.0,
        tie_word_embeddings=True, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(67)
    with torch.no_grad():
        model = GraniteForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    def permute(w, n_heads):  # llama.cpp rotate-half -> interleaved perm
        return (w.reshape(n_heads, 2, w.shape[0] // n_heads // 2, w.shape[1])
                 .swapaxes(1, 2).reshape(w.shape))

    w = GGUFWriter()
    a = "granite"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", c["kv"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.embedding_scale", 12.0)
    w.add_metadata(f"{a}.attention.scale", 0.03)
    w.add_metadata(f"{a}.residual_scale", 0.22)
    w.add_metadata(f"{a}.logit_scale", 8.0)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight",
                        permute(sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight",
                        permute(sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
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
    path = str(tmp_path_factory.mktemp("gr") / "granite.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    _, cfg, _ = load_model(path, mode="dequant")
    assert cfg.attention_scale == pytest.approx(0.03)
    assert cfg.logit_scale == pytest.approx(1 / 8.0)
    assert cfg.embedding_scale == pytest.approx(12.0)


def test_deepseek_v3_mla_matches_hf(tmp_path_factory, rng):
    """DeepSeek-V3: MLA (low-rank q + compressed kv latent, decoupled
    rope), leading dense layer + sigmoid-gated MoE with e_score correction
    bias, node-limited group routing, routed scaling, shared expert.
    Our runtime uses the ABSORBED rank-space attention; parity vs HF's
    naive reconstruction confirms the algebraic equivalence too."""
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ctx=64,
             q_rank=32, kv_rank=16, rope=8, nope=16, vdim=16,
             E=8, topk=2, moe_ffn=32, ffn=128)
    hf_cfg = DeepseekV3Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["heads"], max_position_embeddings=c["ctx"],
        q_lora_rank=c["q_rank"], kv_lora_rank=c["kv_rank"],
        qk_rope_head_dim=c["rope"], qk_nope_head_dim=c["nope"],
        v_head_dim=c["vdim"], head_dim=c["rope"],
        n_routed_experts=c["E"], num_experts_per_tok=c["topk"],
        n_group=4, topk_group=2, routed_scaling_factor=2.5,
        norm_topk_prob=True, n_shared_experts=1,
        moe_intermediate_size=c["moe_ffn"], intermediate_size=c["ffn"],
        first_k_dense_replace=1, rope_theta=10000.0, rope_scaling=None,
        rms_norm_eps=1e-5, attention_bias=False, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(71)
    with torch.no_grad():
        model = DeepseekV3ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "deepseek2"
    w.add_metadata("general.architecture", a)
    for key, val in [
        ("embedding_length", c["hidden"]), ("block_count", c["layers"]),
        ("attention.head_count", c["heads"]),
        ("attention.head_count_kv", c["heads"]),
        ("context_length", c["ctx"]),
        ("attention.key_length", c["nope"] + c["rope"]),
        ("attention.value_length", c["vdim"]),
        ("rope.dimension_count", c["rope"]),
        ("attention.q_lora_rank", c["q_rank"]),
        ("attention.kv_lora_rank", c["kv_rank"]),
        ("feed_forward_length", c["ffn"]),
        ("expert_count", c["E"]), ("expert_used_count", c["topk"]),
        ("expert_feed_forward_length", c["moe_ffn"]),
        ("expert_shared_count", 1), ("expert_gating_func", 2),
        ("expert_group_count", 4), ("expert_group_used_count", 2),
        ("vocab_size", c["vocab"]),
    ]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.expert_weights_scale", 2.5)
    w.add_metadata(f"{a}.expert_weights_norm", True)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_q_a.weight",
                        sd[f"{h}.self_attn.q_a_proj.weight"])
        w.add_tensor_np(f"{p}.attn_q_a_norm.weight",
                        sd[f"{h}.self_attn.q_a_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_q_b.weight",
                        sd[f"{h}.self_attn.q_b_proj.weight"])
        w.add_tensor_np(f"{p}.attn_kv_a_mqa.weight",
                        sd[f"{h}.self_attn.kv_a_proj_with_mqa.weight"])
        w.add_tensor_np(f"{p}.attn_kv_a_norm.weight",
                        sd[f"{h}.self_attn.kv_a_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_kv_b.weight",
                        sd[f"{h}.self_attn.kv_b_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        if i == 0:  # leading dense layer
            for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                                 ("down", "down_proj")):
                w.add_tensor_np(f"{p}.ffn_{ours}.weight",
                                sd[f"{h}.mlp.{theirs}.weight"])
        else:
            w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                            sd[f"{h}.mlp.gate.weight"])
            w.add_tensor_np(f"{p}.exp_probs_b.bias",
                            sd[f"{h}.mlp.gate.e_score_correction_bias"])
            for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                                 ("down", "down_proj")):
                stacked = np.stack(
                    [sd[f"{h}.mlp.experts.{e}.{theirs}.weight"]
                     for e in range(c["E"])])
                w.add_tensor_np(f"{p}.ffn_{ours}_exps.weight", stacked)
                w.add_tensor_np(
                    f"{p}.ffn_{ours}_shexp.weight",
                    sd[f"{h}.mlp.shared_experts.{theirs}.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("ds") / "dsv3.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=8e-4, atol=8e-4)


def test_deepseek_v2_lite_matches_hf(tmp_path_factory, rng):
    """DeepSeek-V2-Lite flavor: MLA WITHOUT q compression (dense wq),
    softmax greedy routing (no renorm, no bias, scale 1)."""
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ctx=64,
             kv_rank=16, rope=8, nope=16, vdim=16,
             E=4, topk=2, moe_ffn=32, ffn=128)
    hf_cfg = DeepseekV2Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["heads"], max_position_embeddings=c["ctx"],
        q_lora_rank=None, kv_lora_rank=c["kv_rank"],
        qk_rope_head_dim=c["rope"], qk_nope_head_dim=c["nope"],
        v_head_dim=c["vdim"], head_dim=c["rope"],
        n_routed_experts=c["E"], num_experts_per_tok=c["topk"],
        topk_method="greedy", norm_topk_prob=False,
        routed_scaling_factor=1.0, n_shared_experts=1,
        moe_intermediate_size=c["moe_ffn"], intermediate_size=c["ffn"],
        first_k_dense_replace=1, rope_theta=10000.0, rope_scaling=None,
        rms_norm_eps=1e-5, attention_bias=False, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(73)
    with torch.no_grad():
        model = DeepseekV2ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "deepseek2"
    w.add_metadata("general.architecture", a)
    for key, val in [
        ("embedding_length", c["hidden"]), ("block_count", c["layers"]),
        ("attention.head_count", c["heads"]),
        ("attention.head_count_kv", c["heads"]),
        ("context_length", c["ctx"]),
        ("attention.key_length", c["nope"] + c["rope"]),
        ("attention.value_length", c["vdim"]),
        ("rope.dimension_count", c["rope"]),
        ("attention.kv_lora_rank", c["kv_rank"]),
        ("feed_forward_length", c["ffn"]),
        ("expert_count", c["E"]), ("expert_used_count", c["topk"]),
        ("expert_feed_forward_length", c["moe_ffn"]),
        ("expert_shared_count", 1), ("vocab_size", c["vocab"]),
    ]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_q.weight",
                        sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_kv_a_mqa.weight",
                        sd[f"{h}.self_attn.kv_a_proj_with_mqa.weight"])
        w.add_tensor_np(f"{p}.attn_kv_a_norm.weight",
                        sd[f"{h}.self_attn.kv_a_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_kv_b.weight",
                        sd[f"{h}.self_attn.kv_b_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        if i == 0:
            for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                                 ("down", "down_proj")):
                w.add_tensor_np(f"{p}.ffn_{ours}.weight",
                                sd[f"{h}.mlp.{theirs}.weight"])
        else:
            w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                            sd[f"{h}.mlp.gate.weight"])
            for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                                 ("down", "down_proj")):
                stacked = np.stack(
                    [sd[f"{h}.mlp.experts.{e}.{theirs}.weight"]
                     for e in range(c["E"])])
                w.add_tensor_np(f"{p}.ffn_{ours}_exps.weight", stacked)
                w.add_tensor_np(
                    f"{p}.ffn_{ours}_shexp.weight",
                    sd[f"{h}.mlp.shared_experts.{theirs}.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("d2") / "dsv2.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=8e-4, atol=8e-4)


def test_glm4_matches_hf(tmp_path_factory, rng):
    """GLM4: partial interleaved RoPE (half the head dims), biased q/k/v,
    fused gate_up MLP (split at conversion), sandwich post-attn/post-mlp
    norms alongside the usual pre-norms."""
    import torch
    from transformers import Glm4Config, Glm4ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=128, ctx=64,
             hd=16)
    hf_cfg = Glm4Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], head_dim=c["hd"],
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(79)
    with torch.no_grad():
        model = Glm4ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "glm4"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("rope.dimension_count", c["hd"] // 2),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        for ours, theirs in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                             ("attn_v", "v_proj")):
            w.add_tensor_np(f"{p}.{ours}.weight",
                            sd[f"{h}.self_attn.{theirs}.weight"])
            w.add_tensor_np(f"{p}.{ours}.bias",
                            sd[f"{h}.self_attn.{theirs}.bias"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.post_attention_norm.weight",
                        sd[f"{h}.post_self_attn_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.post_ffw_norm.weight",
                        sd[f"{h}.post_mlp_layernorm.weight"])
        gu = sd[f"{h}.mlp.gate_up_proj.weight"]  # [2F, H]: gate rows first
        w.add_tensor_np(f"{p}.ffn_gate.weight", gu[: c["ffn"]])
        w.add_tensor_np(f"{p}.ffn_up.weight", gu[c["ffn"]:])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("g4") / "glm4.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_starcoder2_matches_hf(tmp_path_factory, rng):
    """StarCoder2: LayerNorm (with bias), NEOX rope, biased projections,
    no-gate GELU MLP, tied embeddings."""
    import torch
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=128, ctx=64)
    hf_cfg = Starcoder2Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        norm_epsilon=1e-5, use_bias=True, tie_word_embeddings=True,
        residual_dropout=0.0, embedding_dropout=0.0, attention_dropout=0.0,
        sliding_window=None, pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(83)
    with torch.no_grad():
        model = Starcoder2ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "starcoder2"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        for ours, theirs in (("attn_q", "self_attn.q_proj"),
                             ("attn_k", "self_attn.k_proj"),
                             ("attn_v", "self_attn.v_proj"),
                             ("attn_output", "self_attn.o_proj"),
                             ("ffn_up", "mlp.c_fc"),
                             ("ffn_down", "mlp.c_proj")):
            w.add_tensor_np(f"{p}.{ours}.weight", sd[f"{h}.{theirs}.weight"])
            w.add_tensor_np(f"{p}.{ours}.bias", sd[f"{h}.{theirs}.bias"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias",
                        sd[f"{h}.input_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.bias",
                        sd[f"{h}.post_attention_layernorm.bias"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output_norm.bias", sd["model.norm.bias"])
    path = str(tmp_path_factory.mktemp("s2") / "sc2.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_olmo2_matches_hf(tmp_path_factory, rng):
    """OLMo2: NO pre-norms (attn/ffn read the residual stream directly),
    post-attn/post-ffn RMSNorms, FLAT QK-RMSNorm over the whole projection
    (not per head), llama-permuted q/k with consistently permuted norms."""
    import torch
    from transformers import Olmo2Config, Olmo2ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=128, ctx=64)
    hd = c["hidden"] // c["heads"]
    hf_cfg = Olmo2Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_bias=False, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(89)
    with torch.no_grad():
        model = Olmo2ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    def permute(w, n_heads):
        return (w.reshape(n_heads, 2, w.shape[0] // n_heads // 2, *w.shape[1:])
                 .swapaxes(1, 2).reshape(w.shape))

    w = GGUFWriter()
    a = "olmo2"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight",
                        permute(sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight",
                        permute(sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        # flat norms permuted to match the permuted projections
        w.add_tensor_np(f"{p}.attn_q_norm.weight",
                        permute(sd[f"{h}.self_attn.q_norm.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k_norm.weight",
                        permute(sd[f"{h}.self_attn.k_norm.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.post_attention_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.post_ffw_norm.weight",
                        sd[f"{h}.post_feedforward_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("o2") / "olmo2.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_qwen2moe_matches_hf(tmp_path_factory, rng):
    """Qwen2MoE: softmax router WITHOUT topk renorm, plus an always-on
    shared expert whose output is scaled by a learned sigmoid gate."""
    import torch
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=128, ctx=64,
             E=4, topk=2, mffn=32, sffn=64)
    hf_cfg = Qwen2MoeConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        moe_intermediate_size=c["mffn"],
        shared_expert_intermediate_size=c["sffn"],
        num_experts=c["E"], num_experts_per_tok=c["topk"],
        decoder_sparse_step=1, norm_topk_prob=False,
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(97)
    with torch.no_grad():
        model = Qwen2MoeForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    def permute(w, n_heads):
        return (w.reshape(n_heads, 2, w.shape[0] // n_heads // 2, w.shape[-1])
                 .swapaxes(1, 2).reshape(w.shape))

    w = GGUFWriter()
    a = "qwen2moe"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("expert_count", c["E"]),
                     ("expert_used_count", c["topk"]),
                     ("expert_feed_forward_length", c["mffn"]),
                     ("expert_shared_feed_forward_length", c["sffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        # qwen2moe is NEOX-roped: no permutation at conversion
        for ours, theirs in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                             ("attn_v", "v_proj")):
            w.add_tensor_np(f"{p}.{ours}.weight",
                            sd[f"{h}.self_attn.{theirs}.weight"])
            w.add_tensor_np(f"{p}.{ours}.bias",
                            sd[f"{h}.self_attn.{theirs}.bias"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight", sd[f"{h}.mlp.gate.weight"])
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
            stacked = np.stack(
                [sd[f"{h}.mlp.experts.{e}.{theirs}.weight"]
                 for e in range(c["E"])])
            w.add_tensor_np(f"{p}.ffn_{ours}_exps.weight", stacked)
            w.add_tensor_np(f"{p}.ffn_{ours}_shexp.weight",
                            sd[f"{h}.mlp.shared_expert.{theirs}.weight"])
        w.add_tensor_np(f"{p}.ffn_gate_inp_shexp.weight",
                        sd[f"{h}.mlp.shared_expert_gate.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("qm") / "q2moe.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


# -- falcon (parallel residual, MQA, fused qkv [q|k|v], exact-gelu MLP) --------

def test_falcon_matches_hf(tmp_path_factory, rng):
    """Falcon-7B style: multi_query (1 KV head), parallel attn+MLP residual
    off a single input LayerNorm, fused qkv already laid out [q | k | v],
    full-dim NEOX rope, bias-free projections."""
    import torch
    from transformers import FalconConfig, FalconForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ctx=64)
    hf_cfg = FalconConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        new_decoder_architecture=False, multi_query=True, parallel_attn=True,
        bias=False, alibi=False, rope_theta=10000.0,
        layer_norm_epsilon=1e-5, max_position_embeddings=c["ctx"],
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    torch.manual_seed(41)
    with torch.no_grad():
        model = FalconForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "falcon"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", 1)
    w.add_metadata(f"{a}.feed_forward_length", 4 * c["hidden"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight",
                    sd["transformer.word_embeddings.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"transformer.h.{i}"
        # HF multi_query fused qkv is already [all q | k | v]
        w.add_tensor_np(f"{p}.attn_qkv.weight",
                        sd[f"{h}.self_attention.query_key_value.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attention.dense.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias",
                        sd[f"{h}.input_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_up.weight",
                        sd[f"{h}.mlp.dense_h_to_4h.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight",
                        sd[f"{h}.mlp.dense_4h_to_h.weight"])
    w.add_tensor_np("output_norm.weight", sd["transformer.ln_f.weight"])
    w.add_tensor_np("output_norm.bias", sd["transformer.ln_f.bias"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("fa") / "falcon.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    # HF falcon uses exact erf-GELU; we use ggml's tanh approximation
    # (llama.cpp parity) — hence the slightly wider tolerance
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    _, cfg, _ = load_model(path, mode="dequant")
    assert cfg.use_parallel_residual and cfg.uses_layer_norm
    assert cfg.num_kv_heads == 1


# -- stablelm (partial rope, LayerNorm+bias norms, gated SiLU MLP) -------------

def test_stablelm_matches_hf(tmp_path_factory, rng):
    """StableLM-2: separate q/k/v (NOT combined), partial NEOX rope
    (rotary 25%), LayerNorm with bias, SEQUENTIAL residual, SwiGLU MLP —
    the registry previously had gelu/no-gate/parallel, all wrong."""
    import torch
    from transformers import StableLmConfig, StableLmForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=128, ctx=64)
    hd = c["hidden"] // c["heads"]
    hf_cfg = StableLmConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        partial_rotary_factor=0.25, layer_norm_eps=1e-5,
        use_qkv_bias=False, use_parallel_residual=False,
        qk_layernorm=False, attention_dropout=0.0, hidden_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(43)
    with torch.no_grad():
        model = StableLmForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "stablelm"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", c["kv"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.rope.dimension_count", int(hd * 0.25))
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias",
                        sd[f"{h}.input_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.bias",
                        sd[f"{h}.post_attention_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output_norm.bias", sd["model.norm.bias"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("sl") / "stablelm.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    _, cfg, _ = load_model(path, mode="dequant")
    assert not cfg.use_parallel_residual and cfg.has_ffn_gate
    assert cfg.rope.n_dims == int(hd * 0.25) and cfg.uses_layer_norm


# -- phimoe (sparsemixer top-2 routing, LayerNorm, SwiGLU experts) -------------

def test_phimoe_matches_hf(tmp_path_factory, rng):
    """PhiMoE: LayerNorm (not RMSNorm, unlike phi3), full-dim NEOX rope and
    SPARSEMIXER routing — experts picked by thresholded argmax, weights from
    the masked softmax (HF PhimoeSparseMoeBlock inference path)."""
    import torch
    from transformers import PhimoeConfig, PhimoeForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=96, ctx=64,
             E=4, topk=2)
    hf_cfg = PhimoeConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        num_local_experts=c["E"], num_experts_per_tok=c["topk"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_dropout=0.0,
        router_jitter_noise=0.01, input_jitter_noise=0.0,
        attention_bias=False, lm_head_bias=False, sliding_window=None,
        tie_word_embeddings=False,
    )
    torch.manual_seed(47)
    with torch.no_grad():
        model = PhimoeForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "phimoe"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", c["kv"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.expert_count", c["E"])
    w.add_metadata(f"{a}.expert_used_count", c["topk"])
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias",
                        sd[f"{h}.input_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.bias",
                        sd[f"{h}.post_attention_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                        sd[f"{h}.block_sparse_moe.gate.weight"])
        # expert stacks [E, out, in]: w1=gate, w3=up, w2=down
        gate = np.stack([sd[f"{h}.block_sparse_moe.experts.{e}.w1.weight"]
                         for e in range(c["E"])])
        up = np.stack([sd[f"{h}.block_sparse_moe.experts.{e}.w3.weight"]
                       for e in range(c["E"])])
        down = np.stack([sd[f"{h}.block_sparse_moe.experts.{e}.w2.weight"]
                         for e in range(c["E"])])
        w.add_tensor_np(f"{p}.ffn_gate_exps.weight", gate)
        w.add_tensor_np(f"{p}.ffn_up_exps.weight", up)
        w.add_tensor_np(f"{p}.ffn_down_exps.weight", down)
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output_norm.bias", sd["model.norm.bias"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("pm") / "phimoe.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    _, cfg, _ = load_model(path, mode="dequant")
    assert cfg.expert_gating_func == 3 and cfg.router_jitter_eps == 0.01
    assert cfg.uses_layer_norm


# -- jamba (attn/mamba hybrid, periodic MoE, NoPE attention) -------------------

def test_jamba_matches_hf(tmp_path_factory, rng):
    """Jamba: interleaved attention and Mamba-1 blocks (per-layer kind from
    tensor presence), NO positional encoding on attention layers, dt/B/C
    RMSNorms inside the mamba mixer, MoE (softmax-topk, no renorm) on
    alternating layers, plain SwiGLU FFN elsewhere."""
    import torch
    from transformers import JambaConfig, JambaForCausalLM

    c = dict(vocab=96, hidden=64, layers=4, heads=4, kv=2, ffn=128, ctx=64,
             E=4, topk=2, d_state=8, d_conv=4, expand=2)
    dtr = max(c["hidden"] // 16, 1)
    di = c["expand"] * c["hidden"]
    hf_cfg = JambaConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        num_experts=c["E"], num_experts_per_tok=c["topk"],
        expert_layer_period=2, expert_layer_offset=1,
        attn_layer_period=2, attn_layer_offset=0,
        mamba_d_state=c["d_state"], mamba_d_conv=c["d_conv"],
        mamba_expand=c["expand"], mamba_dt_rank=dtr,
        mamba_conv_bias=True, mamba_proj_bias=False,
        use_mamba_kernels=False, rms_norm_eps=1e-5,
        max_position_embeddings=c["ctx"], attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(53)
    with torch.no_grad():
        model = JambaForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "jamba"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.attention.head_count", c["heads"])
    w.add_metadata(f"{a}.attention.head_count_kv", c["kv"])
    w.add_metadata(f"{a}.feed_forward_length", c["ffn"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.dimension_count", 0)  # NoPE attention
    w.add_metadata(f"{a}.ssm.inner_size", di)
    w.add_metadata(f"{a}.ssm.state_size", c["d_state"])
    w.add_metadata(f"{a}.ssm.conv_kernel", c["d_conv"])
    w.add_metadata(f"{a}.ssm.time_step_rank", dtr)
    w.add_metadata(f"{a}.expert_count", c["E"])
    w.add_metadata(f"{a}.expert_used_count", c["topk"])
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        is_attn = i % 2 == 0  # attn_layer_period=2, offset=0
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        if is_attn:
            w.add_tensor_np(f"{p}.attn_q.weight",
                            sd[f"{h}.self_attn.q_proj.weight"])
            w.add_tensor_np(f"{p}.attn_k.weight",
                            sd[f"{h}.self_attn.k_proj.weight"])
            w.add_tensor_np(f"{p}.attn_v.weight",
                            sd[f"{h}.self_attn.v_proj.weight"])
            w.add_tensor_np(f"{p}.attn_output.weight",
                            sd[f"{h}.self_attn.o_proj.weight"])
        else:
            m = f"{h}.mamba"
            w.add_tensor_np(f"{p}.ssm_in.weight", sd[f"{m}.in_proj.weight"])
            w.add_tensor_np(f"{p}.ssm_conv1d.weight",
                            sd[f"{m}.conv1d.weight"][:, 0, :])
            w.add_tensor_np(f"{p}.ssm_conv1d.bias", sd[f"{m}.conv1d.bias"])
            w.add_tensor_np(f"{p}.ssm_x.weight", sd[f"{m}.x_proj.weight"])
            w.add_tensor_np(f"{p}.ssm_dt.weight", sd[f"{m}.dt_proj.weight"])
            w.add_tensor_np(f"{p}.ssm_dt.bias", sd[f"{m}.dt_proj.bias"])
            w.add_tensor_np(f"{p}.ssm_a",
                            -np.exp(sd[f"{m}.A_log"]))  # pre-transformed
            w.add_tensor_np(f"{p}.ssm_d", sd[f"{m}.D"])
            w.add_tensor_np(f"{p}.ssm_out.weight", sd[f"{m}.out_proj.weight"])
            w.add_tensor_np(f"{p}.ssm_dt_norm.weight",
                            sd[f"{m}.dt_layernorm.weight"])
            w.add_tensor_np(f"{p}.ssm_b_norm.weight",
                            sd[f"{m}.b_layernorm.weight"])
            w.add_tensor_np(f"{p}.ssm_c_norm.weight",
                            sd[f"{m}.c_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.pre_ff_layernorm.weight"])
        is_moe = i % 2 == 1  # expert_layer_period=2, offset=1
        if is_moe:
            w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                            sd[f"{h}.feed_forward.router.weight"])
            gate = np.stack(
                [sd[f"{h}.feed_forward.experts.{e}.gate_proj.weight"]
                 for e in range(c["E"])])
            up = np.stack(
                [sd[f"{h}.feed_forward.experts.{e}.up_proj.weight"]
                 for e in range(c["E"])])
            down = np.stack(
                [sd[f"{h}.feed_forward.experts.{e}.down_proj.weight"]
                 for e in range(c["E"])])
            w.add_tensor_np(f"{p}.ffn_gate_exps.weight", gate)
            w.add_tensor_np(f"{p}.ffn_up_exps.weight", up)
            w.add_tensor_np(f"{p}.ffn_down_exps.weight", down)
        else:
            w.add_tensor_np(f"{p}.ffn_gate.weight",
                            sd[f"{h}.feed_forward.gate_proj.weight"])
            w.add_tensor_np(f"{p}.ffn_up.weight",
                            sd[f"{h}.feed_forward.up_proj.weight"])
            w.add_tensor_np(f"{p}.ffn_down.weight",
                            sd[f"{h}.feed_forward.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.final_layernorm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("jb") / "jamba.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    _, cfg, _ = load_model(path, mode="dequant")
    assert cfg.layer_kinds == ("attn", "mamba", "attn", "mamba")
    assert cfg.rope.n_dims == 0  # NoPE


def test_nemotron_matches_hf(tmp_path_factory, rng):
    """Nemotron: LayerNorm1P (conversion stores weight+1, runtime is plain
    LayerNorm with bias), squared-ReLU no-gate MLP, partial NEOX RoPE over
    the first head_dim*0.5 dims (no q/k permutation at conversion)."""
    import torch
    from transformers import NemotronConfig, NemotronForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=128, ctx=64)
    hd = c["hidden"] // c["heads"]
    hf_cfg = NemotronConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        norm_eps=1e-5, partial_rotary_factor=0.5, hidden_act="relu2",
        attention_bias=False, mlp_bias=False, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(101)
    with torch.no_grad():
        model = NemotronForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "nemotron"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.rope.dimension_count", hd // 2)  # partial 0.5
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        for ours, theirs in (("attn_q", "self_attn.q_proj"),
                             ("attn_k", "self_attn.k_proj"),
                             ("attn_v", "self_attn.v_proj"),
                             ("attn_output", "self_attn.o_proj"),
                             ("ffn_up", "mlp.up_proj"),
                             ("ffn_down", "mlp.down_proj")):
            w.add_tensor_np(f"{p}.{ours}.weight", sd[f"{h}.{theirs}.weight"])
        # LayerNorm1P compensation: conversion stores weight + 1
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"] + 1.0)
        w.add_tensor_np(f"{p}.attn_norm.bias",
                        sd[f"{h}.input_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"] + 1.0)
        w.add_tensor_np(f"{p}.ffn_norm.bias",
                        sd[f"{h}.post_attention_layernorm.bias"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"] + 1.0)
    w.add_tensor_np("output_norm.bias", sd["model.norm.bias"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("nt") / "nemotron.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_olmoe_matches_hf(tmp_path_factory, rng):
    """OLMoE: flat QK-RMSNorm over the whole projection BEFORE RoPE
    (permuted alongside the llama-permuted q/k like olmo2), softmax top-k
    MoE with NO renormalization (HF norm_topk_prob=False), SwiGLU experts."""
    import torch
    from transformers import OlmoeConfig, OlmoeForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=80, ctx=64,
             experts=4, topk=2)
    hf_cfg = OlmoeConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        rms_norm_eps=1e-5, num_experts=c["experts"],
        num_experts_per_tok=c["topk"], norm_topk_prob=False,
        attention_bias=False, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(107)
    with torch.no_grad():
        model = OlmoeForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    def permute(w, n_heads):
        return (w.reshape(n_heads, 2, w.shape[0] // n_heads // 2, *w.shape[1:])
                 .swapaxes(1, 2).reshape(w.shape))

    w = GGUFWriter()
    a = "olmoe"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"]),
                     ("expert_count", c["experts"]),
                     ("expert_used_count", c["topk"])]:
        w.add_metadata(f"{a}.{key}", val)
    # NO expert_weights_norm key: norm_topk_prob=False is also llama.cpp's
    # hardcoded choice for OLMoE -> arch default must stay False
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight",
                        permute(sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight",
                        permute(sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_q_norm.weight",
                        permute(sd[f"{h}.self_attn.q_norm.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k_norm.weight",
                        permute(sd[f"{h}.self_attn.k_norm.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight", sd[f"{h}.mlp.gate.weight"])
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
            stacked = np.stack(
                [sd[f"{h}.mlp.experts.{e}.{theirs}.weight"]
                 for e in range(c["experts"])])
            w.add_tensor_np(f"{p}.ffn_{ours}_exps.weight", stacked)
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("oe") / "olmoe.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_starcoder_mqa_matches_hf(tmp_path_factory, rng):
    """StarCoder (gpt_bigcode): MQA (one shared kv head) with a COMBINED
    [q|k|v] c_attn tensor, learned absolute positions, LayerNorm with bias,
    biased projections, tanh-GELU no-gate MLP, tied embeddings."""
    import torch
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ffn=128, ctx=64)
    hf_cfg = GPTBigCodeConfig(
        vocab_size=c["vocab"], n_positions=c["ctx"], n_embd=c["hidden"],
        n_layer=c["layers"], n_head=c["heads"], n_inner=c["ffn"],
        activation_function="gelu_pytorch_tanh", multi_query=True,
        layer_norm_epsilon=1e-5, attn_pdrop=0.0, embd_pdrop=0.0,
        resid_pdrop=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(109)
    with torch.no_grad():
        model = GPTBigCodeForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "starcoder"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", 1),  # MQA
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_tensor_np("token_embd.weight", sd["transformer.wte.weight"])
    w.add_tensor_np("position_embd.weight", sd["transformer.wpe.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"transformer.h.{i}"
        w.add_tensor_np(f"{p}.attn_qkv.weight", sd[f"{h}.attn.c_attn.weight"])
        w.add_tensor_np(f"{p}.attn_qkv.bias", sd[f"{h}.attn.c_attn.bias"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.attn.c_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.bias", sd[f"{h}.attn.c_proj.bias"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.c_fc.weight"])
        w.add_tensor_np(f"{p}.ffn_up.bias", sd[f"{h}.mlp.c_fc.bias"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.c_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.bias", sd[f"{h}.mlp.c_proj.bias"])
        w.add_tensor_np(f"{p}.attn_norm.weight", sd[f"{h}.ln_1.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias", sd[f"{h}.ln_1.bias"])
        w.add_tensor_np(f"{p}.ffn_norm.weight", sd[f"{h}.ln_2.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.bias", sd[f"{h}.ln_2.bias"])
    w.add_tensor_np("output_norm.weight", sd["transformer.ln_f.weight"])
    w.add_tensor_np("output_norm.bias", sd["transformer.ln_f.bias"])
    # no output.weight: tied to token_embd like the real conversions
    path = str(tmp_path_factory.mktemp("sc") / "starcoder.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_dbrx_matches_hf(tmp_path_factory, rng):
    """DBRX: combined Wqkv with QKV clamping (clip_qkv ->
    attention.clamp_kqv), bias-free LayerNorm, norm_2 stored as
    attn_output_norm, merged expert tensors split per expert, top-k
    renormalization WITHOUT any expert_weights_norm key (arch default)."""
    import torch
    from transformers import DbrxConfig, DbrxForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=80, ctx=64,
             experts=4, topk=2)
    hd = c["hidden"] // c["heads"]
    hf_cfg = DbrxConfig(
        d_model=c["hidden"], n_heads=c["heads"], n_layers=c["layers"],
        max_seq_len=c["ctx"], vocab_size=c["vocab"],
        attn_config=dict(kv_n_heads=c["kv"], clip_qkv=0.05,
                         rope_theta=10000.0, attn_pdrop=0.0),
        ffn_config=dict(ffn_hidden_size=c["ffn"],
                        moe_num_experts=c["experts"], moe_top_k=c["topk"],
                        moe_normalize_expert_weights=1.0),
        resid_pdrop=0.0, emb_pdrop=0.0, output_router_logits=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(113)
    with torch.no_grad():
        model = DbrxForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "dbrx"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"]),
                     ("expert_count", c["experts"]),
                     ("expert_used_count", c["topk"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.attention.clamp_kqv", 0.05)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["transformer.wte.weight"])
    E, F, H = c["experts"], c["ffn"], c["hidden"]
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"transformer.blocks.{i}"
        w.add_tensor_np(f"{p}.attn_qkv.weight",
                        sd[f"{h}.norm_attn_norm.attn.Wqkv.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.norm_attn_norm.attn.out_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.norm_attn_norm.norm_1.weight"])
        w.add_tensor_np(f"{p}.attn_output_norm.weight",
                        sd[f"{h}.norm_attn_norm.norm_2.weight"])
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                        sd[f"{h}.ffn.router.layer.weight"])
        # HF merges experts: w1/v1 [E*F, H] row-chunks are gate/up weights;
        # w2 [E*F, H] chunks act as x @ chunk, so down weight = chunk.T
        w1 = sd[f"{h}.ffn.experts.mlp.w1"].reshape(E, F, H)
        v1 = sd[f"{h}.ffn.experts.mlp.v1"].reshape(E, F, H)
        w2 = sd[f"{h}.ffn.experts.mlp.w2"].reshape(E, F, H)
        w.add_tensor_np(f"{p}.ffn_gate_exps.weight", w1)
        w.add_tensor_np(f"{p}.ffn_up_exps.weight", v1)
        w.add_tensor_np(f"{p}.ffn_down_exps.weight",
                        np.ascontiguousarray(w2.transpose(0, 2, 1)))
    w.add_tensor_np("output_norm.weight", sd["transformer.norm_f.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("dx") / "dbrx.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_qwen3_matches_hf(tmp_path_factory, rng):
    """Qwen3: per-head QK-RMSNorm (q_norm/k_norm of size head_dim, applied
    before RoPE), NEOX rope (conversion does NOT permute q/k), explicit
    head_dim != hidden/heads via attention.key_length, no attention biases
    (unlike qwen2)."""
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=96, ctx=64,
             hd=32)
    hf_cfg = Qwen3Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        head_dim=c["hd"], max_position_embeddings=c["ctx"],
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_dropout=0.0,
        tie_word_embeddings=False, use_sliding_window=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(111)
    with torch.no_grad():
        model = Qwen3ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "qwen3"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_q_norm.weight",
                        sd[f"{h}.self_attn.q_norm.weight"])
        w.add_tensor_np(f"{p}.attn_k_norm.weight",
                        sd[f"{h}.self_attn.k_norm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("q3") / "qwen3.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_qwen3moe_matches_hf(tmp_path_factory, rng):
    """Qwen3-MoE: qwen3 attention (per-head QK-norm, NEOX, head_dim key)
    plus softmax top-k routing WITH renormalization (HF norm_topk_prob=True
    == llama.cpp's hardcoded norm_w for qwen3moe; no expert_weights_norm
    key is written) and a separate expert_feed_forward_length."""
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=96, ctx=64,
             hd=16, experts=4, topk=2, effn=48)
    hf_cfg = Qwen3MoeConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        head_dim=c["hd"], max_position_embeddings=c["ctx"],
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_dropout=0.0,
        num_experts=c["experts"], num_experts_per_tok=c["topk"],
        moe_intermediate_size=c["effn"], norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(113)
    with torch.no_grad():
        model = Qwen3MoeForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "qwen3moe"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", c["ffn"]),
                     ("expert_feed_forward_length", c["effn"]),
                     ("expert_count", c["experts"]),
                     ("expert_used_count", c["topk"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_q_norm.weight",
                        sd[f"{h}.self_attn.q_norm.weight"])
        w.add_tensor_np(f"{p}.attn_k_norm.weight",
                        sd[f"{h}.self_attn.k_norm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight", sd[f"{h}.mlp.gate.weight"])
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
            stacked = np.stack(
                [sd[f"{h}.mlp.experts.{e}.{theirs}.weight"]
                 for e in range(c["experts"])])
            w.add_tensor_np(f"{p}.ffn_{ours}_exps.weight", stacked)
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("q3m") / "qwen3moe.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_gpt_oss_matches_hf(tmp_path_factory, rng):
    """gpt-oss: attention sinks (extra softmax logit per head), alternating
    sliding/full layers (pattern 2, even layers sliding), biased q/k/v/o +
    router + per-expert biases, clamped SwiGLU-OAI experts (interleaved HF
    gate_up split into gate/up at conversion), top-k-then-softmax routing
    (== softmax + renorm), NEOX rope."""
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, hd=16, ctx=64,
             experts=4, topk=2, effn=48, window=4)
    hf_cfg = GptOssConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], head_dim=c["hd"],
        intermediate_size=c["effn"], num_local_experts=c["experts"],
        num_experts_per_tok=c["topk"], sliding_window=c["window"],
        rope_theta=10000.0, rms_norm_eps=1e-5, rope_scaling=None,
        max_position_embeddings=c["ctx"], attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0,
    )
    torch.manual_seed(127)
    with torch.no_grad():
        model = GptOssForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "gpt-oss"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("attention.sliding_window", c["window"]),
                     ("feed_forward_length", c["effn"]),
                     ("expert_feed_forward_length", c["effn"]),
                     ("expert_count", c["experts"]),
                     ("expert_used_count", c["topk"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("output", "o_proj")):
            w.add_tensor_np(f"{p}.attn_{ours}.weight",
                            sd[f"{h}.self_attn.{theirs}.weight"])
            w.add_tensor_np(f"{p}.attn_{ours}.bias",
                            sd[f"{h}.self_attn.{theirs}.bias"])
        w.add_tensor_np(f"{p}.attn_sinks.weight", sd[f"{h}.self_attn.sinks"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                        sd[f"{h}.mlp.router.weight"])
        w.add_tensor_np(f"{p}.ffn_gate_inp.bias", sd[f"{h}.mlp.router.bias"])
        # HF stores [E, H, 2F] with gate/up INTERLEAVED; conversion splits
        # and transposes to GGUF's [E, F, H] (out-major) layout
        gu = sd[f"{h}.mlp.experts.gate_up_proj"]
        gub = sd[f"{h}.mlp.experts.gate_up_proj_bias"]
        w.add_tensor_np(f"{p}.ffn_gate_exps.weight",
                        np.ascontiguousarray(gu[:, :, 0::2].transpose(0, 2, 1)))
        w.add_tensor_np(f"{p}.ffn_up_exps.weight",
                        np.ascontiguousarray(gu[:, :, 1::2].transpose(0, 2, 1)))
        w.add_tensor_np(f"{p}.ffn_gate_exps.bias",
                        np.ascontiguousarray(gub[:, 0::2]))
        w.add_tensor_np(f"{p}.ffn_up_exps.bias",
                        np.ascontiguousarray(gub[:, 1::2]))
        dn = sd[f"{h}.mlp.experts.down_proj"]  # [E, F, H]
        w.add_tensor_np(f"{p}.ffn_down_exps.weight",
                        np.ascontiguousarray(dn.transpose(0, 2, 1)))
        w.add_tensor_np(f"{p}.ffn_down_exps.bias",
                        sd[f"{h}.mlp.experts.down_proj_bias"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("oss") / "gptoss.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    # SWA ring-cache path must agree too (regression: the ring branch used
    # to drop the per-head sink logit on sliding layers)
    import jax.numpy as jnp

    params, cfg, _ = load_model(path, mode="dequant")
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=256,
                         swa_ring_extra=8)
    assert runner.ring_slots > 0, "ring cache did not activate"
    kv = runner.init_kv()
    t = len(tokens)
    logits, _ = runner.step(
        jnp.asarray([tokens], jnp.int32),
        jnp.asarray([list(range(t))], jnp.int32),
        jnp.asarray([t], jnp.int32), kv)
    np.testing.assert_allclose(np.asarray(logits[0]), want,
                               rtol=5e-4, atol=5e-4)


def test_gemma1_matches_hf(tmp_path_factory, rng):
    """Gemma (v1): +1-offset RMSNorm weights (converter stores w+1), NEOX
    rope, gated tanh-GELU MLP, tied embeddings, sqrt(hidden) embedding
    scale, explicit head_dim (attention.key_length) != hidden/heads."""
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=96, ctx=64,
             hd=32)
    hf_cfg = GemmaConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        head_dim=c["hd"], max_position_embeddings=c["ctx"],
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_dropout=0.0,
        hidden_activation="gelu_pytorch_tanh", attention_bias=False,
        tie_word_embeddings=True, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(131)
    with torch.no_grad():
        model = GemmaForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "gemma"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"] + 1.0)
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"] + 1.0)
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"] + 1.0)
    # tied: no output.weight
    path = str(tmp_path_factory.mktemp("g1") / "gemma.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_phi2_matches_hf(tmp_path_factory, rng):
    """Phi-2: parallel residual off a single LayerNorm, combined [q|k|v]
    attn_qkv with biases, partial NEOX rope (rope.dimension_count <
    head_dim), no-gate tanh-GELU MLP with biases, biased lm_head and
    final LayerNorm."""
    import torch
    from transformers import PhiConfig, PhiForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, ffn=128, ctx=64)
    hf_cfg = PhiConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["heads"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        partial_rotary_factor=0.5, layer_norm_eps=1e-5,
        hidden_act="gelu_new", attention_dropout=0.0, resid_pdrop=0.0,
        embd_pdrop=0.0, qk_layernorm=False, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(137)
    with torch.no_grad():
        model = PhiForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "phi2"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["heads"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("rope.dimension_count", (c["hidden"] // c["heads"]) // 2),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        qkv_w = np.concatenate([sd[f"{h}.self_attn.q_proj.weight"],
                                sd[f"{h}.self_attn.k_proj.weight"],
                                sd[f"{h}.self_attn.v_proj.weight"]])
        qkv_b = np.concatenate([sd[f"{h}.self_attn.q_proj.bias"],
                                sd[f"{h}.self_attn.k_proj.bias"],
                                sd[f"{h}.self_attn.v_proj.bias"]])
        w.add_tensor_np(f"{p}.attn_qkv.weight", qkv_w)
        w.add_tensor_np(f"{p}.attn_qkv.bias", qkv_b)
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.dense.weight"])
        w.add_tensor_np(f"{p}.attn_output.bias",
                        sd[f"{h}.self_attn.dense.bias"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.bias",
                        sd[f"{h}.input_layernorm.bias"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.fc1.weight"])
        w.add_tensor_np(f"{p}.ffn_up.bias", sd[f"{h}.mlp.fc1.bias"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.fc2.weight"])
        w.add_tensor_np(f"{p}.ffn_down.bias", sd[f"{h}.mlp.fc2.bias"])
    w.add_tensor_np("output_norm.weight", sd["model.final_layernorm.weight"])
    w.add_tensor_np("output_norm.bias", sd["model.final_layernorm.bias"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    w.add_tensor_np("output.bias", sd["lm_head.bias"])
    path = str(tmp_path_factory.mktemp("p2") / "phi2.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_olmo_matches_hf(tmp_path_factory, rng):
    """OLMo v1: NON-PARAMETRIC LayerNorm (no norm tensors in the GGUF at
    all — loader synthesizes unit weights), clip_qkv clamping, llama-style
    permuted q/k, SwiGLU, untied embeddings."""
    import torch
    from transformers import OlmoConfig, OlmoForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=96, ctx=64)
    hf_cfg = OlmoConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        clip_qkv=0.5, attention_bias=False, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(139)
    with torch.no_grad():
        model = OlmoForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "olmo"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add_metadata(f"{a}.attention.clamp_kqv", 0.5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", permute_llama(
            sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight", permute_llama(
            sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        # NO norm tensors: OLMo norms are non-parametric
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("ol") / "olmo.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_granitemoe_matches_hf(tmp_path_factory, rng):
    """GraniteMoE: the four Granite multipliers (embedding/residual/
    attention/logits) combined with MoE where HF fuses gate|up into
    input_linear [E, 2F, H] (conversion splits it) and routing is
    top-k-then-softmax (renorm default, no expert_weights_norm key)."""
    import torch
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=48, ctx=64,
             experts=4, topk=2)
    hf_cfg = GraniteMoeConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        rms_norm_eps=1e-5, num_local_experts=c["experts"],
        num_experts_per_tok=c["topk"], embedding_multiplier=6.0,
        logits_scaling=3.0, residual_multiplier=0.5,
        attention_multiplier=0.08, attention_bias=False,
        attention_dropout=0.0, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(149)
    with torch.no_grad():
        model = GraniteMoeForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "granitemoe"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("expert_count", c["experts"]),
                     ("expert_used_count", c["topk"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.embedding_scale", 6.0)
    w.add_metadata(f"{a}.logit_scale", 3.0)
    w.add_metadata(f"{a}.residual_scale", 0.5)
    w.add_metadata(f"{a}.attention.scale", 0.08)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    F, H = c["ffn"], c["hidden"]
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", permute_llama(
            sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight", permute_llama(
            sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                        sd[f"{h}.block_sparse_moe.router.layer.weight"])
        inp = sd[f"{h}.block_sparse_moe.input_linear.weight"]  # [E, 2F, H]
        w.add_tensor_np(f"{p}.ffn_gate_exps.weight",
                        np.ascontiguousarray(inp[:, :F, :]))
        w.add_tensor_np(f"{p}.ffn_up_exps.weight",
                        np.ascontiguousarray(inp[:, F:, :]))
        w.add_tensor_np(f"{p}.ffn_down_exps.weight",
                        sd[f"{h}.block_sparse_moe.output_linear.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("gm") / "granitemoe.gguf")
    w.write_to_path(path)

    # the logits multipliers shrink everything to ~1e-2, which would let a
    # wrong renorm flag hide inside a 5e-4 atol — lock the semantic (HF
    # topk-then-softmax == softmax+renorm) and compare tightly
    from llama_gguf_tpu.models.architecture import resolve
    assert resolve("granitemoe").moe_renorm_default

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_smollm3_matches_hf(tmp_path_factory, rng):
    """SmolLM3: llama-style layers where every 4th layer ((il+1)%4==0)
    skips RoPE entirely (NoPE interval 4, llama.cpp hardcodes it); 4 layers
    so the test actually crosses one NoPE layer."""
    import torch
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    c = dict(vocab=96, hidden=64, layers=4, heads=4, kv=2, ffn=96, ctx=64)
    hf_cfg = SmolLM3Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        max_position_embeddings=c["ctx"], rope_theta=10000.0,
        rms_norm_eps=1e-5, attention_bias=False, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(151)
    with torch.no_grad():
        model = SmolLM3ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "smollm3"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", permute_llama(
            sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight", permute_llama(
            sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
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
    path = str(tmp_path_factory.mktemp("s3") / "smollm3.gguf")
    w.write_to_path(path)

    # sanity: the default config really marks layer 3 NoPE
    assert hf_cfg.no_rope_layers[3] == 0

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_mamba2_matches_hf(tmp_path_factory, rng):
    """Mamba-2 (SSD): combined in_proj [z|xBC|dt], causal conv over
    [x|B|C], per-head scalar decay (ssm_a = -exp(A_log), [nh]), grouped
    B/C broadcast to heads, per-head D skip, gated full-width RMSNorm
    before out_proj, conversion-reshaped ssm_norm [ng, di/ng]."""
    import torch
    from transformers import Mamba2Config, Mamba2ForCausalLM

    c = dict(vocab=96, hidden=32, layers=2, ctx=64, ds=8, ng=2, nh=4,
             hd=16, ks=4)
    di = c["nh"] * c["hd"]  # 64 (expand=2)
    hf_cfg = Mamba2Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], state_size=c["ds"],
        head_dim=c["hd"], num_heads=c["nh"], n_groups=c["ng"],
        expand=2, conv_kernel=c["ks"], use_conv_bias=True, use_bias=False,
        rms_norm=True, layer_norm_epsilon=1e-5, rescale_prenorm_residual=False,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(157)
    with torch.no_grad():
        model = Mamba2ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "mamba2"
    w.add_metadata("general.architecture", a)
    w.add_metadata(f"{a}.block_count", c["layers"])
    w.add_metadata(f"{a}.embedding_length", c["hidden"])
    w.add_metadata(f"{a}.context_length", c["ctx"])
    w.add_metadata(f"{a}.vocab_size", c["vocab"])
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.ssm.inner_size", di)
    w.add_metadata(f"{a}.ssm.state_size", c["ds"])
    w.add_metadata(f"{a}.ssm.time_step_rank", c["nh"])  # == n_heads
    w.add_metadata(f"{a}.ssm.conv_kernel", c["ks"])
    w.add_metadata(f"{a}.ssm.group_count", c["ng"])
    w.add_tensor_np("token_embd.weight", sd["backbone.embeddings.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"backbone.layers.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight", sd[f"{h}.norm.weight"])
        w.add_tensor_np(f"{p}.ssm_in.weight", sd[f"{h}.mixer.in_proj.weight"])
        # HF conv1d.weight [conv_dim, 1, ks] -> GGUF [conv_dim, ks]
        w.add_tensor_np(f"{p}.ssm_conv1d.weight",
                        sd[f"{h}.mixer.conv1d.weight"][:, 0, :])
        w.add_tensor_np(f"{p}.ssm_conv1d.bias", sd[f"{h}.mixer.conv1d.bias"])
        w.add_tensor_np(f"{p}.ssm_dt.bias", sd[f"{h}.mixer.dt_bias"])
        w.add_tensor_np(f"{p}.ssm_a", -np.exp(sd[f"{h}.mixer.A_log"]))
        w.add_tensor_np(f"{p}.ssm_d", sd[f"{h}.mixer.D"])
        w.add_tensor_np(f"{p}.ssm_norm.weight",
                        sd[f"{h}.mixer.norm.weight"].reshape(c["ng"], -1))
        w.add_tensor_np(f"{p}.ssm_out.weight",
                        sd[f"{h}.mixer.out_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["backbone.norm_f.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("m2") / "mamba2.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_falcon_h1_matches_hf(tmp_path_factory, rng):
    """Falcon-H1: attention AND a Mamba-2 mixer in PARALLEL in every block
    off a single pre-norm, outputs summed into the residual, then a SwiGLU
    FFN half. Mixer uses GROUP-wise gated RMSNorm applied BEFORE the
    silu(z) gate (mamba_rms_norm=True path); multipliers are 1.0 (the
    conversion folds real checkpoints' multipliers into weights)."""
    import torch
    from transformers import FalconH1Config, FalconH1ForCausalLM

    c = dict(vocab=96, hidden=32, layers=2, heads=4, kv=2, ffn=64, ctx=64,
             ds=8, ng=2, nh=4, hd=16, ks=4)
    di = c["nh"] * c["hd"]  # 64
    hf_cfg = FalconH1Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        mamba_d_ssm=di, mamba_n_heads=c["nh"], mamba_d_head=c["hd"],
        mamba_n_groups=c["ng"], mamba_d_state=c["ds"], mamba_d_conv=c["ks"],
        mamba_expand=2, mamba_rms_norm=True, rope_theta=10000.0,
        rms_norm_eps=1e-5, max_position_embeddings=c["ctx"],
        attention_bias=False, tie_word_embeddings=False, pad_token_id=0,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(163)
    with torch.no_grad():
        model = FalconH1ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "falcon-h1"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.ssm.inner_size", di)
    w.add_metadata(f"{a}.ssm.state_size", c["ds"])
    w.add_metadata(f"{a}.ssm.time_step_rank", c["nh"])
    w.add_metadata(f"{a}.ssm.conv_kernel", c["ks"])
    w.add_metadata(f"{a}.ssm.group_count", c["ng"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.pre_ff_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight",
                        sd[f"{h}.feed_forward.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight",
                        sd[f"{h}.feed_forward.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight",
                        sd[f"{h}.feed_forward.down_proj.weight"])
        w.add_tensor_np(f"{p}.ssm_in.weight", sd[f"{h}.mamba.in_proj.weight"])
        w.add_tensor_np(f"{p}.ssm_conv1d.weight",
                        sd[f"{h}.mamba.conv1d.weight"][:, 0, :])
        w.add_tensor_np(f"{p}.ssm_conv1d.bias", sd[f"{h}.mamba.conv1d.bias"])
        w.add_tensor_np(f"{p}.ssm_dt.bias", sd[f"{h}.mamba.dt_bias"])
        w.add_tensor_np(f"{p}.ssm_a", -np.exp(sd[f"{h}.mamba.A_log"]))
        w.add_tensor_np(f"{p}.ssm_d", sd[f"{h}.mamba.D"])
        w.add_tensor_np(f"{p}.ssm_norm.weight",
                        sd[f"{h}.mamba.norm.weight"].reshape(c["ng"], -1))
        w.add_tensor_np(f"{p}.ssm_out.weight", sd[f"{h}.mamba.out_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.final_layernorm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("fh1") / "falconh1.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_granitehybrid_matches_hf(tmp_path_factory, rng):
    """Granite-4.0 hybrid (granitemoehybrid): per-layer mamba2 OR attention
    blocks (NoPE attention — rope.dimension_count=0), each paired with
    MoE experts PLUS an always-on shared MLP (both fused gate|up splits),
    all four Granite multipliers, residual_multiplier on the mamba half
    too."""
    import torch
    from transformers import GraniteMoeHybridConfig, GraniteMoeHybridForCausalLM

    c = dict(vocab=96, hidden=32, layers=2, heads=4, kv=2, ffn=48, ctx=64,
             ds=8, ng=2, nh=4, hd=16, ks=4, experts=4, topk=2)
    di = c["nh"] * c["hd"]  # 64 == mamba_expand * hidden
    hf_cfg = GraniteMoeHybridConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        shared_intermediate_size=c["ffn"], num_local_experts=c["experts"],
        num_experts_per_tok=c["topk"], layer_types=["mamba", "attention"],
        mamba_n_heads=c["nh"], mamba_d_head=c["hd"], mamba_n_groups=c["ng"],
        mamba_d_state=c["ds"], mamba_d_conv=c["ks"], mamba_expand=2,
        embedding_multiplier=6.0, logits_scaling=3.0,
        residual_multiplier=0.5, attention_multiplier=0.08,
        rms_norm_eps=1e-5, attention_bias=False, attention_dropout=0.0,
        max_position_embeddings=c["ctx"], tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(167)
    with torch.no_grad():
        model = GraniteMoeHybridForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "granitehybrid"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("expert_count", c["experts"]),
                     ("expert_used_count", c["topk"]),
                     ("expert_shared_count", 1),
                     ("rope.dimension_count", 0),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.embedding_scale", 6.0)
    w.add_metadata(f"{a}.logit_scale", 3.0)
    w.add_metadata(f"{a}.residual_scale", 0.5)
    w.add_metadata(f"{a}.attention.scale", 0.08)
    w.add_metadata(f"{a}.ssm.inner_size", di)
    w.add_metadata(f"{a}.ssm.state_size", c["ds"])
    w.add_metadata(f"{a}.ssm.time_step_rank", c["nh"])
    w.add_metadata(f"{a}.ssm.conv_kernel", c["ks"])
    w.add_metadata(f"{a}.ssm.group_count", c["ng"])
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    F = c["ffn"]
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        if f"{h}.mamba.in_proj.weight" in sd:
            w.add_tensor_np(f"{p}.ssm_in.weight",
                            sd[f"{h}.mamba.in_proj.weight"])
            w.add_tensor_np(f"{p}.ssm_conv1d.weight",
                            sd[f"{h}.mamba.conv1d.weight"][:, 0, :])
            w.add_tensor_np(f"{p}.ssm_conv1d.bias",
                            sd[f"{h}.mamba.conv1d.bias"])
            w.add_tensor_np(f"{p}.ssm_dt.bias", sd[f"{h}.mamba.dt_bias"])
            w.add_tensor_np(f"{p}.ssm_a", -np.exp(sd[f"{h}.mamba.A_log"]))
            w.add_tensor_np(f"{p}.ssm_d", sd[f"{h}.mamba.D"])
            w.add_tensor_np(f"{p}.ssm_norm.weight",
                            sd[f"{h}.mamba.norm.weight"].reshape(c["ng"], -1))
            w.add_tensor_np(f"{p}.ssm_out.weight",
                            sd[f"{h}.mamba.out_proj.weight"])
        else:
            w.add_tensor_np(f"{p}.attn_q.weight",
                            sd[f"{h}.self_attn.q_proj.weight"])
            w.add_tensor_np(f"{p}.attn_k.weight",
                            sd[f"{h}.self_attn.k_proj.weight"])
            w.add_tensor_np(f"{p}.attn_v.weight",
                            sd[f"{h}.self_attn.v_proj.weight"])
            w.add_tensor_np(f"{p}.attn_output.weight",
                            sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                        sd[f"{h}.block_sparse_moe.router.layer.weight"])
        inp = sd[f"{h}.block_sparse_moe.input_linear.weight"]  # [E, 2F, H]
        w.add_tensor_np(f"{p}.ffn_gate_exps.weight",
                        np.ascontiguousarray(inp[:, :F, :]))
        w.add_tensor_np(f"{p}.ffn_up_exps.weight",
                        np.ascontiguousarray(inp[:, F:, :]))
        w.add_tensor_np(f"{p}.ffn_down_exps.weight",
                        sd[f"{h}.block_sparse_moe.output_linear.weight"])
        shin = sd[f"{h}.shared_mlp.input_linear.weight"]  # [2F, H]
        w.add_tensor_np(f"{p}.ffn_gate_shexp.weight",
                        np.ascontiguousarray(shin[:F, :]))
        w.add_tensor_np(f"{p}.ffn_up_shexp.weight",
                        np.ascontiguousarray(shin[F:, :]))
        w.add_tensor_np(f"{p}.ffn_down_shexp.weight",
                        sd[f"{h}.shared_mlp.output_linear.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("gh") / "granitehybrid.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def _write_ds3_style_moe(w, a, sd, c, rope_dims=None, attn_bias=False,
                         qk_norm=True):
    """Shared GGUF assembly for DeepSeek-V3-style MoE clones (glm4moe,
    dots1): sigmoid router + e_score_correction_bias (exp_probs_b),
    group-limited top-k, shared experts, first_k_dense_replace dense
    layer 0, per-head QK-RMSNorm, NEOX (rotate-half) rope."""
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", c["ffn"]),
                     ("expert_feed_forward_length", c["effn"]),
                     ("expert_count", c["experts"]),
                     ("expert_used_count", c["topk"]),
                     ("expert_shared_count", 1),
                     ("expert_gating_func", 2),
                     ("expert_group_count", c["groups"]),
                     ("expert_group_used_count", c["topk_groups"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.expert_weights_norm", True)
    w.add_metadata(f"{a}.expert_weights_scale", c["scale"])
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    if rope_dims is not None:
        w.add_metadata(f"{a}.rope.dimension_count", rope_dims)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        for ours, theirs in (("attn_q", "q_proj"), ("attn_k", "k_proj"),
                             ("attn_v", "v_proj")):
            w.add_tensor_np(f"{p}.{ours}.weight",
                            sd[f"{h}.self_attn.{theirs}.weight"])
            if attn_bias:
                w.add_tensor_np(f"{p}.{ours}.bias",
                                sd[f"{h}.self_attn.{theirs}.bias"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        if qk_norm:
            w.add_tensor_np(f"{p}.attn_q_norm.weight",
                            sd[f"{h}.self_attn.q_norm.weight"])
            w.add_tensor_np(f"{p}.attn_k_norm.weight",
                            sd[f"{h}.self_attn.k_norm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        if f"{h}.mlp.gate.weight" in sd:  # MoE layer
            w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                            sd[f"{h}.mlp.gate.weight"])
            w.add_tensor_np(f"{p}.exp_probs_b.bias",
                            sd[f"{h}.mlp.gate.e_score_correction_bias"])
            for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                                 ("down", "down_proj")):
                stacked = np.stack(
                    [sd[f"{h}.mlp.experts.{e}.{theirs}.weight"]
                     for e in range(c["experts"])])
                w.add_tensor_np(f"{p}.ffn_{ours}_exps.weight", stacked)
                w.add_tensor_np(f"{p}.ffn_{ours}_shexp.weight",
                                sd[f"{h}.mlp.shared_experts.{theirs}.weight"])
        else:  # first_k_dense_replace dense layer
            w.add_tensor_np(f"{p}.ffn_gate.weight",
                            sd[f"{h}.mlp.gate_proj.weight"])
            w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
            w.add_tensor_np(f"{p}.ffn_down.weight",
                            sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])


def test_glm4moe_matches_hf(tmp_path_factory, rng):
    """GLM-4.5 (glm4moe): DeepSeek-V3-style sigmoid routing with
    correction bias and group-limited top-k, shared expert, first layer
    dense, per-head QK-norm, PARTIAL rotate-half rope (factor 0.5) with
    biased q/k/v — unlike dense glm4's interleaved rope."""
    import torch
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, hd=16, ffn=96,
             effn=48, ctx=64, experts=4, topk=2, groups=2, topk_groups=1,
             scale=1.5)
    hf_cfg = Glm4MoeConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], head_dim=c["hd"],
        intermediate_size=c["ffn"], moe_intermediate_size=c["effn"],
        n_routed_experts=c["experts"], num_experts_per_tok=c["topk"],
        n_shared_experts=1, n_group=c["groups"], topk_group=c["topk_groups"],
        norm_topk_prob=True, routed_scaling_factor=c["scale"],
        first_k_dense_replace=1, use_qk_norm=True,
        partial_rotary_factor=0.5, rope_theta=10000.0, rms_norm_eps=1e-5,
        attention_bias=True, attention_dropout=0.0,
        max_position_embeddings=c["ctx"], tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(173)
    with torch.no_grad():
        model = Glm4MoeForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    _write_ds3_style_moe(w, "glm4moe", sd, c, rope_dims=c["hd"] // 2,
                         attn_bias=True)
    path = str(tmp_path_factory.mktemp("g4m") / "glm4moe.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_dots1_matches_hf(tmp_path_factory, rng):
    """dots.llm1: DeepSeek-V3-style MoE routing (sigmoid + correction
    bias + groups + shared expert + dense layer 0) on a standard GQA
    attention with per-head QK-norm and full rotate-half rope."""
    import torch
    from transformers import Dots1Config, Dots1ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, hd=16, ffn=96,
             effn=48, ctx=64, experts=4, topk=2, groups=2, topk_groups=1,
             scale=1.5)
    hf_cfg = Dots1Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        moe_intermediate_size=c["effn"], n_routed_experts=c["experts"],
        num_experts_per_tok=c["topk"], n_shared_experts=1,
        n_group=c["groups"], topk_group=c["topk_groups"],
        norm_topk_prob=True, routed_scaling_factor=c["scale"],
        first_k_dense_replace=1, rope_theta=10000.0, rms_norm_eps=1e-5,
        attention_bias=False, attention_dropout=0.0,
        max_position_embeddings=c["ctx"], tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(179)
    with torch.no_grad():
        model = Dots1ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    _write_ds3_style_moe(w, "dots1", sd, c)
    path = str(tmp_path_factory.mktemp("d1") / "dots1.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_ernie4_5_matches_hf(tmp_path_factory, rng):
    """ERNIE 4.5 (dense): llama-family block with explicit head_dim and
    tied embeddings (0.3B convention); conversion permutes q/k."""
    import torch
    from transformers import Ernie4_5Config, Ernie4_5ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, hd=16, ffn=96,
             ctx=64)
    hf_cfg = Ernie4_5Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], head_dim=c["hd"],
        intermediate_size=c["ffn"], rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=c["ctx"], use_bias=False,
        tie_word_embeddings=True, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(181)
    with torch.no_grad():
        model = Ernie4_5ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "ernie4_5"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", permute_llama(
            sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight", permute_llama(
            sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
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
    # tied embeddings: no output.weight
    path = str(tmp_path_factory.mktemp("e45") / "ernie.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_seed_oss_matches_hf(tmp_path_factory, rng):
    """Seed-OSS: llama-family block with q/k/v biases (permuted along
    with the weights for q/k), bias-free o_proj, explicit head_dim."""
    import torch
    from transformers import SeedOssConfig, SeedOssForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, hd=16, ffn=96,
             ctx=64)
    hf_cfg = SeedOssConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], head_dim=c["hd"],
        intermediate_size=c["ffn"], rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=c["ctx"], attention_bias=True,
        attention_dropout=0.0, tie_word_embeddings=False, pad_token_id=0,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(191)
    with torch.no_grad():
        model = SeedOssForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    def permute_vec(b, n_heads):
        return permute_llama(b[:, None], n_heads)[:, 0]

    w = GGUFWriter()
    a = "seed_oss"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", permute_llama(
            sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_q.bias", permute_vec(
            sd[f"{h}.self_attn.q_proj.bias"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight", permute_llama(
            sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_k.bias", permute_vec(
            sd[f"{h}.self_attn.k_proj.bias"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.bias", sd[f"{h}.self_attn.v_proj.bias"])
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
    path = str(tmp_path_factory.mktemp("sos") / "seedoss.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_lfm2_matches_hf(tmp_path_factory, rng):
    """LFM2: short-conv mixer blocks (in_proj -> [B|C|x], Bx = B*x, causal
    depthwise conv over L_cache taps, y = C*conv(Bx)) interleaved with GQA
    attention blocks carrying per-head QK-norm; the FINAL norm is stored
    as token_embd_norm (llama.cpp maps HF embedding_norm there)."""
    import torch
    from transformers import Lfm2Config, Lfm2ForCausalLM

    c = dict(vocab=96, hidden=64, layers=4, heads=4, kv=2, hd=16, ctx=64,
             lc=3)
    hf_cfg = Lfm2Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=96,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        conv_L_cache=c["lc"], conv_bias=False, rope_theta=10000.0,
        norm_eps=1e-5, max_position_embeddings=c["ctx"],
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(193)
    with torch.no_grad():
        model = Lfm2ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    ffn = sd["model.layers.0.feed_forward.w1.weight"].shape[0]
    w = GGUFWriter()
    a = "lfm2"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", ffn),
                     ("shortconv.l_cache", c["lc"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.operator_norm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight", sd[f"{h}.ffn_norm.weight"])
        if f"{h}.conv.in_proj.weight" in sd:
            w.add_tensor_np(f"{p}.shortconv.in_proj.weight",
                            sd[f"{h}.conv.in_proj.weight"])
            w.add_tensor_np(f"{p}.shortconv.out_proj.weight",
                            sd[f"{h}.conv.out_proj.weight"])
            w.add_tensor_np(f"{p}.shortconv.conv.weight",
                            sd[f"{h}.conv.conv.weight"][:, 0, :])
        else:
            w.add_tensor_np(f"{p}.attn_q.weight",
                            sd[f"{h}.self_attn.q_proj.weight"])
            w.add_tensor_np(f"{p}.attn_k.weight",
                            sd[f"{h}.self_attn.k_proj.weight"])
            w.add_tensor_np(f"{p}.attn_v.weight",
                            sd[f"{h}.self_attn.v_proj.weight"])
            w.add_tensor_np(f"{p}.attn_output.weight",
                            sd[f"{h}.self_attn.out_proj.weight"])
            w.add_tensor_np(f"{p}.attn_q_norm.weight",
                            sd[f"{h}.self_attn.q_layernorm.weight"])
            w.add_tensor_np(f"{p}.attn_k_norm.weight",
                            sd[f"{h}.self_attn.k_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight",
                        sd[f"{h}.feed_forward.w1.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight",
                        sd[f"{h}.feed_forward.w3.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight",
                        sd[f"{h}.feed_forward.w2.weight"])
    w.add_tensor_np("token_embd_norm.weight",
                    sd["model.embedding_norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("lf2") / "lfm2.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_exaone4_matches_hf(tmp_path_factory, rng):
    """EXAONE-4.0: POST-norm only (no pre-norms; post_attention/
    post_feedforward norms applied to the block outputs, olmo2-style),
    per-head QK-norm, 3-sliding:1-full pattern where GLOBAL layers are
    NoPE and only sliding layers rope (rotate-half, no permute)."""
    import torch
    from transformers import Exaone4Config, Exaone4ForCausalLM

    c = dict(vocab=96, hidden=64, layers=4, heads=4, kv=2, hd=16, ffn=96,
             ctx=64, window=4)
    hf_cfg = Exaone4Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], head_dim=c["hd"],
        intermediate_size=c["ffn"], sliding_window=c["window"],
        sliding_window_pattern=4, rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=c["ctx"], attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(197)
    with torch.no_grad():
        model = Exaone4ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "exaone4"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("attention.sliding_window", c["window"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_q_norm.weight",
                        sd[f"{h}.self_attn.q_norm.weight"])
        w.add_tensor_np(f"{p}.attn_k_norm.weight",
                        sd[f"{h}.self_attn.k_norm.weight"])
        # POST-norms only (no attn_norm/ffn_norm pre-norm tensors)
        w.add_tensor_np(f"{p}.post_attention_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.post_ffw_norm.weight",
                        sd[f"{h}.post_feedforward_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("ex4") / "exaone4.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_arcee_matches_hf(tmp_path_factory, rng):
    """Arcee (AFM): llama-family attention (permuted q/k) with a
    NO-GATE squared-ReLU MLP (up -> relu^2 -> down) under RMSNorm."""
    import torch
    from transformers import ArceeConfig, ArceeForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=96, ctx=64)
    hf_cfg = ArceeConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=c["ctx"], attention_bias=False,
        attention_dropout=0.0, tie_word_embeddings=False, pad_token_id=0,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(199)
    with torch.no_grad():
        model = ArceeForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "arcee"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", permute_llama(
            sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight", permute_llama(
            sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("arc") / "arcee.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_llama4_matches_hf(tmp_path_factory, rng):
    """Llama-4: CHUNKED attention on rope layers (every 4th layer is full
    attention AND NoPE), weightless L2 QK-norm AFTER rope, log-floor
    temperature scaling of q on NoPE layers, MoE every 2nd layer with
    sigmoid top-k routing where the router score scales the expert INPUT
    (weight-before-ffn) plus an always-on shared expert; interleaved
    (NORMAL) rope with no conversion permute."""
    import torch
    from transformers.models.llama4.modeling_llama4 import Llama4ForCausalLM
    from transformers import Llama4TextConfig

    c = dict(vocab=96, hidden=64, layers=4, heads=4, kv=2, hd=16, ctx=64,
             effn=48, dffn=96, experts=4, topk=2, chunk=4)
    hf_cfg = Llama4TextConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], head_dim=c["hd"],
        intermediate_size=c["effn"], intermediate_size_mlp=c["dffn"],
        num_local_experts=c["experts"], num_experts_per_tok=c["topk"],
        interleave_moe_layer_step=2, attention_chunk_size=c["chunk"],
        use_qk_norm=True, attn_temperature_tuning=True, floor_scale=4.0,
        attn_scale=0.25, rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=c["ctx"], attention_bias=False,
        attention_dropout=0.0, tie_word_embeddings=False, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, rope_scaling=None,
    )
    torch.manual_seed(211)
    with torch.no_grad():
        model = Llama4ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "llama4"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("attention.chunk_size", c["chunk"]),
                     ("feed_forward_length", c["dffn"]),
                     ("expert_feed_forward_length", c["effn"]),
                     ("expert_count", c["experts"]),
                     ("expert_used_count", c["topk"]),
                     ("expert_shared_count", 1),
                     ("expert_gating_func", 2),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.attention.use_kq_norm", True)
    w.add_metadata(f"{a}.attention.temperature_scale", 0.25)
    w.add_metadata(f"{a}.attention.floor_scale", 4.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    F = c["effn"]
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        if f"{h}.feed_forward.router.weight" in sd:  # MoE layer
            w.add_tensor_np(f"{p}.ffn_gate_inp.weight",
                            sd[f"{h}.feed_forward.router.weight"])
            gu = sd[f"{h}.feed_forward.experts.gate_up_proj"]  # [E,H,2F]
            w.add_tensor_np(f"{p}.ffn_gate_exps.weight", np.ascontiguousarray(
                gu[:, :, :F].transpose(0, 2, 1)))
            w.add_tensor_np(f"{p}.ffn_up_exps.weight", np.ascontiguousarray(
                gu[:, :, F:].transpose(0, 2, 1)))
            dn = sd[f"{h}.feed_forward.experts.down_proj"]  # [E, F, H]
            w.add_tensor_np(f"{p}.ffn_down_exps.weight",
                            np.ascontiguousarray(dn.transpose(0, 2, 1)))
            for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                                 ("down", "down_proj")):
                w.add_tensor_np(
                    f"{p}.ffn_{ours}_shexp.weight",
                    sd[f"{h}.feed_forward.shared_expert.{theirs}.weight"])
        else:  # dense MLP layer
            w.add_tensor_np(f"{p}.ffn_gate.weight",
                            sd[f"{h}.feed_forward.gate_proj.weight"])
            w.add_tensor_np(f"{p}.ffn_up.weight",
                            sd[f"{h}.feed_forward.up_proj.weight"])
            w.add_tensor_np(f"{p}.ffn_down.weight",
                            sd[f"{h}.feed_forward.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("l4") / "llama4.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_olmo3_matches_hf(tmp_path_factory, rng):
    """OLMo 3: olmo2's flat permuted QK-norm + post-norm-only blocks,
    plus a 3-sliding:1-full window pattern where ALL layers still rope."""
    import torch
    from transformers import Olmo3Config, Olmo3ForCausalLM

    c = dict(vocab=96, hidden=64, layers=4, heads=4, kv=2, ffn=96, ctx=64,
             window=4)
    hf_cfg = Olmo3Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        sliding_window=c["window"], rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=c["ctx"], rope_scaling=None,
        attention_bias=False, attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    assert hf_cfg.layer_types == ["sliding_attention"] * 3 + ["full_attention"]
    torch.manual_seed(223)
    with torch.no_grad():
        model = Olmo3ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    def permute(w, n_heads):
        return (w.reshape(n_heads, 2, w.shape[0] // n_heads // 2, *w.shape[1:])
                 .swapaxes(1, 2).reshape(w.shape))

    w = GGUFWriter()
    a = "olmo3"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.sliding_window", c["window"]),
                     ("attention.sliding_window_pattern", 4),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight",
                        permute(sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight",
                        permute(sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_q_norm.weight",
                        permute(sd[f"{h}.self_attn.q_norm.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k_norm.weight",
                        permute(sd[f"{h}.self_attn.k_norm.weight"], c["kv"]))
        # post-norms only, like olmo2
        w.add_tensor_np(f"{p}.post_attention_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.post_ffw_norm.weight",
                        sd[f"{h}.post_feedforward_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("o3") / "olmo3.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_hunyuan_dense_matches_hf(tmp_path_factory, rng):
    """HunYuan dense v1: per-head QK-RMSNorm applied AFTER rope (unlike
    qwen3/gemma which norm before), rotate-half rope without permute."""
    import torch
    from transformers import HunYuanDenseV1Config, HunYuanDenseV1ForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, hd=16, ffn=96,
             ctx=64)
    hf_cfg = HunYuanDenseV1Config(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], head_dim=c["hd"],
        intermediate_size=c["ffn"], rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=c["ctx"], attention_bias=False,
        attention_dropout=0.0, tie_word_embeddings=False, pad_token_id=0,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(227)
    with torch.no_grad():
        model = HunYuanDenseV1ForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "hunyuan-dense"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_q_norm.weight",
                        sd[f"{h}.self_attn.query_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_k_norm.weight",
                        sd[f"{h}.self_attn.key_layernorm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("hy") / "hunyuan.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_bitnet_matches_hf(tmp_path_factory, rng):
    """BitNet b1.58 (arch, f32 weights): llama block with SUB-norms —
    RMSNorm on the attention output before o_proj and on the gated MLP
    activation before down_proj — and a GATED squared-ReLU MLP."""
    import torch
    from transformers import BitNetConfig, BitNetForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, ffn=96, ctx=64)
    hf_cfg = BitNetConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        rope_theta=10000.0, rms_norm_eps=1e-5,
        max_position_embeddings=c["ctx"], attention_dropout=0.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(229)
    with torch.no_grad():
        model = BitNetForCausalLM(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "bitnet"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", permute_llama(
            sd[f"{h}.self_attn.q_proj.weight"], c["heads"]))
        w.add_tensor_np(f"{p}.attn_k.weight", permute_llama(
            sd[f"{h}.self_attn.k_proj.weight"], c["kv"]))
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_sub_norm.weight",
                        sd[f"{h}.self_attn.attn_sub_norm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.input_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.post_attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_gate.weight", sd[f"{h}.mlp.gate_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_sub_norm.weight",
                        sd[f"{h}.mlp.ffn_sub_norm.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("bn") / "bitnet.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def _t5_pair(tmp_path_factory, rng, gated: bool, seed: int):
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    c = dict(vocab=96, hidden=64, layers=2, heads=4, hd=16, ffn=128,
             buckets=8, maxdist=20)
    hf_cfg = T5Config(
        vocab_size=c["vocab"], d_model=c["hidden"], d_kv=c["hd"],
        d_ff=c["ffn"], num_layers=c["layers"], num_heads=c["heads"],
        relative_attention_num_buckets=c["buckets"],
        relative_attention_max_distance=c["maxdist"],
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0, layer_norm_epsilon=1e-6,
        tie_word_embeddings=not gated, decoder_start_token_id=0,
        pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(seed)
    with torch.no_grad():
        model = T5ForConditionalGeneration(hf_cfg)
        model.eval()
        for p in model.parameters():
            p.mul_(0.3)
        sd = {k: v.numpy().astype(np.float32)
              for k, v in model.state_dict().items()}

    w = GGUFWriter()
    a = "t5"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("attention.relative_buckets_count", c["buckets"]),
                     ("attention.relative_max_distance", c["maxdist"]),
                     ("decoder_start_token_id", 0),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", 128),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_tensor_np("token_embd.weight", sd["shared.weight"])
    for pre, hf_side in (("enc", "encoder"), ("dec", "decoder")):
        for i in range(c["layers"]):
            p, h = f"{pre}.blk.{i}", f"{hf_side}.block.{i}"
            for ours, theirs in (("attn_q", "q"), ("attn_k", "k"),
                                 ("attn_v", "v"), ("attn_o", "o")):
                w.add_tensor_np(f"{p}.{ours}.weight",
                                sd[f"{h}.layer.0.SelfAttention.{theirs}.weight"])
            w.add_tensor_np(f"{p}.attn_norm.weight",
                            sd[f"{h}.layer.0.layer_norm.weight"])
            if i == 0:
                w.add_tensor_np(
                    f"{p}.attn_rel_b.weight",
                    sd[f"{h}.layer.0.SelfAttention"
                       ".relative_attention_bias.weight"])
            fl = 1 if pre == "enc" else 2
            if pre == "dec":
                for ours, theirs in (("cross_attn_q", "q"),
                                     ("cross_attn_k", "k"),
                                     ("cross_attn_v", "v"),
                                     ("cross_attn_o", "o")):
                    w.add_tensor_np(
                        f"{p}.{ours}.weight",
                        sd[f"{h}.layer.1.EncDecAttention.{theirs}.weight"])
                w.add_tensor_np(f"{p}.cross_attn_norm.weight",
                                sd[f"{h}.layer.1.layer_norm.weight"])
            mlp = f"{h}.layer.{fl}.DenseReluDense"
            if gated:
                w.add_tensor_np(f"{p}.ffn_gate.weight",
                                sd[f"{mlp}.wi_0.weight"])
                w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{mlp}.wi_1.weight"])
            else:
                w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{mlp}.wi.weight"])
            w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{mlp}.wo.weight"])
            w.add_tensor_np(f"{p}.ffn_norm.weight",
                            sd[f"{h}.layer.{fl}.layer_norm.weight"])
        w.add_tensor_np(f"{pre}.output_norm.weight",
                        sd[f"{hf_side}.final_layer_norm.weight"])
    if not hf_cfg.tie_word_embeddings:
        w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("t5") /
               ("t5g.gguf" if gated else "t5.gguf"))
    w.write_to_path(path)
    return path, model, c


def _t5_run_ours(path, enc_ids, dec_ids):
    import jax.numpy as jnp

    from llama_gguf_tpu.models.t5 import (t5_decode_step, t5_encode,
                                          t5_init_cache)

    params, cfg, _ = load_model(path, mode="dequant")
    enc_tok = jnp.asarray([enc_ids], jnp.int32)
    enc_mask = jnp.ones_like(enc_tok, bool)
    enc_out = t5_encode(params, cfg, enc_tok, enc_mask)
    cache = t5_init_cache(params, cfg, 1, 32, enc_out)
    t = len(dec_ids)
    logits, _ = t5_decode_step(
        params, cfg, jnp.asarray([dec_ids], jnp.int32),
        jnp.asarray([list(range(t))], jnp.int32),
        jnp.asarray([t], jnp.int32), cache, enc_mask)
    return np.asarray(logits[0]), params, cfg, enc_out, enc_mask


def test_t5_matches_hf(tmp_path_factory, rng):
    """T5 (original): ReLU FFN, tied lm_head with the d_model**-0.5 scale,
    shared relative-position-bias table (bidirectional buckets in the
    encoder, causal in the decoder), UNSCALED attention scores, cross
    attention from once-projected encoder K/V. Also checks the
    incremental path: feeding decoder tokens one step at a time through
    the scattered self-KV cache matches the batch decode."""
    import torch

    path, model, c = _t5_pair(tmp_path_factory, rng, gated=False, seed=233)
    enc_ids = rng.integers(2, c["vocab"], size=9).tolist()
    dec_ids = [0] + rng.integers(2, c["vocab"], size=5).tolist()
    with torch.no_grad():
        want = model(input_ids=torch.tensor([enc_ids]),
                     decoder_input_ids=torch.tensor([dec_ids])
                     ).logits[0].numpy()
    got, params, cfg, enc_out, enc_mask = _t5_run_ours(path, enc_ids, dec_ids)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    # incremental decode parity: one token per step
    import jax.numpy as jnp

    from llama_gguf_tpu.models.t5 import t5_decode_step, t5_init_cache
    cache = t5_init_cache(params, cfg, 1, 32, enc_out)
    last = None
    for t, tok in enumerate(dec_ids):
        last, cache = t5_decode_step(
            params, cfg, jnp.asarray([[tok]], jnp.int32),
            jnp.asarray([[t]], jnp.int32), jnp.asarray([t + 1], jnp.int32),
            cache, enc_mask)
    np.testing.assert_allclose(np.asarray(last[0, 0]), want[-1],
                               rtol=5e-4, atol=5e-4)


def test_t5_gated_matches_hf(tmp_path_factory, rng):
    """T5 v1.1/FLAN flavor: gated-GELU FFN (wi_0/wi_1 -> ffn_gate/ffn_up)
    and an untied lm_head (no output scale)."""
    import torch

    path, model, c = _t5_pair(tmp_path_factory, rng, gated=True, seed=239)
    enc_ids = rng.integers(2, c["vocab"], size=7).tolist()
    dec_ids = [0] + rng.integers(2, c["vocab"], size=4).tolist()
    with torch.no_grad():
        want = model(input_ids=torch.tensor([enc_ids]),
                     decoder_input_ids=torch.tensor([dec_ids])
                     ).logits[0].numpy()
    got = _t5_run_ours(path, enc_ids, dec_ids)[0]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_apertus_matches_hf(tmp_path_factory, rng):
    """Apertus: no-gate xIELU MLP with PER-LAYER learned activation
    constants (effective post-softplus alpha_p / beta+softplus(alpha_n)
    carried as GGUF metadata arrays), per-head pre-rope QK-norm,
    rotate-half rope without permute."""
    import torch
    from transformers import ApertusConfig, ApertusForCausalLM

    c = dict(vocab=96, hidden=64, layers=2, heads=4, kv=2, hd=16, ffn=96,
             ctx=64)
    hf_cfg = ApertusConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"],
        num_hidden_layers=c["layers"], num_attention_heads=c["heads"],
        num_key_value_heads=c["kv"], intermediate_size=c["ffn"],
        rope_theta=10000.0, rms_norm_eps=1e-5, rope_scaling=None,
        max_position_embeddings=c["ctx"], attention_bias=False,
        attention_dropout=0.0, tie_word_embeddings=False, pad_token_id=0,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(241)
    with torch.no_grad():
        model = ApertusForCausalLM(hf_cfg)
        model.eval()
        for name, p in model.named_parameters():
            if "alpha" not in name:  # keep activation params at init
                p.mul_(0.3)
        sd = {k: v.float().numpy().astype(np.float32)
              for k, v in model.state_dict().items()}  # xielu params are bf16

    # effective per-layer constants, softplus applied like the conversion
    def softplus(v):
        return float(np.log1p(np.exp(v)))

    alpha_p, alpha_n, betas, epss = [], [], [], []
    for i in range(c["layers"]):
        act = model.model.layers[i].mlp.act_fn
        beta = float(act.beta.float())
        alpha_p.append(softplus(float(act.alpha_p.float())))
        alpha_n.append(beta + softplus(float(act.alpha_n.float())))
        betas.append(beta)
        epss.append(float(act.eps.float()))

    w = GGUFWriter()
    a = "apertus"
    w.add_metadata("general.architecture", a)
    for key, val in [("embedding_length", c["hidden"]),
                     ("block_count", c["layers"]),
                     ("attention.head_count", c["heads"]),
                     ("attention.head_count_kv", c["kv"]),
                     ("attention.key_length", c["hd"]),
                     ("attention.value_length", c["hd"]),
                     ("feed_forward_length", c["ffn"]),
                     ("context_length", c["ctx"]),
                     ("vocab_size", c["vocab"])]:
        w.add_metadata(f"{a}.{key}", val)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.xielu.alpha_p", np.asarray(alpha_p, np.float32))
    w.add_metadata(f"{a}.xielu.alpha_n", np.asarray(alpha_n, np.float32))
    w.add_metadata(f"{a}.xielu.beta", np.asarray(betas, np.float32))
    w.add_metadata(f"{a}.xielu.eps", np.asarray(epss, np.float32))
    w.add_tensor_np("token_embd.weight", sd["model.embed_tokens.weight"])
    for i in range(c["layers"]):
        p, h = f"blk.{i}", f"model.layers.{i}"
        w.add_tensor_np(f"{p}.attn_q.weight", sd[f"{h}.self_attn.q_proj.weight"])
        w.add_tensor_np(f"{p}.attn_k.weight", sd[f"{h}.self_attn.k_proj.weight"])
        w.add_tensor_np(f"{p}.attn_v.weight", sd[f"{h}.self_attn.v_proj.weight"])
        w.add_tensor_np(f"{p}.attn_output.weight",
                        sd[f"{h}.self_attn.o_proj.weight"])
        w.add_tensor_np(f"{p}.attn_q_norm.weight",
                        sd[f"{h}.self_attn.q_norm.weight"])
        w.add_tensor_np(f"{p}.attn_k_norm.weight",
                        sd[f"{h}.self_attn.k_norm.weight"])
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        sd[f"{h}.attention_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        sd[f"{h}.feedforward_layernorm.weight"])
        w.add_tensor_np(f"{p}.ffn_up.weight", sd[f"{h}.mlp.up_proj.weight"])
        w.add_tensor_np(f"{p}.ffn_down.weight", sd[f"{h}.mlp.down_proj.weight"])
    w.add_tensor_np("output_norm.weight", sd["model.norm.weight"])
    w.add_tensor_np("output.weight", sd["lm_head.weight"])
    path = str(tmp_path_factory.mktemp("ap") / "apertus.gguf")
    w.write_to_path(path)

    tokens = rng.integers(0, c["vocab"], size=10).tolist()
    with torch.no_grad():
        want = model(torch.tensor([tokens])).logits[0].numpy()
    got = run_ours(path, tokens, c["ctx"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
