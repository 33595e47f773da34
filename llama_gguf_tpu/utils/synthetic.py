"""Synthetic GGUF model builder (random weights, real configs).

Used by bench.py, __graft_entry__.py and tests: no model downloads are
possible in the build environment, so benchmarks run on synthetic models
with the exact tensor shapes/quantization of the reference configs
(BASELINE.json: Qwen2.5-0.5B Q4_K_M etc.).
"""

from __future__ import annotations

import os

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from ..quant.quantize import quantize

PRESETS = {
    # name: (arch, vocab, hidden, layers, heads, kv_heads, ffn, ctx, tie)
    "tiny": ("qwen2", 512, 128, 2, 4, 2, 256, 256, False),
    "tiny-tied": ("qwen2", 512, 128, 2, 4, 2, 256, 256, True),
    "small": ("qwen2", 2048, 256, 4, 8, 2, 512, 512, False),
    "qwen2.5-0.5b": ("qwen2", 151936, 896, 24, 14, 2, 4864, 32768, True),
    "llama3-8b": ("llama", 128256, 4096, 32, 32, 8, 14336, 8192, False),
    "tinyllama-1.1b": ("llama", 32000, 2048, 22, 32, 4, 5632, 2048, False),
}

# Mixtral-style sparse-MoE presets (llama arch + expert_count, the GGUF
# convention mixtral converts to). BASELINE serving config "Mixtral-8x7B
# Q4_K_M (MoE, sharded experts)" — the real geometry is listed for scale
# planning; tiny-moe carries the same tensor conventions at test size.
# name: (vocab, hidden, layers, heads, kv_heads, ffn, ctx, experts, topk)
MOE_PRESETS = {
    "tiny-moe": (512, 128, 2, 4, 2, 256, 256, 4, 2),
    "mixtral-8x7b": (32000, 4096, 32, 32, 8, 14336, 32768, 8, 2),
    # Real Mixtral-8x7B PER-LAYER geometry, 8 of 32 layers: the full model
    # is ~26 GB at Q4_K_M and cannot fit one 16 GB v5e chip, but every
    # kernel shape, the expert-dispatch cost, and the per-layer byte
    # traffic are layer-local, so an 8-layer slice measures the real
    # thing and extrapolates linearly (scripts/bench_serving_configs.py).
    "mixtral-8x7b-l8": (32000, 4096, 8, 32, 8, 14336, 32768, 8, 2),
}

# Qwen3Next-style hybrid (gated full attention every 4th layer, DeltaNet
# linear attention elsewhere). BASELINE serving config "Qwen3Next Q4_K_M
# (hybrid GQA + DeltaNet, 2 hosts)".
# name: (vocab, hidden, layers, heads, kv_heads, head_dim, ffn, ctx,
#        hv, hk, dk, dv, conv)
HYBRID_PRESETS = {
    "tiny-qwen3next": (512, 128, 4, 4, 2, 32, 256, 256, 4, 2, 32, 32, 4),
}

# Falcon-H1-convention parallel hybrid: every block runs attention AND a
# Mamba-2 mixer off one pre-norm, outputs summed, then a SwiGLU FFN half.
# name: (vocab, hidden, layers, heads, kv_heads, ffn, ctx, d_inner,
#        d_state, n_groups, n_heads, conv)
FALCONH1_PRESETS = {
    "tiny-falconh1": (512, 128, 2, 4, 2, 256, 256, 128, 16, 2, 4, 4),
}


def build_synthetic_gguf(
    path: str,
    preset: str = "tiny",
    quant: GGMLType = GGMLType.Q4_K,
    seed: int = 0,
    max_ctx: int | None = None,
) -> str:
    """Write a synthetic model if not already cached; returns path."""
    if os.path.exists(path):
        return path
    if preset in MOE_PRESETS:
        return _build_moe(path, preset, quant, seed, max_ctx)
    if preset in HYBRID_PRESETS:
        return _build_hybrid(path, preset, quant, seed, max_ctx)
    if preset in FALCONH1_PRESETS:
        return _build_falconh1(path, preset, quant, seed, max_ctx)
    arch, vocab, hidden, layers, heads, kv_heads, ffn, ctx, tie = PRESETS[preset]
    if max_ctx:
        ctx = min(ctx, max_ctx)
    head_dim = hidden // heads
    rng = np.random.default_rng(seed)

    w = GGUFWriter()
    w.add_metadata("general.architecture", arch)
    w.add_metadata("general.name", f"synthetic-{preset}")
    w.add_metadata(f"{arch}.embedding_length", hidden)
    w.add_metadata(f"{arch}.block_count", layers)
    w.add_metadata(f"{arch}.attention.head_count", heads)
    w.add_metadata(f"{arch}.attention.head_count_kv", kv_heads)
    w.add_metadata(f"{arch}.feed_forward_length", ffn)
    w.add_metadata(f"{arch}.context_length", ctx)
    w.add_metadata(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata(f"{arch}.rope.freq_base", 1000000.0 if arch == "qwen2" else 10000.0)
    w.add_metadata(f"{arch}.vocab_size", vocab)
    _add_tokenizer(w, vocab)

    scale = 0.02

    def rw(*shape):
        return (rng.standard_normal(shape).astype(np.float32) * scale)

    def addq(name, arr, q=quant):
        from ..gguf.constants import type_traits

        k = arr.shape[-1]
        if q != GGMLType.F32 and k % type_traits(q).block_size != 0 \
                and k % 32 == 0:
            # llama.cpp falls back to a legacy 32-block format when a
            # K-quant's 256-superblock doesn't divide the row
            q = GGMLType.Q5_1
        if q != GGMLType.F32 and k % type_traits(q).block_size == 0:
            raw = quantize(arr, q)
            w.add_tensor_raw(name, tuple(reversed(arr.shape)), q, raw.tobytes())
        else:
            w.add_tensor_np(name, arr)

    # Q4_K_M convention: embeddings Q6_K-ish, most weights Q4_K, some Q6_K.
    # Rows not divisible by the 256-elem K-block (e.g. qwen2.5-0.5b's
    # hidden 896) quantize as Q8_0, like llama.cpp's fallback — previously
    # they silently stayed F32, which made the tied lm_head a dense-f32
    # matmul every decode step.
    if quant == GGMLType.F32:
        emb_q = GGMLType.F32
    elif hidden % 256 == 0:
        emb_q = GGMLType.Q6_K
    else:
        emb_q = GGMLType.Q8_0
    addq("token_embd.weight", rw(vocab, hidden), emb_q)
    for i in range(layers):
        p = f"blk.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        np.ones(hidden, np.float32) + rw(hidden))
        addq(f"{p}.attn_q.weight", rw(heads * head_dim, hidden))
        addq(f"{p}.attn_k.weight", rw(kv_heads * head_dim, hidden))
        addq(f"{p}.attn_v.weight", rw(kv_heads * head_dim, hidden))
        addq(f"{p}.attn_output.weight", rw(hidden, heads * head_dim))
        if arch == "qwen2":
            w.add_tensor_np(f"{p}.attn_q.bias", rw(heads * head_dim))
            w.add_tensor_np(f"{p}.attn_k.bias", rw(kv_heads * head_dim))
            w.add_tensor_np(f"{p}.attn_v.bias", rw(kv_heads * head_dim))
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        np.ones(hidden, np.float32) + rw(hidden))
        addq(f"{p}.ffn_gate.weight", rw(ffn, hidden))
        addq(f"{p}.ffn_up.weight", rw(ffn, hidden))
        addq(f"{p}.ffn_down.weight", rw(hidden, ffn),
             GGMLType.Q6_K if quant != GGMLType.F32 else GGMLType.F32)
    w.add_tensor_np("output_norm.weight", np.ones(hidden, np.float32) + rw(hidden))
    if not tie:
        addq("output.weight", rw(vocab, hidden), emb_q)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    w.write_to_path(path)
    return path


def _add_tokenizer(w: GGUFWriter, vocab: int) -> None:
    """Minimal byte-fallback SPM tokenizer metadata."""
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    ttypes = [2, 3, 3] + [6] * 256
    while len(toks) < min(vocab, 4096):
        toks.append(f"tok{len(toks)}")
        ttypes.append(1)
    w.add_metadata("tokenizer.ggml.model", "llama")
    w.add_metadata("tokenizer.ggml.tokens", toks)
    w.add_metadata("tokenizer.ggml.scores", np.zeros(len(toks), np.float32))
    w.add_metadata("tokenizer.ggml.token_type", np.array(ttypes, np.int32))
    w.add_metadata("tokenizer.ggml.bos_token_id", 1)
    w.add_metadata("tokenizer.ggml.eos_token_id", 2)
    w.add_metadata("tokenizer.ggml.unknown_token_id", 0)


def _quant_put(w: GGUFWriter, name: str, arr: np.ndarray, q: GGMLType) -> None:
    """Quantize (last-dim blocks) and add a 2D/3D tensor; f32 fallback when
    the row length doesn't divide the block size."""
    from ..gguf.constants import type_traits

    k = arr.shape[-1]
    if q != GGMLType.F32 and k % type_traits(q).block_size != 0 and k % 32 == 0:
        q = GGMLType.Q5_1
    if q != GGMLType.F32 and k % type_traits(q).block_size == 0:
        raw = quantize(arr, q)
        w.add_tensor_raw(name, tuple(reversed(arr.shape)), q, raw.tobytes())
    else:
        w.add_tensor_np(name, arr)


def _build_moe(path: str, preset: str, quant: GGMLType, seed: int,
               max_ctx: int | None) -> str:
    """Mixtral-convention sparse MoE (llama arch + expert_count metadata,
    stacked ffn_*_exps expert tensors; reference arch registry
    /root/reference/src/model/architecture.rs mixtral->llama mapping)."""
    vocab, hidden, layers, heads, kv_heads, ffn, ctx, experts, topk = \
        MOE_PRESETS[preset]
    if max_ctx:
        ctx = min(ctx, max_ctx)
    head_dim = hidden // heads
    rng = np.random.default_rng(seed)

    def rw(*shape):
        return (rng.standard_normal(shape).astype(np.float32) * 0.02)

    w = GGUFWriter()
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("general.name", f"synthetic-{preset}")
    w.add_metadata("llama.embedding_length", hidden)
    w.add_metadata("llama.block_count", layers)
    w.add_metadata("llama.attention.head_count", heads)
    w.add_metadata("llama.attention.head_count_kv", kv_heads)
    w.add_metadata("llama.feed_forward_length", ffn)
    w.add_metadata("llama.context_length", ctx)
    w.add_metadata("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata("llama.rope.freq_base", 1000000.0)
    w.add_metadata("llama.expert_count", experts)
    w.add_metadata("llama.expert_used_count", topk)
    w.add_metadata("llama.expert_weights_norm", True)
    w.add_metadata("llama.vocab_size", vocab)
    _add_tokenizer(w, vocab)

    def addq(name, arr, q=quant):
        _quant_put(w, name, arr, q)

    addq("token_embd.weight", rw(vocab, hidden),
         GGMLType.F32 if quant == GGMLType.F32 else GGMLType.Q6_K)
    for i in range(layers):
        p = f"blk.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        np.ones(hidden, np.float32) + rw(hidden))
        addq(f"{p}.attn_q.weight", rw(heads * head_dim, hidden))
        addq(f"{p}.attn_k.weight", rw(kv_heads * head_dim, hidden))
        addq(f"{p}.attn_v.weight", rw(kv_heads * head_dim, hidden))
        addq(f"{p}.attn_output.weight", rw(hidden, heads * head_dim))
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        np.ones(hidden, np.float32) + rw(hidden))
        w.add_tensor_np(f"{p}.ffn_gate_inp.weight", rw(experts, hidden))
        addq(f"{p}.ffn_gate_exps.weight", rw(experts, ffn, hidden))
        addq(f"{p}.ffn_up_exps.weight", rw(experts, ffn, hidden))
        addq(f"{p}.ffn_down_exps.weight", rw(experts, hidden, ffn),
             GGMLType.Q6_K if quant != GGMLType.F32 else GGMLType.F32)
    w.add_tensor_np("output_norm.weight",
                    np.ones(hidden, np.float32) + rw(hidden))
    addq("output.weight", rw(vocab, hidden),
         GGMLType.F32 if quant == GGMLType.F32 else GGMLType.Q6_K)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    w.write_to_path(path)
    return path


def _build_hybrid(path: str, preset: str, quant: GGMLType, seed: int,
                  max_ctx: int | None) -> str:
    """Qwen3Next-convention hybrid: DeltaNet linear-attention layers with a
    gated full-attention layer every 4th block. GGUF conventions match the
    HF-oracle builder in tests/test_arch_zoo.py (ssm_in = [q|k|v] grouped
    per k-head, z in attn_gate, (1+w) norms, partial RoPE, ssm_a
    pre-transformed)."""
    (vocab, hidden, layers, heads, kv_heads, head_dim, ffn, ctx,
     hv, hk, dk, dv, conv) = HYBRID_PRESETS[preset]
    if max_ctx:
        ctx = min(ctx, max_ctx)
    rng = np.random.default_rng(seed)

    def rw(*shape):
        return (rng.standard_normal(shape).astype(np.float32) * 0.02)

    a = "qwen3next"
    w = GGUFWriter()
    w.add_metadata("general.architecture", a)
    w.add_metadata("general.name", f"synthetic-{preset}")
    w.add_metadata(f"{a}.embedding_length", hidden)
    w.add_metadata(f"{a}.block_count", layers)
    w.add_metadata(f"{a}.attention.head_count", heads)
    w.add_metadata(f"{a}.attention.head_count_kv", kv_heads)
    w.add_metadata(f"{a}.attention.key_length", head_dim)
    w.add_metadata(f"{a}.attention.value_length", head_dim)
    w.add_metadata(f"{a}.feed_forward_length", ffn)
    w.add_metadata(f"{a}.context_length", ctx)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.rope.dimension_count", head_dim // 4)
    w.add_metadata(f"{a}.ssm.inner_size", hv * dv)
    w.add_metadata(f"{a}.ssm.state_size", dk)
    w.add_metadata(f"{a}.ssm.group_count", hk)
    w.add_metadata(f"{a}.ssm.time_step_rank", hv)
    w.add_metadata(f"{a}.ssm.conv_kernel", conv)
    w.add_metadata(f"{a}.vocab_size", vocab)
    _add_tokenizer(w, vocab)

    def addq(name, arr, q=quant):
        _quant_put(w, name, arr, q)

    conv_dim = 2 * hk * dk + hv * dv
    addq("token_embd.weight", rw(vocab, hidden),
         GGMLType.F32 if quant == GGMLType.F32 else GGMLType.Q8_0)
    for i in range(layers):
        p = f"blk.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        np.ones(hidden, np.float32) + rw(hidden))
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        np.ones(hidden, np.float32) + rw(hidden))
        addq(f"{p}.ffn_gate.weight", rw(ffn, hidden))
        addq(f"{p}.ffn_up.weight", rw(ffn, hidden))
        addq(f"{p}.ffn_down.weight", rw(hidden, ffn))
        if (i + 1) % 4 != 0:  # DeltaNet linear-attention layer
            addq(f"{p}.ssm_in.weight",
                 rw(hk * dk + hk * dk + hv * dv, hidden))
            addq(f"{p}.attn_gate.weight", rw(hv * dv, hidden))
            w.add_tensor_np(f"{p}.ssm_ba.weight", rw(2 * hv, hidden))
            w.add_tensor_np(f"{p}.ssm_conv1d.weight", rw(conv_dim, conv))
            w.add_tensor_np(f"{p}.ssm_dt.bias", rw(hv))
            w.add_tensor_np(f"{p}.ssm_a",
                            -np.exp(rw(hv)).astype(np.float32))
            w.add_tensor_np(f"{p}.ssm_norm.weight",
                            np.ones(dv, np.float32) + rw(dv))
            addq(f"{p}.ssm_out.weight", rw(hidden, hv * dv))
        else:  # gated full attention
            addq(f"{p}.attn_q.weight", rw(heads * head_dim, hidden))
            addq(f"{p}.attn_gate.weight", rw(heads * head_dim, hidden))
            addq(f"{p}.attn_k.weight", rw(kv_heads * head_dim, hidden))
            addq(f"{p}.attn_v.weight", rw(kv_heads * head_dim, hidden))
            addq(f"{p}.attn_output.weight", rw(hidden, heads * head_dim))
            w.add_tensor_np(f"{p}.attn_q_norm.weight",
                            np.ones(head_dim, np.float32) + rw(head_dim))
            w.add_tensor_np(f"{p}.attn_k_norm.weight",
                            np.ones(head_dim, np.float32) + rw(head_dim))
    w.add_tensor_np("output_norm.weight",
                    np.ones(hidden, np.float32) + rw(hidden))
    addq("output.weight", rw(vocab, hidden),
         GGMLType.F32 if quant == GGMLType.F32 else GGMLType.Q8_0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    w.write_to_path(path)
    return path


def _build_falconh1(path: str, preset: str, quant: GGMLType, seed: int,
                    max_ctx: int | None) -> str:
    """Falcon-H1-convention parallel hybrid: attention + mamba2 mixer in
    every block (GGUF conventions match tests/test_arch_zoo.py's
    falcon-h1 HF-oracle builder: in_proj = [z|xBC|dt], ssm_a = -exp(A_log)
    per head, per-group gated ssm_norm stored [ng, di/ng])."""
    (vocab, hidden, layers, heads, kv_heads, ffn, ctx,
     di, ds, ng, nh, conv) = FALCONH1_PRESETS[preset]
    if max_ctx:
        ctx = min(ctx, max_ctx)
    head_dim = hidden // heads
    rng = np.random.default_rng(seed)

    def rw(*shape):
        return (rng.standard_normal(shape).astype(np.float32) * 0.02)

    a = "falcon-h1"
    w = GGUFWriter()
    w.add_metadata("general.architecture", a)
    w.add_metadata("general.name", f"synthetic-{preset}")
    w.add_metadata(f"{a}.embedding_length", hidden)
    w.add_metadata(f"{a}.block_count", layers)
    w.add_metadata(f"{a}.attention.head_count", heads)
    w.add_metadata(f"{a}.attention.head_count_kv", kv_heads)
    w.add_metadata(f"{a}.feed_forward_length", ffn)
    w.add_metadata(f"{a}.context_length", ctx)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata(f"{a}.rope.freq_base", 10000.0)
    w.add_metadata(f"{a}.ssm.inner_size", di)
    w.add_metadata(f"{a}.ssm.state_size", ds)
    w.add_metadata(f"{a}.ssm.group_count", ng)
    w.add_metadata(f"{a}.ssm.time_step_rank", nh)
    w.add_metadata(f"{a}.ssm.conv_kernel", conv)
    w.add_metadata(f"{a}.vocab_size", vocab)
    _add_tokenizer(w, vocab)

    def addq(name, arr, q=quant):
        _quant_put(w, name, arr, q)

    conv_dim = di + 2 * ng * ds
    addq("token_embd.weight", rw(vocab, hidden),
         GGMLType.F32 if quant == GGMLType.F32 else GGMLType.Q8_0)
    for i in range(layers):
        p = f"blk.{i}"
        w.add_tensor_np(f"{p}.attn_norm.weight",
                        np.ones(hidden, np.float32) + rw(hidden))
        w.add_tensor_np(f"{p}.ffn_norm.weight",
                        np.ones(hidden, np.float32) + rw(hidden))
        addq(f"{p}.attn_q.weight", rw(heads * head_dim, hidden))
        addq(f"{p}.attn_k.weight", rw(kv_heads * head_dim, hidden))
        addq(f"{p}.attn_v.weight", rw(kv_heads * head_dim, hidden))
        addq(f"{p}.attn_output.weight", rw(hidden, heads * head_dim))
        addq(f"{p}.ssm_in.weight", rw(2 * di + 2 * ng * ds + nh, hidden))
        w.add_tensor_np(f"{p}.ssm_conv1d.weight", rw(conv_dim, conv))
        w.add_tensor_np(f"{p}.ssm_conv1d.bias", rw(conv_dim))
        w.add_tensor_np(f"{p}.ssm_dt.bias", rw(nh))
        w.add_tensor_np(f"{p}.ssm_a", -np.exp(rw(nh)).astype(np.float32))
        w.add_tensor_np(f"{p}.ssm_d", rw(nh))
        w.add_tensor_np(f"{p}.ssm_norm.weight",
                        (np.ones(di, np.float32) + rw(di)).reshape(ng, -1))
        addq(f"{p}.ssm_out.weight", rw(hidden, di))
        addq(f"{p}.ffn_gate.weight", rw(ffn, hidden))
        addq(f"{p}.ffn_up.weight", rw(ffn, hidden))
        addq(f"{p}.ffn_down.weight", rw(hidden, ffn))
    w.add_tensor_np("output_norm.weight",
                    np.ones(hidden, np.float32) + rw(hidden))
    addq("output.weight", rw(vocab, hidden),
         GGMLType.F32 if quant == GGMLType.F32 else GGMLType.Q8_0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    w.write_to_path(path)
    return path


def build_synthetic_t5(path: str, vocab: int = 512, hidden: int = 64,
                       layers: int = 2, heads: int = 4, hd: int = 16,
                       ffn: int = 128, gated: bool = False,
                       decoder: bool = True, seed: int = 0) -> str:
    """Synthetic T5 GGUF (llama.cpp enc./dec. naming); ``decoder=False``
    emits an encoder-only `t5encoder` model."""
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)

    def rw(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    a = "t5" if decoder else "t5encoder"
    w = GGUFWriter()
    w.add_metadata("general.architecture", a)
    w.add_metadata("general.name", "synthetic-tiny-t5")
    w.add_metadata(f"{a}.embedding_length", hidden)
    w.add_metadata(f"{a}.block_count", layers)
    w.add_metadata(f"{a}.attention.head_count", heads)
    w.add_metadata(f"{a}.attention.key_length", hd)
    w.add_metadata(f"{a}.attention.value_length", hd)
    w.add_metadata(f"{a}.attention.relative_buckets_count", 8)
    w.add_metadata(f"{a}.attention.relative_max_distance", 20)
    w.add_metadata(f"{a}.decoder_start_token_id", 0)
    w.add_metadata(f"{a}.feed_forward_length", ffn)
    w.add_metadata(f"{a}.context_length", 512)
    w.add_metadata(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_metadata(f"{a}.vocab_size", vocab)
    _add_tokenizer(w, vocab)
    w.add_tensor_np("token_embd.weight", rw(vocab, hidden))
    for pre in (("enc", "dec") if decoder else ("enc",)):
        for i in range(layers):
            p = f"{pre}.blk.{i}"
            w.add_tensor_np(f"{p}.attn_q.weight", rw(heads * hd, hidden))
            w.add_tensor_np(f"{p}.attn_k.weight", rw(heads * hd, hidden))
            w.add_tensor_np(f"{p}.attn_v.weight", rw(heads * hd, hidden))
            w.add_tensor_np(f"{p}.attn_o.weight", rw(hidden, heads * hd))
            w.add_tensor_np(f"{p}.attn_norm.weight",
                            np.ones(hidden, np.float32) + rw(hidden))
            if i == 0:
                w.add_tensor_np(f"{p}.attn_rel_b.weight", rw(8, heads))
            if pre == "dec":
                w.add_tensor_np(f"{p}.cross_attn_q.weight",
                                rw(heads * hd, hidden))
                w.add_tensor_np(f"{p}.cross_attn_k.weight",
                                rw(heads * hd, hidden))
                w.add_tensor_np(f"{p}.cross_attn_v.weight",
                                rw(heads * hd, hidden))
                w.add_tensor_np(f"{p}.cross_attn_o.weight",
                                rw(hidden, heads * hd))
                w.add_tensor_np(f"{p}.cross_attn_norm.weight",
                                np.ones(hidden, np.float32) + rw(hidden))
            if gated:
                w.add_tensor_np(f"{p}.ffn_gate.weight", rw(ffn, hidden))
            w.add_tensor_np(f"{p}.ffn_up.weight", rw(ffn, hidden))
            w.add_tensor_np(f"{p}.ffn_down.weight", rw(hidden, ffn))
            w.add_tensor_np(f"{p}.ffn_norm.weight",
                            np.ones(hidden, np.float32) + rw(hidden))
        w.add_tensor_np(f"{pre}.output_norm.weight",
                        np.ones(hidden, np.float32) + rw(hidden))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    w.write_to_path(path)
    return path
