"""Synthetic GGUF model builders for tests and benchmarks.

Builds complete GGUF files (metadata + weights + minimal tokenizer) for tiny
random models, optionally quantized — the in-process equivalent of the
reference's embedded_model_test.rs fixtures.
"""

from __future__ import annotations

import numpy as np

from llama_gguf_tpu.gguf.constants import GGMLType
from llama_gguf_tpu.gguf.writer import GGUFWriter
from llama_gguf_tpu.quant.quantize import quantize


def add_quant_tensor(w: GGUFWriter, name: str, arr: np.ndarray, t: GGMLType):
    """Quantize a 2D/3D numpy array and add it with correct GGUF dims."""
    if t == GGMLType.F32:
        w.add_tensor_np(name, arr.astype(np.float32))
        return
    raw = quantize(arr, t)
    w.add_tensor_raw(name, tuple(reversed(arr.shape)), t, raw.tobytes())


def make_tiny_model(
    path: str,
    arch: str = "qwen2",
    vocab: int = 256,
    hidden: int = 64,
    layers: int = 2,
    heads: int = 4,
    kv_heads: int = 2,
    ffn: int = 128,
    ctx: int = 128,
    rope_base: float = 10000.0,
    quant: GGMLType = GGMLType.F32,
    attention_bias: bool | None = None,
    tie_embeddings: bool = False,
    seed: int = 0,
    scale: float = 0.05,
    tokenizer: bool = False,
    extra_metadata: dict | None = None,
) -> dict[str, np.ndarray]:
    """Write a tiny random decoder-only model; returns the f32 weights dict
    keyed by GGUF tensor name (pre-quantization values)."""
    rng = np.random.default_rng(seed)
    head_dim = hidden // heads
    if attention_bias is None:
        attention_bias = arch in ("qwen2", "qwen")

    def randw(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    weights: dict[str, np.ndarray] = {}
    w = GGUFWriter()
    w.add_metadata("general.architecture", arch)
    w.add_metadata("general.name", "tiny-test")
    w.add_metadata(f"{arch}.embedding_length", hidden)
    w.add_metadata(f"{arch}.block_count", layers)
    w.add_metadata(f"{arch}.attention.head_count", heads)
    w.add_metadata(f"{arch}.attention.head_count_kv", kv_heads)
    w.add_metadata(f"{arch}.feed_forward_length", ffn)
    w.add_metadata(f"{arch}.context_length", ctx)
    w.add_metadata(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata(f"{arch}.rope.freq_base", float(rope_base))
    w.add_metadata(f"{arch}.vocab_size", vocab)
    for mk, mv in (extra_metadata or {}).items():
        w.add_metadata(mk, mv)

    if tokenizer:
        assert vocab >= 260, "tokenizer fixture needs vocab >= 260"
        toks = ["<unk>", "<s>", "</s>"]
        ttypes = [2, 3, 3]
        for b in range(256):
            toks.append(f"<0x{b:02X}>")
            ttypes.append(6)  # BYTE
        while len(toks) < vocab:
            toks.append(f"tok{len(toks)}")
            ttypes.append(1)
        w.add_metadata("tokenizer.ggml.model", "llama")
        w.add_metadata("tokenizer.ggml.tokens", toks)
        w.add_metadata("tokenizer.ggml.scores", np.zeros(vocab, np.float32))
        w.add_metadata("tokenizer.ggml.token_type", np.array(ttypes, np.int32))
        w.add_metadata("tokenizer.ggml.bos_token_id", 1)
        w.add_metadata("tokenizer.ggml.eos_token_id", 2)
        w.add_metadata("tokenizer.ggml.unknown_token_id", 0)

    def put(name, arr, q=quant):
        weights[name] = arr
        # norms / biases / small tensors stay f32 (reference behavior)
        add_quant_tensor(w, name, arr, q)

    put("token_embd.weight", randw(vocab, hidden), GGMLType.F32)
    for i in range(layers):
        p = f"blk.{i}"
        put(f"{p}.attn_norm.weight", 1.0 + randw(hidden), GGMLType.F32)
        put(f"{p}.attn_q.weight", randw(heads * head_dim, hidden))
        put(f"{p}.attn_k.weight", randw(kv_heads * head_dim, hidden))
        put(f"{p}.attn_v.weight", randw(kv_heads * head_dim, hidden))
        put(f"{p}.attn_output.weight", randw(hidden, heads * head_dim))
        if attention_bias:
            put(f"{p}.attn_q.bias", randw(heads * head_dim), GGMLType.F32)
            put(f"{p}.attn_k.bias", randw(kv_heads * head_dim), GGMLType.F32)
            put(f"{p}.attn_v.bias", randw(kv_heads * head_dim), GGMLType.F32)
        put(f"{p}.ffn_norm.weight", 1.0 + randw(hidden), GGMLType.F32)
        put(f"{p}.ffn_gate.weight", randw(ffn, hidden))
        put(f"{p}.ffn_up.weight", randw(ffn, hidden))
        put(f"{p}.ffn_down.weight", randw(hidden, ffn))
    put("output_norm.weight", 1.0 + randw(hidden), GGMLType.F32)
    if not tie_embeddings:
        put("output.weight", randw(vocab, hidden))

    w.write_to_path(path)
    return weights
