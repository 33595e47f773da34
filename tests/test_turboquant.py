"""TurboQuant compressed-KV tests: rotation orthogonality, pack/unpack
exactness, quantization error bounds, dot-product preservation, QJL
estimator, and end-to-end generation with tq2/tq3 caches."""

import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_tiny_model
from llama_gguf_tpu.engine.engine import Engine, EngineConfig
from llama_gguf_tpu.models import kv as KV
from llama_gguf_tpu.models.turboquant import (
    compress, decompress, dequantize_midrise, hadamard_matrix, pack_levels,
    qjl_compress, qjl_scores, quantize_midrise, rotate, unpack_levels,
)
from llama_gguf_tpu.sampling.sampler import SamplerConfig

GREEDY = SamplerConfig(temperature=0.0, repetition_penalty=1.0)


def test_hadamard_orthonormal():
    for d in (8, 64, 128):
        h = hadamard_matrix(d)
        assert np.allclose(h @ h.T, np.eye(d), atol=1e-5)
    with pytest.raises(ValueError):
        hadamard_matrix(24)


def test_rotation_preserves_dot_products(rng):
    a = rng.normal(size=(5, 64)).astype(np.float32)
    b = rng.normal(size=(7, 64)).astype(np.float32)
    ra, rb = np.asarray(rotate(jnp.asarray(a))), np.asarray(rotate(jnp.asarray(b)))
    assert np.allclose(ra @ rb.T, a @ b.T, atol=1e-4)


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_pack_unpack_exact(bits, rng):
    d = 64
    q = rng.integers(0, 1 << bits, size=(3, 5, d)).astype(np.uint8)
    packed = pack_levels(jnp.asarray(q), bits)
    assert packed.shape[-1] == d * bits // 8
    got = np.asarray(unpack_levels(packed, bits, d))
    assert np.array_equal(got, q)


@pytest.mark.parametrize("bits,max_rel", [(2, 0.45), (3, 0.22), (4, 0.11)])
def test_quant_error_bounds(bits, max_rel, rng):
    x = rng.normal(size=(100, 64)).astype(np.float32)
    q, delta = quantize_midrise(jnp.asarray(x), bits)
    back = np.asarray(dequantize_midrise(q, delta, bits))
    rel = np.linalg.norm(back - x) / np.linalg.norm(x)
    assert rel < max_rel, rel


@pytest.mark.parametrize("bits", [2, 3])
def test_compress_preserves_attention_scores(bits, rng):
    """Scores from decompressed keys stay correlated with true scores."""
    k = rng.normal(size=(32, 64)).astype(np.float32)
    q = rng.normal(size=(64,)).astype(np.float32)
    packed, delta = compress(jnp.asarray(k), bits)
    back = np.asarray(decompress(packed, delta, bits, 64))
    true = k @ q
    approx = back @ q
    corr = np.corrcoef(true, approx)[0, 1]
    assert corr > (0.97 if bits == 3 else 0.9), corr
    assert np.argmax(true) == np.argmax(approx) or \
        abs(true[np.argmax(approx)] - true.max()) < 0.15 * np.abs(true).max()


def test_qjl_unbiased_scores(rng):
    k = rng.normal(size=(64, 128)).astype(np.float32)
    q = rng.normal(size=(128,)).astype(np.float32)
    packed, norms = qjl_compress(jnp.asarray(k))
    assert packed.shape == (64, 16)  # 1 bit/dim
    est = np.asarray(qjl_scores(jnp.asarray(q), packed, norms))
    true = k @ q
    corr = np.corrcoef(true, est)[0, 1]
    assert corr > 0.75, corr
    # scale is right on average (unbiased up to estimator variance)
    ratio = np.polyfit(true, est, 1)[0]
    assert 0.7 < ratio < 1.3, ratio


@pytest.mark.parametrize("fmt,ratio", [("tq2", 12.0), ("tq3", 9.0)])
def test_cache_memory_ratio(fmt, ratio):
    f32 = KV.init_cache(2, 1, 64, 4, 64, fmt="f32")
    tq = KV.init_cache(2, 1, 64, 4, 64, fmt=fmt)
    assert KV.memory_bytes(f32) / KV.memory_bytes(tq) > ratio


def test_cache_write_read_roundtrip(rng):
    kv = KV.init_cache(1, 1, 8, 2, 64, fmt="tq3")
    k = jnp.asarray(rng.normal(size=(1, 4, 2, 64)).astype(np.float32))
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None])
    kv = KV.write(kv, 0, k, k, pos)
    ko, vo = KV.read(kv, 0, head_dim=64, v_head_dim=64)
    rel = np.linalg.norm(np.asarray(ko[0, :4]) - np.asarray(k[0])) / \
        np.linalg.norm(np.asarray(k[0]))
    assert rel < 0.25, rel


@pytest.mark.parametrize("fmt", ["tq2", "tq3"])
def test_generation_with_turboquant_kv(tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("tq") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    ref = Engine.load(path, EngineConfig(weight_mode="dequant"))
    tq = Engine.load(path, EngineConfig(weight_mode="dequant", kv_format=fmt))
    ids = ref.tokenizer.encode("tok1 tok2 tok3")
    a = ref.greedy_tokens(ids, 6)
    b = tq.greedy_tokens(ids, 6)
    assert len(b) == len(a)  # runs end-to-end; lossy cache may diverge later


def test_qjl_cache_format_and_memory():
    kv = KV.init_cache(2, 1, 64, 4, 64, fmt="qjl")
    assert KV.cache_format(kv, head_dim=64) == "qjl"
    f32 = KV.init_cache(2, 1, 64, 4, 64, fmt="f32")
    # keys 1-bit + f32 norm, values 4-bit + scale: >5x total
    assert KV.memory_bytes(f32) / KV.memory_bytes(kv) > 5


def test_generation_with_qjl_kv(tmp_path_factory):
    """End-to-end decode with attention computed ON compressed keys."""
    path = str(tmp_path_factory.mktemp("qjl") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    ref = Engine.load(path, EngineConfig(weight_mode="dequant"))
    qjl = Engine.load(path, EngineConfig(weight_mode="dequant",
                                         kv_format="qjl"))
    ids = ref.tokenizer.encode("tok1 tok2 tok3")
    out = qjl.greedy_tokens(ids, 8)
    out2 = qjl.greedy_tokens(ids, 8)
    assert out == out2 and len(out) >= 1  # runs, deterministic
    # scores are estimates: outputs may diverge from exact attention, but
    # the very first token (short context) usually agrees
    exact = ref.greedy_tokens(ids, 1)
    assert isinstance(exact[0], int)
