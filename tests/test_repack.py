"""Repacked TPU layouts must reconstruct exactly to the f32 dequant oracle."""

import numpy as np
import pytest

from llama_gguf_tpu.gguf.constants import GGMLType
from llama_gguf_tpu.quant.dequant import dequantize
from llama_gguf_tpu.quant.quantize import quantize
from llama_gguf_tpu.quant.repack import dequantize_repacked, repack

FORMATS = [
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
    GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K, GGMLType.IQ4_NL,
]


@pytest.mark.parametrize("t", FORMATS, ids=lambda t: t.name)
def test_repack_reconstruction_exact(t, rng):
    n, k = 8, 512
    x = rng.standard_normal((n, k)).astype(np.float32)
    raw = quantize(x, t)
    oracle = dequantize(raw, t, shape=(n, k))  # [N, K]
    rw = repack(raw, t, (n, k))
    got = dequantize_repacked(rw).T  # [K, N] -> [N, K]
    np.testing.assert_allclose(got, oracle, rtol=0, atol=1e-6)


@pytest.mark.parametrize("t", FORMATS, ids=lambda t: t.name)
def test_repack_bits_per_weight(t):
    n, k = 8, 512
    raw = quantize(np.zeros((n, k), np.float32), t)
    rw = repack(raw, t, (n, k))
    # sanity: packed layouts use at most 16 bits/weight (f32 scales incl.)
    assert rw.bits_per_weight <= 16.5, rw.bits_per_weight
    assert rw.scales.shape == (k // rw.group, n)
    if rw.fmt == "q4":
        assert rw.packed.shape == (k // 2, n)
    else:
        assert rw.packed.shape == (k, n)


def test_repack_cache_roundtrip(tmp_path):
    """First quant-mode load writes a .repack sidecar; the second load
    reads it back zero-copy with bit-identical arrays; touching the GGUF
    invalidates it (source signature check)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_tiny_model
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.ops.linear import QuantLinear
    from llama_gguf_tpu.quant.repack_cache import RepackCache, cache_path

    path = str(tmp_path / "tiny.gguf")
    # Q4_K needs 256-divisible K dims
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=256, layers=2,
                    heads=4, kv_heads=2, ffn=256, ctx=64, seed=3,
                    quant=GGMLType.Q4_K)

    params1, _, _ = load_model(path, mode="quant")
    assert os.path.exists(cache_path(path))

    params2, _, _ = load_model(path, mode="quant")

    import jax

    def quant_leaves(p):
        out = []
        jax.tree_util.tree_map(
            lambda t: out.append(t) if isinstance(t, QuantLinear) else None,
            p, is_leaf=lambda t: isinstance(t, QuantLinear))
        return out

    l1, l2 = quant_leaves(params1), quant_leaves(params2)
    assert l1 and len(l1) == len(l2)
    for a, b in zip(l1, l2):
        assert a.fmt == b.fmt and a.group == b.group
        np.testing.assert_array_equal(np.asarray(a.packed),
                                      np.asarray(b.packed))
        np.testing.assert_array_equal(np.asarray(a.scales),
                                      np.asarray(b.scales))
        if a.mins is not None:
            np.testing.assert_array_equal(np.asarray(a.mins),
                                          np.asarray(b.mins))

    # invalidation: rewrite the gguf -> signature mismatch -> cache rebuilt
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=256, layers=2,
                    heads=4, kv_heads=2, ffn=256, ctx=64, seed=4,
                    quant=GGMLType.Q4_K)
    c = RepackCache(path)
    assert not c.valid  # stale sidecar rejected
    params3, _, _ = load_model(path, mode="quant")  # rebuilds
    c2 = RepackCache(path)
    assert c2.valid


def test_inline_packing_matches_reference_pack_fns(rng):
    """repack() packs bit-planes inline in [N, K] orientation for speed;
    pack_q4_group_split remains the layout REFERENCE — pin that both
    produce identical bytes so the copies cannot drift."""
    import numpy as np

    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.quant import repack as RP
    from llama_gguf_tpu.quant.quantize import quantize

    n, k = 48, 512
    x = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)

    raw4 = quantize(x, GGMLType.Q4_K)
    rw4 = RP.repack(raw4, GGMLType.Q4_K, (n, k))
    q, _, _, fmt, group = RP._extract(
        np.frombuffer(raw4, np.uint8), GGMLType.Q4_K, n, k)
    assert fmt == "q4"
    ref = RP.pack_q4_group_split(
        np.ascontiguousarray(q.T).astype(np.uint8), group)
    np.testing.assert_array_equal(rw4.packed, ref)

    # Q6_K rides the int8 layout (the dedicated q6 plane layout was
    # measured a net loss and deleted in round 3)
    raw6 = quantize(x, GGMLType.Q6_K)
    rw6 = RP.repack(raw6, GGMLType.Q6_K, (n, k))
    assert rw6.fmt == "q8"
    assert rw6.packed.shape == (k, n)
