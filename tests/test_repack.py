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
    elif rw.fmt == "q6":
        assert rw.packed.shape == (k // 2, n)
        assert rw.packed2.shape == (k // 4, n)
        assert rw.bits_per_weight <= 8.6  # ~6.75 + f32 scales
    else:
        assert rw.packed.shape == (k, n)
