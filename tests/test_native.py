"""Native C++ dequant: bit-exact parity with the numpy reference kernels,
plus a throughput sanity check."""

import time

import numpy as np
import pytest

from llama_gguf_tpu import native
from llama_gguf_tpu.gguf.constants import GGMLType
from llama_gguf_tpu.quant import dequant as dq
from llama_gguf_tpu.quant.quantize import quantize

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")

NUMPY_FNS = {
    "Q4_0": dq.dequantize_q4_0, "Q4_1": dq.dequantize_q4_1,
    "Q5_0": dq.dequantize_q5_0, "Q5_1": dq.dequantize_q5_1,
    "Q8_0": dq.dequantize_q8_0, "Q4_K": dq.dequantize_q4_k,
    "Q5_K": dq.dequantize_q5_k, "Q6_K": dq.dequantize_q6_k,
    "Q8_K": dq.dequantize_q8_k,
}


@pytest.mark.parametrize("fmt", sorted(native.NATIVE_FORMATS))
def test_native_matches_numpy_bitexact(fmt, rng):
    t = GGMLType[fmt]
    x = rng.normal(size=4096).astype(np.float32)
    raw = quantize(x, t)
    want = NUMPY_FNS[fmt](np.frombuffer(raw, np.uint8))
    got = native.dequantize_native(raw, fmt)
    assert got is not None
    assert np.array_equal(got, want), np.abs(got - want).max()


@pytest.mark.parametrize("fmt", ["Q4_K", "Q6_K", "Q8_0"])
def test_random_bytes_no_crash_and_match(fmt, rng):
    """Arbitrary byte patterns (worst-case scales/nibbles) decode
    identically — guards the f16 edge cases (subnormals, inf/nan)."""
    _, block_bytes, _ = native.NATIVE_FORMATS[fmt]
    raw = rng.integers(0, 256, size=block_bytes * 64, dtype=np.uint8)
    want = NUMPY_FNS[fmt](raw)
    got = native.dequantize_native(raw, fmt)
    w = np.asarray(want)
    g = np.asarray(got)
    both_nan = np.isnan(w) & np.isnan(g)
    assert np.array_equal(w[~both_nan], g[~both_nan])


def test_dispatch_through_dequantize(rng):
    """quant.dequant.dequantize routes big buffers through the native lib
    and produces the same values as the numpy path."""
    x = rng.normal(size=256 * 512).astype(np.float32)  # > 64 KiB raw
    raw = quantize(x, GGMLType.Q4_K)
    via_dispatch = dq.dequantize(raw, GGMLType.Q4_K)
    direct_numpy = dq.dequantize_q4_k(np.frombuffer(raw, np.uint8))
    assert np.array_equal(via_dispatch, direct_numpy)


def test_throughput_not_absurdly_slow(rng):
    """Native Q4_K dequant should move at least ~200 MB/s of output."""
    x = rng.normal(size=256 * 4096).astype(np.float32)
    raw = quantize(x, GGMLType.Q4_K)
    native.dequantize_native(raw, "Q4_K")  # warm
    t0 = time.time()
    for _ in range(5):
        native.dequantize_native(raw, "Q4_K")
    dt = (time.time() - t0) / 5
    mbps = x.nbytes / dt / 1e6
    assert mbps > 200, f"{mbps:.0f} MB/s"
