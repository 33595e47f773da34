"""Quantization round-trip + layout correctness tests.

The scalar oracle below transliterates llama.cpp's dequantize_row_* loop
semantics directly (independent of the vectorized implementation under test),
so a vectorization index bug cannot self-validate.
"""

import numpy as np
import pytest

from llama_gguf_tpu.gguf.constants import GGMLType, QK_K, tensor_nbytes
from llama_gguf_tpu.quant import dequant as DQ
from llama_gguf_tpu.quant import quantize as QZ


# ---------------------------------------------------------------------------
# Scalar oracle (llama.cpp loop semantics, deliberately unvectorized)
# ---------------------------------------------------------------------------


def f16(lo, hi):
    return np.frombuffer(bytes([lo, hi]), dtype="<f2")[0].astype(np.float32)


def scalar_dequant_q4_k(block: bytes) -> np.ndarray:
    d = f16(block[0], block[1])
    dmin = f16(block[2], block[3])
    scales = block[4:16]
    qs = block[16:144]
    sc, mn = [], []
    for j in range(8):
        if j < 4:
            sc.append(scales[j] & 63)
            mn.append(scales[j + 4] & 63)
        else:
            sc.append((scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4))
            mn.append((scales[j + 4] >> 4) | ((scales[j] >> 6) << 4))
    out = np.zeros(256, np.float32)
    oi, qp, is_ = 0, 0, 0
    for _ in range(4):
        d1, m1 = d * sc[is_], dmin * mn[is_]
        d2, m2 = d * sc[is_ + 1], dmin * mn[is_ + 1]
        for l in range(32):
            out[oi] = d1 * (qs[qp + l] & 0xF) - m1
            oi += 1
        for l in range(32):
            out[oi] = d2 * (qs[qp + l] >> 4) - m2
            oi += 1
        qp += 32
        is_ += 2
    return out


def scalar_dequant_q6_k(block: bytes) -> np.ndarray:
    ql = block[0:128]
    qh = block[128:192]
    sc = np.frombuffer(block[192:208], dtype=np.int8)
    d = f16(block[208], block[209])
    out = np.zeros(256, np.float32)
    for n in range(2):
        for l in range(32):
            is_ = l // 16
            q1 = ((ql[n * 64 + l] & 0xF) | ((qh[n * 32 + l] & 3) << 4)) - 32
            q2 = ((ql[n * 64 + l + 32] & 0xF) | (((qh[n * 32 + l] >> 2) & 3) << 4)) - 32
            q3 = ((ql[n * 64 + l] >> 4) | (((qh[n * 32 + l] >> 4) & 3) << 4)) - 32
            q4 = ((ql[n * 64 + l + 32] >> 4) | (((qh[n * 32 + l] >> 6) & 3) << 4)) - 32
            out[n * 128 + l] = d * sc[n * 8 + is_] * q1
            out[n * 128 + l + 32] = d * sc[n * 8 + is_ + 2] * q2
            out[n * 128 + l + 64] = d * sc[n * 8 + is_ + 4] * q3
            out[n * 128 + l + 96] = d * sc[n * 8 + is_ + 6] * q4
    return out


def scalar_dequant_q2_k(block: bytes) -> np.ndarray:
    scales = block[0:16]
    qs = block[16:80]
    d = f16(block[80], block[81])
    dmin = f16(block[82], block[83])
    out = np.zeros(256, np.float32)
    y, is_ = 0, 0
    qoff = 0
    for n in range(0, 256, 128):
        shift = 0
        for _j in range(4):
            sc = scales[is_]; is_ += 1
            dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
            for l in range(16):
                out[y] = dl * ((qs[qoff + l] >> shift) & 3) - ml
                y += 1
            sc = scales[is_]; is_ += 1
            dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
            for l in range(16):
                out[y] = dl * ((qs[qoff + l + 16] >> shift) & 3) - ml
                y += 1
            shift += 2
        qoff += 32
    return out


def scalar_dequant_q3_k(block: bytes) -> np.ndarray:
    hmask = block[0:32]
    qs = block[32:96]
    raw_sc = block[96:108]
    d = f16(block[108], block[109])
    kmask1, kmask2 = 0x03030303, 0x0F0F0F0F
    aux = list(np.frombuffer(raw_sc, dtype="<u4"))
    tmp = int(aux[2])
    a = [0] * 4
    a[2] = ((int(aux[0]) >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4)
    a[3] = ((int(aux[1]) >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4)
    a[0] = (int(aux[0]) & kmask2) | (((tmp >> 0) & kmask1) << 4)
    a[1] = (int(aux[1]) & kmask2) | (((tmp >> 2) & kmask1) << 4)
    sc_bytes = b"".join(int(v).to_bytes(4, "little") for v in a)
    scales = np.frombuffer(sc_bytes, dtype=np.int8).astype(np.int32) - 32
    out = np.zeros(256, np.float32)
    y, is_, m, qoff = 0, 0, 1, 0
    for n in range(0, 256, 128):
        shift = 0
        for _j in range(4):
            dl = d * scales[is_]; is_ += 1
            for l in range(16):
                q = ((qs[qoff + l] >> shift) & 3) - (0 if (hmask[l] & m) else 4)
                out[y] = dl * q
                y += 1
            dl = d * scales[is_]; is_ += 1
            for l in range(16):
                q = ((qs[qoff + l + 16] >> shift) & 3) - (0 if (hmask[l + 16] & m) else 4)
                out[y] = dl * q
                y += 1
            shift += 2
            m <<= 1
        qoff += 32
    return out


def scalar_dequant_q5_k(block: bytes) -> np.ndarray:
    d = f16(block[0], block[1])
    dmin = f16(block[2], block[3])
    scales = block[4:16]
    qh = block[16:48]
    qs = block[48:176]
    sc, mn = [], []
    for j in range(8):
        if j < 4:
            sc.append(scales[j] & 63)
            mn.append(scales[j + 4] & 63)
        else:
            sc.append((scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4))
            mn.append((scales[j + 4] >> 4) | ((scales[j] >> 6) << 4))
    out = np.zeros(256, np.float32)
    y, qp, is_, u1, u2 = 0, 0, 0, 1, 2
    for _ in range(4):
        d1, m1 = d * sc[is_], dmin * mn[is_]
        d2, m2 = d * sc[is_ + 1], dmin * mn[is_ + 1]
        for l in range(32):
            out[y] = d1 * ((qs[qp + l] & 0xF) + (16 if qh[l] & u1 else 0)) - m1
            y += 1
        for l in range(32):
            out[y] = d2 * ((qs[qp + l] >> 4) + (16 if qh[l] & u2 else 0)) - m2
            y += 1
        qp += 32
        is_ += 2
        u1 <<= 2
        u2 <<= 2
    return out


SCALAR_ORACLE = {
    GGMLType.Q2_K: scalar_dequant_q2_k,
    GGMLType.Q3_K: scalar_dequant_q3_k,
    GGMLType.Q4_K: scalar_dequant_q4_k,
    GGMLType.Q5_K: scalar_dequant_q5_k,
    GGMLType.Q6_K: scalar_dequant_q6_k,
}


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

ROUND_TRIP_RTOL = {
    GGMLType.Q4_0: 0.12, GGMLType.Q4_1: 0.08, GGMLType.Q5_0: 0.06,
    GGMLType.Q5_1: 0.04, GGMLType.Q8_0: 0.01, GGMLType.Q8_1: 0.01,
    GGMLType.Q2_K: 0.45, GGMLType.Q3_K: 0.30, GGMLType.Q4_K: 0.12,
    GGMLType.Q5_K: 0.07, GGMLType.Q6_K: 0.04, GGMLType.Q8_K: 0.01,
    GGMLType.IQ4_NL: 0.15,
    GGMLType.IQ4_XS: 0.15,
}


@pytest.mark.parametrize("t", sorted(ROUND_TRIP_RTOL, key=int))
def test_round_trip_error(t, rng):
    n = 4 * 256
    x = rng.standard_normal(n).astype(np.float32)
    raw = QZ.quantize(x, t)
    assert raw.nbytes == tensor_nbytes(t, n)
    y = DQ.dequantize(raw, t)
    rms = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x**2))
    assert rms < ROUND_TRIP_RTOL[t], f"{t.name}: relative RMS {rms:.4f}"


@pytest.mark.parametrize("t", sorted(SCALAR_ORACLE, key=int))
def test_vectorized_matches_scalar_oracle(t, rng):
    """Vectorized dequant must agree bit-for-bit with llama.cpp loop semantics."""
    tb = tensor_nbytes(t, QK_K)
    for trial in range(4):
        raw = rng.integers(0, 256, size=tb, dtype=np.uint8)
        got = DQ.dequantize(raw, t)
        want = SCALAR_ORACLE[t](bytes(raw))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_q4_0_known_block():
    # d = 1.0 (f16 0x3C00), qs = [0x10] means elem0 = 0-8 = -8, elem16 = 1-8 = -7
    raw = np.zeros(18, np.uint8)
    raw[0:2] = [0x00, 0x3C]
    raw[2] = 0x10
    y = DQ.dequantize(raw, GGMLType.Q4_0)
    assert y[0] == -8.0 and y[16] == -7.0
    assert np.all(y[1:16] == -8.0) and np.all(y[17:] == -8.0)


def test_q8_0_known_block():
    raw = np.zeros(34, np.uint8)
    raw[0:2] = [0x00, 0x40]  # d = 2.0
    raw[2:34] = np.arange(32).astype(np.int8).view(np.uint8)
    y = DQ.dequantize(raw, GGMLType.Q8_0)
    np.testing.assert_array_equal(y, 2.0 * np.arange(32))


def test_f16_bf16():
    x = np.array([1.0, -2.5, 0.125, 65504.0], np.float32)
    assert np.allclose(DQ.dequantize(QZ.quantize(x, GGMLType.F16), GGMLType.F16), x)
    y = DQ.dequantize(QZ.quantize(x, GGMLType.BF16), GGMLType.BF16)
    assert np.allclose(y, x, rtol=0.01)


def test_deterministic_quantize(rng):
    x = rng.standard_normal(512).astype(np.float32)
    a = QZ.quantize(x, GGMLType.Q4_K)
    b = QZ.quantize(x, GGMLType.Q4_K)
    np.testing.assert_array_equal(a, b)


def test_large_tensor_shapes(rng):
    x = rng.standard_normal((64, 256)).astype(np.float32)
    raw = QZ.quantize(x, GGMLType.Q6_K)
    y = DQ.dequantize(raw, GGMLType.Q6_K, shape=(64, 256))
    assert y.shape == (64, 256)
    rms = np.sqrt(np.mean((x - y) ** 2))
    assert rms < 0.05


def test_quantize_model_to_iq4_xs(tmp_path, rng):
    """End-to-end requantize to IQ4_XS: the output file loads and its
    dequantized weights track the f32 source."""
    import numpy as np

    from llama_gguf_tpu.gguf.requantize import QuantizeOptions, quantize_model
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    src = str(tmp_path / "f32.gguf")
    build_synthetic_gguf(src, preset="tiny", quant=GGMLType.F32)
    dst = str(tmp_path / "iq4xs.gguf")
    rep = quantize_model(src, dst, QuantizeOptions(target=GGMLType.IQ4_XS))
    assert rep.out_bytes < rep.in_bytes
    from llama_gguf_tpu.gguf.reader import GGUFFile

    g_src, g_dst = GGUFFile.open(src), GGUFFile.open(dst)
    assert any(t.ggml_type == GGMLType.IQ4_XS for t in g_dst.tensors.values())
    # ffn_down's row length (256) divides the IQ4_XS superblock; ffn_up's
    # (128) doesn't and falls back to F16 per the llama.cpp convention
    name = "blk.0.ffn_down.weight"
    assert g_dst.tensors[name].ggml_type == GGMLType.IQ4_XS
    a = DQ.dequantize(g_src.tensor_bytes(name),
                      g_src.tensors[name].ggml_type)
    b = DQ.dequantize(g_dst.tensor_bytes(name),
                      g_dst.tensors[name].ggml_type)
    rms = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a ** 2))
    assert rms < 0.15
    # and the requantized model still loads + runs through the loader
    load_model(dst, mode="dequant")
