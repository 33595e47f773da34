"""TurboQuant: 2/3-bit compressed KV cache primitives.

Parity target: /root/reference/src/model/kv_turboquant.rs:19-176 and
src/model/turboquant/{quant.rs:26-206,rotation.rs,qjl.rs,codebook.rs}:
Hadamard rotation -> scalar quantization (mid-rise, amax-scaled) -> optional
QJL (sign-bit) unbiased inner-product estimation, with attention computed in
the rotated space.

TPU-native design choices:
  * the Hadamard rotation is a [D, D] matmul with a Sylvester-construction
    orthonormal matrix — a tiny MXU op that XLA fuses into the cache write /
    read, instead of the reference's recursive butterfly on CPU
  * quantized levels are bit-PACKED into uint8 lanes (4 values/byte at
    2 bits, 8 values per 3 bytes at 3 bits) with vectorized shift/mask
    unpacking — real 10-16x HBM savings vs f32, not int8 storage
  * because H is orthonormal, de-rotating on read (H^T x) reproduces exact
    dot products, so the attention code is unchanged; the unpack+scale+
    de-rotate fuses into the attention matmul
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def hadamard_matrix(dim: int) -> np.ndarray:
    """Orthonormal Walsh-Hadamard matrix (Sylvester), dim a power of 2."""
    if dim & (dim - 1):
        raise ValueError(f"hadamard dim must be a power of 2, got {dim}")
    h = np.array([[1.0]], np.float32)
    while h.shape[0] < dim:
        h = np.block([[h, h], [h, -h]])
    return (h / np.sqrt(dim)).astype(np.float32)


def rotate(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Apply the (orthonormal, symmetric) Hadamard rotation along axis -1."""
    h = jnp.asarray(hadamard_matrix(x.shape[-1]))
    # H is symmetric and orthonormal: H^-1 = H^T = H
    del inverse
    return jnp.einsum("...d,de->...e", x.astype(jnp.float32), h)


# ---------------------------------------------------------------------------
# mid-rise scalar quantization (quant.rs:26-206)
# ---------------------------------------------------------------------------


def quantize_midrise(x: jnp.ndarray, bits: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x [..., D] -> (levels uint8 [..., D] in [0, 2^bits), scale [...]).

    Mid-rise uniform quantizer: deq = (level - offset + 0.5) * delta with
    delta = 2*amax/2^bits — MSE-reasonable for the near-Gaussian rotated
    coordinates (the Hadamard rotation gaussianizes outliers)."""
    n = 1 << bits
    amax = jnp.max(jnp.abs(x), axis=-1)
    delta = jnp.maximum(2.0 * amax / n, 1e-12)
    q = jnp.floor(x / delta[..., None]) + (n // 2)
    q = jnp.clip(q, 0, n - 1).astype(jnp.uint8)
    return q, delta.astype(jnp.float32)


def dequantize_midrise(q: jnp.ndarray, delta: jnp.ndarray,
                       bits: int) -> jnp.ndarray:
    n = 1 << bits
    return (q.astype(jnp.float32) - (n // 2) + 0.5) * delta[..., None]


# ---------------------------------------------------------------------------
# bit packing (uint8 lanes)
# ---------------------------------------------------------------------------


def pack_levels(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack uint8 levels [..., D] -> packed uint8 [..., D*bits/8]."""
    d = q.shape[-1]
    if bits == 2:
        assert d % 4 == 0
        g = q.reshape(*q.shape[:-1], d // 4, 4).astype(jnp.uint8)
        return (g[..., 0] | (g[..., 1] << 2) | (g[..., 2] << 4)
                | (g[..., 3] << 6))
    if bits == 3:
        assert d % 8 == 0
        g = q.reshape(*q.shape[:-1], d // 8, 8).astype(jnp.uint32)
        word = jnp.zeros(g.shape[:-1], jnp.uint32)
        for i in range(8):
            word = word | (g[..., i] << (3 * i))
        b0 = (word & 0xFF).astype(jnp.uint8)
        b1 = ((word >> 8) & 0xFF).astype(jnp.uint8)
        b2 = ((word >> 16) & 0xFF).astype(jnp.uint8)
        return jnp.stack([b0, b1, b2], axis=-1).reshape(
            *q.shape[:-1], d * 3 // 8)
    if bits == 4:
        assert d % 2 == 0
        g = q.reshape(*q.shape[:-1], d // 2, 2).astype(jnp.uint8)
        return g[..., 0] | (g[..., 1] << 4)
    raise ValueError(f"unsupported bit width {bits}")


def unpack_levels(p: jnp.ndarray, bits: int, d: int) -> jnp.ndarray:
    """Unpack uint8 [..., D*bits/8] -> levels uint8 [..., D]."""
    if bits == 2:
        vals = jnp.stack([p & 3, (p >> 2) & 3, (p >> 4) & 3, (p >> 6) & 3],
                         axis=-1)
        return vals.reshape(*p.shape[:-1], d)
    if bits == 3:
        trip = p.reshape(*p.shape[:-1], d // 8, 3).astype(jnp.uint32)
        word = trip[..., 0] | (trip[..., 1] << 8) | (trip[..., 2] << 16)
        vals = jnp.stack([(word >> (3 * i)) & 7 for i in range(8)], axis=-1)
        return vals.astype(jnp.uint8).reshape(*p.shape[:-1], d)
    if bits == 4:
        vals = jnp.stack([p & 0xF, (p >> 4) & 0xF], axis=-1)
        return vals.reshape(*p.shape[:-1], d)
    raise ValueError(f"unsupported bit width {bits}")


# ---------------------------------------------------------------------------
# combined compress / decompress for cache vectors
# ---------------------------------------------------------------------------


def compress(x: jnp.ndarray, bits: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """float [..., D] -> (packed uint8 [..., D*bits/8], scale [...])."""
    q, delta = quantize_midrise(rotate(x), bits)
    return pack_levels(q, bits), delta


def decompress(packed: jnp.ndarray, delta: jnp.ndarray, bits: int,
               d: int) -> jnp.ndarray:
    """Inverse of compress: de-rotated float [..., D]. Dot products against
    the original vectors are preserved up to quantization error because the
    rotation is orthonormal."""
    q = unpack_levels(packed, bits, d)
    return rotate(dequantize_midrise(q, delta, bits), inverse=True)


# ---------------------------------------------------------------------------
# QJL: sign-bit (1-bit) keys with unbiased inner-product estimation
# (turboquant/qjl.rs)
# ---------------------------------------------------------------------------


def qjl_compress(k: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k [..., D] -> (sign bits packed uint8 [..., D/8], norms [...])."""
    r = rotate(k)
    signs = (r > 0).astype(jnp.uint8)
    d = signs.shape[-1]
    g = signs.reshape(*signs.shape[:-1], d // 8, 8)
    packed = jnp.zeros(g.shape[:-1], jnp.uint8)
    for i in range(8):
        packed = packed | (g[..., i] << i)
    norms = jnp.linalg.norm(k, axis=-1)
    return packed, norms.astype(jnp.float32)


def qjl_scores_batched(q: jnp.ndarray, packed: jnp.ndarray,
                       norms: jnp.ndarray) -> jnp.ndarray:
    """Batched unbiased inner-product estimates for GQA attention.

    q: [B,T,K,R,D] (un-rotated); packed: [B,S,K,D/8] sign bits;
    norms: [B,S,K] -> scores [B,T,K,R,S]."""
    d = q.shape[-1]
    bits = jnp.stack([(packed >> i) & 1 for i in range(8)], axis=-1)
    signs = bits.reshape(*packed.shape[:-1], d).astype(jnp.float32) * 2 - 1
    r = rotate(q)
    raw = jnp.einsum("btkrd,bskd->btkrs", r, signs) / jnp.sqrt(float(d))
    scale = jnp.sqrt(jnp.pi / 2).astype(jnp.float32)
    return raw * jnp.moveaxis(norms, 1, 2)[:, None, :, None, :] * scale


def qjl_scores(q: jnp.ndarray, packed: jnp.ndarray,
               norms: jnp.ndarray) -> jnp.ndarray:
    """Unbiased estimate of <q, k> for every stored key.

    With s = sign(Hk) and r = Hq: E[<s, r>] = sqrt(2/pi) * <q,k>/||k||
    for Gaussian-like rotated coordinates, hence
    <q,k> ~= sqrt(pi/2) * ||k|| * <sign(Hk), Hq> / sqrt(D).

    q: [..., D]; packed: [S, D/8]; norms: [S] -> scores [..., S]."""
    d = q.shape[-1]
    bits = jnp.stack([(packed >> i) & 1 for i in range(8)], axis=-1)
    signs = bits.reshape(*packed.shape[:-1], d).astype(jnp.float32) * 2 - 1
    r = rotate(q)
    raw = jnp.einsum("...d,sd->...s", r, signs) / jnp.sqrt(d)
    return raw * norms * jnp.sqrt(jnp.pi / 2).astype(jnp.float32)
