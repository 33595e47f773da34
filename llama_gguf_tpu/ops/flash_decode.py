"""Per-row ragged decode attention (flash-decode) as a Pallas TPU kernel.

The decode-phase analogue of the reference's per-sequence caches
(/root/reference/src/engine_batched.rs:373, backend/cpu/flash_attn.rs:45,
backend/cuda/kernels.rs:1395): each batch row reads ONLY its own live KV
blocks. The XLA attention path reads the whole batch-global read bucket for
every row — one 2k-context sequence in a 32-stream batch makes all 32 rows
pay the 2k read. Here the kernel's grid is (B, S-blocks) with the S-block
index map CLAMPED to each row's last live block: Pallas skips the DMA
whenever consecutive grid steps map to the same block, so a 200-token row
in a 2048 bucket moves one 256-block from HBM, not eight.

Head folding: Mosaic requires the last two dims of every block to be
8/128-divisible or full — a [B, S, K, D] cache block that squeezes the
K(V-head) axis (second-to-last) is NOT lowerable (the first version of
this kernel shipped that way and failed Mosaic on-device while passing
every interpret-mode test). Instead the cache rides as [B, S, K*D] (a
free minor-dim merge) and the query as a BLOCK-DIAGONAL [K*RP, K*D]
panel, so ONE dot per S-block computes every head's scores at once:
row-block h of q_bd is zero outside column-block h, hence
(q_bd @ k_blk^T)[h*RP+i, j] = q_h[i] . k_j[h] exactly. The PV product
then yields [K*RP, K*DV] whose DIAGONAL blocks are the per-head outputs
(extracted in-kernel at the last S-block). The off-diagonal MXU work is
the price of legal layouts — a factor K on a unit that is >90% idle
during memory-bound decode; the kernel refuses K > MAX_KV_HEADS (MHA
models fall back to the XLA bucket path where that waste would bite).

Static shapes throughout (the bucket bounds the grid; per-row raggedness
rides the scalar-prefetched lengths), online softmax across S-blocks in
VMEM scratch — the TPU-native shape of flash decoding.

Supports: GQA/MQA (K <= 8, any R = H/K), causal + length masking, sliding
window (block range additionally clamped from the left), logit softcap,
attention sinks (gpt-oss), distinct value head dim. Callers fall back to
the XLA path for MHA, ALiBi, chunked attention (negative window), ring
caches, quantized KV formats and non-divisible buckets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK = 256
MAX_KV_HEADS = 8  # MXU waste is x KV-heads; past this the XLA path wins


def _kernel(scal_ref, q_ref, k_ref, v_ref, sink_ref, o_ref,
            m_ref, l_ref, acc_ref, *, blk: int, scale: float,
            softcap: float, window: int, nblk: int, kh: int, rp: int,
            dv: int, has_sinks: bool):
    """One (b, s) grid step.

    scal_ref: int32 [2, B] (lengths; positions) in SMEM.
    q_ref [KH*RP, KH*D] block-diagonal; k_ref [blk, KH*D];
    v_ref [blk, KH*DV]; o_ref [KH, RP, DV];
    scratch m/l [KH*RP, 128] f32 (col 0 live), acc [KH*RP, KH*DV] f32."""
    b = pl.program_id(0)
    s = pl.program_id(1)
    length = scal_ref[0, b]
    pos = scal_ref[1, b]
    last_blk = jnp.maximum((length + blk - 1) // blk - 1, 0)
    first_blk = (jnp.maximum(pos - window + 1, 0) // blk if window > 0
                 else jnp.int32(0))

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((s >= first_blk) & (s <= last_blk))
    def _():
        q = q_ref[:].astype(jnp.float32)
        k = k_ref[:].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [KH*RP, blk]
        if softcap > 0.0:
            scores = jnp.tanh(scores / softcap) * softcap
        s_idx = s * blk + jax.lax.broadcasted_iota(
            jnp.int32, (kh * rp, blk), 1)
        valid = (s_idx <= pos) & (s_idx < length)
        if window > 0:
            valid &= s_idx > pos - window
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, :1]  # [KH*RP, 1]
        m_new = jnp.maximum(m_prev, scores.max(-1, keepdims=True))
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(scores - safe_m)
        p = jnp.where(valid, p, 0.0)
        alpha = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - safe_m))
        l_ref[:, :1] = l_ref[:, :1] * alpha + p.sum(-1, keepdims=True)
        m_ref[:, :1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(s == nblk - 1)
    def _():
        m = m_ref[:, :1]
        l = l_ref[:, :1]
        if has_sinks:
            # gpt-oss sinks: one constant extra logit per head joins the
            # denominator (no value); ride the running max for stability
            sk = sink_ref[:, :1].astype(jnp.float32)  # [KH*RP, 1]
            safe_m = jnp.where(m == NEG_INF, 0.0, m)
            m2 = jnp.maximum(safe_m, sk)
            alpha = jnp.exp(safe_m - m2)
            l = l * alpha + jnp.exp(sk - m2)
            norm = acc_ref[:] * (alpha / jnp.maximum(l, 1e-30))
        else:
            norm = acc_ref[:] / jnp.maximum(l, 1e-30)
        # per-head output = DIAGONAL [RP, DV] blocks of [KH*RP, KH*DV]
        for h in range(kh):
            o_ref[h] = norm[h * rp:(h + 1) * rp,
                            h * dv:(h + 1) * dv].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kh", "d", "dv", "bound", "blk", "scale", "softcap",
                     "window", "interpret"))
def _flash_decode_call(q_bd, k_cache, v_cache, lengths, positions, sinks, *,
                       kh: int, d: int, dv: int, bound: int, blk: int,
                       scale: float, softcap: float, window: int,
                       interpret: bool):
    b = q_bd.shape[0]
    rp = q_bd.shape[1] // kh
    nblk = bound // blk
    scalars = jnp.stack([lengths.astype(jnp.int32),
                         positions.astype(jnp.int32)])  # [2, B]
    has_sinks = sinks is not None
    if not has_sinks:
        sinks = jnp.zeros((kh * rp, 128), jnp.float32)

    kernel = functools.partial(
        _kernel, blk=blk, scale=scale, softcap=softcap, window=window,
        nblk=nblk, kh=kh, rp=rp, dv=dv, has_sinks=has_sinks)

    def clamp_s(bi, si, sref):
        length = sref[0, bi]
        pos = sref[1, bi]
        last = jnp.maximum((length + blk - 1) // blk - 1, 0)
        if window > 0:
            first = jnp.maximum(pos - window + 1, 0) // blk
            first = jnp.minimum(first, last)
        else:
            first = jnp.int32(0)
        return jnp.clip(si, first, last)

    # index maps receive the scalar-prefetch ref AFTER the grid indices
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((None, kh * rp, kh * d),
                         lambda bi, si, sref: (bi, 0, 0)),
            pl.BlockSpec((None, blk, kh * d),
                         lambda bi, si, sref: (bi, clamp_s(bi, si, sref), 0)),
            pl.BlockSpec((None, blk, kh * dv),
                         lambda bi, si, sref: (bi, clamp_s(bi, si, sref), 0)),
            pl.BlockSpec((kh * rp, 128), lambda bi, si, sref: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, kh, rp, dv),
                               lambda bi, si, sref: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((kh * rp, 128), jnp.float32),
            pltpu.VMEM((kh * rp, 128), jnp.float32),
            pltpu.VMEM((kh * rp, kh * dv), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kh, rp, dv), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scalars, q_bd, k_cache, v_cache, sinks)


_INTERPRET = False  # tests force interpret mode on the CPU mesh


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def interpret_mode() -> bool:
    return _INTERPRET


def _pick_block(bound: int) -> int:
    for blk in (DEFAULT_BLOCK, 128, 64, 32, 16, 8):
        if bound % blk == 0 and blk <= bound:
            return blk
    return 1


def flash_decode(qg, k_cache, v_cache, positions, lengths, *, scale: float,
                 bound: int, softcap: float = 0.0, sliding_window: int = 0,
                 sinks=None, interpret: bool = False):
    """qg [B, 1, K, R, D] f32; k_cache/v_cache [B, S, K, D/Dv] (full padded
    cache, any float dtype); positions [B, 1]; lengths [B].
    Returns [B, 1, K, R, Dv] f32 — same contract as
    ops.attention.dense_attention at T=1, with per-row ragged KV reads.
    ``bound``: static read bucket (the grid covers only bound positions).
    Requires K <= MAX_KV_HEADS (caller falls back to XLA otherwise).
    """
    b, t, kh, r, d = qg.shape
    assert t == 1 and kh <= MAX_KV_HEADS
    dv = v_cache.shape[-1]
    blk = _pick_block(bound)
    rp = max(8, -(-r // 8) * 8)
    q = qg[:, 0]  # [B, K, R, D]
    if rp != r:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, rp - r), (0, 0)))
    # block-diagonal query: row-block h nonzero only in column-block h
    eye = jnp.eye(kh, dtype=q.dtype)
    q_bd = jnp.einsum("bkrd,kl->bkrld", q, eye).reshape(
        b, kh * rp, kh * d)
    sink_arr = None
    if sinks is not None:
        sk = sinks.reshape(kh, r).astype(jnp.float32)
        if rp != r:
            sk = jnp.concatenate(
                [sk, jnp.full((kh, rp - r), NEG_INF, jnp.float32)], axis=1)
        sink_arr = jnp.broadcast_to(sk.reshape(kh * rp, 1), (kh * rp, 128))
    # the FULL padded cache is passed; the grid only covers ``bound``
    # positions (nblk = bound/blk) — slicing the cache in XLA would
    # materialize a copy of the whole bucket, the very traffic this kernel
    # exists to avoid. The [B, S, K, D] -> [B, S, K*D] minor-dim merge is
    # metadata-only (contiguous), and keeps the block's last two dims
    # (blk, K*D) Mosaic-legal at any K/D.
    s_cap = k_cache.shape[1]
    out = _flash_decode_call(
        q_bd, k_cache.reshape(b, s_cap, kh * d),
        v_cache.reshape(b, s_cap, kh * dv),
        lengths, positions[:, 0], sink_arr,
        kh=kh, d=d, dv=dv, bound=bound, blk=blk, scale=scale,
        softcap=softcap, window=sliding_window, interpret=interpret)
    return out[:, None, :, :r, :]
