"""Attention score paths: dense and chunked (flash-style online softmax).

Parity/analogue: the reference's CPU flash attention (tiled online softmax,
BLOCK_SIZE=64 KV tiles, /root/reference/src/backend/cpu/flash_attn.rs:45-284)
and the CUDA flash_attention_cached kernel (kernels.rs:1395). On TPU the
dense einsum path is MXU-optimal for short sequences, but prefill at T=S=4k
would materialize O(T*S) score tensors; the chunked path scans KV blocks
with running (max, denom, acc) state so peak memory is O(T * block), while
every inner op stays a big fused einsum for the MXU. XLA keeps the loop
on-device; no Pallas needed to hit the memory-bound roofline here because
the KV cache is read exactly once.

Shared semantics with models/transformer.attention: causal + length mask,
sliding window, logit softcap, GQA grouping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30
DEFAULT_BLOCK = 256


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Standard ALiBi slopes: geometric sequence from 2^(-8/n) for the
    largest power-of-two n <= num_heads, with interleaved extras."""
    import math

    n = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-8.0 / n)
    slopes = [base ** (i + 1) for i in range(n)]
    if n < num_heads:
        extra_base = 2.0 ** (-4.0 / n)
        extra = [extra_base ** (2 * i + 1) for i in range(num_heads - n)]
        slopes = slopes + extra
    return jnp.asarray(slopes, jnp.float32)


def alibi_bias(positions: jnp.ndarray, s_idx: jnp.ndarray,
               num_kv_heads: int, rep: int) -> jnp.ndarray:
    """[B, T, K, R, S] bias: -slope_h * (q_pos - key_pos), clamped at 0
    for future keys (masked anyway). s_idx: key positions [S] or [B, S]."""
    slopes = alibi_slopes(num_kv_heads * rep).reshape(num_kv_heads, rep)
    si = s_idx[None, None, :] if s_idx.ndim == 1 else s_idx[:, None, :]
    dist = positions[:, :, None] - si  # [B,T,S]
    dist = jnp.maximum(dist, 0).astype(jnp.float32)
    return -slopes[None, None, :, :, None] * dist[:, :, None, None, :]
# use the chunked path when the dense score tensor would exceed this many
# elements (B*T*H*S)
CHUNK_THRESHOLD = 1 << 22


def _mask_block(positions, lengths, s_idx, sliding_window: int):
    """[B, T, S_blk] bool visibility mask for key positions s_idx.

    s_idx is [S] (contiguous cache: slot == position) or [B, S] (SWA ring
    cache: per-slot stored absolute positions, -1 = empty)."""
    si = s_idx[None, None, :] if s_idx.ndim == 1 else s_idx[:, None, :]
    valid = (si <= positions[:, :, None]) & (si < lengths[:, None, None])
    if s_idx.ndim == 2:
        valid &= si >= 0  # never-written ring slots
    if sliding_window > 0:
        valid &= si > (positions[:, :, None] - sliding_window)
    elif sliding_window < 0:
        # CHUNKED attention (llama4 rope layers), encoded as a negative
        # window: keys visible only within the query's chunk of size -w
        c = -sliding_window
        valid &= si >= (positions[:, :, None] // c) * c
    return valid


def dense_attention(qg, keys, vals, positions, lengths, *, scale: float,
                    softcap: float = 0.0, sliding_window: int = 0,
                    sinks=None, alibi: bool = False, key_positions=None):
    """qg [B,T,K,R,D]; keys [B,S,K,D]; vals [B,S,K,Dv] -> [B,T,K,R,Dv].

    ``key_positions`` [B,S]: per-slot absolute positions for ring-buffer
    (SWA) caches where slot index != position; None = contiguous cache."""
    s = keys.shape[1]
    s_idx = jnp.arange(s) if key_positions is None else key_positions
    scores = jnp.einsum("btkrd,bskd->btkrs", qg, keys) * scale
    if alibi:
        scores = scores + alibi_bias(positions, s_idx,
                                     qg.shape[2], qg.shape[3])
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    valid = _mask_block(positions, lengths, s_idx, sliding_window)
    scores = jnp.where(valid[:, :, None, None, :], scores, NEG_INF)
    if sinks is not None:
        b, t, k, r, _ = scores.shape
        sk = jnp.broadcast_to(sinks.reshape(1, 1, k, r, 1), (b, t, k, r, 1))
        probs = jax.nn.softmax(jnp.concatenate([scores, sk], -1), axis=-1)
        probs = probs[..., :-1]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    # fully-masked rows (padding slots) -> 0, matching the chunked path
    any_valid = valid.any(-1)[:, :, None, None, None]
    probs = jnp.where(any_valid, probs, 0.0)
    return jnp.einsum("btkrs,bskd->btkrd", probs, vals)


def chunked_attention(qg, keys, vals, positions, lengths, *, scale: float,
                      softcap: float = 0.0, sliding_window: int = 0,
                      alibi: bool = False, sinks=None,
                      block: int = DEFAULT_BLOCK):
    """Flash-style attention over KV blocks with online softmax.

    Same signature/result as dense_attention: sinks join the running
    denominator at the end (exp(sink - m) per head). Peak intermediate is
    [B,T,K,R,block] instead of [B,T,K,R,S]."""
    b, t, k, r, d = qg.shape
    s = keys.shape[1]
    if s % block:
        # pad S up to a block multiple: padded slots carry key position
        # >= s >= lengths, so _mask_block removes them — keeping the
        # O(T*block) memory bound for any cache length
        pad = block - s % block
        keys = jnp.pad(keys, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vals = jnp.pad(vals, ((0, 0), (0, pad), (0, 0), (0, 0)))
        s += pad
    nblk = s // block
    dv = vals.shape[-1]

    m0 = jnp.full((b, t, k, r), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, t, k, r), jnp.float32)
    acc0 = jnp.zeros((b, t, k, r, dv), jnp.float32)

    def body(carry, blk):
        m, l, acc = carry
        ks = jax.lax.dynamic_slice_in_dim(keys, blk * block, block, 1)
        vs = jax.lax.dynamic_slice_in_dim(vals, blk * block, block, 1)
        scores = jnp.einsum("btkrd,bskd->btkrs", qg, ks) * scale
        s_idx = blk * block + jnp.arange(block)
        if alibi:
            scores = scores + alibi_bias(positions, s_idx, qg.shape[2],
                                         qg.shape[3])
        if softcap > 0.0:
            scores = jnp.tanh(scores / softcap) * softcap
        valid = _mask_block(positions, lengths, s_idx, sliding_window)
        scores = jnp.where(valid[:, :, None, None, :], scores, NEG_INF)

        m_new = jnp.maximum(m, scores.max(-1))
        # guard: all-masked rows keep m at NEG_INF; exp(NEG_INF-NEG_INF)
        # must not produce NaN
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(scores - safe_m[..., None])
        p = jnp.where(valid[:, :, None, None, :], p, 0.0)
        alpha = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - safe_m))
        l = l * alpha + p.sum(-1)
        acc = acc * alpha[..., None] + jnp.einsum("btkrs,bskd->btkrd", p, vs)
        return (m_new, l, acc), None

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0),
                                  jnp.arange(nblk, dtype=jnp.int32))
    if sinks is not None:
        # gpt-oss attention sinks: one extra constant logit per head joins
        # the softmax denominator (it contributes no value vector); fold it
        # into the running max so a large sink cannot overflow the exp
        sk = jnp.broadcast_to(sinks.reshape(1, 1, k, r), m.shape)
        safe_m = jnp.where(m == NEG_INF, 0.0, m)
        m2 = jnp.maximum(safe_m, sk)
        alpha = jnp.exp(safe_m - m2)
        l = l * alpha + jnp.exp(sk - m2)
        acc = acc * alpha[..., None]
    return acc / jnp.maximum(l[..., None], 1e-30)


def qjl_attention(qg, k_packed, k_norms, v_packed, v_scale, positions,
                  lengths, *, scale: float, v_head_dim: int,
                  softcap: float = 0.0, sliding_window: int = 0):
    """Attention computed ON compressed keys: scores come from the QJL
    sign-sketch estimator without reconstructing K (the literal analogue of
    the reference's TurboQuant attention_layer, kv_turboquant.rs:176);
    values are tq4-decompressed for the weighted sum.

    qg [B,T,K,R,D]; k_packed [B,S,K,D/8]; k_norms [B,S,K];
    v_packed [B,S,K,Dv/2]; v_scale [B,S,K]."""
    from ..models.turboquant import decompress, qjl_scores_batched

    s = k_packed.shape[1]
    scores = qjl_scores_batched(qg, k_packed, k_norms) * scale
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    valid = _mask_block(positions, lengths, jnp.arange(s), sliding_window)
    scores = jnp.where(valid[:, :, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(valid.any(-1)[:, :, None, None, None], probs, 0.0)
    vals = decompress(v_packed, v_scale, 4, v_head_dim)
    return jnp.einsum("btkrs,bskd->btkrd", probs, vals)


def group_take(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather batch rows by GROUP-LOCAL indices: ``x`` [B, ...] viewed as
    G contiguous groups of B/G rows, ``idx`` [G, C] row indices within each
    group (entries == B/G are padding: clamped here, dropped at the
    scatter). Returns [G*C, ...]. Because every gather stays inside its own
    group, GSPMD keeps the op shard-local when the batch axis is sharded
    into G pieces — no cross-shard collectives."""
    g, c = idx.shape
    xg = x.reshape(g, x.shape[0] // g, *x.shape[1:])
    out = jnp.take_along_axis(
        xg, idx.reshape(g, c, *([1] * (x.ndim - 1))), axis=1, mode="clip")
    return out.reshape(g * c, *x.shape[1:])


def tiered_attention(read_fn, qg, positions, lengths, lo: int, hi: int,
                     tier_idx: jnp.ndarray, **kw):
    """Two-tier ragged decode attention (pure XLA, static shapes).

    Every row runs attention against the ``lo`` KV bucket; the (few) rows
    whose live context exceeds ``lo`` — pre-selected into ``tier_idx``
    [G, C] (G contiguous batch groups of C group-local indices; entries
    == B/G are padding and dropped) — are gathered, run against the ``hi``
    bucket, and scatter-overwrite their lo-bucket results. HBM attention
    reads drop from B*hi to B*lo + G*C*hi: one 2k-context straggler in a
    32-stream batch no longer makes all 32 rows read the 2k bucket
    (the VERDICT r2 "batch-global bucket tax"; the reference never pays it
    because each sequence owns a length-sized cache,
    /root/reference/src/engine_batched.rs:373 — this is the static-shape
    TPU equivalent, chosen over the Pallas flash-decode kernel whose
    real-model interaction cost measured ~240 us/layer, docs/ROOFLINE.md).

    G matches the mesh's data-axis shard count (ModelRunner.tier_shards,
    threaded via the read_bound tuple),
    so under GSPMD every take/scatter is shard-local by construction
    (group_take); G=1 is the single-device case.

    ``read_fn(bound, rows)`` -> (keys, vals): reads the KV cache sliced to
    ``bound`` positions, optionally gathering batch rows first (rows in
    the same grouped [G, C] form, handled by models/kv.read).
    """
    g, c = tier_idx.shape
    b = qg.shape[0]
    keys, vals = read_fn(lo, None)
    ctx = attention_scores(qg, keys, vals, positions, lengths, **kw)
    k_hi, v_hi = read_fn(hi, tier_idx)
    ctx_hi = attention_scores(
        group_take(qg, tier_idx), k_hi, v_hi,
        group_take(positions, tier_idx), group_take(lengths, tier_idx),
        **kw)
    ctxg = ctx.reshape(g, b // g, *ctx.shape[1:])
    ctxg = ctxg.at[jnp.arange(g)[:, None], tier_idx].set(
        ctx_hi.reshape(g, c, *ctx.shape[1:]), mode="drop")
    return ctxg.reshape(b, *ctx.shape[1:])


def attention_scores(qg, keys, vals, positions, lengths, *, scale: float,
                     softcap: float = 0.0, sliding_window: int = 0,
                     sinks=None, alibi: bool = False, key_positions=None):
    """Pick dense vs chunked by the dense score-tensor size (static).
    Ring caches (key_positions given) are window-sized, so always dense."""
    b, t, k, r, _ = qg.shape
    s = keys.shape[1]
    if key_positions is None and \
            b * t * k * r * s > CHUNK_THRESHOLD and s >= 2 * DEFAULT_BLOCK:
        return chunked_attention(qg, keys, vals, positions, lengths,
                                 scale=scale, softcap=softcap,
                                 sliding_window=sliding_window, alibi=alibi,
                                 sinks=sinks)
    return dense_attention(qg, keys, vals, positions, lengths, scale=scale,
                           softcap=softcap, sliding_window=sliding_window,
                           sinks=sinks, alibi=alibi,
                           key_positions=key_positions)
