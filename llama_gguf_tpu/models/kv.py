"""KV cache as a functional pytree, designed for jit donation.

The reference mutates per-layer Vec<Tensor> caches in place
(/root/reference/src/model/mod.rs:64-178) and has three separate cache
implementations: f32, quantized INT8/FP8 (kv_quantized.rs:11-728) and
TurboQuant (kv_turboquant.rs). The TPU-native design is a pytree of
PER-LAYER [B, S, H_kv, D] buffers (kv["k"]/kv["v"] are L-tuples) threaded
through the jitted step with buffer donation, so XLA updates each layer in
place in HBM. Per-layer buffers matter: with one stacked [L, B, S, H, D]
array, XLA's aliasing analysis gives up once sliced reads interleave with
the per-layer scatter writes and COPIES the whole cache every decode step —
measured 2x step time at B=32/S=2048 (5.2 ms of pure copy). The storage
format is a *static* choice baked into the compiled step:

  f32 / bf16       — plain dense cache
  i8               — per-(position, head) symmetric int8 scales, the analogue
                     of KVCacheFormat::Int8 (kv_quantized.rs:11) — 4x smaller
                     than f32; dequantized on read (fused into attention)
  f8_e4m3 / f8_e5m2 — native float8 dtypes on TPU, the analogue of
                     KVCacheFormat::Fp8E4M3/Fp8E5M2; 4x smaller, no scales

Sequence bookkeeping (lengths/positions) lives with the caller; truncate and
reset are index arithmetic, and shift_left (context shift) re-rotates the
stored keys by the RoPE delta — exact, unlike the reference's plain memmove
(model/mod.rs:142) which leaves keys rotated for their old positions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

FORMATS = ("f32", "bf16", "i8", "f8_e4m3", "f8_e5m2", "tq2", "tq3", "tq4",
           "qjl")

_STORE_DTYPE = {
    "f32": jnp.float32,
    "bf16": jnp.bfloat16,
    "i8": jnp.int8,
    "f8_e4m3": jnp.float8_e4m3fn,
    "f8_e5m2": jnp.float8_e5m2,
}


def ring_format_ok(fmt) -> bool:
    """KV formats the SWA ring cache supports (single source of truth:
    quantized/scale-carrying formats keep the plain padded layout)."""
    return fmt in (None, "f32", "bf16", "f8_e4m3", "f8_e5m2")


def init_cache(num_layers: int, batch: int, max_seq: int, num_kv_heads: int,
               head_dim: int, dtype=jnp.float32, v_head_dim: int | None = None,
               fmt: str | None = None, swa_layers: tuple = (),
               ring_slots: int = 0) -> dict[str, Any]:
    """Create an empty cache. ``fmt`` picks the storage format; the legacy
    ``dtype`` arg maps f32/bf16 when fmt is not given. tq2/tq3/tq4 are
    TurboQuant compressed formats (Hadamard-rotated, bit-packed;
    models/turboquant.py) — 16x/10.7x/8x smaller than f32.

    ``swa_layers``/``ring_slots``: when given (and the format is scale-free
    dense), sliding-window layers get RING buffers of ``ring_slots``
    positions instead of ``max_seq`` — the analogue of llama.cpp's iSWA
    cache. For gemma3-class models (5/6 layers windowed at 1k, ctx 128k)
    this shrinks the KV cache ~50x. Ring slot j tracks its absolute
    position in ``swa_pos`` (init -1 = empty); attention masks by stored
    position, so the layout change is invisible to the math."""
    # the ring needs >= 1 full layer: cache_shape/write_swa derive the
    # logical max_seq from kv["k"][0], which an all-SWA model would leave
    # empty — fall back to the plain cache there
    use_ring = (ring_slots > 0 and any(swa_layers)
                and not all(swa_layers)
                and ring_format_ok(fmt)
                and ring_slots < max_seq)
    if use_ring:
        n_full = sum(not s for s in swa_layers)
        n_swa = len(swa_layers) - n_full
        base = init_cache(n_full, batch, max_seq, num_kv_heads, head_dim,
                          dtype=dtype, v_head_dim=v_head_dim, fmt=fmt)
        ring = init_cache(n_swa, batch, ring_slots, num_kv_heads, head_dim,
                          dtype=dtype, v_head_dim=v_head_dim, fmt=fmt)
        base["k_swa"] = ring["k"]
        base["v_swa"] = ring["v"]
        base["swa_pos"] = tuple(
            jnp.full((batch, ring_slots), -1, jnp.int32)
            for _ in range(n_swa))
        return base
    if fmt is None:
        fmt = "bf16" if dtype == jnp.bfloat16 else "f32"
    if fmt not in FORMATS:
        raise ValueError(f"unknown kv format {fmt!r} (one of {FORMATS})")
    vd = head_dim if v_head_dim is None else v_head_dim

    def layers(shape, dt):
        return tuple(jnp.zeros(shape, dt) for _ in range(num_layers))

    if fmt == "qjl":
        # keys as 1-bit QJL sign sketches + norms; attention scores are
        # computed directly ON the compressed keys (the literal analogue of
        # kv_turboquant.rs:176 'attention on compressed keys'); values tq4
        return {
            "k": layers((batch, max_seq, num_kv_heads, head_dim // 8),
                        jnp.uint8),
            "v": layers((batch, max_seq, num_kv_heads, vd // 2), jnp.uint8),
            "k_scale": layers((batch, max_seq, num_kv_heads), jnp.float32),
            "v_scale": layers((batch, max_seq, num_kv_heads), jnp.float32),
        }
    if fmt.startswith("tq"):
        bits = int(fmt[2])
        return {
            "k": layers((batch, max_seq, num_kv_heads, head_dim * bits // 8),
                        jnp.uint8),
            "v": layers((batch, max_seq, num_kv_heads, vd * bits // 8),
                        jnp.uint8),
            "k_scale": layers((batch, max_seq, num_kv_heads), jnp.float32),
            "v_scale": layers((batch, max_seq, num_kv_heads), jnp.float32),
        }
    store = _STORE_DTYPE[fmt]
    kv: dict[str, Any] = {
        "k": layers((batch, max_seq, num_kv_heads, head_dim), store),
        "v": layers((batch, max_seq, num_kv_heads, vd), store),
    }
    if fmt == "i8":
        kv["k_scale"] = layers((batch, max_seq, num_kv_heads), jnp.float32)
        kv["v_scale"] = layers((batch, max_seq, num_kv_heads), jnp.float32)
    return kv


def cache_shape(kv: dict[str, Any]) -> tuple[int, int, int, int, int]:
    """Logical [L, B, S, H, D] shape (the storage is per-layer tuples)."""
    return (len(kv["k"]),) + tuple(kv["k"][0].shape)


def cache_format(kv: dict[str, Any], head_dim: int | None = None) -> str:
    dt = kv["k"][0].dtype
    if dt == jnp.uint8:  # TurboQuant/QJL: packed, bits inferred from head_dim
        if head_dim is None:
            return "tq"
        bits = kv["k"][0].shape[-1] * 8 // head_dim
        return "qjl" if bits == 1 else f"tq{bits}"
    if dt == jnp.int8:
        return "i8"
    if dt == jnp.float8_e4m3fn:
        return "f8_e4m3"
    if dt == jnp.float8_e5m2:
        return "f8_e5m2"
    return "bf16" if dt == jnp.bfloat16 else "f32"


def _set_layer(kv: dict[str, Any], key: str, layer: int,
               value: jnp.ndarray) -> None:
    t = list(kv[key])
    t[layer] = value
    kv[key] = tuple(t)


def _quantize_i8(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-(token, head) int8: x [B,T,H,D] -> (q, scale [B,T,H])."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(x * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _set_at_positions(cache: jnp.ndarray, value: jnp.ndarray,
                      positions: jnp.ndarray) -> jnp.ndarray:
    """cache [B, S, ...] <- value [B, T, ...] at positions [B, T]; positions
    >= S are DROPPED (never clobber live entries).

    The single-token single-row case (the B=1 decode step) avoids XLA
    scatter: on this device one scatter op costs ~4.6 us and the 2-per-layer
    cache writes alone were ~200 us of a 2.1 ms TinyLlama step (interleaved
    A/B, scripts/bench_glue_attrib.py). A dynamic_slice + select +
    dynamic_update_slice chain is semantically identical (OOB writes the
    old row back = drop) and measurably cheaper."""
    if positions.shape == (1, 1):
        s = cache.shape[1]
        pos = positions[0, 0]
        idx = jnp.clip(pos, 0, s - 1)
        cur = jax.lax.dynamic_slice_in_dim(cache, idx, 1, axis=1)
        val = jnp.where(pos < s, value.astype(cache.dtype), cur)
        return jax.lax.dynamic_update_slice_in_dim(cache, val, idx, axis=1)
    b_idx = jnp.arange(value.shape[0])[:, None]
    return cache.at[b_idx, positions].set(value.astype(cache.dtype),
                                          mode="drop")


def write(kv: dict[str, Any], layer: int, k: jnp.ndarray, v: jnp.ndarray,
          positions: jnp.ndarray) -> dict[str, Any]:
    """Scatter new K/V at per-token positions.

    k/v: [B, T, H_kv, D] float; positions: [B, T] int32 -> updated cache.
    Padding slots use an out-of-range position (>= max_seq) and are DROPPED
    by the scatter, so they can never clobber live cache entries.
    """
    fmt = cache_format(kv, head_dim=k.shape[-1])
    kv = dict(kv)

    def upd(key, value):
        _set_layer(kv, key, layer,
                   _set_at_positions(kv[key][layer], value, positions))

    if fmt == "qjl":
        from .turboquant import compress, qjl_compress

        kp, knorm = qjl_compress(k.astype(jnp.float32))
        vp, vs = compress(v.astype(jnp.float32), 4)
        upd("k", kp)
        upd("v", vp)
        upd("k_scale", knorm)
        upd("v_scale", vs)
        return kv
    if fmt.startswith("tq"):
        from .turboquant import compress

        bits = int(fmt[2])
        kp, ks = compress(k.astype(jnp.float32), bits)
        vp, vs = compress(v.astype(jnp.float32), bits)
        upd("k", kp)
        upd("v", vp)
        upd("k_scale", ks)
        upd("v_scale", vs)
        return kv
    if fmt == "i8":
        kq, ks = _quantize_i8(k.astype(jnp.float32))
        vq, vs = _quantize_i8(v.astype(jnp.float32))
        upd("k", kq)
        upd("v", vq)
        upd("k_scale", ks)
        upd("v_scale", vs)
        return kv
    upd("k", k.astype(kv["k"][layer].dtype))
    upd("v", v.astype(kv["v"][layer].dtype))
    return kv


def write_swa(kv: dict[str, Any], swa_idx: int, k: jnp.ndarray,
              v: jnp.ndarray, positions: jnp.ndarray,
              window: int) -> dict[str, Any]:
    """Scatter K/V into a sliding-window ring buffer at slot pos % R.

    Requires T <= R - window + 1 (checked at trace time): within one step,
    the oldest key any query needs (q_pos - window + 1) must not share a
    ring slot with a newer key written in the same scatter. Padding
    positions (>= the full stack's max_seq) map to slot R and are dropped.
    """
    r = kv["k_swa"][swa_idx].shape[1]
    t = k.shape[1]
    window = abs(window)  # negative = chunked-attention encoding; the
    # reach-back bound is the same |window| positions
    if t > r - window + 1:
        raise ValueError(
            f"prefill chunk T={t} too large for SWA ring (R={r}, "
            f"window={window}); chunk prefill to <= {r - window + 1} tokens "
            "or disable the ring cache (swa_ring=False)")
    max_seq = kv["k"][0].shape[1]  # full stack keeps the logical bound even
    slot = jnp.where(positions < max_seq, positions % r, r)  # when empty
    b_idx = jnp.arange(k.shape[0])[:, None]
    kv = dict(kv)
    _set_layer(kv, "k_swa", swa_idx,
               kv["k_swa"][swa_idx].at[b_idx, slot].set(
                   k.astype(kv["k_swa"][swa_idx].dtype), mode="drop"))
    _set_layer(kv, "v_swa", swa_idx,
               kv["v_swa"][swa_idx].at[b_idx, slot].set(
                   v.astype(kv["v_swa"][swa_idx].dtype), mode="drop"))
    _set_layer(kv, "swa_pos", swa_idx,
               kv["swa_pos"][swa_idx].at[b_idx, slot].set(
                   positions, mode="drop"))
    return kv


def read_swa(kv: dict[str, Any], swa_idx: int, compute_dtype=jnp.float32
             ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ring K/V + per-slot absolute positions: ([B,R,H,D], [B,R,H,Dv],
    [B,R] int32, -1 = empty slot)."""
    return (kv["k_swa"][swa_idx].astype(compute_dtype),
            kv["v_swa"][swa_idx].astype(compute_dtype),
            kv["swa_pos"][swa_idx])


def read(kv: dict[str, Any], layer: int, compute_dtype=jnp.float32,
         head_dim: int | None = None,
         v_head_dim: int | None = None,
         bound: int | None = None,
         rows: jnp.ndarray | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dequantized K/V for one layer: ([B,S,H,Dk], [B,S,H,Dv]) in
    ``compute_dtype``. For i8 the dequant multiply fuses into the attention
    matmuls under XLA; tq formats unpack+de-rotate (head_dim required).

    ``bound``: STATIC position count to read — slices the cache to
    [:, :bound] so HBM traffic covers only live positions instead of the
    whole padded max_seq (the ragged-decode analogue of the reference's
    cached flash attention, /root/reference/src/backend/cuda/kernels.rs:1395
    — but done with static shapes so XLA tiles it like any dense read).
    The caller guarantees every valid position < bound.

    ``rows``: optional int32 batch-row gather (two-tier ragged decode:
    only the long rows' cache bytes leave HBM for the high bucket). Either
    [C] global indices or [G, C] GROUP-LOCAL indices (G contiguous batch
    groups, matching ModelRunner.tier_shards — each group's gather stays
    inside its own batch shard under GSPMD); result is [C or G*C, ...].
    Out-of-range indices clamp — callers drop those rows at the scatter."""
    fmt = cache_format(kv, head_dim=head_dim)

    def pick(a):
        if rows is not None:
            if rows.ndim == 2:  # grouped shard-local gather
                g, c = rows.shape
                ag = a.reshape(g, a.shape[0] // g, *a.shape[1:])
                a = jnp.take_along_axis(
                    ag, rows.reshape(g, c, *([1] * (a.ndim - 1))),
                    axis=1, mode="clip").reshape(g * c, *a.shape[1:])
            else:
                a = a[rows]  # jnp OOB gather clamps under jit
        if bound is not None and bound < a.shape[1]:
            a = a[:, :bound]
        return a

    k = pick(kv["k"][layer])
    v = pick(kv["v"][layer])
    if fmt.startswith("tq") and len(fmt) > 2:
        from .turboquant import decompress

        bits = int(fmt[2])
        vd = v_head_dim or head_dim
        ks = pick(kv["k_scale"][layer])
        vs = pick(kv["v_scale"][layer])
        kf = decompress(k, ks, bits, head_dim)
        vf = decompress(v, vs, bits, vd)
        return kf.astype(compute_dtype), vf.astype(compute_dtype)
    if fmt == "tq":
        raise ValueError("tq cache read requires head_dim")
    if fmt == "qjl":
        raise ValueError(
            "qjl caches cannot be read back as K/V (keys are sign sketches);"
            " attention runs on the compressed keys via ops.attention."
            "qjl_attention")
    if fmt == "i8":
        ks = pick(kv["k_scale"][layer])
        vs = pick(kv["v_scale"][layer])
        k = k.astype(compute_dtype) * ks[..., None].astype(compute_dtype)
        v = v.astype(compute_dtype) * vs[..., None].astype(compute_dtype)
        return k, v
    return k.astype(compute_dtype), v.astype(compute_dtype)


def batch_slice(kv: dict[str, Any], idx: jnp.ndarray) -> dict[str, Any]:
    """Gather a batch subset (for scheduler slot compaction). Every leaf —
    cache layers AND recurrent state (mamba/deltanet) — is per-layer with
    batch as its leading axis."""
    return jax.tree_util.tree_map(lambda a: a[idx], kv)


# ---------------------------------------------------------------------------
# context shift (parity: KVCache::shift_left model/mod.rs:142, but exact)
# ---------------------------------------------------------------------------


def shift_left(kv: dict[str, Any], n: int, rope_cfg=None,
               batch_idx: int | None = None, model_cfg=None) -> dict[str, Any]:
    """Drop the first ``n`` cache positions and slide the rest left.

    Stored keys are post-RoPE; sliding a key from position p to p-n must
    re-rotate it by -n*theta, which is a linear rotation — applied here
    (the reference's memmove skips this and decodes against stale
    rotations). The caller subtracts n from its lengths.

    Pass ``model_cfg`` (a ModelConfig) for correct PER-LAYER handling:
    NoPE layers are not re-rotated, dual-base SWA layers re-rotate at
    their own frequency base, and MLA latents re-rotate only the trailing
    rope dims of the cached [c_kv | k_rope] vector. ``rope_cfg`` alone
    applies one homogeneous rotation to every layer (legacy).
    ``batch_idx`` shifts (and re-rotates) only that batch row.
    """
    if "k_swa" in kv:
        raise ValueError(
            "context shift is not supported with the SWA ring cache "
            "(ring slots alias positions modulo R); create the runner with "
            "swa_ring=False to use context shift")
    kv = dict(kv)
    fmt = cache_format(kv)

    def only_row(orig, new):
        if batch_idx is None:
            return new
        return orig.at[batch_idx].set(new[batch_idx])

    for key in ("k", "v", "k_scale", "v_scale"):
        if key not in kv:
            continue
        kv[key] = tuple(only_row(a, jnp.roll(a, -n, axis=1))
                        for a in kv[key])
    if fmt == "tq":
        # TurboQuant keys are stored Hadamard-rotated+packed; shift without
        # RoPE re-rotation (the approximation the reference memmove makes)
        return kv

    num_layers = len(kv["k"])

    def layer_rope(i):
        if model_cfg is not None:
            return model_cfg.layer_rope(i)
        return rope_cfg if rope_cfg is not None and rope_cfg.n_dims > 0 \
            else None

    # MLA caches hold [c_kv | k_rope]: only the trailing rope dims rotate
    rank = getattr(model_cfg, "kv_lora_rank", 0) if model_cfg else 0

    from ..ops.rope import rerotate_keys

    def rerot(kf, rcfg):
        if rank > 0:
            tail = rerotate_keys(kf[..., rank:], -n, rcfg)
            return jnp.concatenate([kf[..., :rank], tail], axis=-1)
        return rerotate_keys(kf, -n, rcfg)

    if fmt == "i8":
        # rotate in float then requantize (same rule as _quantize_i8)
        new_k, new_s = [], []
        for i, (k, s) in enumerate(zip(kv["k"], kv["k_scale"])):
            rcfg = layer_rope(i)
            if rcfg is None:
                new_k.append(k)
                new_s.append(s)
                continue
            kf = rerot(k.astype(jnp.float32) * s[..., None], rcfg)
            q, scale = _quantize_i8(kf)
            new_k.append(only_row(k, q))
            new_s.append(only_row(s, scale))
        kv["k"] = tuple(new_k)
        kv["k_scale"] = tuple(new_s)
    else:
        new_k = []
        for i, k in enumerate(kv["k"]):
            rcfg = layer_rope(i)
            if rcfg is None:
                new_k.append(k)
                continue
            new_k.append(only_row(
                k, rerot(k.astype(jnp.float32), rcfg).astype(k.dtype)))
        kv["k"] = tuple(new_k)
    del num_layers
    return kv


def memory_bytes(kv: dict[str, Any]) -> int:
    return sum(a.size * a.dtype.itemsize
               for a in jax.tree_util.tree_leaves(kv))
