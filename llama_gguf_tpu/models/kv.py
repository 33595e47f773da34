"""KV cache as a functional pytree, designed for jit donation.

The reference mutates per-layer Vec<Tensor> caches in place
(/root/reference/src/model/mod.rs:64-178). The TPU-native design is a single
stacked pair of arrays [L, B, S, H_kv, D] threaded through the jitted step
with buffer donation, so XLA updates it in place in HBM without copies.

Sequence bookkeeping (lengths/positions) lives with the caller; truncate and
shift-left (context shift) become index arithmetic on positions instead of
memmoves, and `reset` is just zeroing lengths.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_cache(num_layers: int, batch: int, max_seq: int, num_kv_heads: int,
               head_dim: int, dtype=jnp.float32,
               v_head_dim: int | None = None) -> dict[str, Any]:
    vd = head_dim if v_head_dim is None else v_head_dim
    return {
        "k": jnp.zeros((num_layers, batch, max_seq, num_kv_heads, head_dim), dtype),
        "v": jnp.zeros((num_layers, batch, max_seq, num_kv_heads, vd), dtype),
    }


def cache_shape(kv: dict[str, Any]) -> tuple[int, int, int, int, int]:
    return tuple(kv["k"].shape)


def write(kv: dict[str, Any], layer: int, k: jnp.ndarray, v: jnp.ndarray,
          positions: jnp.ndarray) -> dict[str, Any]:
    """Scatter new K/V at per-token positions.

    k/v: [B, T, H_kv, D]; positions: [B, T] int32 -> updated cache.
    Padding slots use an out-of-range position (>= max_seq) and are DROPPED
    by the scatter, so they can never clobber live cache entries.
    """
    b_idx = jnp.arange(k.shape[0])[:, None]
    kv = dict(kv)
    kv["k"] = kv["k"].at[layer, b_idx, positions].set(
        k.astype(kv["k"].dtype), mode="drop"
    )
    kv["v"] = kv["v"].at[layer, b_idx, positions].set(
        v.astype(kv["v"].dtype), mode="drop"
    )
    return kv


def batch_slice(kv: dict[str, Any], idx: jnp.ndarray) -> dict[str, Any]:
    """Gather a batch subset (for scheduler slot compaction)."""
    return {"k": kv["k"][:, idx], "v": kv["v"][:, idx]}
