"""Linear layers over dense or TPU-repacked quantized weights.

The reference keeps weights quantized and dispatches per-call fused
dequant-matvec kernels (/root/reference/src/model/layers.rs:56-96,
src/backend/cuda/kernels.rs:443+). The TPU-native equivalent: weights are
repacked at load time into two canonical device layouts

  * "q4": nibbles packed two-per-byte in a group-local split layout,
          uint8 [K/2, N]: within each scale group, byte j holds elements j
          and j+group/2 — unpacking yields two contiguous panels per group
          (no sublane interleave) and every K-tile is self-contained.
  * "q8": int8 [K, N].

(A third "q6" plane layout — 4-bit + 2-bit planes keeping Q6_K at ~6.6 bits
in HBM — was built and measured in round 2 and DELETED in round 3: its
2-bit unpack is VPU-bound on v5e and lost 26% end-to-end at 8B despite
reading 25% fewer bytes. See docs/PERFORMANCE.md.)

plus per-group scale (and optional min) panels [K/group, N]. The affine "min"
term is factored out of the kernel entirely:

    y = x @ (s ⊙ q)  -  x_groupsum @ m

where x_groupsum is [B, K/group]. Every GGML format maps onto one of these
two layouts (see quant/repack.py).

`apply` dispatches to the fused Pallas kernel on TPU and to an XLA
dequant-then-matmul reference path elsewhere (also the correctness oracle).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantLinear:
    """Quantized weight for y = x @ W with W logically [K, N] (in, out)."""

    packed: Any  # uint8 [K/2, N] for q4; int8 [K, N] for q8
    scales: Any  # [K/group, N] float32 or bfloat16
    mins: Any | None  # [K/group, N] or None (symmetric)
    bias: Any | None
    fmt: str = field(metadata=dict(static=True), default="q8")  # q4|q8
    group: int = field(metadata=dict(static=True), default=32)
    k: int = field(metadata=dict(static=True), default=0)
    n: int = field(metadata=dict(static=True), default=0)
    source_type: str = field(metadata=dict(static=True), default="")
    # output-slice boundaries of a fused projection (static metadata)
    splits: tuple | None = field(metadata=dict(static=True), default=None)

    def tree_flatten(self):
        children = (self.packed, self.scales, self.mins, self.bias)
        aux = (self.fmt, self.group, self.k, self.n, self.source_type,
               self.splits)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self):
        return (self.k, self.n)


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseLinear:
    """Dense weight [K, N] (+ optional bias [N])."""

    weight: Any
    bias: Any | None = None
    splits: tuple | None = field(metadata=dict(static=True), default=None)

    def tree_flatten(self):
        return (self.weight, self.bias), (self.splits,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self):
        return self.weight.shape


@jax.tree_util.register_pytree_node_class
@dataclass
class LoraLinear:
    """Low-rank adapter around a base linear: y = base(x) + (x@A)@B*scale
    (parity: reference LoraAdapter, src/model/lora.rs:89)."""

    base: Any  # DenseLinear | QuantLinear
    a: Any     # [K, r]
    b: Any     # [r, N]
    scale: Any  # scalar

    def tree_flatten(self):
        return (self.base, self.a, self.b, self.scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.base.shape


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantExpertStack:
    """Stacked quantized expert weights [E, ...] for MoE gathered dispatch.

    The analogue of the reference keeping expert weights compressed and
    streaming only the routed experts (moe.rs:321-416 + the CUDA expert
    streaming in gpu_only.rs): `gather_dequant` reads ONLY the selected
    experts' packed bytes from HBM and dequantizes them in-graph."""

    packed: Any  # [E, K/2, N] uint8 (q4) or [E, K, N] int8 (q8)
    scales: Any  # [E, K/g, N]
    mins: Any | None
    fmt: str = field(metadata=dict(static=True), default="q8")
    group: int = field(metadata=dict(static=True), default=32)
    k: int = field(metadata=dict(static=True), default=0)
    n: int = field(metadata=dict(static=True), default=0)

    def tree_flatten(self):
        return ((self.packed, self.scales, self.mins),
                (self.fmt, self.group, self.k, self.n))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self):
        return (self.packed.shape[0], self.k, self.n)

    def gather_dequant(self, idx: jnp.ndarray,
                       dtype=jnp.float32) -> jnp.ndarray:
        """Dequantized weights for expert ids ``idx`` [...]: [..., K, N]."""
        p = jnp.take(self.packed, idx, axis=0)
        s = jnp.take(self.scales, idx, axis=0).astype(jnp.float32)
        lead = p.shape[:-2]
        if self.fmt == "q4":
            h = self.group // 2
            p3 = p.reshape(*lead, self.k // self.group, h, self.n)
            q = jnp.concatenate([p3 & 0x0F, p3 >> 4], axis=-2).astype(
                jnp.float32)
        else:
            q = p.reshape(*lead, self.k // self.group, self.group,
                          self.n).astype(jnp.float32)
        w = q * s[..., :, None, :]
        if self.mins is not None:
            m = jnp.take(self.mins, idx, axis=0).astype(jnp.float32)
            w = w - m[..., :, None, :]
        return w.reshape(*lead, self.k, self.n).astype(dtype)


def fuse_linears(lins: list) -> Any | None:
    """Fuse same-input linears into one wide matmul (concat along N).

    On TPU decode, small matmuls are launch/fixed-overhead-bound; fusing
    q/k/v (and ffn gate/up) into single kernels cuts ops per layer from 7 to
    4. Returns None when the weights aren't compatible (mixed formats /
    groups / K). The reference's combined-QKV handling (loader.rs:857) is
    the inverse operation — it splits; we fuse."""
    if any(l is None for l in lins) or len(lins) < 2:
        return None
    if all(isinstance(l, DenseLinear) for l in lins):
        w = jnp.concatenate([l.weight for l in lins], axis=1)
        biases = [l.bias for l in lins]
        if any(b is not None for b in biases):
            parts = [
                b if b is not None else jnp.zeros((l.weight.shape[1],),
                                                  w.dtype)
                for b, l in zip(biases, lins)
            ]
            bias = jnp.concatenate(parts)
        else:
            bias = None
        return DenseLinear(w, bias,
                           splits=tuple(l.weight.shape[1] for l in lins))
    if not all(isinstance(l, QuantLinear) for l in lins):
        return None
    first = lins[0]
    if any(l.fmt != first.fmt or l.group != first.group or l.k != first.k
           for l in lins):
        return None
    has_mins = [l.mins is not None for l in lins]
    if any(has_mins) != all(has_mins):
        return None
    packed = jnp.concatenate([l.packed for l in lins], axis=1)
    scales = jnp.concatenate([l.scales for l in lins], axis=1)
    mins = (jnp.concatenate([l.mins for l in lins], axis=1)
            if all(has_mins) else None)
    biases = [l.bias for l in lins]
    if any(b is not None for b in biases):
        parts = [b if b is not None else jnp.zeros((l.n,), jnp.float32)
                 for b, l in zip(biases, lins)]
        bias = jnp.concatenate(parts)
    else:
        bias = None
    return QuantLinear(packed, scales, mins, bias, first.fmt, first.group,
                       first.k, sum(l.n for l in lins),
                       first.source_type, splits=tuple(l.n for l in lins))


def unfuse_linear(lin, splits: list[int]) -> list:
    """Inverse of fuse_linears: slice along N at the given widths."""
    offs = np.cumsum([0] + list(splits))
    out = []
    for a, b in zip(offs[:-1], offs[1:]):
        if isinstance(lin, DenseLinear):
            out.append(DenseLinear(
                lin.weight[:, a:b],
                lin.bias[a:b] if lin.bias is not None else None))
        else:
            out.append(QuantLinear(
                lin.packed[:, a:b], lin.scales[:, a:b],
                lin.mins[:, a:b] if lin.mins is not None else None,
                lin.bias[a:b] if lin.bias is not None else None,
                lin.fmt, lin.group, lin.k, int(b - a), lin.source_type))
    return out


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantEmbedding:
    """Token embedding table kept QUANTIZED in HBM, dequantized per-row on
    gather (the f32 table of an 8B model is 2.1 GB — 4x the quantized
    bytes; lookups touch one row per token so the dequant is free).

    Layout is ROW-major (one vocab entry per row, packed along H):
      q4: packed uint8 [V, H/2], group-split within each row's scale groups
      q8: int8  [V, H]
    plus scales/mins [V, H/group]."""

    packed: Any
    scales: Any
    mins: Any | None
    fmt: str = field(metadata=dict(static=True), default="q8")
    group: int = field(metadata=dict(static=True), default=32)
    vocab: int = field(metadata=dict(static=True), default=0)
    hidden: int = field(metadata=dict(static=True), default=0)

    def tree_flatten(self):
        return ((self.packed, self.scales, self.mins),
                (self.fmt, self.group, self.vocab, self.hidden))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def shape(self):
        return (self.vocab, self.hidden)


def embedding_lookup(emb, tokens: jnp.ndarray,
                     dtype=jnp.float32) -> jnp.ndarray:
    """tokens [...] int -> [..., H]. Dense tables gather directly;
    QuantEmbedding gathers packed rows and dequantizes in-graph (XLA fuses
    the unpack into the gather consumers)."""
    if not isinstance(emb, QuantEmbedding):
        return jnp.take(emb, tokens, axis=0)
    g = emb.group
    rows_s = jnp.take(emb.scales, tokens, axis=0).astype(jnp.float32)
    if emb.fmt == "q4":
        rows_p = jnp.take(emb.packed, tokens, axis=0)  # [..., H/2]
        h2 = emb.hidden // 2
        p3 = rows_p.reshape(*rows_p.shape[:-1], h2 // (g // 2), g // 2)
        q = jnp.concatenate([p3 & 0x0F, p3 >> 4], axis=-1)  # [..., G, g]
        q = q.reshape(*rows_p.shape[:-1], emb.hidden).astype(jnp.float32)
    else:
        q = jnp.take(emb.packed, tokens, axis=0).astype(jnp.float32)
    s = jnp.repeat(rows_s, g, axis=-1)
    w = q * s
    if emb.mins is not None:
        m = jnp.repeat(jnp.take(emb.mins, tokens, axis=0)
                       .astype(jnp.float32), g, axis=-1)
        w = w - m
    return w.astype(dtype)


def unpack_q4(ql: QuantLinear) -> jnp.ndarray:
    """Unpack group-split nibbles to integer values [K, N] (uint8, 0..15).
    See quant/repack.py pack_q4_group_split for the layout."""
    k2, n = ql.packed.shape
    h = ql.group // 2
    p3 = ql.packed.reshape(k2 // h, h, n)
    return jnp.concatenate([p3 & 0x0F, p3 >> 4], axis=1).reshape(2 * k2, n)


def dequantize_weight(ql: QuantLinear, dtype=jnp.float32) -> jnp.ndarray:
    """Materialize the dequantized weight [K, N] (reference path)."""
    if ql.fmt == "q4":
        q = unpack_q4(ql).astype(jnp.float32)
    else:
        q = ql.packed.astype(jnp.float32)
    s = jnp.repeat(ql.scales.astype(jnp.float32), ql.group, axis=0)
    w = q * s
    if ql.mins is not None:
        w = w - jnp.repeat(ql.mins.astype(jnp.float32), ql.group, axis=0)
    return w.astype(dtype)


def _apply_quant_xla(x: jnp.ndarray, ql: QuantLinear) -> jnp.ndarray:
    """XLA reference path: dequantize in-graph then matmul."""
    w = dequantize_weight(ql, jnp.float32)
    y = jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)
    return y


_USE_PALLAS = None


def use_pallas_default() -> bool:
    """Fused Pallas kernels only on real TPU backends."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        try:
            plat = jax.devices()[0].platform
        except Exception:
            plat = "cpu"
        _USE_PALLAS = plat in ("tpu", "axon")
    return _USE_PALLAS


def set_use_pallas(value: bool | None) -> None:
    global _USE_PALLAS
    _USE_PALLAS = value


def apply(lin, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W (+ bias). x: [..., K] -> [..., N]."""
    if isinstance(lin, LoraLinear):
        y = apply(lin.base, x)
        xa = jnp.dot(x.astype(jnp.float32), lin.a,
                     preferred_element_type=jnp.float32)
        delta = jnp.dot(xa, lin.b, preferred_element_type=jnp.float32)
        return (y.astype(jnp.float32) + delta * lin.scale).astype(y.dtype)
    if isinstance(lin, DenseLinear):
        y = jnp.dot(x, lin.weight.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if lin.bias is not None:
            y = y + lin.bias.astype(y.dtype)
        return y

    assert isinstance(lin, QuantLinear), type(lin)
    lead = x.shape[:-1]
    k = x.shape[-1]
    xb = x.reshape(-1, k)
    if use_pallas_default():
        from .qmatmul import qmatmul  # deferred: pallas import
        y = qmatmul(xb, lin)
    else:
        # mins are folded into the dequantized weight on this path
        y = _apply_quant_xla(xb, lin)
    y = y.astype(x.dtype)
    if lin.bias is not None:
        y = y + lin.bias.astype(y.dtype)
    return y.reshape(*lead, y.shape[-1])
