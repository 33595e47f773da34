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
    fmt: str = field(metadata=dict(static=True), default="q8")  # "q4" | "q8"
    group: int = field(metadata=dict(static=True), default=32)
    k: int = field(metadata=dict(static=True), default=0)
    n: int = field(metadata=dict(static=True), default=0)
    source_type: str = field(metadata=dict(static=True), default="")

    def tree_flatten(self):
        children = (self.packed, self.scales, self.mins, self.bias)
        aux = (self.fmt, self.group, self.k, self.n, self.source_type)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scales, mins, bias = children
        fmt, group, k, n, source_type = aux
        return cls(packed, scales, mins, bias, fmt, group, k, n, source_type)

    @property
    def shape(self):
        return (self.k, self.n)


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseLinear:
    """Dense weight [K, N] (+ optional bias [N])."""

    weight: Any
    bias: Any | None = None

    def tree_flatten(self):
        return (self.weight, self.bias), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

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
