"""Normalization ops.

Plain jnp implementations: XLA fuses these into neighbours on TPU (the
reference needed hand-fused CUDA kernels, kernels.rs:131; on TPU the compiler
does this). f32 accumulation regardless of input dtype for parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float,
             add_unit_offset: bool = False) -> jnp.ndarray:
    """RMSNorm. ``add_unit_offset`` multiplies by (1 + w) (Gemma family)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    w = weight.astype(jnp.float32)
    if add_unit_offset:
        w = 1.0 + w
    return (normed * w).astype(dt)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None,
               eps: float) -> jnp.ndarray:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mu) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dt)


def apply_norm(x: jnp.ndarray, norm_params: dict, eps: float,
               use_layer_norm: bool = False,
               add_unit_offset: bool = False) -> jnp.ndarray:
    if use_layer_norm:
        return layer_norm(x, norm_params["weight"], norm_params.get("bias"), eps)
    return rms_norm(x, norm_params["weight"], eps, add_unit_offset)
