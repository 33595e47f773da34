"""Rotary position embeddings: Normal and NeoX pairing, partial, linear/YaRN
scaling.

TPU-first design: RoPE is a pure function of (x, positions) computed inside
the jitted step; XLA fuses the sin/cos and the rotation into surrounding ops,
so no table materialization or custom kernel is needed for the decode path.

Parity target: the reference's CPU rope (/root/reference/src/backend/cpu/
ops.rs:1216-1352) — Normal pairing rotates (x[2i], x[2i+1]), NeoX rotates
(x[i], x[i+d/2]); partial RoPE rotates only the first (or last) n_dims of the
head dimension.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..models.config import RopeConfig, RopeScalingType, RopeType


def rope_inv_freq(cfg: RopeConfig) -> jnp.ndarray:
    """Per-pair inverse frequencies [n_dims/2], with YaRN interpolation."""
    half = cfg.n_dims // 2
    exponents = jnp.arange(0, half, dtype=jnp.float32) * (2.0 / cfg.n_dims)
    inv_freq = 1.0 / (cfg.freq_base**exponents)
    if cfg.scaling_type == RopeScalingType.YARN and cfg.yarn_ext_factor != 0.0:
        # YaRN: interpolate between scaled and unscaled freqs per dimension
        lo = _yarn_corr_dim(cfg, cfg.yarn_beta_fast)
        hi = _yarn_corr_dim(cfg, cfg.yarn_beta_slow)
        ramp = jnp.clip(
            (jnp.arange(half, dtype=jnp.float32) - lo) / jnp.maximum(hi - lo, 1e-3),
            0.0,
            1.0,
        )
        mask = (1.0 - ramp) * cfg.yarn_ext_factor
        inv_freq = inv_freq / cfg.freq_scale * (1 - mask) + inv_freq * mask
        return inv_freq
    return inv_freq


def _yarn_corr_dim(cfg: RopeConfig, n_rot: float) -> float:
    return (
        cfg.n_dims
        * math.log(cfg.original_max_position_embeddings / (n_rot * 2 * math.pi))
        / (2 * math.log(cfg.freq_base))
    )


def rope_cos_sin(
    positions: jnp.ndarray, cfg: RopeConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions [...], each [..., n_dims/2]."""
    inv_freq = rope_inv_freq(cfg)
    scale = cfg.freq_scale if cfg.scaling_type != RopeScalingType.YARN else 1.0
    theta = positions[..., None].astype(jnp.float32) * scale * inv_freq
    attn_factor = (
        cfg.yarn_attn_factor if cfg.scaling_type == RopeScalingType.YARN else 1.0
    )
    return jnp.cos(theta) * attn_factor, jnp.sin(theta) * attn_factor


def apply_rope(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: RopeConfig,
) -> jnp.ndarray:
    """Apply RoPE to x [..., n_heads, head_dim].

    cos/sin are [..., n_dims/2] broadcast over the heads axis. Handles partial
    RoPE (n_dims < head_dim) at the start or end of the head dim.
    """
    head_dim = x.shape[-1]
    nd = cfg.n_dims
    orig_dtype = x.dtype
    if nd < head_dim:
        if cfg.partial_at_end:
            pass_part, rot_part = x[..., : head_dim - nd], x[..., head_dim - nd :]
        else:
            rot_part, pass_part = x[..., :nd], x[..., nd:]
    else:
        rot_part, pass_part = x, None

    rot_part = rot_part.astype(jnp.float32)
    c = cos[..., None, :]  # broadcast over heads: [..., 1, nd/2]
    s = sin[..., None, :]
    if cfg.rope_type == RopeType.NEOX:
        x1 = rot_part[..., : nd // 2]
        x2 = rot_part[..., nd // 2 :]
        r1 = x1 * c - x2 * s
        r2 = x2 * c + x1 * s
        rotated = jnp.concatenate([r1, r2], axis=-1)
    else:  # NORMAL: interleaved pairs
        x1 = rot_part[..., 0::2]
        x2 = rot_part[..., 1::2]
        r1 = x1 * c - x2 * s
        r2 = x2 * c + x1 * s
        rotated = jnp.stack([r1, r2], axis=-1).reshape(rot_part.shape)

    rotated = rotated.astype(orig_dtype)
    if pass_part is None:
        return rotated
    if cfg.partial_at_end:
        return jnp.concatenate([pass_part, rotated], axis=-1)
    return jnp.concatenate([rotated, pass_part], axis=-1)


def rerotate_keys(k: jnp.ndarray, delta: int, cfg: RopeConfig) -> jnp.ndarray:
    """Rotate stored (post-RoPE) keys by a fixed position delta.

    RoPE is linear in position: moving a key from position p to p+delta is a
    rotation by delta*theta regardless of p. Used by the KV context shift so
    shifted keys stay consistent with their new positions (the reference's
    shift_left memmove skips this, model/mod.rs:142).

    k: [..., H, D] (any leading dims)."""
    cos, sin = rope_cos_sin(jnp.asarray(delta, jnp.float32), cfg)
    return apply_rope(k, cos, sin, cfg)
