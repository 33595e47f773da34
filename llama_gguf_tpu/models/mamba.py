"""Mamba v1 selective state-space layer.

Parity target: /root/reference/src/model/mamba.rs:22-256 (MambaLayer/
MambaState: in-proj split, causal depthwise conv1d ring buffer, SiLU,
x_db -> (dt, B, C), softplus dt, selective scan
s = exp(A*dt)*s + B*dt*x, y = C.s + D*x, gate silu(z), out-proj) and the
loader names blk.N.ssm_{in,conv1d,x,dt,a,d,out} (loader.rs:1040+).

TPU-native design: everything that is a matmul (in/out projections, x_db,
dt) runs batched over [B, T] on the MXU *outside* the recurrence; the causal
conv is a full-sequence convolution (not a per-token ring buffer); only the
O(T) state update lives inside lax.scan, carrying [B, d_inner, d_state] in
registers/VMEM. The reference computes all of this per token per scalar.

State lives in the kv pytree under "mamba": conv [L, B, ks-1, d_inner] and
ssm [L, B, d_inner, d_state], donated through the jitted step like the
attention KV cache.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops import linear as L
from ..ops.norms import rms_norm


def init_mamba_state(cfg, batch: int, num_layers: int) -> dict[str, Any]:
    # per-layer tuples (not a stacked [L, ...] array): like the KV cache,
    # a stacked buffer with interleaved per-layer reads and .at[layer]
    # updates defeats XLA's in-place aliasing inside lax.scan
    ks = cfg.ssm_conv_kernel
    return {
        "conv": tuple(
            jnp.zeros((batch, ks - 1, cfg.ssm_d_inner), jnp.float32)
            for _ in range(num_layers)),
        "ssm": tuple(
            jnp.zeros((batch, cfg.ssm_d_inner, cfg.ssm_d_state), jnp.float32)
            for _ in range(num_layers)),
    }


def mamba_layer(layer: dict, cfg, x: jnp.ndarray, positions: jnp.ndarray,
                kv: dict, layer_idx: int,
                lengths: jnp.ndarray) -> tuple[jnp.ndarray, dict]:
    """x: [B, T, H] -> ([B, T, H], kv'). Processes T tokens causally.

    positions/lengths identify bucket-padding slots (positions >= lengths),
    which must NOT advance the recurrent conv/SSM state — a constraint dense
    attention doesn't have (there the scatter just drops OOB writes)."""
    b, t, _ = x.shape
    di, ds, dtr = cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_dt_rank
    ks = cfg.ssm_conv_kernel
    valid = positions < lengths[:, None]  # [B, T]
    vf = valid.astype(jnp.float32)[..., None]

    residual = x
    h = rms_norm(x, layer["attn_norm"]["weight"], cfg.norm_eps)

    proj = L.apply(layer["ssm_in"], h).astype(jnp.float32)  # [B,T,2di]
    x_ssm, z = proj[..., :di] * vf, proj[..., di:]

    # -- causal depthwise conv over the whole window (batched, no ring buffer)
    conv_state = kv["mamba"]["conv"][layer_idx]  # [B, ks-1, di]
    seq = jnp.concatenate([conv_state, x_ssm], axis=1)  # [B, ks-1+T, di]
    w = layer["conv_w"].astype(jnp.float32)  # [ks, di]
    # out[t] = sum_k w[k] * seq[t+k]  (t = 0..T-1)
    stacked = jnp.stack([seq[:, k: k + t, :] for k in range(ks)], axis=2)
    conv = jnp.einsum("btkd,kd->btd", stacked, w)
    if layer.get("conv_b") is not None:
        conv = conv + layer["conv_b"].astype(jnp.float32)
    # new conv state = last ks-1 VALID inputs: window slots n_b..n_b+ks-2
    # (valid tokens occupy slots 0..n_b-1 of x_ssm within this window)
    n_valid = valid.sum(axis=1).astype(jnp.int32)  # [B]
    gather_idx = n_valid[:, None] + jnp.arange(ks - 1)[None, :]  # [B, ks-1]
    new_conv = jnp.take_along_axis(seq, gather_idx[..., None], axis=1)
    xs = jax.nn.silu(conv)  # [B, T, di]

    # -- batched projections feeding the scan
    x_db = L.apply(layer["ssm_x"], xs.astype(x.dtype)).astype(jnp.float32)
    dt_raw = x_db[..., :dtr]
    b_t = x_db[..., dtr: dtr + ds]          # [B, T, ds]
    c_t = x_db[..., dtr + ds: dtr + 2 * ds]  # [B, T, ds]
    if "dt_norm" in layer:  # jamba: RMSNorms on dt/B/C before discretization
        dt_raw = rms_norm(dt_raw, layer["dt_norm"], cfg.norm_eps)
        b_t = rms_norm(b_t, layer["b_norm"], cfg.norm_eps)
        c_t = rms_norm(c_t, layer["c_norm"], cfg.norm_eps)
    dt = L.apply(layer["ssm_dt"], dt_raw.astype(x.dtype)).astype(jnp.float32)
    dt = jax.nn.softplus(dt + layer["dt_bias"].astype(jnp.float32))  # [B,T,di]

    a = layer["ssm_a"].astype(jnp.float32)  # [di, ds], already -exp(A_log)
    decay = jnp.exp(dt[..., None] * a[None, None])  # [B, T, di, ds]
    drive = (dt * xs)[..., None] * b_t[:, :, None, :]  # [B, T, di, ds]
    # freeze the state across padding slots: decay=1, drive=0
    v4 = vf[..., None]
    decay = decay * v4 + (1.0 - v4)
    drive = drive * v4

    ssm0 = kv["mamba"]["ssm"][layer_idx]  # [B, di, ds]

    def body(state, inp):
        dec, drv, c = inp  # [B,di,ds], [B,di,ds], [B,ds]
        state = dec * state + drv
        y = jnp.einsum("bdn,bn->bd", state, c)
        return state, y

    ssm_f, ys = jax.lax.scan(
        body, ssm0,
        (decay.swapaxes(0, 1), drive.swapaxes(0, 1), c_t.swapaxes(0, 1)),
    )
    y = ys.swapaxes(0, 1)  # [B, T, di]

    if layer.get("ssm_d") is not None:
        y = y + layer["ssm_d"].astype(jnp.float32) * xs
    y = y * jax.nn.silu(z)

    out = L.apply(layer["ssm_out"], y.astype(x.dtype))

    kv = dict(kv)
    mamba = dict(kv["mamba"])
    conv = list(mamba["conv"])
    conv[layer_idx] = new_conv
    mamba["conv"] = tuple(conv)
    ssm = list(mamba["ssm"])
    ssm[layer_idx] = ssm_f
    mamba["ssm"] = tuple(ssm)
    kv["mamba"] = mamba
    x = residual + out

    if "ffn" in layer:  # jamba: mamba mixer + FFN/MoE half per block
        from ..ops.norms import apply_norm
        from .transformer import feed_forward, moe_layer

        h2 = apply_norm(x, layer["ffn_norm"], cfg.norm_eps,
                        cfg.uses_layer_norm)
        ffn_out = (
            moe_layer(layer["ffn"], cfg, h2)
            if "router" in layer["ffn"]
            else feed_forward(layer["ffn"], cfg, h2)
        )
        x = x + ffn_out
    return x, kv


def load_mamba_layer(loader, i: int, cfg) -> dict:
    """Load one Mamba layer from GGUF (loader.rs:1040 name parity)."""
    import numpy as np

    p = f"blk.{i}"
    layer: dict[str, Any] = {
        "attn_norm": loader.norm(f"{p}.attn_norm"),
        "ssm_in": loader.linear(f"{p}.ssm_in"),
        "ssm_x": loader.linear(f"{p}.ssm_x"),
        "ssm_dt": loader.linear(f"{p}.ssm_dt", bias_name="__none__"),
        "ssm_out": loader.linear(f"{p}.ssm_out"),
    }
    # conv weight GGUF np shape [d_inner, ks] -> [ks, d_inner]
    conv_w = loader.dense(f"{p}.ssm_conv1d.weight")
    layer["conv_w"] = loader._put(
        np.ascontiguousarray(conv_w.T), f"{p}.ssm_conv1d.weight")
    if loader.has(f"{p}.ssm_conv1d.bias"):
        layer["conv_b"] = loader._put(loader.dense(f"{p}.ssm_conv1d.bias"),
                                      f"{p}.ssm_conv1d.bias")
    # A stored as [d_inner, d_state] np shape, already negative
    layer["ssm_a"] = loader._put(loader.dense(f"{p}.ssm_a"), f"{p}.ssm_a")
    layer["dt_bias"] = loader._put(loader.dense(f"{p}.ssm_dt.bias"),
                                   f"{p}.ssm_dt.bias")
    if loader.has(f"{p}.ssm_d"):
        layer["ssm_d"] = loader._put(loader.dense(f"{p}.ssm_d"), f"{p}.ssm_d")
    # jamba: RMSNorms on dt/B/C (HF JambaMambaMixer dt/b/c_layernorm)
    for tag in ("dt", "b", "c"):
        name = f"{p}.ssm_{tag}_norm"
        if loader.has(f"{name}.weight"):
            layer[f"{tag}_norm"] = loader._put(
                loader.dense(f"{name}.weight"), f"{name}.weight")
    # jamba blocks pair the mamba mixer with an FFN/MoE half
    if loader.has(f"{p}.ffn_norm.weight"):
        layer["ffn_norm"] = loader.norm(f"{p}.ffn_norm")
        layer["ffn"] = loader._load_ffn(i, cfg)
    return layer
