"""DeltaNet (gated delta rule) linear-attention layers for Qwen3Next hybrids.

Implements the recurrence  S_t = S_{t-1} * exp(g_t) + beta_t (v_t - S^T k_t) k_t^T
as a lax.scan over tokens with the state kept on device, plus the causal
conv1d + SiLU pre-filter. Parity target:
/root/reference/src/model/deltanet.rs:21-260.

Status: layer loading and recurrence implemented in transformer-state form;
see deltanet_layer. The recurrent state (S, conv ring buffer) is carried in
the "deltanet" slot of the cache pytree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linear as L
from ..ops.norms import rms_norm


def load_deltanet_layer(loader, i: int, cfg) -> dict:
    """Load a DeltaNet layer (Qwen3Next naming, loader.rs:991-1139)."""
    p = f"blk.{i}"
    layer: dict[str, Any] = {}
    layer["attn_norm"] = loader.norm(f"{p}.attn_norm")
    dn: dict[str, Any] = {}
    # combined qkvz projection (Qwen3Next) or separate beta/alpha (Qwen3.5)
    if loader.has(f"{p}.ssm_in.weight"):
        dn["in_proj"] = loader.linear(f"{p}.ssm_in")
    if loader.has(f"{p}.ssm_beta.weight"):
        dn["beta_proj"] = loader.linear(f"{p}.ssm_beta")
    if loader.has(f"{p}.ssm_alpha.weight"):
        dn["alpha_proj"] = loader.linear(f"{p}.ssm_alpha")
    if loader.has(f"{p}.ssm_ba.weight"):
        dn["ba_proj"] = loader.linear(f"{p}.ssm_ba")
    conv_w = loader.dense(f"{p}.ssm_conv1d.weight")
    dn["conv_w"] = loader._put(np.ascontiguousarray(conv_w), f"{p}.ssm_conv1d.weight")
    if loader.has(f"{p}.ssm_conv1d.bias"):
        dn["conv_b"] = loader._put(loader.dense(f"{p}.ssm_conv1d.bias"),
                                   f"{p}.ssm_conv1d.bias")
    if loader.has(f"{p}.ssm_dt.bias"):
        dn["dt_bias"] = loader._put(loader.dense(f"{p}.ssm_dt.bias"),
                                    f"{p}.ssm_dt.bias")
    if loader.has(f"{p}.ssm_a"):
        dn["ssm_a"] = loader._put(loader.dense(f"{p}.ssm_a"), f"{p}.ssm_a")
    if loader.has(f"{p}.ssm_norm.weight"):
        dn["out_norm"] = loader._put(loader.dense(f"{p}.ssm_norm.weight"),
                                     f"{p}.ssm_norm.weight")
    dn["z_proj"] = loader.linear(f"{p}.attn_gate")
    dn["out_proj"] = loader.linear(f"{p}.ssm_out")
    layer["deltanet"] = dn
    layer["ffn"] = loader._load_ffn(i, cfg)
    ffn_norm = loader.norm(f"{p}.ffn_norm", required=False)
    if ffn_norm is not None:
        layer["ffn_norm"] = ffn_norm
    return layer


def delta_rule_scan(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    beta: jnp.ndarray, gate: jnp.ndarray,
                    state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gated delta rule over a token sequence.

    q,k: [B, T, Hk, Dk] (L2-normalized per head); v: [B, T, Hv, Dv];
    beta: [B, T, Hv]; gate: [B, T, Hv] (log-decay, <= 0);
    state: [B, Hv, Dk, Dv]. Returns (out [B, T, Hv, Dv], new_state).

    Hv may be a multiple of Hk (value heads grouped over key heads).
    """
    bsz, t, hk, dk = q.shape
    hv, dv = v.shape[2], v.shape[3]
    rep = hv // hk

    def step(s, inp):
        qt, kt, vt, bt, gt = inp  # [B,Hk,Dk], [B,Hk,Dk], [B,Hv,Dv], [B,Hv], [B,Hv]
        kt_v = jnp.repeat(kt, rep, axis=1)  # [B,Hv,Dk]
        qt_v = jnp.repeat(qt, rep, axis=1)
        s = s * jnp.exp(gt)[:, :, None, None]
        # prediction error: v_pred = S^T k = einsum over Dk
        v_pred = jnp.einsum("bhkv,bhk->bhv", s, kt_v)
        delta = (vt - v_pred) * bt[..., None]
        s = s + jnp.einsum("bhk,bhv->bhkv", kt_v, delta)
        out = jnp.einsum("bhkv,bhk->bhv", s, qt_v)
        return s, out

    xs = (
        jnp.moveaxis(q, 1, 0),
        jnp.moveaxis(k, 1, 0),
        jnp.moveaxis(v, 1, 0),
        jnp.moveaxis(beta, 1, 0),
        jnp.moveaxis(gate, 1, 0),
    )
    state, outs = jax.lax.scan(step, state, xs)
    return jnp.moveaxis(outs, 0, 1), state


def deltanet_layer(layer: dict, cfg, x: jnp.ndarray, positions: jnp.ndarray,
                   kv: dict, layer_idx: int,
                   lengths: jnp.ndarray | None = None) -> tuple[jnp.ndarray, dict]:
    """Full DeltaNet block: norm -> conv+silu qkv -> delta rule -> gated out.

    Recurrent state lives in kv["deltanet"][layer_idx] as
    {"S": [B, Hv, Dk, Dv], "conv": [B, K-1, C]}. Bucket-padding slots
    (positions >= lengths) must not advance the conv ring or S.
    """
    from ..ops.norms import apply_norm

    b, t, _ = x.shape
    if lengths is not None:
        valid = positions < lengths[:, None]  # [B, T]
    else:
        valid = jnp.ones((b, t), bool)
    vmask = valid.astype(jnp.float32)[..., None]
    dk = cfg.ssm_d_state
    hk = cfg.ssm_n_group
    hv = cfg.ssm_dt_rank
    dv = cfg.ssm_d_inner // max(hv, 1)

    h = apply_norm(x, layer["attn_norm"], cfg.norm_eps, cfg.uses_layer_norm)
    dn = layer["deltanet"]

    # GGUF convention (deltanet.rs:161-232): ssm_in -> [q | k | v] flat,
    # z from the separate attn_gate projection
    proj = L.apply(dn["in_proj"], h).astype(jnp.float32)  # [B,T,q+k+v]
    nq, nk, nv = hk * dk, hk * dk, hv * dv
    qf = proj[..., :nq]
    kf = proj[..., nq:nq + nk]
    vf = proj[..., nq + nk:nq + nk + nv]
    zf = L.apply(dn["z_proj"], h).astype(jnp.float32)  # [B,T,Hv*Dv]

    # causal depthwise conv over the qkv part, with ring-buffer state
    conv_w = dn["conv_w"].astype(jnp.float32)  # [C, K] (np shape)
    ksz = conv_w.shape[-1]
    qkv = jnp.concatenate([qf, kf, vf], axis=-1) * vmask  # [B, T, C]
    st = kv["deltanet"][layer_idx]
    conv_state = st["conv"]  # [B, ksz-1, C]
    seq = jnp.concatenate([conv_state, qkv], axis=1)  # [B, ksz-1+T, C]
    idx = jnp.arange(t)[:, None] + jnp.arange(ksz)[None, :]  # [T, K]
    windows = seq[:, idx, :]  # [B, T, K, C]
    conv = jnp.einsum("btkc,ck->btc", windows, conv_w)
    if "conv_b" in dn:
        conv = conv + dn["conv_b"].astype(jnp.float32)
    conv = jax.nn.silu(conv)
    # new conv state = last ksz-1 VALID inputs (padding excluded)
    n_valid = valid.sum(axis=1).astype(jnp.int32)
    gidx = n_valid[:, None] + jnp.arange(ksz - 1)[None, :]
    new_conv_state = jnp.take_along_axis(seq, gidx[..., None], axis=1)

    q = conv[..., :nq].reshape(b, t, hk, dk)
    k = conv[..., nq:nq + nk].reshape(b, t, hk, dk)
    v = conv[..., nq + nk:].reshape(b, t, hv, dv)

    # per-head L2 norm of q, k; q additionally scaled by Dk^-0.5
    q = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-6)
    k = k * jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-6)
    q = q * (dk ** -0.5)

    if "ba_proj" in dn:  # combined beta/alpha projection, grouped per
        # k-head: [b(r) | a(r)] x Hk (deltanet.rs:179-189)
        ba = L.apply(dn["ba_proj"], h).astype(jnp.float32)  # [B,T,2*Hv]
        rep_v = hv // max(hk, 1)
        bag = ba.reshape(b, t, hk, 2 * rep_v)
        beta_raw = bag[..., :rep_v].reshape(b, t, hv)
        alpha_raw = bag[..., rep_v:].reshape(b, t, hv)
    else:
        beta_raw = L.apply(dn["beta_proj"], h).astype(jnp.float32)
        alpha_raw = L.apply(dn["alpha_proj"], h).astype(jnp.float32)
    beta = jax.nn.sigmoid(beta_raw)
    # GGUF stores ssm_a = -exp(A_log) (already negative; mamba convention)
    a = dn["ssm_a"].astype(jnp.float32) if "ssm_a" in dn else -1.0
    dt_bias = dn.get("dt_bias", 0.0)
    gate = a * jax.nn.softplus(alpha_raw + dt_bias)  # log-decay <= 0
    # freeze state across padding: beta=0 (no write), gate=0 (decay=1)
    vm = valid.astype(jnp.float32)[..., None]  # broadcast over heads
    beta = beta * vm
    gate = gate * vm

    out, new_s = delta_rule_scan(q, k, v, beta, gate, st["S"])

    if "out_norm" in dn:  # per-head RMSNorm on output
        out = rms_norm(out, dn["out_norm"], cfg.norm_eps)
    out = out * jax.nn.silu(zf.reshape(b, t, hv, dv))
    out = out.reshape(b, t, hv * dv).astype(x.dtype)
    y = L.apply(dn["out_proj"], out)

    kv = dict(kv)
    dstates = list(kv["deltanet"])
    dstates[layer_idx] = {"S": new_s, "conv": new_conv_state}
    kv["deltanet"] = tuple(dstates)

    x = x + y
    # FFN half of the block
    from .transformer import feed_forward, moe_layer
    from ..ops.norms import apply_norm as an
    h2 = an(x, layer["ffn_norm"], cfg.norm_eps, cfg.uses_layer_norm)
    ffn_out = (
        moe_layer(layer["ffn"], cfg, h2)
        if "router" in layer["ffn"]
        else feed_forward(layer["ffn"], cfg, h2)
    )
    return x + ffn_out, kv


def init_deltanet_state(cfg, batch: int, num_layers: int) -> tuple:
    """Per-layer recurrent state tuple aligned with cfg.layer_kinds."""
    dk = cfg.ssm_d_state
    hk = cfg.ssm_n_group
    hv = cfg.ssm_dt_rank
    dv = cfg.ssm_d_inner // max(hv, 1)
    ksz = max(cfg.ssm_conv_kernel, 1)
    conv_ch = 2 * hk * dk + hv * dv
    states = []
    kinds = cfg.layer_kinds or ("attn",) * num_layers
    for kind in kinds:
        if kind == "deltanet":
            states.append({
                "S": jnp.zeros((batch, hv, dk, dv), jnp.float32),
                "conv": jnp.zeros((batch, ksz - 1, conv_ch), jnp.float32),
            })
        else:
            states.append({
                "S": jnp.zeros((batch, 1, 1, 1), jnp.float32),
                "conv": jnp.zeros((batch, 1, 1), jnp.float32),
            })
    return tuple(states)
