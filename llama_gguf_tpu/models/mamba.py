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
    di, ds = cfg.ssm_d_inner, cfg.ssm_d_state
    kinds = cfg.layer_kinds or ("mamba",) * num_layers

    def conv_shape(i):
        if kinds[i] == "shortconv":  # LFM2: (L_cache-1)-tap Bx window
            return (batch, cfg.shortconv_l_cache - 1, cfg.hidden_size)
        if kinds[i] in ("mamba2", "hybrid_par"):  # conv runs over [x|B|C]
            ng = max(cfg.ssm_n_group, 1)
            return (batch, ks - 1, di + 2 * ng * ds)
        # attn layers in ssm-less hybrids (lfm2) have ks == 0: placeholder
        return (batch, max(ks - 1, 0), di)

    def ssm_shape(i):
        if kinds[i] == "shortconv":  # no SSM state, placeholder only
            return (batch, 0, 0)
        if kinds[i] in ("mamba2", "hybrid_par"):  # per-head [nh, hd, ds]
            nh = max(cfg.ssm_dt_rank, 1)
            return (batch, nh, di // nh, ds)
        return (batch, di, ds)

    return {
        "conv": tuple(jnp.zeros(conv_shape(i), jnp.float32)
                      for i in range(num_layers)),
        "ssm": tuple(jnp.zeros(ssm_shape(i), jnp.float32)
                     for i in range(num_layers)),
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


def mamba2_mixer(layer: dict, cfg, h: jnp.ndarray, positions: jnp.ndarray,
                 kv: dict, layer_idx: int,
                 lengths: jnp.ndarray) -> tuple[jnp.ndarray, dict]:
    """Mamba-2 (SSD) mixer core: normed input [B, T, H] -> (out, kv').

    HF Mamba2Mixer torch-path parity: in_proj -> [z | xBC | dt], causal
    depthwise conv over [x|B|C], per-HEAD scalar decay a=-exp(A_log[h]),
    grouped B/C broadcast to heads, state h[b,head,hd,ds], y = h.C + D*x,
    gated RMSNorm (optional; group-wise and norm-before-gate variants for
    Falcon-H1), out_proj. Same TPU layout as mamba_layer: all matmuls
    batched outside the scan, only the O(T) state update inside lax.scan."""
    b, t, _ = h.shape
    di, ds = cfg.ssm_d_inner, cfg.ssm_d_state
    nh = cfg.ssm_dt_rank  # llama.cpp: time_step_rank == n_heads for mamba2
    ng = max(cfg.ssm_n_group, 1)
    hd = di // nh
    ks = cfg.ssm_conv_kernel
    conv_dim = di + 2 * ng * ds
    valid = positions < lengths[:, None]  # [B, T]
    vf = valid.astype(jnp.float32)[..., None]

    proj = L.apply(layer["ssm_in"], h).astype(jnp.float32)
    z = proj[..., :di]
    xbc = proj[..., di: di + conv_dim] * vf
    dt_raw = proj[..., di + conv_dim:]  # [B, T, nh]

    conv_state = kv["mamba"]["conv"][layer_idx]  # [B, ks-1, conv_dim]
    seq = jnp.concatenate([conv_state, xbc], axis=1)
    w = layer["conv_w"].astype(jnp.float32)  # [ks, conv_dim]
    stacked = jnp.stack([seq[:, k: k + t, :] for k in range(ks)], axis=2)
    conv = jnp.einsum("btkd,kd->btd", stacked, w)
    if layer.get("conv_b") is not None:
        conv = conv + layer["conv_b"].astype(jnp.float32)
    n_valid = valid.sum(axis=1).astype(jnp.int32)
    gather_idx = n_valid[:, None] + jnp.arange(ks - 1)[None, :]
    new_conv = jnp.take_along_axis(seq, gather_idx[..., None], axis=1)
    xbc = jax.nn.silu(conv)

    xs = xbc[..., :di].reshape(b, t, nh, hd)
    rep = nh // ng
    b_h = jnp.repeat(
        xbc[..., di: di + ng * ds].reshape(b, t, ng, ds), rep, axis=2)
    c_h = jnp.repeat(
        xbc[..., di + ng * ds:].reshape(b, t, ng, ds), rep, axis=2)

    dt = jax.nn.softplus(dt_raw + layer["dt_bias"].astype(jnp.float32))
    a = layer["ssm_a"].astype(jnp.float32).reshape(-1)  # [nh], -exp(A_log)
    decay = jnp.exp(dt * a[None, None, :])  # [B, T, nh]
    # freeze the state across padding slots: decay=1, drive=0
    decay = jnp.where(valid[..., None], decay, 1.0)
    drive = (dt[..., None] * xs)[..., None] * b_h[..., None, :]
    drive = drive * valid[:, :, None, None, None]  # [B, T, nh, hd, ds]

    ssm0 = kv["mamba"]["ssm"][layer_idx]  # [B, nh, hd, ds]

    def body(state, inp):
        dec, drv, c = inp  # [B,nh], [B,nh,hd,ds], [B,nh,ds]
        state = dec[..., None, None] * state + drv
        y = jnp.einsum("bnhs,bns->bnh", state, c)
        return state, y

    ssm_f, ys = jax.lax.scan(
        body, ssm0,
        (decay.swapaxes(0, 1), drive.swapaxes(0, 1), c_h.swapaxes(0, 1)))
    y = ys.swapaxes(0, 1)  # [B, T, nh, hd]
    if layer.get("ssm_d") is not None:
        d = layer["ssm_d"].astype(jnp.float32).reshape(-1)  # [nh]
        y = y + d[None, None, :, None] * xs
    y = y.reshape(b, t, di)

    def gated_norm(y):
        groups = cfg.ssm_norm_groups  # static (config, not pytree)
        if groups > 1:  # Falcon-H1: variance per group of di/ng channels
            yr = y.reshape(b, t, groups, di // groups)
            yr = yr * jax.lax.rsqrt(
                jnp.mean(jnp.square(yr), -1, keepdims=True) + cfg.norm_eps)
            return yr.reshape(b, t, di) * layer["ssm_norm"].astype(jnp.float32)
        return rms_norm(y, layer["ssm_norm"], cfg.norm_eps)

    if "ssm_norm" not in layer:  # Falcon-H1 mamba_rms_norm=False
        y = y * jax.nn.silu(z)
    elif cfg.ssm_norm_before_gate:  # Falcon-H1 default order
        y = gated_norm(y) * jax.nn.silu(z)
    else:  # Mamba-2 MambaRMSNormGated: gate first, then norm
        y = gated_norm(y * jax.nn.silu(z))
    out = L.apply(layer["ssm_out"], y.astype(h.dtype))

    kv = dict(kv)
    mamba = dict(kv["mamba"])
    conv = list(mamba["conv"])
    conv[layer_idx] = new_conv
    mamba["conv"] = tuple(conv)
    ssm = list(mamba["ssm"])
    ssm[layer_idx] = ssm_f
    mamba["ssm"] = tuple(ssm)
    kv["mamba"] = mamba
    return out, kv


def mamba2_layer(layer: dict, cfg, x: jnp.ndarray, positions: jnp.ndarray,
                 kv: dict, layer_idx: int,
                 lengths: jnp.ndarray) -> tuple[jnp.ndarray, dict]:
    """Full Mamba-2 block: pre-norm + mixer + residual (+ hybrid FFN half).

    cfg.residual_scale (granitehybrid residual_multiplier) scales both the
    mixer and FFN contributions, mirroring the attention blocks."""
    from ..ops.norms import apply_norm

    rs = cfg.residual_scale
    h = apply_norm(x, layer["attn_norm"], cfg.norm_eps, cfg.uses_layer_norm)
    out, kv = mamba2_mixer(layer, cfg, h, positions, kv, layer_idx, lengths)
    if rs != 1.0:
        out = out * jnp.asarray(rs, out.dtype)
    x = x + out

    if "ffn" in layer:  # hybrid blocks pairing the mixer with an FFN half
        from ..ops.norms import apply_norm
        from .transformer import feed_forward, moe_layer

        h2 = apply_norm(x, layer["ffn_norm"], cfg.norm_eps,
                        cfg.uses_layer_norm)
        ffn_out = (
            moe_layer(layer["ffn"], cfg, h2)
            if "router" in layer["ffn"]
            else feed_forward(layer["ffn"], cfg, h2)
        )
        if rs != 1.0:
            ffn_out = ffn_out * jnp.asarray(rs, ffn_out.dtype)
        x = x + ffn_out
    return x, kv


def load_mamba2_fields(loader, i: int, cfg) -> dict:
    """Mixer-only Mamba-2 tensors: ssm_in is [z|xBC|dt] combined, no
    ssm_x/ssm_dt projection (dt comes straight from in_proj; only
    ssm_dt.bias exists), per-head ssm_a/ssm_d, optional gated ssm_norm.
    Shared by pure Mamba-2 layers and Falcon-H1 parallel hybrids."""
    import numpy as np

    p = f"blk.{i}"
    layer: dict[str, Any] = {
        "ssm_in": loader.linear(f"{p}.ssm_in"),
        "ssm_out": loader.linear(f"{p}.ssm_out"),
    }
    conv_w = loader.dense(f"{p}.ssm_conv1d.weight")  # [conv_dim, ks]
    layer["conv_w"] = loader._put(
        np.ascontiguousarray(conv_w.T), f"{p}.ssm_conv1d.weight")
    if loader.has(f"{p}.ssm_conv1d.bias"):
        layer["conv_b"] = loader._put(loader.dense(f"{p}.ssm_conv1d.bias"),
                                      f"{p}.ssm_conv1d.bias")
    layer["ssm_a"] = loader._put(loader.dense(f"{p}.ssm_a"), f"{p}.ssm_a")
    layer["dt_bias"] = loader._put(loader.dense(f"{p}.ssm_dt.bias"),
                                   f"{p}.ssm_dt.bias")
    if loader.has(f"{p}.ssm_d"):
        layer["ssm_d"] = loader._put(loader.dense(f"{p}.ssm_d"), f"{p}.ssm_d")
    if loader.has(f"{p}.ssm_norm.weight"):
        # conversion stores ssm_norm as [ng, di/ng]; Mamba-2 normalizes
        # full-width (flatten back), Falcon-H1 normalizes per GROUP and
        # applies the norm BEFORE the silu(z) gate
        layer["ssm_norm"] = loader._put(
            loader.dense(f"{p}.ssm_norm.weight").reshape(-1),
            f"{p}.ssm_norm.weight")
    return layer


def load_mamba2_layer(loader, i: int, cfg) -> dict:
    """Load one pure Mamba-2 block (pre-norm + mixer + optional FFN half)."""
    p = f"blk.{i}"
    layer = {"attn_norm": loader.norm(f"{p}.attn_norm")}
    layer.update(load_mamba2_fields(loader, i, cfg))
    if loader.has(f"{p}.ffn_norm.weight"):  # hybrid block FFN half
        layer["ffn_norm"] = loader.norm(f"{p}.ffn_norm")
        layer["ffn"] = loader._load_ffn(i, cfg)
    return layer


def shortconv_layer(layer: dict, cfg, x: jnp.ndarray, positions: jnp.ndarray,
                    kv: dict, layer_idx: int,
                    lengths: jnp.ndarray) -> tuple[jnp.ndarray, dict]:
    """LFM2 short-convolution mixer block: [B, T, H] -> ([B, T, H], kv').

    HF Lfm2ShortConv parity: in_proj -> [B | C | x] (each hidden-wide),
    Bx = B*x, causal depthwise conv over L_cache taps, y = C * conv(Bx),
    out_proj; then the block's SwiGLU FFN half. Recurrent state is the
    (L_cache - 1)-tap Bx window stored in the kv["mamba"]["conv"] tuple."""
    from ..ops.norms import apply_norm

    b, t, d = x.shape
    lc = cfg.shortconv_l_cache
    valid = positions < lengths[:, None]
    vf = valid.astype(jnp.float32)[..., None]

    h = apply_norm(x, layer["attn_norm"], cfg.norm_eps, cfg.uses_layer_norm)
    proj = L.apply(layer["conv_in"], h).astype(jnp.float32)  # [B, T, 3H]
    b_g, c_g, x_g = proj[..., :d], proj[..., d: 2 * d], proj[..., 2 * d:]
    bx = b_g * x_g * vf  # zero padding slots so they can't enter the state

    conv_state = kv["mamba"]["conv"][layer_idx]  # [B, lc-1, H]
    seq = jnp.concatenate([conv_state, bx], axis=1)
    w = layer["conv_w"].astype(jnp.float32)  # [lc, H]
    stacked = jnp.stack([seq[:, k: k + t, :] for k in range(lc)], axis=2)
    conv_out = jnp.einsum("btkd,kd->btd", stacked, w)
    if layer.get("conv_b") is not None:
        conv_out = conv_out + layer["conv_b"].astype(jnp.float32)
    n_valid = valid.sum(axis=1).astype(jnp.int32)
    gather_idx = n_valid[:, None] + jnp.arange(lc - 1)[None, :]
    new_conv = jnp.take_along_axis(seq, gather_idx[..., None], axis=1)

    y = c_g * conv_out
    out = L.apply(layer["conv_out"], y.astype(x.dtype))

    kv = dict(kv)
    mamba = dict(kv["mamba"])
    conv = list(mamba["conv"])
    conv[layer_idx] = new_conv
    mamba["conv"] = tuple(conv)
    kv["mamba"] = mamba
    x = x + out

    from ..ops.norms import apply_norm
    from .transformer import feed_forward

    h2 = apply_norm(x, layer["ffn_norm"], cfg.norm_eps, cfg.uses_layer_norm)
    return x + feed_forward(layer["ffn"], cfg, h2), kv


def load_shortconv_layer(loader, i: int, cfg) -> dict:
    """LFM2 conv block tensors: blk.N.shortconv.{in_proj,out_proj,conv}."""
    import numpy as np

    p = f"blk.{i}"
    layer: dict[str, Any] = {
        "attn_norm": loader.norm(f"{p}.attn_norm"),
        "conv_in": loader.linear(f"{p}.shortconv.in_proj"),
        "conv_out": loader.linear(f"{p}.shortconv.out_proj"),
    }
    conv_w = loader.dense(f"{p}.shortconv.conv.weight")  # [H, lc]
    layer["conv_w"] = loader._put(
        np.ascontiguousarray(conv_w.T), f"{p}.shortconv.conv.weight")
    if loader.has(f"{p}.shortconv.conv.bias"):
        layer["conv_b"] = loader._put(
            loader.dense(f"{p}.shortconv.conv.bias"),
            f"{p}.shortconv.conv.bias")
    layer["ffn_norm"] = loader.norm(f"{p}.ffn_norm")
    layer["ffn"] = loader._load_ffn(i, cfg)
    return layer
