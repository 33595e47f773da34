"""BERT-family encoder-only models (embedding models).

Parity target: /root/reference/src/model/bert.rs:20-307 (BertModel/BertLayer)
and the loader's BERT builder (/root/reference/src/model/loader.rs:368-489:
token_embd + position_embd + token_types embeddings, token_embd_norm,
blk.N.attn_output_norm / layer_output_norm naming). Semantics match the
reference: pre-norm residual blocks, bidirectional attention (no causal
mask), tanh-approx GELU FFN without gate (bert.rs:143-149).

TPU-native design: one jitted batched forward [B, T] with a padding mask —
the reference encodes one token vector at a time per position.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linear as L
from ..ops.norms import apply_norm
from .config import ModelConfig

NEG_INF = -1e30


def bert_layer(layer: dict, cfg: ModelConfig, x: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """One encoder layer. x: [B, T, H]; mask: [B, T] bool (True = real)."""
    b, t, _ = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    h = apply_norm(x, layer["attn_norm"], cfg.norm_eps, use_layer_norm=True)
    q = L.apply(layer["attn"]["wq"], h).reshape(b, t, nh, hd)
    k = L.apply(layer["attn"]["wk"], h).reshape(b, t, nh, hd)
    v = L.apply(layer["attn"]["wv"], h).reshape(b, t, nh, hd)

    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (hd ** -0.5)
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    ctx = ctx.reshape(b, t, nh * hd).astype(x.dtype)
    x = x + L.apply(layer["attn"]["wo"], ctx)

    h2 = apply_norm(x, layer["ffn_norm"], cfg.norm_eps, use_layer_norm=True)
    up = L.apply(layer["ffn"]["up"], h2).astype(jnp.float32)
    act = jax.nn.gelu(up, approximate=True)  # tanh approx (bert.rs:147)
    x = x + L.apply(layer["ffn"]["down"], act.astype(x.dtype))
    return x


def bert_forward(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
                 mask: jnp.ndarray,
                 token_types: jnp.ndarray | None = None) -> jnp.ndarray:
    """Full encoder: tokens/mask [B, T] -> hidden states [B, T, H]."""
    x = jnp.take(params["embed"], tokens, axis=0)
    if params.get("position_embed") is not None:
        t = tokens.shape[1]
        x = x + params["position_embed"][None, :t]
    if params.get("type_embed") is not None:
        tt = token_types if token_types is not None else jnp.zeros_like(tokens)
        x = x + jnp.take(params["type_embed"], tt, axis=0)
    if params.get("embed_norm") is not None:
        x = apply_norm(x, params["embed_norm"], cfg.norm_eps,
                       use_layer_norm=True)
    x = x * mask[..., None].astype(x.dtype)
    for layer in params["layers"]:
        x = bert_layer(layer, cfg, x, mask)
    return x


class BertEncoder:
    """Jitted batched encoder with length bucketing."""

    def __init__(self, params: dict, cfg: ModelConfig):
        self.params = params
        self.cfg = cfg
        self._fns: dict[tuple[int, int], Any] = {}

    def _get(self, b: int, t: int):
        key = (b, t)
        fn = self._fns.get(key)
        if fn is None:
            cfg = self.cfg

            def _run(params, tokens, mask):
                return bert_forward(params, cfg, tokens, mask)

            fn = jax.jit(_run)
            self._fns[key] = fn
        return fn

    def encode(self, token_ids: list[list[int]]) -> np.ndarray:
        """Encode a batch of sequences; returns [B, T_max, H] with a list of
        lengths accessible via attention-mask semantics."""
        from ..engine.runner import bucket_len

        b = len(token_ids)
        t = bucket_len(max(len(ids) for ids in token_ids))
        toks = np.zeros((b, t), np.int32)
        mask = np.zeros((b, t), bool)
        for i, ids in enumerate(token_ids):
            toks[i, : len(ids)] = ids
            mask[i, : len(ids)] = True
        out = self._get(b, t)(self.params, jnp.asarray(toks),
                              jnp.asarray(mask))
        return np.asarray(out)

    def embed(self, token_ids: list[int], pooling: str = "mean",
              normalize: bool = True) -> np.ndarray:
        from .embeddings import pool

        hidden = self.encode([token_ids])[0, : len(token_ids)]
        vec = pool(hidden, pooling)
        if normalize:
            n = np.linalg.norm(vec)
            if n > 0:
                vec = vec / n
        return vec


def load_bert(loader) -> tuple[dict, ModelConfig]:
    """Build BERT params from GGUF (loader.rs:368 builder semantics)."""
    cfg = loader.config
    params: dict[str, Any] = {}
    params["embed"] = loader._put(loader.dense("token_embd.weight"),
                                  "token_embd.weight")
    params["position_embed"] = (
        loader._put(loader.dense("position_embd.weight"),
                    "position_embd.weight")
        if loader.has("position_embd.weight") else None)
    params["type_embed"] = (
        loader._put(loader.dense("token_types.weight"), "token_types.weight")
        if loader.has("token_types.weight") else None)
    params["embed_norm"] = loader.norm("token_embd_norm", required=False)

    layers = []
    for i in range(cfg.num_layers):
        p = f"blk.{i}"
        attn_norm = (loader.norm(f"{p}.attn_output_norm", required=False)
                     or loader.norm(f"{p}.attn_norm"))
        ffn_norm = (loader.norm(f"{p}.layer_output_norm", required=False)
                    or loader.norm(f"{p}.ffn_norm"))
        layers.append({
            "attn_norm": attn_norm,
            "attn": {
                "wq": loader.linear(f"{p}.attn_q"),
                "wk": loader.linear(f"{p}.attn_k"),
                "wv": loader.linear(f"{p}.attn_v"),
                "wo": loader.linear(f"{p}.attn_output"),
            },
            "ffn_norm": ffn_norm,
            "ffn": {
                "up": loader.linear(f"{p}.ffn_up"),
                "down": loader.linear(f"{p}.ffn_down"),
            },
        })
    params["layers"] = layers
    return params, cfg
