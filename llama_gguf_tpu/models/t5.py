"""T5 encoder-decoder (and t5encoder encoder-only) models.

llama.cpp arch parity: the reference (Lexmata/llama-gguf) does not support
T5 at all; llama.cpp does (enc.blk.N.* / dec.blk.N.* tensor naming, shared
relative-position-bias table on layer 0, unscaled attention scores, RMSNorm
pre-norm blocks, ReLU or gated-GELU FFN by tensor presence, tied lm_head
scaled by d_model**-0.5). HF oracle: transformers T5ForConditionalGeneration
(tests/test_arch_zoo.py::test_t5_matches_hf).

TPU-native design: the encoder is one batched bidirectional forward; the
decoder is an incremental jitted step over a scattered self-attention KV
cache with the cross-attention K/V projected ONCE from the encoder output.
The relative-position bias is computed on the fly from the layer-0 bucket
table (log-spaced buckets, exact HF `_relative_position_bucket` semantics).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops import linear as L
from ..ops.norms import rms_norm

NEG_INF = -1e30


# -- relative position buckets (HF T5Attention._relative_position_bucket) ----

def _rel_bucket(rel: jnp.ndarray, bidirectional: bool, num_buckets: int,
                max_distance: int) -> jnp.ndarray:
    """rel = key_pos - query_pos -> bucket index [same shape]."""
    nb = num_buckets
    ret = jnp.zeros_like(rel)
    if bidirectional:
        nb = nb // 2
        ret = ret + (rel > 0).astype(rel.dtype) * nb
        n = jnp.abs(rel)
    else:
        n = -jnp.minimum(rel, 0)
    max_exact = nb // 2
    is_small = n < max_exact
    # log-spaced buckets for distances in [max_exact, max_distance)
    nf = jnp.maximum(n.astype(jnp.float32), 1.0)
    large = max_exact + (
        jnp.log(nf / max_exact) / jnp.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(rel.dtype)
    large = jnp.minimum(large, nb - 1)
    return ret + jnp.where(is_small, n, large)


def _rel_bias(table: jnp.ndarray, q_pos: jnp.ndarray, k_pos: jnp.ndarray,
              bidirectional: bool, num_buckets: int,
              max_distance: int) -> jnp.ndarray:
    """table [buckets, heads]; q_pos [B, T]; k_pos [S] -> [B, heads, T, S]."""
    rel = k_pos[None, None, :] - q_pos[:, :, None]  # [B, T, S]
    bucket = _rel_bucket(rel, bidirectional, num_buckets, max_distance)
    bias = jnp.take(table.astype(jnp.float32), bucket, axis=0)  # [B,T,S,H]
    return bias.transpose(0, 3, 1, 2)


def _attend(q, k, v, bias, mask):
    """q [B,T,nh,hd]; k/v [B,S,nh,hd]; bias [B,nh,T,S] or None;
    mask [B,T,S] bool. T5 scores are UNSCALED (no 1/sqrt(d))."""
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    if bias is not None:
        scores = scores + bias
    scores = jnp.where(mask[:, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(mask[:, None], probs, 0.0)  # fully-masked rows -> 0
    ctx = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    return ctx


def _ffn(layer: dict, cfg, x: jnp.ndarray) -> jnp.ndarray:
    h = rms_norm(x, layer["ffn_norm"], cfg.norm_eps)
    if "gate" in layer["ffn"]:  # t5 v1.1 / flan: gated GELU
        g = L.apply(layer["ffn"]["gate"], h).astype(jnp.float32)
        u = L.apply(layer["ffn"]["up"], h).astype(jnp.float32)
        act = jax.nn.gelu(g, approximate=True) * u
    else:  # original t5: ReLU
        act = jax.nn.relu(L.apply(layer["ffn"]["up"], h).astype(jnp.float32))
    return x + L.apply(layer["ffn"]["down"], act.astype(x.dtype))


def t5_encode(params: dict, cfg, tokens: jnp.ndarray,
              mask: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional encoder: tokens/mask [B, T] -> hidden [B, T, H]."""
    enc = params["enc"]
    nh, hd = cfg.num_heads, cfg.head_dim
    b, t = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    bias = _rel_bias(enc["rel_b"], pos, jnp.arange(t), True,
                     cfg.rel_buckets, cfg.rel_max_distance)
    amask = mask[:, None, :] & mask[:, :, None]  # [B, T, S]
    for layer in enc["layers"]:
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        a = layer["attn"]
        q = L.apply(a["wq"], h).reshape(b, t, nh, hd)
        k = L.apply(a["wk"], h).reshape(b, t, nh, hd)
        v = L.apply(a["wv"], h).reshape(b, t, nh, hd)
        ctx = _attend(q, k, v, bias, amask)
        x = x + L.apply(a["wo"], ctx.reshape(b, t, nh * hd).astype(x.dtype))
        x = _ffn(layer, cfg, x)
    return rms_norm(x, enc["output_norm"], cfg.norm_eps)


def t5_init_cache(params: dict, cfg, batch: int, max_seq: int,
                  enc_out: jnp.ndarray) -> dict:
    """Decoder state: per-layer self-attn K/V rings + cross K/V projected
    once from the encoder output (the decode loop never touches enc_out
    again — llama.cpp recomputes cross K/V per step)."""
    nh, hd = cfg.num_heads, cfg.head_dim
    b, s_enc = enc_out.shape[0], enc_out.shape[1]
    dec = params["dec"]
    zeros = lambda: jnp.zeros((batch, max_seq, nh, hd), jnp.float32)  # noqa: E731
    cache = {
        "k": tuple(zeros() for _ in dec["layers"]),
        "v": tuple(zeros() for _ in dec["layers"]),
        "ck": tuple(
            L.apply(layer["cross"]["wk"], enc_out)
             .reshape(b, s_enc, nh, hd).astype(jnp.float32)
            for layer in dec["layers"]),
        "cv": tuple(
            L.apply(layer["cross"]["wv"], enc_out)
             .reshape(b, s_enc, nh, hd).astype(jnp.float32)
            for layer in dec["layers"]),
    }
    return cache


def t5_decode_step(params: dict, cfg, tokens: jnp.ndarray,
                   positions: jnp.ndarray, lengths: jnp.ndarray,
                   cache: dict, enc_mask: jnp.ndarray
                   ) -> tuple[jnp.ndarray, dict]:
    """Incremental decoder step.

    tokens/positions [B, T]; lengths [B] = valid self-KV length after this
    step; enc_mask [B, S_enc]. Returns (logits [B, T, V], cache')."""
    dec = params["dec"]
    nh, hd = cfg.num_heads, cfg.head_dim
    b, t = tokens.shape
    s = cache["k"][0].shape[1]
    x = jnp.take(params["embed"], tokens, axis=0)
    k_pos = jnp.arange(s)
    bias = _rel_bias(dec["rel_b"], positions, k_pos, False,
                     cfg.rel_buckets, cfg.rel_max_distance)
    causal = (k_pos[None, None, :] <= positions[:, :, None]) & \
             (k_pos[None, None, :] < lengths[:, None, None])
    cross_mask = jnp.broadcast_to(enc_mask[:, None, :],
                                  (b, t, enc_mask.shape[1]))
    cache = dict(cache)
    ks, vs = list(cache["k"]), list(cache["v"])
    b_idx = jnp.arange(b)[:, None]
    for i, layer in enumerate(dec["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        a = layer["attn"]
        q = L.apply(a["wq"], h).reshape(b, t, nh, hd)
        k = L.apply(a["wk"], h).reshape(b, t, nh, hd).astype(jnp.float32)
        v = L.apply(a["wv"], h).reshape(b, t, nh, hd).astype(jnp.float32)
        # scatter into the self cache (OOB positions drop, like models/kv)
        slot = jnp.where(positions < s, positions, s)
        ks[i] = ks[i].at[b_idx, slot].set(k, mode="drop")
        vs[i] = vs[i].at[b_idx, slot].set(v, mode="drop")
        ctx = _attend(q, ks[i], vs[i], bias, causal)
        x = x + L.apply(a["wo"], ctx.reshape(b, t, nh * hd).astype(x.dtype))

        h2 = rms_norm(x, layer["cross_norm"], cfg.norm_eps)
        c = layer["cross"]
        qc = L.apply(c["wq"], h2).reshape(b, t, nh, hd)
        ctx2 = _attend(qc, cache["ck"][i], cache["cv"][i], None, cross_mask)
        x = x + L.apply(c["wo"],
                        ctx2.reshape(b, t, nh * hd).astype(x.dtype))
        x = _ffn(layer, cfg, x)
    x = rms_norm(x, dec["output_norm"], cfg.norm_eps)
    if params.get("output") is not None:
        logits = L.apply(params["output"], x)
    else:  # tied: HF scales by d_model**-0.5 before the shared projection
        xs = x * (cfg.hidden_size ** -0.5)
        logits = xs.astype(jnp.float32) @ params["embed"].astype(
            jnp.float32).T
    cache["k"], cache["v"] = tuple(ks), tuple(vs)
    return logits.astype(jnp.float32), cache


def _load_stack(loader, prefix: str, n: int, cross: bool) -> dict:
    def linear_any(*names):
        for name in names[:-1]:
            got = loader.linear(name, required=False)
            if got is not None:
                return got
        return loader.linear(names[-1])

    layers = []
    for i in range(n):
        p = f"{prefix}.blk.{i}"
        layer: dict[str, Any] = {
            "attn_norm": loader._put(
                loader.dense(f"{p}.attn_norm.weight"),
                f"{p}.attn_norm.weight"),
            "attn": {
                "wq": loader.linear(f"{p}.attn_q"),
                "wk": loader.linear(f"{p}.attn_k"),
                "wv": loader.linear(f"{p}.attn_v"),
                "wo": linear_any(f"{p}.attn_o", f"{p}.attn_output"),
            },
            "ffn_norm": loader._put(
                loader.dense(f"{p}.ffn_norm.weight"),
                f"{p}.ffn_norm.weight"),
            "ffn": {},
        }
        if loader.has(f"{p}.ffn_gate.weight"):
            layer["ffn"]["gate"] = loader.linear(f"{p}.ffn_gate")
        layer["ffn"]["up"] = loader.linear(f"{p}.ffn_up")
        layer["ffn"]["down"] = loader.linear(f"{p}.ffn_down")
        if cross:
            layer["cross_norm"] = loader._put(
                loader.dense(f"{p}.cross_attn_norm.weight"),
                f"{p}.cross_attn_norm.weight")
            layer["cross"] = {
                "wq": loader.linear(f"{p}.cross_attn_q"),
                "wk": loader.linear(f"{p}.cross_attn_k"),
                "wv": loader.linear(f"{p}.cross_attn_v"),
                "wo": linear_any(f"{p}.cross_attn_o",
                                 f"{p}.cross_attn_output"),
            }
        layers.append(layer)
    rel_name = f"{prefix}.blk.0.attn_rel_b.weight"
    return {
        "layers": layers,
        # bucket table shared across layers (only layer 0 carries it);
        # stored [buckets, heads] like the HF tensor
        "rel_b": loader._put(loader.dense(rel_name), rel_name),
        "output_norm": loader._put(
            loader.dense(f"{prefix}.output_norm.weight"),
            f"{prefix}.output_norm.weight"),
    }


def load_t5(loader, cfg) -> dict:
    """Assemble T5 params from a llama.cpp-convention GGUF (enc./dec.
    prefixes). For arch 't5encoder' only the encoder stack exists.
    Stack depths are counted by tensor presence (decoder depth may differ
    from the metadata block count)."""

    def depth(prefix: str) -> int:
        n = 0
        while loader.has(f"{prefix}.blk.{n}.attn_q.weight"):
            n += 1
        return n

    params: dict[str, Any] = {
        "embed": loader._put(
            loader.dense("token_embd.weight"), "token_embd.weight"),
        "enc": _load_stack(loader, "enc", depth("enc"), cross=False),
    }
    if loader.has("dec.blk.0.attn_q.weight"):
        params["dec"] = _load_stack(loader, "dec", depth("dec"), cross=True)
    if loader.has("output.weight"):
        params["output"] = loader.linear("output")
    return params


class T5Runner:
    """Minimal jitted encoder-decoder runner for Engine integration.

    Encoder lengths are padded to 16-token buckets and the decoder runs
    one token per step over a fixed-size self-KV cache, so the jit caches
    stay small (one encode program per bucket, one decode program)."""

    def __init__(self, params: dict, cfg, max_seq: int = 0):
        self.params = params
        self.cfg = cfg
        self.max_seq = max_seq or min(cfg.max_seq_len, 1024)
        self._encode = jax.jit(
            lambda tok, mask: t5_encode(params, cfg, tok, mask))
        self._step = jax.jit(
            lambda tok, pos, lens, cache, emask: t5_decode_step(
                params, cfg, tok, pos, lens, cache, emask))
        # jitted cache init: fuses the 2*layers cross-K/V projections into
        # one program (each host dispatch costs ms over the device tunnel)
        self._mkcache = jax.jit(
            lambda enc_out: t5_init_cache(params, cfg, 1, self.max_seq,
                                          enc_out))

    def make_cache(self, enc_out: jnp.ndarray) -> dict:
        if enc_out.shape[0] == 1:
            return self._mkcache(enc_out)
        return t5_init_cache(self.params, self.cfg, enc_out.shape[0],
                             self.max_seq, enc_out)

    def encode_ids(self, ids: list[int]) -> tuple[jnp.ndarray, jnp.ndarray]:
        pad = -len(ids) % 16 or 0
        tok = jnp.asarray([list(ids) + [0] * pad], jnp.int32)
        mask = jnp.asarray([[True] * len(ids) + [False] * pad])
        return self._encode(tok, mask), mask

    def generate_ids(self, ids: list[int], max_tokens: int,
                     eos_id: int | None = None,
                     sample=None) -> list[int]:
        """Greedy (or ``sample(logits np [V]) -> id``) seq2seq generation."""
        import numpy as np

        enc_out, enc_mask = self.encode_ids(ids)
        cache = self.make_cache(enc_out)
        tok = self.cfg.decoder_start_token_id
        out: list[int] = []
        for t in range(min(max_tokens, self.max_seq - 1)):
            logits, cache = self._step(
                jnp.asarray([[tok]], jnp.int32),
                jnp.asarray([[t]], jnp.int32),
                jnp.asarray([t + 1], jnp.int32), cache, enc_mask)
            row = np.asarray(logits[0, 0])
            tok = int(row.argmax()) if sample is None else int(sample(row))
            if eos_id is not None and tok == eos_id:
                break
            out.append(tok)
        return out
