"""Embedding extraction with pooling + similarity utilities.

Parity: /root/reference/src/model/embeddings.rs:67-390 (EmbeddingExtractor:
Mean/Last/First/Max pooling, normalization; cosine/dot/euclidean,
find_nearest).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def extract_hidden_states(runner, token_ids: list[int]) -> np.ndarray:
    """Run the model and return final-norm hidden states [T, H]."""
    from .transformer import embed as embed_tokens, transformer_layer
    from ..ops.norms import apply_norm

    cfg = runner.cfg
    t = len(token_ids)
    kv = runner.init_kv(batch=1)
    tokens = jnp.asarray([token_ids], jnp.int32)
    positions = jnp.asarray([list(range(t))], jnp.int32)
    lengths = jnp.asarray([t], jnp.int32)

    @jax.jit
    def _run(params, tokens, positions, lengths, kv):
        x = embed_tokens(params, cfg, tokens)
        kinds = cfg.layer_kinds or ("attn",) * len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            if kinds[i] == "deltanet":
                from .deltanet import deltanet_layer
                x, kv = deltanet_layer(layer, cfg, x, positions, kv, i)
            else:
                x, kv = transformer_layer(layer, cfg, x, positions, kv, i, lengths)
        gemma = cfg.arch_info.is_gemma if cfg.arch_info else False
        x = apply_norm(x, params["final_norm"], cfg.norm_eps,
                       cfg.uses_layer_norm, gemma)
        return x

    h = _run(runner.params, tokens, positions, lengths, kv)
    return np.asarray(h[0])


def pool(hidden: np.ndarray, pooling: str = "mean") -> np.ndarray:
    if pooling == "mean":
        return hidden.mean(axis=0)
    if pooling == "last":
        return hidden[-1]
    if pooling == "first":  # CLS
        return hidden[0]
    if pooling == "max":
        return hidden.max(axis=0)
    raise ValueError(f"unknown pooling {pooling}")


def extract_embedding(runner, token_ids: list[int], pooling: str = "mean",
                      normalize: bool = True) -> np.ndarray:
    h = extract_hidden_states(runner, token_ids)
    v = pool(h, pooling)
    if normalize:
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n
    return v


# -- similarity utilities ----------------------------------------------------


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def dot_similarity(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b))


def euclidean_distance(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b))


def find_nearest(query: np.ndarray, corpus: np.ndarray, k: int = 5,
                 metric: str = "cosine") -> list[tuple[int, float]]:
    """Top-k nearest rows of corpus [N, D] to query [D]."""
    if metric == "cosine":
        qn = query / (np.linalg.norm(query) + 1e-12)
        cn = corpus / (np.linalg.norm(corpus, axis=1, keepdims=True) + 1e-12)
        scores = cn @ qn
        order = np.argsort(scores)[::-1][:k]
        return [(int(i), float(scores[i])) for i in order]
    if metric == "dot":
        scores = corpus @ query
        order = np.argsort(scores)[::-1][:k]
        return [(int(i), float(scores[i])) for i in order]
    if metric == "euclidean":
        d = np.linalg.norm(corpus - query[None, :], axis=1)
        order = np.argsort(d)[:k]
        return [(int(i), float(d[i])) for i in order]
    raise ValueError(f"unknown metric {metric}")
