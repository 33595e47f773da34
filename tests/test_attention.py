"""Chunked (flash-style) attention must match the dense path exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

import llama_gguf_tpu.ops.attention as A


def make_inputs(rng, b=2, t=16, k=2, r=2, d=8, s=64, dv=None):
    dv = dv or d
    qg = jnp.asarray(rng.normal(size=(b, t, k, r, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(b, s, k, d)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(b, s, k, dv)).astype(np.float32))
    positions = jnp.asarray(
        np.tile(np.arange(10, 10 + t, dtype=np.int32), (b, 1)))
    lengths = jnp.asarray(np.array([10 + t, 5], np.int32)[:b])
    return qg, keys, vals, positions, lengths


@pytest.mark.parametrize("block", [8, 16, 64])
def test_chunked_matches_dense(rng, block):
    qg, keys, vals, pos, lens = make_inputs(rng)
    dense = A.dense_attention(qg, keys, vals, pos, lens, scale=0.35)
    chunk = A.chunked_attention(qg, keys, vals, pos, lens, scale=0.35,
                                block=block)
    assert np.allclose(np.asarray(dense), np.asarray(chunk), atol=1e-5)


def test_chunked_with_softcap_and_window(rng):
    qg, keys, vals, pos, lens = make_inputs(rng)
    kw = dict(scale=0.35, softcap=5.0, sliding_window=12)
    dense = A.dense_attention(qg, keys, vals, pos, lens, **kw)
    chunk = A.chunked_attention(qg, keys, vals, pos, lens, block=16, **kw)
    assert np.allclose(np.asarray(dense), np.asarray(chunk), atol=1e-5)


def test_fully_masked_rows_no_nan(rng):
    """Rows with zero visible keys (padding slots) must not produce NaN."""
    qg, keys, vals, pos, lens = make_inputs(rng, b=1)
    lens = jnp.asarray([0], jnp.int32)  # nothing visible
    out = A.chunked_attention(qg, keys, vals, pos, lens, scale=0.35, block=16)
    assert np.isfinite(np.asarray(out)).all()


def test_dispatch_threshold(rng, monkeypatch):
    """attention_scores routes big shapes to the chunked path."""
    calls = {}
    real = A.chunked_attention

    def spy(*a, **k):
        calls["chunked"] = True
        return real(*a, **k)

    monkeypatch.setattr(A, "chunked_attention", spy)
    monkeypatch.setattr(A, "CHUNK_THRESHOLD", 1024)
    qg, keys, vals, pos, lens = make_inputs(rng, t=8, s=512)
    out = A.attention_scores(qg, keys, vals, pos, lens, scale=0.35)
    assert calls.get("chunked") and np.isfinite(np.asarray(out)).all()


def test_model_forward_long_prefill_chunked(monkeypatch, tmp_path):
    """End-to-end: with a tiny threshold the model prefill runs chunked and
    produces the same logits as the dense path."""
    from fixtures import make_tiny_model
    from llama_gguf_tpu.engine.engine import Engine, EngineConfig

    path = str(tmp_path / "ca.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=512, seed=3,
                    tokenizer=True)
    ids = list(np.random.default_rng(0).integers(3, 280, size=300))

    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    dense_out = eng.greedy_tokens(ids, 4)

    monkeypatch.setattr(A, "CHUNK_THRESHOLD", 1 << 12)
    eng2 = Engine.load(path, EngineConfig(weight_mode="dequant"))
    chunk_out = eng2.greedy_tokens(ids, 4)
    assert chunk_out == dense_out


def test_attention_sinks_against_numpy(rng):
    """Attention-sinks semantics (gpt-oss): one extra per-head logit joins
    the softmax and its probability mass is dropped."""
    b, t, k, r, d, s = 1, 4, 2, 2, 8, 16
    qg = jnp.asarray(rng.normal(size=(b, t, k, r, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(b, s, k, d)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(b, s, k, d)).astype(np.float32))
    pos = jnp.asarray(np.arange(t, dtype=np.int32)[None] + 5)
    lens = jnp.asarray([t + 5], np.int32)
    sinks = jnp.asarray(rng.normal(size=(k, r)).astype(np.float32))

    got = np.asarray(A.dense_attention(qg, keys, vals, pos, lens, scale=0.4,
                                       sinks=sinks))

    qn, kn, vn, sn = map(np.asarray, (qg, keys, vals, sinks))
    want = np.zeros_like(got)
    for ti in range(t):
        for ki in range(k):
            for ri in range(r):
                logits = np.array([
                    qn[0, ti, ki, ri] @ kn[0, si, ki] * 0.4
                    if (si <= ti + 5 and si < t + 5) else -1e30
                    for si in range(s)
                ] + [sn[ki, ri]])
                e = np.exp(logits - logits.max())
                probs = (e / e.sum())[:-1]  # sink mass dropped
                want[0, ti, ki, ri] = probs @ vn[0, :, ki]
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_alibi_dense_chunked_match():
    """ALiBi bias must be identical between dense and chunked paths."""
    from llama_gguf_tpu.ops.attention import (alibi_slopes, chunked_attention,
                                              dense_attention)

    rng = np.random.default_rng(7)
    b, t, k, r, d, s = 2, 4, 2, 2, 8, 512
    qg = jnp.asarray(rng.normal(size=(b, t, k, r, d)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(b, s, k, d)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(b, s, k, d)), jnp.float32)
    positions = jnp.asarray([[500, 501, 502, 503], [100, 101, 102, 103]])
    lengths = jnp.asarray([504, 104])
    a = dense_attention(qg, keys, vals, positions, lengths, scale=0.3,
                        alibi=True)
    c = chunked_attention(qg, keys, vals, positions, lengths, scale=0.3,
                          alibi=True, block=128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=1e-5, atol=1e-5)
    # slopes: power-of-two head count is the textbook geometric sequence
    np.testing.assert_allclose(np.asarray(alibi_slopes(8)),
                               [2.0 ** (-i) for i in range(1, 9)], rtol=1e-6)


def test_chunked_sinks_match_dense(rng):
    """Chunked online-softmax with attention sinks (gpt-oss) must equal
    the dense path — sinks used to force the dense fallback, which OOMs
    at long prefill."""
    qg, keys, vals, pos, lens = make_inputs(rng)
    k, r = qg.shape[2], qg.shape[3]
    sinks = jnp.asarray(rng.normal(size=(k, r)).astype(np.float32) * 3.0)
    dense = A.dense_attention(qg, keys, vals, pos, lens, scale=0.35,
                              sinks=sinks)
    chunk = A.chunked_attention(qg, keys, vals, pos, lens, scale=0.35,
                                sinks=sinks, block=16)
    assert np.allclose(np.asarray(dense), np.asarray(chunk), atol=1e-5)
    # huge sink: must not overflow the running exp
    big = jnp.full((k, r), 80.0, jnp.float32)
    chunk2 = A.chunked_attention(qg, keys, vals, pos, lens, scale=0.35,
                                 sinks=big, block=16)
    assert np.isfinite(np.asarray(chunk2)).all()


def test_chunked_non_multiple_s_keeps_block(rng):
    """S not divisible by the block must PAD (masked tail), not degrade to
    a single full-size block."""
    b, t, k, r, d, dv = 1, 3, 2, 2, 16, 16
    s = 50  # not a multiple of 16
    qg = jnp.asarray(rng.normal(size=(b, t, k, r, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(b, s, k, d)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(b, s, k, dv)).astype(np.float32))
    pos = jnp.asarray(np.arange(40, 40 + t, dtype=np.int32)[None])
    lens = jnp.asarray(np.array([40 + t], np.int32))
    dense = A.dense_attention(qg, keys, vals, pos, lens, scale=0.3)
    chunk = A.chunked_attention(qg, keys, vals, pos, lens, scale=0.3,
                                block=16)
    assert np.allclose(np.asarray(dense), np.asarray(chunk), atol=1e-5)
