"""Static KV read-bound (ragged decode): bounded attention reads must be
bit-identical to reading the whole padded cache.

The bound is the static-shape analogue of the reference's cached flash
attention (/root/reference/src/backend/cuda/kernels.rs:1395): instead of a
kernel with a dynamic KV length, the compiled step reads only a power-of-two
bucket of live positions (engine/runner.read_bucket) and the scheduler picks
the bucket — every step result must match the full read exactly, since the
skipped positions are masked (hence exactly zero-weight) either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_tiny_model
from llama_gguf_tpu.engine.runner import ModelRunner, read_bucket
from llama_gguf_tpu.models import kv as KV
from llama_gguf_tpu.models.loader import load_model
from llama_gguf_tpu.models.transformer import forward

CTX = 1024


def test_read_bucket():
    assert read_bucket(1, CTX) == 256  # floor
    assert read_bucket(256, CTX) == 256
    assert read_bucket(257, CTX) == 512
    assert read_bucket(300, CTX) == 512
    assert read_bucket(513, CTX) == 1024
    assert read_bucket(5000, CTX) == CTX  # capped at max_seq
    assert read_bucket(100, 64) == 64  # tiny caches: bound == max_seq


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rb") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=97, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=CTX, seed=3)
    params, cfg, _ = load_model(path, mode="dequant")
    return params, cfg


@pytest.mark.parametrize("fmt", ["f32", "i8"])
def test_step_bitexact_vs_full_read(model, fmt, rng):
    params, cfg = model
    n = 300
    tokens = jnp.asarray(rng.integers(0, 97, size=(1, n)), jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)[None]
    lengths = jnp.asarray([n], jnp.int32)

    def run(read_bound):
        kv = KV.init_cache(cfg.num_layers, 1, CTX, cfg.num_kv_heads,
                           cfg.head_dim, fmt=fmt)
        logits, kv = forward(params, cfg, tokens, positions, kv, lengths,
                             read_bound=read_bound)
        # one decode step past the prefill
        lg2, kv = forward(params, cfg,
                          jnp.asarray([[5]], jnp.int32),
                          jnp.asarray([[n]], jnp.int32), kv,
                          jnp.asarray([n + 1], jnp.int32),
                          read_bound=read_bound)
        return np.asarray(logits), np.asarray(lg2), kv

    full_lg, full_lg2, full_kv = run(None)
    b_lg, b_lg2, b_kv = run(512)
    np.testing.assert_array_equal(b_lg, full_lg)
    np.testing.assert_array_equal(b_lg2, full_lg2)
    for key in full_kv:
        np.testing.assert_array_equal(np.asarray(b_kv[key]),
                                      np.asarray(full_kv[key]))


def test_plan_segments():
    """Segments never cross a bucket boundary, chunk lengths are powers of
    two, and the whole plan covers exactly ``steps`` tokens."""
    plan = ModelRunner.plan_segments
    # 2048-token generation from pos 0: early steps use SMALL bounds
    p = plan(0, 2048, 2048)
    assert p == [(256, 256), (256, 512), (512, 1024), (1024, 2048)]
    # tg128 protocol stays a single chunk (no extra compiles)
    assert plan(33, 128, 2048) == [(128, 256)]
    # crossing one boundary decomposes the residual into pow2 chunks
    p = plan(250, 16, 2048)
    assert sum(c for c, _ in p) == 16
    assert all(c & (c - 1) == 0 for c, _ in p)
    assert p[0] == (4, 256) and p[1] == (2, 256) and p[-1][1] == 512
    # every (chunk, bound) pair respects chunk's positions < bound
    for start in (0, 100, 255, 256, 1000):
        done = 0
        for c, b in plan(start, 500, 2048):
            assert start + done + c <= b or b == 2048
            done += c
        assert done == 500
    # past the cache end: remaining steps run at the max_seq bound
    p = plan(2040, 64, 2048)
    assert p[-1][1] == 2048 and sum(c for c, _ in p) == 64


def test_greedy_decode_segmented_matches_stepwise(tmp_path, rng):
    """greedy_decode crossing bucket boundaries == per-step greedy chain
    (exact token match), and the compiled scans are shared across calls
    with different start positions (the lattice property)."""
    path = str(tmp_path / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=97, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=CTX, seed=7)
    params, cfg, _ = load_model(path, mode="dequant")
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=CTX)

    ids = rng.integers(0, 97, size=250).tolist()
    kv = runner.init_kv()
    logits, kv, p = runner.prefill(ids, kv)
    steps = 20  # crosses the 256 boundary at step 6

    # oracle: step-by-step greedy via decode_one
    kv_ref = runner.init_kv()
    lg, kv_ref, _ = runner.prefill(ids, kv_ref)
    cur = int(np.argmax(np.asarray(lg)))
    want = []
    for i in range(steps):
        lg, kv_ref = runner.decode_one(cur, p + i, kv_ref)
        cur = int(np.argmax(np.asarray(lg)))
        want.append(cur)

    cur0 = jnp.asarray([int(np.argmax(np.asarray(logits)))], jnp.int32)
    toks, kv = runner.greedy_decode(cur0, jnp.asarray([p], jnp.int32), kv,
                                    steps=steps)
    got = np.asarray(toks)[0].tolist()
    # note: decode_one feeds token i at position p+i producing logits for
    # p+i+1 — align: greedy_decode's first output corresponds to feeding
    # cur0 at p, same as decode_one(cur, p). Exact match required.
    assert got == want

    scan_keys = {k for k in runner._steps if k[0] == "greedy_scan"}
    assert ("greedy_scan", 1, 256) in scan_keys
    assert ("greedy_scan", 1, 512) in scan_keys
    # a second call from a different position crossing the same boundary
    # must NOT create new scan entries (chunk variants live inside jit)
    kv2 = runner.init_kv()
    _, kv2, p2 = runner.prefill(ids[:200], kv2)
    toks2, kv2 = runner.greedy_decode(cur0, jnp.asarray([p2], jnp.int32),
                                      kv2, steps=70)
    assert {k for k in runner._steps if k[0] == "greedy_scan"} == scan_keys


def test_runner_auto_bound_matches_prefill(tmp_path, rng):
    """ModelRunner picks bounds automatically (prefill/decode_one/
    greedy_decode); a long cached decode must still match the one-shot
    prefill logits position by position."""
    path = str(tmp_path / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=97, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=CTX, seed=5)
    params, cfg, _ = load_model(path, mode="dequant")
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=CTX)

    ids = rng.integers(0, 97, size=270).tolist()
    # oracle: full-sequence forward, no bound
    kv0 = runner.init_kv()
    toks = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
    want, _ = forward(params, cfg, toks, pos, kv0,
                      jnp.asarray([len(ids)], jnp.int32))
    want = np.asarray(want[0])

    # prefill most of it, then decode_one across the 256-bucket boundary
    split = 250
    kv = runner.init_kv()
    logits, kv, p = runner.prefill(ids[:split], kv)
    np.testing.assert_allclose(np.asarray(logits), want[split - 1],
                               rtol=2e-5, atol=2e-5)
    for i in range(split, len(ids)):
        logits, kv = runner.decode_one(ids[i], i, kv)
        np.testing.assert_allclose(np.asarray(logits), want[i],
                                   rtol=2e-5, atol=2e-5)
