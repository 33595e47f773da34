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


def test_greedy_decode_segmented_matches_stepwise(tmp_path, rng,
                                                   monkeypatch):
    """greedy_decode crossing bucket boundaries == per-step greedy chain
    (exact token match), and the compiled scans are shared across calls
    with different start positions (the lattice property)."""
    # the ambient environment may have opted out of the full-bound policy;
    # this test asserts the policy-ON key set
    monkeypatch.delenv("LLAMA_GGUF_NO_FULL_BOUND", raising=False)
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

    # B=1 small-cache models take the measured full-bound program (r5
    # policy, runner._prefer_full_bound): every segment compiles at the
    # max_seq bound — one scan key regardless of boundary crossings
    scan_keys = {k for k in runner._steps if k[0] == "greedy_scan"}
    assert scan_keys == {("greedy_scan", 1, CTX)}
    # a second call from a different position crossing the same boundary
    # must NOT create new scan entries (chunk variants live inside jit)
    kv2 = runner.init_kv()
    _, kv2, p2 = runner.prefill(ids[:200], kv2)
    toks2, kv2 = runner.greedy_decode(cur0, jnp.asarray([p2], jnp.int32),
                                      kv2, steps=70)
    assert {k for k in runner._steps if k[0] == "greedy_scan"} == scan_keys


def test_greedy_decode_bucket_lattice_with_policy_off(tmp_path, rng,
                                                      monkeypatch):
    """With the full-bound policy opted out, greedy_decode keeps the
    per-bucket scan lattice AND still matches the policy-on tokens (the
    bound is invisible to the math, only to the schedule)."""
    monkeypatch.setenv("LLAMA_GGUF_NO_FULL_BOUND", "1")
    path = str(tmp_path / "tiny2.gguf")
    make_tiny_model(path, arch="qwen2", vocab=97, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=CTX, seed=7)
    params, cfg, _ = load_model(path, mode="dequant")
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=CTX)
    assert not runner._prefer_full_bound(1)
    ids = rng.integers(0, 97, size=250).tolist()
    kv = runner.init_kv()
    logits, kv, p = runner.prefill(ids, kv)
    cur0 = jnp.asarray([int(np.argmax(np.asarray(logits)))], jnp.int32)
    toks, kv = runner.greedy_decode(cur0, jnp.asarray([p], jnp.int32), kv,
                                    steps=20)
    scan_keys = {k for k in runner._steps if k[0] == "greedy_scan"}
    assert ("greedy_scan", 1, 256) in scan_keys
    assert ("greedy_scan", 1, 512) in scan_keys

    monkeypatch.delenv("LLAMA_GGUF_NO_FULL_BOUND")
    runner2 = ModelRunner(params, cfg, max_batch=1, max_seq=CTX)
    assert runner2._prefer_full_bound(1)
    kv2 = runner2.init_kv()
    logits2, kv2, p2 = runner2.prefill(ids, kv2)
    toks2, kv2 = runner2.greedy_decode(
        jnp.asarray([int(np.argmax(np.asarray(logits2)))], jnp.int32),
        jnp.asarray([p2], jnp.int32), kv2, steps=20)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


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


# ---------------------------------------------------------------------------
# two-tier ragged decode (pick_read_bound + tiered_attention)
# ---------------------------------------------------------------------------

from llama_gguf_tpu.engine.runner import pick_read_bound  # noqa: E402


def test_pick_read_bound():
    # one 2k straggler in a 32-stream batch: all rows read 256, 1 reads 2048
    lens = [200] * 31 + [2000]
    assert pick_read_bound(lens, 2048) == (256, 2048, 1)
    # uniform batch: single bucket
    assert pick_read_bound([200] * 32, 2048) == 256
    assert pick_read_bound([2000] * 32, 2048) == 2048
    # B=1 can never win from tiering
    assert pick_read_bound([2000], 2048) == 2048
    # too many long rows for the tier cap: fall back past them
    assert pick_read_bound([300] * 31 + [2000], 2048) == (512, 2048, 1)
    # more than TIER_CAP_MAX rows beyond every lo candidate: single bucket
    assert pick_read_bound([1500] * 20 + [2000] * 12, 2048) == 2048
    # 3 long rows -> capacity rounds up to 4
    assert pick_read_bound([100] * 29 + [1000] * 3, 2048) == (256, 1024, 4)
    # empty slots (length 0) are fine
    assert pick_read_bound([0] * 16 + [100] * 15 + [2000], 2048) == \
        (256, 2048, 1)


def test_pick_read_bound_hysteresis():
    """prev= is reused while still correct and within TIER_HYSTERESIS of
    the modeled optimum — a serving loop's compile-key churn guard."""
    lens = [200] * 31 + [2000]
    base = pick_read_bound(lens, 2048)
    assert base == (256, 2048, 1)
    # drift: one short row grows past 256 -> fresh optimum would be
    # (512, 2048, 1) or cap=2; the previous tuple still covers it if cap
    # allows, else it re-picks
    lens2 = [200] * 30 + [400, 2000]
    fresh = pick_read_bound(lens2, 2048)
    held = pick_read_bound(lens2, 2048, prev=base)
    if held == base:  # held: prev must still be CORRECT (cap >= over-lo)
        lo, hi, cap = base
        assert sum(1 for n in lens2 if n > lo) <= cap
    else:
        assert held == fresh
    # an invalid prev (straggler outgrew hi) is never reused
    lens3 = [200] * 31 + [4000]
    assert pick_read_bound(lens3, 8192, prev=base) != base
    # batch went uniform short: prev's extra hi pass costs 1.25x optimum
    # (32*256 + 2048 vs 32*256) — within hysteresis, so it is HELD (one
    # wasted cap-row pass beats a recompile)
    assert pick_read_bound([200] * 32, 2048, prev=base) == base
    # a single-bucket prev one bucket up costs 2x optimum — dropped
    # (adjacent buckets are 2x apart, always past TIER_HYSTERESIS)
    assert pick_read_bound([200] * 32, 2048, prev=512) == 256
    assert pick_read_bound([600] * 32, 2048, prev=512) == 1024
    # identical pick: unchanged
    assert pick_read_bound(lens, 2048, prev=base) == base


def test_pick_read_bound_sharded():
    """Grouped (data-parallel) tier picking: cap covers the WORST shard's
    straggler count, and the modeled hi-tier cost scales with shards*cap."""
    # one straggler in shard 0 of 2: cap stays 1 (cap is per shard)
    lens = [200] * 15 + [2000] + [200] * 16
    assert pick_read_bound(lens, 2048, shards=2) == (256, 2048, 1)
    # one straggler in EACH shard: still cap=1 per shard
    lens = [200] * 15 + [2000] + [200] * 15 + [2000]
    assert pick_read_bound(lens, 2048, shards=2) == (256, 2048, 1)
    # 3 stragglers all in one shard: per-shard cap rounds up to 4
    lens = [100] * 13 + [1000] * 3 + [100] * 16
    assert pick_read_bound(lens, 2048, shards=2) == (256, 1024, 4)
    # shards that don't divide the batch fall back to ungrouped
    assert pick_read_bound([200] * 30 + [2000], 2048, shards=2) == \
        pick_read_bound([200] * 30 + [2000], 2048)
    # shards=1 is exactly the ungrouped behaviour
    lens = [200] * 31 + [2000]
    assert pick_read_bound(lens, 2048, shards=1) == \
        pick_read_bound(lens, 2048)


@pytest.mark.parametrize("fmt", ["f32", "i8"])
def test_tiered_step_bitexact(model, fmt, rng):
    """A two-tier decode step must be bit-identical to the single-bucket
    step at the hi bound: the lo pass is exact for short rows (read-bound
    invariance) and long rows are scatter-overwritten by the hi pass."""
    params, cfg = model
    b = 8
    lens = [30, 40, 50, 60, 70, 80, 90, 700]  # one straggler
    kv = KV.init_cache(cfg.num_layers, b, CTX, cfg.num_kv_heads,
                       cfg.head_dim, fmt=fmt)
    # per-row ragged prefill in one batched forward (OOB positions drop)
    n = max(lens)
    toks = np.zeros((b, n), np.int32)
    pos = np.full((b, n), CTX, np.int32)
    for i, ln in enumerate(lens):
        toks[i, :ln] = rng.integers(0, 97, size=ln)
        pos[i, :ln] = np.arange(ln)
    _, kv = forward(params, cfg, jnp.asarray(toks), jnp.asarray(pos), kv,
                    jnp.asarray(lens, jnp.int32))

    # one decode step for every row
    dt = jnp.asarray(rng.integers(0, 97, size=(b, 1)), jnp.int32)
    dp = jnp.asarray(lens, jnp.int32)[:, None]
    dl = jnp.asarray(lens, jnp.int32) + 1

    def step(read_bound):
        lg, kv2 = forward(params, cfg, dt, dp, jax.tree_util.tree_map(
            lambda a: a, kv), dl, read_bound=read_bound)
        return np.asarray(lg), kv2

    want, kv_full = step(1024)
    # capacity larger than the actual straggler count: padding rows drop
    for cap in (1, 4):
        got, kv_tier = step((256, 1024, cap))
        np.testing.assert_array_equal(got, want)
        for key in kv_full:
            np.testing.assert_array_equal(np.asarray(kv_tier[key]),
                                          np.asarray(kv_full[key]))


def test_greedy_decode_tiered_matches_sequential(tmp_path, rng):
    """Ragged-batch greedy_decode (which picks a tiered bound internally)
    must produce exactly the tokens each row would produce decoded alone."""
    path = str(tmp_path / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=97, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=CTX, seed=11)
    params, cfg, _ = load_model(path, mode="dequant")
    steps = 8
    lens = [20, 35, 50, 600]
    prompts = [rng.integers(0, 97, size=n).tolist() for n in lens]

    runner = ModelRunner(params, cfg, max_batch=4, max_seq=CTX)
    kv = runner.init_kv()
    first = []
    for i, ids in enumerate(prompts):
        lg, kv, _ = runner.prefill(ids, kv, batch_idx=i)
        first.append(int(np.argmax(np.asarray(lg))))
    # the segment bound must tier: assert the plan actually used a tuple
    assert isinstance(pick_read_bound([n + steps for n in lens], CTX), tuple)
    toks, kv = runner.greedy_decode(
        jnp.asarray(first, jnp.int32), jnp.asarray(lens, jnp.int32), kv,
        steps=steps)
    got = np.asarray(toks)

    for i, ids in enumerate(prompts):
        solo = ModelRunner(params, cfg, max_batch=1, max_seq=CTX)
        kv1 = solo.init_kv()
        lg, kv1, p = solo.prefill(ids, kv1)
        t1, kv1 = solo.greedy_decode(
            jnp.asarray([first[i]], jnp.int32), jnp.asarray([p], jnp.int32),
            kv1, steps=steps)
        np.testing.assert_array_equal(got[i], np.asarray(t1)[0])


def test_tiered_mixed_step_bitexact(model, rng):
    """Tiering must also be exact for T>1 mixed steps (prefill-chunk rows
    riding with decode rows, engine/batched._mixed_step shapes): the long
    row here is a PREFILL row whose chunk lands past lo."""
    params, cfg = model
    b, t = 4, 8
    # rows 0-2 decode at short contexts; row 3 prefills a chunk at ~600
    kv = KV.init_cache(cfg.num_layers, b, CTX, cfg.num_kv_heads,
                       cfg.head_dim)
    base = [40, 50, 60, 600]
    n = max(base)
    toks = np.zeros((b, n), np.int32)
    pos = np.full((b, n), CTX, np.int32)
    for i, ln in enumerate(base):
        toks[i, :ln] = rng.integers(0, 97, size=ln)
        pos[i, :ln] = np.arange(ln)
    _, kv = forward(params, cfg, jnp.asarray(toks), jnp.asarray(pos), kv,
                    jnp.asarray(base, jnp.int32))

    # mixed step: decode rows carry 1 token (cols 1+ OOB-dropped), the
    # prefill row carries t tokens
    mt = np.zeros((b, t), np.int32)
    mp = np.full((b, t), CTX, np.int32)
    for i in range(3):
        mt[i, 0] = rng.integers(0, 97)
        mp[i, 0] = base[i]
    mt[3] = rng.integers(0, 97, size=t)
    mp[3] = base[3] + np.arange(t)
    lens = np.asarray([base[0] + 1, base[1] + 1, base[2] + 1, base[3] + t],
                      np.int32)
    lp = np.asarray([0, 0, 0, t - 1], np.int32)

    def step(read_bound):
        lg, kv2 = forward(params, cfg, jnp.asarray(mt), jnp.asarray(mp),
                          jax.tree_util.tree_map(lambda a: a, kv),
                          jnp.asarray(lens), read_bound=read_bound,
                          logit_positions=jnp.asarray(lp))
        return np.asarray(lg), kv2

    want, kv_full = step(1024)
    got, kv_tier = step((256, 1024, 1))
    np.testing.assert_array_equal(got, want)
    for key in kv_full:
        np.testing.assert_array_equal(np.asarray(kv_tier[key]),
                                      np.asarray(kv_full[key]))
