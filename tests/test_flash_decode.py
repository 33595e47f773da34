"""flash_decode (per-row ragged decode attention) vs the dense oracle.

Every case runs the Pallas kernel in interpret mode on CPU against
ops.attention.dense_attention on identical inputs — the kernel's per-row
clamped block reads must be numerically invisible (the skipped positions
are exactly zero-weight either way)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_gguf_tpu.ops.attention import dense_attention
from llama_gguf_tpu.ops.flash_decode import flash_decode, _pick_block


def make_case(rng, b, s, kh, r, d, dv=None, kv_dtype=jnp.float32):
    dv = dv or d
    qg = jnp.asarray(rng.standard_normal((b, 1, kh, r, d)), jnp.float32)
    keys = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((b, s, kh, dv)), jnp.float32)
    return qg, keys.astype(kv_dtype), vals.astype(kv_dtype)


def run_both(qg, keys, vals, positions, lengths, bound, **kw):
    kf = keys.astype(jnp.float32)
    vf = vals.astype(jnp.float32)
    want = dense_attention(qg, kf[:, :bound], vf[:, :bound],
                           positions, lengths, **kw)
    got = flash_decode(qg, keys, vals, positions, lengths,
                       bound=bound, interpret=True, **kw)
    return np.asarray(got), np.asarray(want)


def test_ragged_rows_match_dense(rng):
    """Mixed-length batch: every row matches the dense path despite each
    reading a different number of blocks."""
    b, s, kh, r, d = 4, 512, 2, 4, 64
    qg, keys, vals = make_case(rng, b, s, kh, r, d)
    lengths = jnp.asarray([5, 200, 257, 512], jnp.int32)
    positions = (lengths - 1)[:, None]
    got, want = run_both(qg, keys, vals, positions, lengths, 512,
                         scale=d ** -0.5)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bound_smaller_than_cache(rng):
    """The grid covers only ``bound`` positions of a larger padded cache."""
    b, s, kh, r, d = 2, 1024, 2, 2, 64
    qg, keys, vals = make_case(rng, b, s, kh, r, d)
    lengths = jnp.asarray([100, 250], jnp.int32)
    positions = (lengths - 1)[:, None]
    got, want = run_both(qg, keys, vals, positions, lengths, 256,
                         scale=d ** -0.5)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mha_and_mqa_head_layouts(rng):
    # MHA: R=1 (pads to 8 sublanes); MQA: one kv head, many q heads
    for kh, r in ((4, 1), (1, 12)):
        qg, keys, vals = make_case(rng, 2, 256, kh, r, 64)
        lengths = jnp.asarray([7, 256], jnp.int32)
        positions = (lengths - 1)[:, None]
        got, want = run_both(qg, keys, vals, positions, lengths, 256,
                             scale=0.125)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sliding_window(rng):
    b, s, kh, r, d = 2, 512, 2, 2, 64
    qg, keys, vals = make_case(rng, b, s, kh, r, d)
    lengths = jnp.asarray([400, 512], jnp.int32)
    positions = (lengths - 1)[:, None]
    got, want = run_both(qg, keys, vals, positions, lengths, 512,
                         scale=d ** -0.5, sliding_window=128)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_softcap_and_sinks(rng):
    b, s, kh, r, d = 2, 256, 2, 4, 64
    qg, keys, vals = make_case(rng, b, s, kh, r, d)
    lengths = jnp.asarray([100, 256], jnp.int32)
    positions = (lengths - 1)[:, None]
    got, want = run_both(qg, keys, vals, positions, lengths, 256,
                         scale=d ** -0.5, softcap=30.0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    sinks = jnp.asarray(rng.standard_normal((kh, r)), jnp.float32)
    got, want = run_both(qg, keys, vals, positions, lengths, 256,
                         scale=d ** -0.5, sinks=sinks)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bf16_cache_and_distinct_value_dim(rng):
    qg, keys, vals = make_case(rng, 2, 256, 2, 4, 64, dv=32,
                               kv_dtype=jnp.bfloat16)
    lengths = jnp.asarray([33, 256], jnp.int32)
    positions = (lengths - 1)[:, None]
    got, want = run_both(qg, keys, vals, positions, lengths, 256,
                         scale=0.125)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_padding_rows_zero(rng):
    """Inactive rows (length 0, position parked at max_seq) produce exactly
    zero context, matching the dense path's any_valid guard."""
    qg, keys, vals = make_case(rng, 3, 256, 2, 2, 64)
    lengths = jnp.asarray([10, 0, 256], jnp.int32)
    positions = jnp.asarray([[9], [2048], [255]], jnp.int32)
    got, want = run_both(qg, keys, vals, positions, lengths, 256,
                         scale=0.125)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert not got[1].any()


def test_runner_integration_matches_xla_path(tmp_path, rng):
    """A full model decode step through the flash-decode path (interpret
    mode) matches the XLA attention path on a ragged 3-row batch."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_tiny_model
    from llama_gguf_tpu.engine.runner import ModelRunner, read_bucket
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.ops import flash_decode as FD

    path = str(tmp_path / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=97, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=512, seed=9)
    params, cfg, _ = load_model(path, mode="dequant")

    prompts = [rng.integers(0, 97, size=n).tolist() for n in (5, 40, 300)]

    def prep(runner):
        kv = runner.init_kv(batch=3)
        for bi, ids in enumerate(prompts):
            _, kv, _ = runner.prefill(ids, kv, batch_idx=bi)
        toks = jnp.asarray([[3], [7], [11]], jnp.int32)
        pos = jnp.asarray([[5], [40], [300]], jnp.int32)
        lens = jnp.asarray([6, 41, 301], jnp.int32)
        return runner.step(toks, pos, lens, kv,
                           read_bound=read_bucket(301, 512))[0]

    r_xla = ModelRunner(params, cfg, max_batch=3, max_seq=512)
    assert not r_xla.cfg.flash_decode
    want = np.asarray(prep(r_xla))

    FD.set_interpret(True)
    try:
        r_fd = ModelRunner(params, cfg, max_batch=3, max_seq=512)
        assert r_fd.cfg.flash_decode
        got = np.asarray(prep(r_fd))
    finally:
        FD.set_interpret(False)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_pick_block():
    assert _pick_block(2048) == 256
    assert _pick_block(256) == 256
    assert _pick_block(64) == 64
    assert _pick_block(96) == 32
