"""KV-cache variants: quantized i8/f8 formats, context shift with RoPE
re-rotation, paged pool with copy-on-write, prompt cache prefix sharing."""

import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_tiny_model
from llama_gguf_tpu.engine.engine import Engine, EngineConfig
from llama_gguf_tpu.engine.prompt_cache import PromptCache
from llama_gguf_tpu.models import kv as KV
from llama_gguf_tpu.models.config import RopeConfig, RopeType
from llama_gguf_tpu.models.paged import (
    OutOfBlocksError, PageAllocator, PagedKVPool,
)
from llama_gguf_tpu.sampling.sampler import SamplerConfig

GREEDY = SamplerConfig(temperature=0.0, repetition_penalty=1.0)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kvv") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    return path


# -- quantized formats ---------------------------------------------------------

@pytest.mark.parametrize("fmt", ["f32", "bf16", "i8", "f8_e4m3", "f8_e5m2"])
def test_kv_roundtrip(fmt, rng):
    kv = KV.init_cache(2, 1, 8, 2, 16, fmt=fmt)
    assert KV.cache_format(kv) == fmt
    k = jnp.asarray(rng.normal(size=(1, 4, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 4, 2, 16)).astype(np.float32))
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None])
    kv = KV.write(kv, 0, k, v, pos)
    ko, vo = KV.read(kv, 0)
    tol = {"f32": 1e-6, "bf16": 0.05, "i8": 0.05,
           "f8_e4m3": 0.15, "f8_e5m2": 0.3}[fmt]
    assert np.allclose(np.asarray(ko[0, :4]), np.asarray(k[0]), atol=tol,
                       rtol=tol)
    assert np.allclose(np.asarray(vo[0, :4]), np.asarray(v[0]), atol=tol,
                       rtol=tol)
    # untouched positions stay zero
    assert np.all(np.asarray(ko[0, 4:]) == 0)


def test_kv_memory_shrinks():
    f32 = KV.init_cache(4, 2, 64, 4, 32, fmt="f32")
    i8 = KV.init_cache(4, 2, 64, 4, 32, fmt="i8")
    f8 = KV.init_cache(4, 2, 64, 4, 32, fmt="f8_e4m3")
    assert KV.memory_bytes(i8) < KV.memory_bytes(f32) / 3  # ~4x minus scales
    assert KV.memory_bytes(f8) == KV.memory_bytes(f32) / 4


def test_oob_positions_dropped():
    kv = KV.init_cache(1, 1, 4, 1, 8, fmt="i8")
    k = jnp.ones((1, 2, 1, 8))
    pos = jnp.asarray(np.array([[0, 99]], np.int32))  # second OOB
    kv = KV.write(kv, 0, k, k, pos)
    ko, _ = KV.read(kv, 0)
    assert np.allclose(np.asarray(ko[0, 0, 0]), 1.0, atol=0.02)
    assert np.all(np.asarray(ko[0, 1:]) == 0)


def test_single_token_write_matches_scatter():
    """The B=1/T=1 decode write takes the dynamic-slice fast path
    (kv._set_at_positions); it must be bit-identical to the general
    scatter, including the OOB-drop semantics the segmented greedy scan
    relies on past the cache end (runner.plan_segments)."""
    rng = np.random.default_rng(3)
    val = jnp.asarray(rng.normal(size=(1, 1, 2, 8)).astype(np.float32))
    for pos, fmt in [(0, "f32"), (2, "f32"), (3, "f32"), (4, "f32"),
                     (99, "f32"), (2, "bf16"), (99, "bf16"),
                     (2, "i8"), (99, "i8")]:
        kv_f = KV.init_cache(1, 1, 4, 2, 8, fmt=fmt)
        kv_f = KV.write(kv_f, 0, val * 0 + 1.0, val * 0 + 1.0,
                        jnp.asarray([[1]], np.int32))  # pre-fill slot 1
        kv_s = {k: tuple(v) for k, v in kv_f.items()}
        p_fast = jnp.asarray([[pos]], np.int32)          # (1,1): fast path
        p_scat = jnp.asarray([[pos, 99]], np.int32)      # (1,2): scatter
        val2 = jnp.concatenate([val, val], axis=1)
        out_f = KV.write(kv_f, 0, val, val, p_fast)
        out_s = KV.write(kv_s, 0, val2, val2, p_scat)
        for key in out_f:
            a, b = np.asarray(out_f[key][0]), np.asarray(out_s[key][0])
            assert a.dtype == b.dtype and np.array_equal(a, b), (pos, fmt, key)


@pytest.mark.parametrize("fmt", ["i8", "f8_e4m3", "bf16"])
def test_generation_with_quantized_kv(model_path, fmt):
    """Quantized-KV greedy output stays close to f32-KV output (and the
    engine runs end-to-end)."""
    ref = Engine.load(model_path, EngineConfig(weight_mode="dequant"))
    qt = Engine.load(model_path, EngineConfig(weight_mode="dequant",
                                              kv_format=fmt))
    ids = ref.tokenizer.encode("tok1 tok2 tok3")
    a = ref.greedy_tokens(ids, 8)
    b = qt.greedy_tokens(ids, 8)
    # first tokens should agree; tiny random models amplify quant noise later
    assert a[0] == b[0]


# -- context shift ----------------------------------------------------------------

def test_shift_left_rerotation_exact():
    """Shifting by n then reading must equal writing at shifted positions:
    the re-rotation makes the shift exact for RoPE'd keys."""
    from llama_gguf_tpu.ops.rope import apply_rope, rope_cos_sin

    rope = RopeConfig(freq_base=10000.0, n_dims=16, rope_type=RopeType.NEOX)
    rng = np.random.default_rng(0)
    raw_k = rng.normal(size=(1, 6, 2, 16)).astype(np.float32)
    pos = np.arange(6, dtype=np.int32)[None]

    def roped(k, positions):
        cos, sin = rope_cos_sin(jnp.asarray(positions), rope)
        return apply_rope(jnp.asarray(k), cos, sin, rope)

    kv = KV.init_cache(1, 1, 8, 2, 16, fmt="f32")
    kv = KV.write(kv, 0, roped(raw_k, pos), jnp.asarray(raw_k),
                  jnp.asarray(pos))
    shifted = KV.shift_left(kv, 2, rope_cfg=rope)
    ko, vo = KV.read(shifted, 0)

    # expected: tokens 2..5 rotated for positions 0..3
    expect = roped(raw_k[:, 2:6], pos[:, :4])
    assert np.allclose(np.asarray(ko[0, :4]), np.asarray(expect[0]),
                       atol=1e-4)
    # values just slide (no rotation)
    assert np.allclose(np.asarray(vo[0, :4]), raw_k[0, 2:6], atol=1e-6)


# -- paged pool -------------------------------------------------------------------

def test_page_allocator():
    a = PageAllocator(3)
    b1, b2 = a.allocate(), a.allocate()
    assert a.free_blocks == 1
    a.retain(b1)
    a.release(b1)
    assert a.free_blocks == 1  # still referenced once
    a.release(b1)
    assert a.free_blocks == 2
    a.allocate()
    a.allocate()
    with pytest.raises(OutOfBlocksError):
        a.allocate()
    assert a.ref_count(b2) == 1


def test_paged_pool_append_gather(rng):
    pool = PagedKVPool(num_layers=2, num_blocks=8, num_kv_heads=2,
                       head_dim=4, block_size=4)
    pool.create("s1")
    toks = [rng.normal(size=(2, 2, 4)).astype(np.float32) for _ in range(6)]
    for t in toks:
        pool.append("s1", jnp.asarray(t), jnp.asarray(t * 2))
    k, v, n = pool.gather("s1", max_blocks=4)
    assert n == 6 and k.shape == (2, 16, 2, 4)
    for i, t in enumerate(toks):
        assert np.allclose(np.asarray(k[:, i]), t, atol=1e-6)
        assert np.allclose(np.asarray(v[:, i]), t * 2, atol=1e-6)


def test_paged_copy_on_write(rng):
    pool = PagedKVPool(num_layers=1, num_blocks=8, num_kv_heads=1,
                       head_dim=4, block_size=4)
    pool.create("a")
    base = [rng.normal(size=(1, 1, 4)).astype(np.float32) for _ in range(5)]
    for t in base:
        pool.append("a", jnp.asarray(t), jnp.asarray(t))
    free_before = pool.allocator.free_blocks
    pool.fork("a", "b")
    assert pool.allocator.free_blocks == free_before  # shared, no copy yet

    # diverge: appends copy the shared tail block, then extend independently
    div_a = rng.normal(size=(1, 1, 4)).astype(np.float32)
    div_b = rng.normal(size=(1, 1, 4)).astype(np.float32)
    pool.append("a", jnp.asarray(div_a), jnp.asarray(div_a))
    pool.append("b", jnp.asarray(div_b), jnp.asarray(div_b))

    ka, _, na = pool.gather("a", max_blocks=4)
    kb, _, nb = pool.gather("b", max_blocks=4)
    assert na == nb == 6
    for i, t in enumerate(base):  # shared prefix intact in both
        assert np.allclose(np.asarray(ka[:, i]), t, atol=1e-6)
        assert np.allclose(np.asarray(kb[:, i]), t, atol=1e-6)
    assert np.allclose(np.asarray(ka[:, 5]), div_a, atol=1e-6)
    assert np.allclose(np.asarray(kb[:, 5]), div_b, atol=1e-6)

    pool.free("a")
    pool.free("b")
    assert pool.allocator.free_blocks == 8


# -- prompt cache -----------------------------------------------------------------

def test_prompt_cache_restore_and_lru():
    cache = PromptCache(max_bytes=1 << 20, min_prefix=2)
    kv = KV.init_cache(1, 1, 16, 1, 4, fmt="f32")
    k = jnp.arange(8 * 4, dtype=jnp.float32).reshape(1, 8, 1, 4)
    kv = KV.write(kv, 0, k, k, jnp.arange(8, dtype=jnp.int32)[None])
    cache.put([1, 2, 3, 4, 5, 6, 7, 8], kv)
    assert cache.entry_count == 1

    fresh = KV.init_cache(1, 1, 16, 1, 4, fmt="f32")
    restored, n = cache.restore([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], fresh)
    assert n == 8
    ko, _ = KV.read(restored, 0)
    assert np.allclose(np.asarray(ko[0, :8]), np.asarray(k[0]), atol=1e-6)

    # no prefix match
    _, n2 = cache.restore([9, 9, 9], fresh)
    assert n2 == 0
    assert cache.stats.hits == 1 and cache.stats.misses == 1

    # full match restores len-1 (caller needs a last token for logits)
    _, n3 = cache.restore([1, 2, 3, 4, 5, 6, 7, 8], fresh)
    assert n3 == 7


def test_prompt_cache_engine_integration(model_path):
    eng = Engine.load(model_path, EngineConfig(weight_mode="dequant",
                                               prompt_cache=True))
    out1 = eng.generate("tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8 tok9",
                        max_tokens=6, sampler=GREEDY)
    assert eng.prompt_cache.stats.stored >= 1
    out2 = eng.generate("tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8 tok9",
                        max_tokens=6, sampler=GREEDY)
    assert out2 == out1  # cached-prefix decode matches cold decode
    assert eng.prompt_cache.stats.hits >= 1


# -- SWA ring cache (iSWA) ----------------------------------------------------


def _swa_model(tmp_path, ctx=2048, window=16):
    """Tiny gemma2-flavored model: pattern 2 -> layer 0 sliding, 1 full."""
    from fixtures import make_tiny_model

    path = str(tmp_path / "swa.gguf")
    make_tiny_model(
        path, arch="gemma2", vocab=64, hidden=32, layers=2, heads=4,
        kv_heads=2, ffn=64, ctx=ctx, attention_bias=False, seed=3,
        extra_metadata={"gemma2.attention.sliding_window": window},
    )
    return path


def test_swa_ring_matches_full_cache(tmp_path):
    """Ring-buffer SWA cache must produce bit-identical logits to the full
    cache through prefill + decode past the window."""
    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.models.loader import load_model

    path = _swa_model(tmp_path)
    params, cfg, _ = load_model(path, mode="dequant")
    prompt = list(np.random.default_rng(0).integers(0, 64, size=40))

    outs = {}
    for ring in (False, True):
        r = ModelRunner(params, cfg, max_batch=1, max_seq=2048,
                        swa_ring=ring, swa_ring_extra=128)
        assert (r.ring_slots > 0) == ring
        kv = r.init_kv()
        if ring:  # layer 1 (full) keeps 2048 slots; layer 0 rings at 128+16
            assert len(kv["k"]) == 1 and len(kv["k_swa"]) == 1
            assert kv["k_swa"][0].shape[1] == r.ring_slots
        logits, kv, pos = r.prefill(prompt, kv)
        toks, _ = r.greedy_decode(
            np.asarray([int(np.argmax(np.asarray(logits)))]),
            np.asarray([pos]), kv, steps=24)
        outs[ring] = (np.asarray(logits), np.asarray(toks))
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_array_equal(outs[False][1], outs[True][1])


def test_swa_ring_long_prompt_chunks(tmp_path):
    """Prompts longer than the ring headroom are chunked transparently and
    still match the full cache."""
    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.models.loader import load_model

    path = _swa_model(tmp_path)
    params, cfg, _ = load_model(path, mode="dequant")
    prompt = list(np.random.default_rng(1).integers(0, 64, size=300))

    outs = {}
    for ring in (False, True):
        r = ModelRunner(params, cfg, max_batch=1, max_seq=2048,
                        swa_ring=ring, swa_ring_extra=128)
        kv = r.init_kv()
        logits, _, _ = r.prefill(prompt, kv)  # 300 > 128-slot headroom
        outs[ring] = np.asarray(logits)
    np.testing.assert_allclose(outs[False], outs[True], rtol=2e-5, atol=2e-5)


def test_swa_ring_rejects_context_shift(tmp_path):
    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.models import kv as KV
    from llama_gguf_tpu.models.loader import load_model

    path = _swa_model(tmp_path)
    params, cfg, _ = load_model(path, mode="dequant")
    r = ModelRunner(params, cfg, max_batch=1, max_seq=2048,
                    swa_ring=True, swa_ring_extra=128)
    kv = r.init_kv()
    with pytest.raises(ValueError, match="context shift"):
        KV.shift_left(kv, 4, cfg.rope)


def test_shift_left_per_layer_rope():
    """Per-layer context shift (model_cfg path): NoPE layers must NOT be
    re-rotated (roll only), roped layers must; MLA latents rotate only
    the trailing rope dims. Regression: one homogeneous rope_cfg used to
    rotate every layer."""
    from llama_gguf_tpu.models.config import ModelConfig
    from llama_gguf_tpu.ops.rope import apply_rope, rope_cos_sin

    rope = RopeConfig(freq_base=10000.0, n_dims=16, rope_type=RopeType.NEOX)
    cfg = ModelConfig(arch="smollm3", vocab_size=8, hidden_size=32,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      intermediate_size=32, max_seq_len=8, rope=rope,
                      nope_layer_interval=2)  # layer 1 ((1+1)%2==0) is NoPE
    rng = np.random.default_rng(1)
    raw_k = rng.normal(size=(1, 6, 2, 16)).astype(np.float32)
    pos = np.arange(6, dtype=np.int32)[None]

    def roped(k, positions):
        cos, sin = rope_cos_sin(jnp.asarray(positions), rope)
        return apply_rope(jnp.asarray(k), cos, sin, rope)

    kv = KV.init_cache(2, 1, 8, 2, 16, fmt="f32")
    kv = KV.write(kv, 0, roped(raw_k, pos), jnp.asarray(raw_k),
                  jnp.asarray(pos))
    kv = KV.write(kv, 1, jnp.asarray(raw_k), jnp.asarray(raw_k),
                  jnp.asarray(pos))  # NoPE layer stores raw keys
    shifted = KV.shift_left(kv, 2, model_cfg=cfg)

    k0, _ = KV.read(shifted, 0)
    expect0 = roped(raw_k[:, 2:6], pos[:, :4])
    assert np.allclose(np.asarray(k0[0, :4]), np.asarray(expect0[0]),
                       atol=1e-4)
    k1, _ = KV.read(shifted, 1)
    # NoPE layer: keys just slide, bit-identical
    assert np.allclose(np.asarray(k1[0, :4]), raw_k[0, 2:6], atol=0)


def test_shift_left_batch_idx_leaves_other_rows():
    """batch_idx shift must not roll OR re-rotate the other rows."""
    rope = RopeConfig(freq_base=10000.0, n_dims=16, rope_type=RopeType.NEOX)
    rng = np.random.default_rng(2)
    raw = rng.normal(size=(2, 6, 2, 16)).astype(np.float32)
    pos = np.tile(np.arange(6, dtype=np.int32), (2, 1))
    kv = KV.init_cache(1, 2, 8, 2, 16, fmt="f32")
    kv = KV.write(kv, 0, jnp.asarray(raw), jnp.asarray(raw),
                  jnp.asarray(pos))
    before_row1 = np.asarray(kv["k"][0][1]).copy()
    shifted = KV.shift_left(kv, 2, rope_cfg=rope, batch_idx=0)
    after_row1 = np.asarray(shifted["k"][0][1])
    assert np.array_equal(before_row1, after_row1)
    # row 0 did shift
    assert not np.array_equal(np.asarray(kv["k"][0][0]),
                              np.asarray(shifted["k"][0][0]))
