"""Speculative decoding parity + LoRA adapter tests."""

import numpy as np
import pytest

from fixtures import make_tiny_model
from llama_gguf_tpu.engine.engine import Engine, EngineConfig
from llama_gguf_tpu.engine.speculative import SpeculativeDecoder, make_self_draft
from llama_gguf_tpu.gguf.writer import GGUFWriter
from llama_gguf_tpu.models.lora import LoraAdapter, apply_lora, remove_lora


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spec") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=4,
                    heads=4, kv_heads=2, ffn=128, ctx=160, seed=11,
                    tokenizer=True)
    return Engine.load(path, EngineConfig(weight_mode="dequant"))


# -- speculative ----------------------------------------------------------------

def test_speculative_same_model_exact(engine):
    """Draft == target: 100% acceptance and exact greedy parity."""
    ids = engine.tokenizer.encode("tok1 tok2 tok3")
    dec = SpeculativeDecoder(engine.runner, engine.runner, num_draft=4)
    plain = dec.generate_plain_greedy(ids, 16)
    spec = dec.generate_greedy(ids, 16)
    assert spec == plain
    assert dec.stats.acceptance_rate == 1.0
    assert dec.stats.tokens_per_round > 1.0


def test_speculative_self_draft_exact(engine):
    """Early-exit draft: imperfect acceptance but output still EXACTLY
    matches target greedy (the speculative guarantee)."""
    ids = engine.tokenizer.encode("tok4 tok5")
    dec = SpeculativeDecoder.self_speculative(engine.runner, exit_layer=1,
                                              num_draft=3)
    plain = dec.generate_plain_greedy(ids, 20)
    spec = dec.generate_greedy(ids, 20)
    assert spec == plain
    assert dec.stats.rounds > 0
    assert 0.0 <= dec.stats.acceptance_rate <= 1.0


def test_speculative_different_draft_exact(engine, tmp_path_factory):
    """Independent (differently-seeded) draft model: low acceptance, exact
    output regardless."""
    dpath = str(tmp_path_factory.mktemp("spec2") / "draft.gguf")
    make_tiny_model(dpath, arch="qwen2", vocab=288, hidden=32, layers=1,
                    heads=2, kv_heads=1, ffn=64, ctx=160, seed=77,
                    tokenizer=True)
    draft_eng = Engine.load(dpath, EngineConfig(weight_mode="dequant"))
    ids = engine.tokenizer.encode("tok9 tok8")
    dec = SpeculativeDecoder(engine.runner, draft_eng.runner, num_draft=3)
    plain = dec.generate_plain_greedy(ids, 12)
    spec = dec.generate_greedy(ids, 12)
    assert spec == plain


def test_make_self_draft_shares_weights(engine):
    draft = make_self_draft(engine.runner, 2)
    assert draft.cfg.num_layers == 2
    assert draft.params["layers"][0] is engine.runner.params["layers"][0]
    assert draft.params["embed"] is engine.runner.params["embed"]


# -- LoRA -------------------------------------------------------------------------

def _write_lora_gguf(path: str, num_layers: int, hidden: int, rank: int,
                     alpha: float, seed: int, zero_b: bool = False,
                     targets=("attn_q", "attn_output")) -> None:
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_metadata("general.type", "adapter")
    w.add_metadata("adapter.type", "lora")
    w.add_metadata("adapter.lora.alpha", float(alpha))
    for i in range(num_layers):
        for t in targets:
            # llama.cpp layout: lora_a [r, K], lora_b [N, r]
            a = rng.normal(size=(rank, hidden)).astype(np.float32) * 0.1
            b = (np.zeros((hidden, rank), np.float32) if zero_b else
                 rng.normal(size=(hidden, rank)).astype(np.float32) * 0.1)
            w.add_tensor_np(f"blk.{i}.{t}.weight.lora_a", a)
            w.add_tensor_np(f"blk.{i}.{t}.weight.lora_b", b)
    w.write_to_path(path)


def test_lora_load_and_scale(tmp_path):
    p = str(tmp_path / "adapter.gguf")
    _write_lora_gguf(p, num_layers=2, hidden=64, rank=4, alpha=8.0, seed=1)
    ad = LoraAdapter.load_gguf(p)
    assert ad.rank == 4 and ad.alpha == 8.0 and ad.scale == 2.0
    assert len(ad.tensors) == 4
    a, b = ad.tensors["blk.0.attn_q"]
    assert a.shape == (64, 4) and b.shape == (4, 64)


def test_lora_zero_b_is_identity(engine, tmp_path):
    p = str(tmp_path / "zero.gguf")
    _write_lora_gguf(p, num_layers=4, hidden=64, rank=4, alpha=4.0, seed=2,
                     zero_b=True)
    ids = engine.tokenizer.encode("tok1 tok2")
    before = engine.greedy_tokens(ids, 6)
    n = apply_lora(engine.runner.params, LoraAdapter.load_gguf(p))
    assert n == 8
    engine.runner._steps.clear()  # params structure changed: retrace
    after = engine.greedy_tokens(ids, 6)
    assert after == before  # B=0 adapter is a no-op
    assert remove_lora(engine.runner.params) == 8
    engine.runner._steps.clear()


def test_lora_changes_output_and_removes(engine, tmp_path):
    p = str(tmp_path / "real.gguf")
    _write_lora_gguf(p, num_layers=4, hidden=64, rank=4, alpha=32.0, seed=3)
    ids = engine.tokenizer.encode("tok3 tok4 tok5")
    before = engine.greedy_tokens(ids, 8)
    apply_lora(engine.runner.params, LoraAdapter.load_gguf(p))
    engine.runner._steps.clear()
    with_lora = engine.greedy_tokens(ids, 8)
    assert with_lora != before  # a strong adapter must change logits
    remove_lora(engine.runner.params)
    engine.runner._steps.clear()
    restored = engine.greedy_tokens(ids, 8)
    assert restored == before


def test_lora_shape_mismatch_rejected(engine, tmp_path):
    p = str(tmp_path / "bad.gguf")
    _write_lora_gguf(p, num_layers=1, hidden=32, rank=2, alpha=2.0, seed=4)
    with pytest.raises(ValueError, match="shape mismatch"):
        apply_lora(engine.runner.params, LoraAdapter.load_gguf(p))
    remove_lora(engine.runner.params)


def test_lora_rejects_non_adapter(tmp_path):
    w = GGUFWriter()
    w.add_metadata("general.type", "model")
    w.add_tensor_np("x", np.zeros((4, 4), np.float32))
    p = str(tmp_path / "notlora.gguf")
    w.write_to_path(p)
    with pytest.raises(ValueError):
        LoraAdapter.load_gguf(p)


def test_speculative_sampled_same_model_accepts_all(engine):
    """pt == pd when draft == target, so every draft must be accepted."""
    from llama_gguf_tpu.sampling.sampler import SamplerConfig

    ids = engine.tokenizer.encode("tok1 tok2")
    dec = SpeculativeDecoder(engine.runner, engine.runner, num_draft=4)
    cfg = SamplerConfig(temperature=0.9, top_k=0, top_p=1.0,
                        repetition_penalty=1.0)
    out = dec.generate_sampled(ids, 16, cfg, seed=0)
    assert len(out) == 16
    assert dec.stats.acceptance_rate == 1.0


def test_speculative_sampled_distribution_matches_direct(engine):
    """Empirical next-token distribution from speculative sampling matches
    direct target sampling (total-variation distance check)."""
    from llama_gguf_tpu.engine.speculative import make_self_draft
    from llama_gguf_tpu.sampling.sampler import Sampler, SamplerConfig

    ids = engine.tokenizer.encode("tok3 tok4")
    # top_k=8 keeps the support small so 150 samples have power
    cfg = SamplerConfig(temperature=1.0, top_k=8, top_p=1.0,
                        repetition_penalty=1.0)
    trials = 150

    # direct: sample the token after the first greedy-ish sampled token —
    # to keep it simple compare the FIRST generated token's distribution
    kv = engine.runner.init_kv()
    logits, _, _ = engine.runner.prefill(ids, kv)
    probs = Sampler(cfg).probs(np.asarray(logits), ids)

    dec = SpeculativeDecoder(engine.runner, make_self_draft(engine.runner, 1),
                             num_draft=3)
    counts = np.zeros(probs.shape[0], np.int64)
    for s in range(trials):
        out = dec.generate_sampled(ids, 1, cfg, seed=s)
        counts[out[0]] += 1
    emp = counts / trials
    tvd = 0.5 * np.abs(emp - probs).sum()
    # expected sampling noise at N=150 over <=8 support is ~0.09
    assert tvd < 0.22, tvd


def test_sampler_probs_api(engine):
    from llama_gguf_tpu.sampling.sampler import Sampler, SamplerConfig

    logits = np.array([1.0, 3.0, 2.0, -1.0], np.float32)
    p = Sampler(SamplerConfig(temperature=1.0, top_k=2, top_p=1.0,
                              repetition_penalty=1.0)).probs(logits)
    assert p[0] == 0 and p[3] == 0  # top-2 keeps ids 1, 2
    assert p.sum() == pytest.approx(1.0)
    g = Sampler(SamplerConfig(temperature=0.0)).probs(logits)
    assert g[1] == 1.0 and g.sum() == 1.0


def test_engine_config_lora_applied(tmp_path):
    """EngineConfig(lora=...) applies the adapter at load and matches a
    manual apply_lora on the base engine (the reference only exposes LoRA
    as a library API; here it is first-class in the engine config + CLI
    --lora)."""
    mp = str(tmp_path / "base.gguf")
    make_tiny_model(mp, arch="qwen2", vocab=288, hidden=64, layers=4,
                    heads=4, kv_heads=2, ffn=128, ctx=160, seed=11,
                    tokenizer=True)
    lp = str(tmp_path / "adapter.gguf")
    _write_lora_gguf(lp, num_layers=4, hidden=64, rank=4, alpha=32.0, seed=3)

    base = Engine.load(mp, EngineConfig(weight_mode="dequant"))
    ids = base.tokenizer.encode("tok5 tok6")
    plain = base.greedy_tokens(ids, 8)
    apply_lora(base.runner.params, LoraAdapter.load_gguf(lp))
    want = base.greedy_tokens(ids, 8)

    eng = Engine.load(mp, EngineConfig(weight_mode="dequant", lora=lp))
    got = eng.greedy_tokens(ids, 8)
    assert got == want
    assert got != plain  # strong adapter must actually change the output


# -- prompt-lookup speculation ---------------------------------------------------

def test_prompt_lookup_propose():
    from llama_gguf_tpu.engine.speculative import PromptLookupDecoder

    d = PromptLookupDecoder.__new__(PromptLookupDecoder)
    d.max_ngram = 3
    # suffix [7, 8] occurred earlier, followed by [9, 10]
    hist = [1, 7, 8, 9, 10, 2, 7, 8]
    assert d._propose(hist, 4) == [9, 10, 2, 7]
    assert d._propose(hist, 2) == [9, 10]
    # most recent occurrence wins: suffix [5] matches the later [5, 6]
    hist2 = [5, 1, 5, 6, 5]
    assert d._propose(hist2, 2) == [6, 5]
    # no match
    assert d._propose([1, 2, 3], 4) == []
    assert d._propose([4], 4) == []


def test_prompt_lookup_greedy_exact(engine):
    """Prompt-lookup decode must equal plain greedy decoding exactly —
    single-pass verification guarantees it whatever the proposals are."""
    from llama_gguf_tpu.engine.speculative import (
        PromptLookupDecoder, SpeculativeDecoder,
    )

    runner = engine.runner
    # repetitive prompt so n-gram proposals actually fire
    ids = engine.tokenizer.encode("tok7 tok8 tok9 tok7 tok8 tok9 tok7 tok8")
    plain = SpeculativeDecoder(runner, runner).generate_plain_greedy(ids, 24)
    pl = PromptLookupDecoder(runner, num_draft=6)
    got = pl.generate_greedy(ids, 24)
    assert got == plain
    assert pl.stats.rounds > 0
    # every generated token is either an accepted draft or a bonus token
    assert pl.stats.accepted + pl.stats.bonus == len(got) - 1
