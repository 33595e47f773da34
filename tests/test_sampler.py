"""Sampler pipeline tests."""

import numpy as np

from llama_gguf_tpu.sampling.sampler import Sampler, SamplerConfig


def logits_fixture():
    v = np.full(100, -10.0, np.float32)
    v[5] = 5.0
    v[10] = 4.0
    v[20] = 3.0
    v[30] = 2.0
    return v


def test_greedy():
    s = Sampler(SamplerConfig(temperature=0.0))
    assert s.sample(logits_fixture()) == 5


def test_top_k_restricts():
    s = Sampler(SamplerConfig(temperature=1.0, top_k=2, top_p=1.0,
                              repetition_penalty=1.0, seed=0))
    picks = {s.sample(logits_fixture()) for _ in range(200)}
    assert picks <= {5, 10}


def test_top_p_restricts():
    s = Sampler(SamplerConfig(temperature=1.0, top_k=0, top_p=0.8,
                              repetition_penalty=1.0, seed=0))
    picks = {s.sample(logits_fixture()) for _ in range(200)}
    assert 30 not in picks


def test_min_p():
    s = Sampler(SamplerConfig(temperature=1.0, top_k=0, top_p=1.0,
                              min_p=0.5, repetition_penalty=1.0, seed=0))
    picks = {s.sample(logits_fixture()) for _ in range(100)}
    assert picks == {5}


def test_repetition_penalty_flips_argmax():
    cfg = SamplerConfig(temperature=0.0, repetition_penalty=10.0)
    s = Sampler(cfg)
    assert s.sample(logits_fixture(), history=[5]) == 10


def test_frequency_penalty():
    cfg = SamplerConfig(temperature=0.0, repetition_penalty=1.0,
                        frequency_penalty=2.0)
    s = Sampler(cfg)
    # token 5 appeared 3x -> logit 5 - 6 = -1 < 4
    assert s.sample(logits_fixture(), history=[5, 5, 5]) == 10


def test_grammar_mask():
    s = Sampler(SamplerConfig(temperature=0.0))
    mask = np.zeros(100, bool)
    mask[20] = True
    assert s.sample(logits_fixture(), mask=mask) == 20


def test_seeded_determinism():
    a = Sampler(SamplerConfig(temperature=1.0, seed=7))
    b = Sampler(SamplerConfig(temperature=1.0, seed=7))
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    assert [a.sample(x) for _ in range(20)] == [b.sample(x) for _ in range(20)]


def test_mirostat_runs():
    s = Sampler(SamplerConfig(temperature=1.0, mirostat=2, seed=0))
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    toks = [s.sample(x) for _ in range(50)]
    assert all(0 <= t < 1000 for t in toks)
