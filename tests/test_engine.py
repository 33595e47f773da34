"""End-to-end engine tests on a synthetic GGUF model with a real tokenizer."""

import numpy as np
import pytest

from fixtures import make_tiny_model
from llama_gguf_tpu.engine.engine import ChatEngine, Engine, EngineConfig
from llama_gguf_tpu.sampling.sampler import SamplerConfig


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    return Engine.load(path, EngineConfig(weight_mode="dequant"))


def test_generate_deterministic(engine):
    a = engine.generate("tok1 tok2", max_tokens=8,
                        sampler=SamplerConfig(temperature=0.0))
    b = engine.generate("tok1 tok2", max_tokens=8,
                        sampler=SamplerConfig(temperature=0.0))
    assert a == b
    assert engine.stats.generated_tokens <= 8


def test_streaming_matches_batch(engine):
    cfg = SamplerConfig(temperature=0.0)
    full = engine.generate("tok3", max_tokens=6, sampler=cfg)
    parts = list(engine.generate_streaming("tok3", max_tokens=6, sampler=cfg))
    assert "".join(parts) == full


def test_stop_sequences(engine):
    cfg = SamplerConfig(temperature=0.0)
    full = engine.generate("tok3", max_tokens=10, sampler=cfg)
    if len(full) > 3:
        stop = full[2:4]
        stopped = engine.generate("tok3", max_tokens=10, sampler=cfg,
                                  stop=[stop])
        assert stop not in stopped
        assert full.startswith(stopped)


def test_greedy_tokens_reproducible(engine):
    ids = engine.tokenizer.encode("tok1 tok5 tok9")
    a = engine.greedy_tokens(ids, 10)
    b = engine.greedy_tokens(ids, 10)
    assert a == b
    assert len(a) <= 10


def test_chat_engine_turns(engine):
    chat = ChatEngine(engine, system_prompt="sys")
    r1 = chat.send("tok1", max_tokens=4, sampler=SamplerConfig(temperature=0.0))
    assert isinstance(r1, str)
    assert len(chat.messages) == 3  # system, user, assistant
    chat.send("tok2", max_tokens=4, sampler=SamplerConfig(temperature=0.0))
    assert len(chat.messages) == 5


def test_embed(engine):
    v = engine.embed("tok1 tok2")
    assert v.shape == (64,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    w = engine.embed("tok9 tok8")
    assert not np.allclose(v, w)


def test_context_shift_generates_past_window(tmp_path_factory):
    """With context_shift the engine generates past max_seq by sliding the
    KV window (exact RoPE re-rotation)."""
    path = str(tmp_path_factory.mktemp("cs") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=256, seed=11,
                    tokenizer=True)
    cfg = SamplerConfig(temperature=0.0, repetition_penalty=1.0)
    eng = Engine.load(path, EngineConfig(weight_mode="dequant",
                                         max_context_len=32,
                                         context_shift=True))
    out = eng.generate("tok1 tok2 tok3", max_tokens=60, sampler=cfg)
    # without shifting, generation caps at ~32 - prompt; with shifting we
    # must get well beyond the window (unless EOG fired, which greedy on
    # this fixture does not)
    assert eng.stats.generated_tokens > 40
    out2 = eng.generate("tok1 tok2 tok3", max_tokens=60, sampler=cfg)
    assert out2 == out  # deterministic across shifts

    # default (no shift) stops at the window
    eng2 = Engine.load(path, EngineConfig(weight_mode="dequant",
                                          max_context_len=32))
    eng2.generate("tok1 tok2 tok3", max_tokens=60, sampler=cfg)
    assert eng2.stats.generated_tokens <= 32


def test_t5_engine_generate(tmp_path):
    """T5 encoder-decoder through the Engine: deterministic greedy ids,
    generate() returns text, stats populated (llama.cpp supports T5; the
    reference does not — capability beyond reference parity)."""
    from llama_gguf_tpu.engine.engine import Engine, EngineConfig
    from llama_gguf_tpu.utils.synthetic import build_synthetic_t5

    path = str(tmp_path / "t5.gguf")
    build_synthetic_t5(path)
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    assert eng.t5 is not None
    ids1 = eng.greedy_tokens([5, 9, 11], 8)
    ids2 = eng.greedy_tokens([5, 9, 11], 8)
    assert ids1 == ids2 and len(ids1) > 0
    out = eng.generate("hello", max_tokens=8)
    assert isinstance(out, str)
    assert eng.stats.prompt_tokens > 0


def test_t5encoder_embed(tmp_path):
    """t5encoder (encoder-only): embed() pools the encoder output;
    generate() raises."""
    import numpy as np
    import pytest

    from llama_gguf_tpu.engine.engine import Engine, EngineConfig
    from llama_gguf_tpu.utils.synthetic import build_synthetic_t5

    path = str(tmp_path / "t5enc.gguf")
    build_synthetic_t5(path, decoder=False)
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    vec = eng.embed("hello world")
    assert vec.ndim == 1 and np.isfinite(vec).all()
    assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-5
    with pytest.raises(RuntimeError, match="t5encoder"):
        eng.generate("hello", max_tokens=4)


def test_t5_sampled_and_stop(tmp_path):
    """Non-greedy T5 sampling must work (regression: 2-D logits reached
    the sampler) and stop strings must not leak their prefix."""
    from llama_gguf_tpu.engine.engine import Engine, EngineConfig
    from llama_gguf_tpu.sampling.sampler import SamplerConfig
    from llama_gguf_tpu.utils.synthetic import build_synthetic_t5

    path = str(tmp_path / "t5.gguf")
    build_synthetic_t5(path)
    eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
    out = eng.generate("hi", max_tokens=6,
                       sampler=SamplerConfig(temperature=1.0, seed=5))
    assert isinstance(out, str)
    # same seed -> same sample
    out2 = eng.generate("hi", max_tokens=6,
                        sampler=SamplerConfig(temperature=1.0, seed=5))
    assert out == out2
    full = eng.generate("hi", max_tokens=8)
    if len(full) >= 3:
        stop = full[1:3]  # a substring that starts mid-stream
        cut = eng.generate("hi", max_tokens=8, stop=[stop])
        assert stop not in cut
        assert full.startswith(cut)
    import pytest
    with pytest.raises(ValueError, match="grammar"):
        eng.generate("hi", max_tokens=4, grammar=object())


def test_prompt_cache_session_file(tmp_path):
    """Prompt-cache disk persistence (llama.cpp --prompt-cache parity):
    a second engine loading the session file restores the prefix and
    produces identical greedy output."""
    import numpy as np

    from fixtures import make_tiny_model
    from llama_gguf_tpu.engine.engine import Engine, EngineConfig

    path = str(tmp_path / "m.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    sess = str(tmp_path / "session.npz")

    from llama_gguf_tpu.sampling.sampler import SamplerConfig

    greedy = SamplerConfig(temperature=0.0)
    e1 = Engine.load(path, EngineConfig(
        weight_mode="dequant", prompt_cache_file=sess))
    out1 = e1.generate("the quick brown fox jumps over", max_tokens=8,
                       sampler=greedy)
    assert e1.save_prompt_cache() >= 1

    e2 = Engine.load(path, EngineConfig(
        weight_mode="dequant", prompt_cache_file=sess))
    assert e2.prompt_cache.entry_count >= 1
    out2 = e2.generate("the quick brown fox jumps over", max_tokens=8,
                       sampler=greedy)
    assert out2 == out1
    assert e2.prompt_cache.stats.hits >= 1


def test_prompt_cache_session_bf16_and_plain_path(tmp_path):
    """Session files round-trip non-f32 KV dtypes (bfloat16 used to
    reload as numpy void and crash restore) and respect the exact path
    given (np.savez used to append '.npz')."""
    import os

    import numpy as np

    from fixtures import make_tiny_model
    from llama_gguf_tpu.engine.engine import Engine, EngineConfig
    from llama_gguf_tpu.sampling.sampler import SamplerConfig

    path = str(tmp_path / "m.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    sess = str(tmp_path / "session.bin")  # deliberately not .npz
    greedy = SamplerConfig(temperature=0.0)

    e1 = Engine.load(path, EngineConfig(
        weight_mode="dequant", kv_format="bf16", prompt_cache_file=sess))
    out1 = e1.generate("pack my box with five dozen", max_tokens=6,
                       sampler=greedy)
    assert e1.save_prompt_cache() >= 1
    assert os.path.exists(sess)  # exact path, no .npz appended

    e2 = Engine.load(path, EngineConfig(
        weight_mode="dequant", kv_format="bf16", prompt_cache_file=sess))
    assert e2.prompt_cache.entry_count >= 1
    out2 = e2.generate("pack my box with five dozen", max_tokens=6,
                       sampler=greedy)
    assert out2 == out1
    assert e2.prompt_cache.stats.hits >= 1
