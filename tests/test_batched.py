"""Continuous-batching engine tests: batched decode must match sequential
greedy decode exactly, plus scheduler mechanics (streaming, stop patterns,
admission control)."""

import numpy as np
import pytest

from llama_gguf_tpu.engine.batched import BatchedEngine, _StopBuffer
from llama_gguf_tpu.engine.engine import Engine, EngineConfig
from llama_gguf_tpu.engine.runner import ModelRunner
from llama_gguf_tpu.sampling.sampler import SamplerConfig

from fixtures import make_tiny_model


GREEDY = SamplerConfig(temperature=0.0, repetition_penalty=1.0)


@pytest.fixture(scope="module")
def tiny_model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bm") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    return path


@pytest.fixture(scope="module")
def engine(tiny_model_path):
    return Engine.load(tiny_model_path,
                       EngineConfig(weight_mode="dequant", max_batch=1))


@pytest.fixture(scope="module")
def batched(tiny_model_path):
    eng = Engine.load(tiny_model_path,
                      EngineConfig(weight_mode="dequant", max_batch=4))
    be = BatchedEngine(eng.runner, eng.tokenizer, max_queue=16)
    yield be
    be.shutdown()


def test_batched_matches_sequential_greedy(engine, batched):
    prompts = ["Hello there", "The quick brown fox", "A"]
    seq_out = [engine.generate(p, max_tokens=12, sampler=GREEDY)
               for p in prompts]
    handles = [batched.submit(p, max_tokens=12, sampler=GREEDY)
               for p in prompts]
    bat_out = [h.text(timeout=120) for h in handles]
    assert bat_out == seq_out


def test_batched_streaming_pieces(batched):
    h = batched.submit("Stream me", max_tokens=8, sampler=GREEDY)
    pieces = list(h.stream(timeout=120))
    assert "".join(pieces) == "".join(pieces)  # stream drains
    assert h.done and h.finish_reason in ("stop", "length")
    assert h.completion_tokens <= 8


def test_batched_more_requests_than_slots(batched):
    handles = [batched.submit(f"req {i}", max_tokens=6, sampler=GREEDY)
               for i in range(9)]  # > 4 slots: forces queue + slot reuse
    outs = [h.text(timeout=240) for h in handles]
    assert all(h.finish_reason in ("stop", "length") for h in handles)
    assert len(outs) == 9
    # determinism: same prompt resubmitted gives the same output
    again = batched.submit("req 0", max_tokens=6, sampler=GREEDY).text(timeout=120)
    assert again == outs[0]


def test_admission_control(tiny_model_path):
    eng = Engine.load(tiny_model_path,
                      EngineConfig(weight_mode="dequant", max_batch=1))
    be = BatchedEngine(eng.runner, eng.tokenizer, max_queue=2)
    try:
        h1 = be.submit("a", max_tokens=64, sampler=GREEDY)
        h2 = be.submit("b", max_tokens=64, sampler=GREEDY)
        with pytest.raises(RuntimeError, match="queue full"):
            for _ in range(8):
                be.submit("c", max_tokens=64, sampler=GREEDY)
        h1.text(timeout=240)
        h2.text(timeout=240)
        assert be.stats.rejected >= 1
    finally:
        be.shutdown()


def test_stop_pattern_in_batched(batched):
    # force a stop pattern hit by stopping on a piece of the greedy output
    ref = batched.submit("Hello there", max_tokens=12, sampler=GREEDY).text(timeout=120)
    if len(ref) > 4:
        stop = ref[2:5]
        out = batched.submit("Hello there", max_tokens=12, sampler=GREEDY,
                             stop=[stop]).text(timeout=120)
        assert stop not in out
        assert out == ref[: ref.index(stop)]


def test_stats(batched):
    assert batched.stats.decode_tokens > 0
    assert batched.stats.decode_tps >= 0


# -- _StopBuffer unit ---------------------------------------------------------

def test_stop_buffer_exact_and_split():
    sb = _StopBuffer(["END"])
    out, hit = sb.push("hello E")
    assert out == "hello " and not hit
    out, hit = sb.push("N")
    assert out == "" and not hit
    out, hit = sb.push("D tail")
    assert hit and out == ""


def test_stop_buffer_no_false_hold():
    sb = _StopBuffer(["xyz"])
    out, hit = sb.push("abc")
    assert out == "abc" and not hit
    assert sb.flush() == ""


def test_batched_prompt_cache(tiny_model_path):
    """Prefix-shared prefill in the batched engine produces identical
    output and registers cache hits."""
    from llama_gguf_tpu.engine.prompt_cache import PromptCache

    eng = Engine.load(tiny_model_path,
                      EngineConfig(weight_mode="dequant", max_batch=2))
    cache = PromptCache(max_bytes=64 << 20, min_prefix=4)
    be = BatchedEngine(eng.runner, eng.tokenizer, max_queue=8,
                       prompt_cache=cache)
    try:
        prompt = "tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8"
        a = be.submit(prompt, max_tokens=6, sampler=GREEDY).text(timeout=120)
        assert cache.stats.stored >= 1
        b = be.submit(prompt, max_tokens=6, sampler=GREEDY).text(timeout=120)
        assert b == a
        assert cache.stats.hits >= 1
    finally:
        be.shutdown()


def test_chunked_prefill_interleaves(tiny_model_path):
    """A long prompt prefills in chunks; short requests decode meanwhile,
    and output matches the unchunked result exactly."""
    eng = Engine.load(tiny_model_path,
                      EngineConfig(weight_mode="dequant", max_batch=2))
    # reference output with one-shot prefill
    be_ref = BatchedEngine(eng.runner, eng.tokenizer, max_queue=8,
                           prefill_chunk=4096)
    long_prompt = " ".join(f"tok{i % 200}" for i in range(60))
    want = be_ref.submit(long_prompt, max_tokens=5,
                         sampler=GREEDY).text(timeout=180)
    be_ref.shutdown()

    be = BatchedEngine(eng.runner, eng.tokenizer, max_queue=8,
                       prefill_chunk=8)  # force many chunks
    try:
        h_long = be.submit(long_prompt, max_tokens=5, sampler=GREEDY)
        h_short = be.submit("hi", max_tokens=5, sampler=GREEDY)
        short_out = h_short.text(timeout=180)
        long_out = h_long.text(timeout=180)
        assert long_out == want
        assert h_short.finish_reason in ("stop", "length")
        assert isinstance(short_out, str)
    finally:
        be.shutdown()


def test_concurrent_prefill_burst_matches_sequential(tiny_model_path):
    """Several prompts of different lengths admitted at once prefill in ONE
    batched step per chunk (rows at different offsets) and still match the
    one-at-a-time greedy output exactly."""
    eng = Engine.load(tiny_model_path,
                      EngineConfig(weight_mode="dequant", max_batch=4))
    seq_eng = Engine.load(tiny_model_path,
                          EngineConfig(weight_mode="dequant", max_batch=1))
    prompts = [
        " ".join(f"tok{i % 150}" for i in range(40)),
        "short one",
        " ".join(f"w{i}" for i in range(25)),
        "x",
    ]
    want = [seq_eng.generate(p, max_tokens=6, sampler=GREEDY)
            for p in prompts]

    be = BatchedEngine(eng.runner, eng.tokenizer, max_queue=8,
                       prefill_chunk=16)  # forces multi-chunk, mixed offsets
    try:
        handles = [be.submit(p, max_tokens=6, sampler=GREEDY)
                   for p in prompts]
        got = [h.text(timeout=240) for h in handles]
    finally:
        be.shutdown()
    assert got == want


def test_mixed_prefill_decode_single_step(tiny_model_path):
    """Token-level mixed batching: while sequence A decodes, admitting a
    long-prompt sequence B must NOT add separate prefill steps — B's
    chunks ride in the same batched forwards as A's decode tokens
    (stats.mixed_steps > 0), and outputs still match sequential greedy."""
    eng = Engine.load(tiny_model_path,
                      EngineConfig(weight_mode="dequant", max_batch=4))
    ref = Engine.load(tiny_model_path,
                      EngineConfig(weight_mode="dequant", max_batch=1))
    # small chunk so the long prompt needs several chunks
    be = BatchedEngine(eng.runner, eng.tokenizer, max_queue=16,
                       prefill_chunk=8)
    try:
        import time as _t

        step_calls = {"n": 0}
        orig_step = eng.runner.step

        def counting_step(*a, **kw):
            step_calls["n"] += 1
            _t.sleep(0.03)  # throttle so A is still decoding when B arrives
            return orig_step(*a, **kw)

        eng.runner.step = counting_step

        long_prompt = "word " * 30  # several 8-token chunks
        h_a = be.submit("Hello there", max_tokens=24, sampler=GREEDY)
        # wait until A is actually decoding (not a wall-clock guess: the
        # compile cache can make 24 decode steps finish in <0.2s)
        deadline = _t.time() + 60
        while be.stats.decode_steps < 1 and _t.time() < deadline:
            _t.sleep(0.005)
        assert be.stats.decode_steps >= 1, "A never started decoding"
        h_b = be.submit(long_prompt, max_tokens=8, sampler=GREEDY)
        out_a = h_a.text(timeout=120)
        out_b = h_b.text(timeout=120)

        assert be.stats.mixed_steps > 0, vars(be.stats)
        # every step with a decode row counts as ONE decode step; B's
        # prefill chunks added zero standalone steps beyond its own
        # pre-admission window
        total_tokens = be.stats.decode_tokens
        assert be.stats.decode_steps <= step_calls["n"]
        assert total_tokens >= 24 + 8 - 2  # EOG can end early

        want_a = ref.generate("Hello there", max_tokens=24, sampler=GREEDY)
        want_b = ref.generate(long_prompt, max_tokens=8, sampler=GREEDY)
        assert out_a == want_a
        assert out_b == want_b
    finally:
        be.shutdown()
