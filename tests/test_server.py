"""HTTP server integration tests: a REAL aiohttp server on an ephemeral
localhost port (the same pattern as the reference's
tests/distributed_integration_test.rs localhost gRPC shards), exercised with
plain HTTP requests including true SSE streaming."""

import json
import socket
import threading
import time

import pytest
import requests

from fixtures import make_tiny_model
from llama_gguf_tpu.server.app import ServerConfig, ServerState, create_app


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from aiohttp import web
    import asyncio

    path = str(tmp_path_factory.mktemp("srv") / "tiny.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    cfg = ServerConfig(model_path=path, port=_free_port(), max_batch=2,
                       weight_mode="dequant", max_tokens_default=16)
    state = ServerState(cfg)
    app = create_app(state)

    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)

    async def start():
        await runner.setup()
        site = web.TCPSite(runner, cfg.host, cfg.port)
        await site.start()

    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(start(), loop).result(timeout=30)
    base = f"http://{cfg.host}:{cfg.port}"
    # wait until healthy
    for _ in range(50):
        try:
            if requests.get(base + "/health", timeout=2).status_code == 200:
                break
        except requests.ConnectionError:
            time.sleep(0.1)
    yield base, state
    asyncio.run_coroutine_threadsafe(runner.cleanup(), loop).result(timeout=10)
    loop.call_soon_threadsafe(loop.stop)
    state.shutdown()


def test_health_and_models(server):
    base, _ = server
    h = requests.get(base + "/health").json()
    assert h["status"] == "ok"
    m = requests.get(base + "/v1/models").json()
    assert m["object"] == "list" and len(m["data"]) == 1
    assert m["data"][0]["id"].endswith(".gguf")


def test_completions(server):
    base, _ = server
    r = requests.post(base + "/v1/completions", json={
        "prompt": "Once upon", "max_tokens": 8, "temperature": 0.0,
    })
    assert r.status_code == 200, r.text
    d = r.json()
    assert d["object"] == "text_completion"
    assert d["choices"][0]["finish_reason"] in ("stop", "length")
    assert d["usage"]["prompt_tokens"] > 0
    assert d["usage"]["total_tokens"] == (
        d["usage"]["prompt_tokens"] + d["usage"]["completion_tokens"])


def test_chat_completions(server):
    base, _ = server
    r = requests.post(base + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 8, "temperature": 0.0,
    })
    assert r.status_code == 200, r.text
    d = r.json()
    assert d["object"] == "chat.completion"
    assert d["choices"][0]["message"]["role"] == "assistant"


def test_chat_streaming_sse(server):
    base, _ = server
    r = requests.post(base + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "stream"}],
        "max_tokens": 8, "temperature": 0.0, "stream": True,
    }, stream=True)
    assert r.status_code == 200
    assert r.headers["Content-Type"].startswith("text/event-stream")
    events = []
    for line in r.iter_lines():
        if line.startswith(b"data: "):
            payload = line[6:]
            if payload == b"[DONE]":
                events.append("DONE")
                break
            events.append(json.loads(payload))
    assert events[-1] == "DONE"
    chunks = events[:-1]
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    assert "usage" in chunks[-1]


def test_completions_match_nonstream_stream(server):
    base, _ = server
    body = {"prompt": "det", "max_tokens": 8, "temperature": 0.0}
    full = requests.post(base + "/v1/completions", json=body).json()
    r = requests.post(base + "/v1/completions", json={**body, "stream": True},
                      stream=True)
    text = ""
    for line in r.iter_lines():
        if line.startswith(b"data: ") and line[6:] != b"[DONE]":
            d = json.loads(line[6:])
            text += d["choices"][0]["text"]
    assert text == full["choices"][0]["text"]


def test_embeddings(server):
    base, _ = server
    r = requests.post(base + "/v1/embeddings", json={
        "input": ["hello", "world"],
    })
    assert r.status_code == 200, r.text
    d = r.json()
    assert len(d["data"]) == 2
    assert len(d["data"][0]["embedding"]) == 64  # hidden size
    assert d["usage"]["prompt_tokens"] > 0


def test_response_format_json(server):
    base, _ = server
    r = requests.post(base + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "json"}],
        "max_tokens": 24, "temperature": 1.0, "seed": 3,
        "repetition_penalty": 1.0,
        "response_format": {"type": "json_object"},
    })
    assert r.status_code == 200, r.text
    content = r.json()["choices"][0]["message"]["content"]
    # must be a JSON prefix at worst; parse if generation completed
    if r.json()["choices"][0]["finish_reason"] == "stop":
        json.loads(content)


def test_tool_call_constrained(server):
    base, _ = server
    r = requests.post(base + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "weather in Paris?"}],
        "max_tokens": 48, "temperature": 1.0, "seed": 0,
        "repetition_penalty": 1.0,
        "tools": [{
            "type": "function",
            "function": {
                "name": "get_weather",
                "description": "Get weather",
                "parameters": {
                    "type": "object",
                    "properties": {"city": {"type": "string"}},
                    "required": ["city"],
                },
            },
        }],
        "tool_choice": {"type": "function",
                        "function": {"name": "get_weather"}},
    })
    assert r.status_code == 200, r.text
    choice = r.json()["choices"][0]
    if choice["finish_reason"] == "tool_calls":
        call = choice["message"]["tool_calls"][0]
        assert call["function"]["name"] == "get_weather"
        args = json.loads(call["function"]["arguments"])
        assert isinstance(args.get("city"), str)


def test_errors(server):
    base, _ = server
    assert requests.post(base + "/v1/completions", json={}).status_code == 400
    assert requests.post(base + "/v1/chat/completions",
                         json={}).status_code == 400
    r = requests.post(base + "/v1/completions", data=b"not json",
                      headers={"Content-Type": "application/json"})
    assert r.status_code == 400
    assert requests.post(base + "/v1/embeddings", json={}).status_code == 400


def test_queue_status(server):
    base, _ = server
    q = requests.get(base + "/v1/queue").json()
    assert q["max_batch"] == 2
    assert q["stats"]["completed"] >= 1


def test_hot_reload(server, tmp_path):
    base, state = server
    path2 = str(tmp_path / "other.gguf")
    make_tiny_model(path2, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=99,
                    tokenizer=True)
    r = requests.post(base + "/v1/internal/load_model",
                      json={"model_path": path2})
    assert r.status_code == 200, r.text
    assert r.json()["model"] == "other.gguf"
    # server still serves after reload
    r2 = requests.post(base + "/v1/completions", json={
        "prompt": "after reload", "max_tokens": 4, "temperature": 0.0})
    assert r2.status_code == 200


def test_rag_endpoints(tmp_path):
    """RAG routes over a real server with rag_db enabled."""
    from aiohttp import web
    import asyncio

    path = str(tmp_path / "ragsrv.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=96, seed=11,
                    tokenizer=True)
    cfg = ServerConfig(model_path=path, port=_free_port(), max_batch=1,
                       weight_mode="dequant", max_tokens_default=8,
                       rag_db=":memory:")
    state = ServerState(cfg)
    app = create_app(state)
    loop = asyncio.new_event_loop()
    runner_ = web.AppRunner(app)

    async def start():
        await runner_.setup()
        await web.TCPSite(runner_, cfg.host, cfg.port).start()

    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(start(), loop).result(timeout=30)
    base = f"http://{cfg.host}:{cfg.port}"
    try:
        r = requests.post(base + "/v1/rag/ingest", json={
            "text": "the moon orbits the earth. " * 6,
            "source": "astro.txt"})
        assert r.status_code == 200 and r.json()["chunks"] >= 1
        r = requests.post(base + "/v1/rag/search", json={
            "query": "moon orbit", "k": 2, "search": "keyword"})
        assert r.status_code == 200
        assert "moon" in r.json()["results"][0]["text"]
        r = requests.post(base + "/v1/rag/query", json={
            "query": "what orbits the earth", "k": 1, "max_tokens": 4})
        assert r.status_code == 200
        assert r.json()["citations"]
        assert requests.post(base + "/v1/rag/search",
                             json={}).status_code == 400
    finally:
        asyncio.run_coroutine_threadsafe(runner_.cleanup(), loop).result(timeout=10)
        loop.call_soon_threadsafe(loop.stop)
        state.shutdown()


def test_remote_chat_client(server):
    """RemoteChatClient against the live server (parity: client.rs)."""
    from llama_gguf_tpu.client import RemoteChatClient, RemoteError

    base, _ = server
    c = RemoteChatClient(base)
    assert c.health()["status"] == "ok"
    assert len(c.models()) == 1
    full = c.chat([{"role": "user", "content": "hi"}], max_tokens=6,
                  temperature=0.0)
    streamed = "".join(c.chat_streaming([{"role": "user", "content": "hi"}],
                                        max_tokens=6, temperature=0.0))
    assert streamed == full
    vecs = c.embed(["a", "b"])
    assert len(vecs) == 2 and len(vecs[0]) == 64
    with pytest.raises(RemoteError, match="400"):
        c.complete(prompt=None)


def test_completions_logprobs(server):
    """Legacy completions logprobs: int = top-N per generated token."""
    base, _ = server
    r = requests.post(base + "/v1/completions", json={
        "prompt": "Once upon", "max_tokens": 4, "temperature": 0.0,
        "logprobs": 3,
    })
    assert r.status_code == 200, r.text
    lp = r.json()["choices"][0]["logprobs"]
    assert lp is not None
    n = len(lp["tokens"])
    assert n > 0 and len(lp["token_logprobs"]) == n
    assert all(v <= 0.0 for v in lp["token_logprobs"])
    assert len(lp["top_logprobs"]) == n
    # dict-keyed by token STRING: distinct ids may decode to the same text
    assert all(1 <= len(t) <= 3 for t in lp["top_logprobs"])
    # greedy decode: the sampled token is the argmax, so nothing in the
    # top list can beat it (string-keyed dicts may collide, so the
    # sampled token itself isn't guaranteed a surviving key)
    for tok, logp, top in zip(lp["tokens"], lp["token_logprobs"],
                              lp["top_logprobs"]):
        assert max(top.values()) <= logp + 1e-9


def test_chat_logprobs(server):
    """Chat logprobs: bool + top_logprobs, OpenAI content[] schema."""
    base, _ = server
    r = requests.post(base + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4, "temperature": 0.0,
        "logprobs": True, "top_logprobs": 2,
    })
    assert r.status_code == 200, r.text
    choice = r.json()["choices"][0]
    content = choice["logprobs"]["content"]
    assert len(content) > 0
    for e in content:
        assert e["logprob"] <= 0.0
        assert isinstance(e["bytes"], list)
        assert len(e["top_logprobs"]) == 2
    # default: no logprobs requested -> null field
    r2 = requests.post(base + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 2, "temperature": 0.0,
    })
    assert r2.json()["choices"][0]["logprobs"] is None


def test_n_choices(server):
    """OpenAI `n`: multiple sampled choices per request (seeded so the
    choices are distinct but reproducible)."""
    base, _ = server
    r = requests.post(base + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 6, "temperature": 1.2, "seed": 7, "n": 3,
    })
    assert r.status_code == 200, r.text
    d = r.json()
    assert [c["index"] for c in d["choices"]] == [0, 1, 2]
    assert d["usage"]["completion_tokens"] >= 3
    # n>1 + stream rejected
    r2 = requests.post(base + "/v1/completions", json={
        "prompt": "x", "n": 2, "stream": True,
    })
    assert r2.status_code == 400


def test_logit_bias(server):
    """OpenAI logit_bias: +100 on one token forces greedy decode to it."""
    base, _ = server
    r = requests.post(base + "/v1/completions", json={
        "prompt": "x", "max_tokens": 3, "temperature": 0.0,
        "logit_bias": {"42": 100.0}, "logprobs": 0,
    })
    assert r.status_code == 200, r.text
    # the forced token dominates every step (sampler applies the bias
    # before argmax); verify via the returned per-token logprobs ids
    d = r.json()["choices"][0]
    assert len(d["logprobs"]["tokens"]) == 3
    # greedy + 100-bias: all sampled tokens are id 42's text
    toks = set(d["logprobs"]["tokens"])
    assert len(toks) == 1


def test_serve_encoder_only_model(tmp_path):
    """Embeddings-only serving: an encoder-only model loads, serves
    /v1/embeddings, and generation endpoints return a clear 400."""
    import asyncio

    from aiohttp import web

    from llama_gguf_tpu.utils.synthetic import build_synthetic_t5

    path = str(tmp_path / "t5enc.gguf")
    build_synthetic_t5(path, decoder=False)
    cfg = ServerConfig(model_path=path, port=_free_port(), max_batch=2,
                       weight_mode="dequant", warmup=False)
    state = ServerState(cfg)
    app = create_app(state)
    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)

    async def start():
        await runner.setup()
        site = web.TCPSite(runner, cfg.host, cfg.port)
        await site.start()

    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(start(), loop).result(timeout=60)
    base = f"http://{cfg.host}:{cfg.port}"
    try:
        for _ in range(50):
            try:
                if requests.get(base + "/health", timeout=2).json()[
                        "status"] == "ok":
                    break
            except requests.ConnectionError:
                time.sleep(0.1)
        r = requests.post(base + "/v1/embeddings", json={"input": "hello"})
        assert r.status_code == 200, r.text
        assert len(r.json()["data"][0]["embedding"]) == 64
        r2 = requests.post(base + "/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}]})
        assert r2.status_code == 400
        assert "generation" in r2.json()["error"]["message"]
    finally:
        asyncio.run_coroutine_threadsafe(runner.cleanup(), loop).result(
            timeout=10)
        loop.call_soon_threadsafe(loop.stop)
        state.shutdown()


def test_logit_bias_invalid_is_400(server):
    base, _ = server
    r = requests.post(base + "/v1/completions", json={
        "prompt": "x", "max_tokens": 2, "logit_bias": {"abc": "high"},
    })
    assert r.status_code == 400


def test_metrics_endpoint(server):
    """Prometheus /metrics (llama-server analogue)."""
    base, _ = server
    r = requests.get(base + "/metrics")
    assert r.status_code == 200
    assert r.headers["Content-Type"].startswith("text/plain")
    body = r.text
    assert "llamagguf_requests_completed_total" in body
    assert "# TYPE llamagguf_requests_active gauge" in body
    assert "llamagguf_model_loaded 1" in body


def test_props_and_echo(server):
    base, _ = server
    p = requests.get(base + "/props").json()
    assert p["arch"] == "qwen2" and p["n_embd"] == 64
    assert p["supports_generation"] is True
    body = {"prompt": "Once", "max_tokens": 4, "temperature": 0.0}
    plain = requests.post(base + "/v1/completions", json=body).json()
    echoed = requests.post(base + "/v1/completions",
                           json={**body, "echo": True}).json()
    assert echoed["choices"][0]["text"] == "Once" + plain["choices"][0]["text"]
