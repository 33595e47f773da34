"""OpenAI-compatible HTTP server (aiohttp) over the continuous-batching engine.

Parity target: /root/reference/src/server/ (api.rs:36 run_server,
handlers.rs:163-1306, types.rs:8-318): /v1/chat/completions (tools +
tool_choice + streaming), /v1/completions, /v1/embeddings, /v1/models,
/health, queue status, model hot-load + SIGHUP reload. Two deliberate
improvements over the reference:

  * requests share the BatchedEngine's batched decode step (the reference
    runs N independent sequential generations behind a semaphore,
    handlers.rs:58-97), and
  * streaming is TRUE token streaming over SSE — the reference generates the
    whole completion first and replays it as chunks (handlers.rs:352-361).

Tool calls are grammar-constrained: when tool_choice forces a call, decoding
runs under a JSON-schema grammar built from the tool's parameters, so the
arguments always parse.
"""

from __future__ import annotations

import asyncio
import json
import logging
import signal
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..engine.batched import BatchedEngine, RequestHandle
from ..engine.engine import Engine, EngineConfig
from ..sampling.sampler import SamplerConfig

log = logging.getLogger(__name__)

try:
    from aiohttp import web
except ImportError:  # pragma: no cover
    web = None


@dataclass
class ServerConfig:
    host: str = "127.0.0.1"
    port: int = 8080
    model_path: str | None = None
    max_batch: int = 8
    max_queue: int = 64
    max_tokens_default: int = 512
    weight_mode: str = "quant"
    api_keys: list[str] = field(default_factory=list)
    served_model_name: str | None = None
    rag_db: str | None = None  # sqlite path enabling /v1/rag/* endpoints
    prompt_cache_bytes: int = 0  # >0 enables prefix-sharing KV snapshots
    lora: str | None = None  # GGUF LoRA adapter applied at model load
    # pre-compile the common decode/prefill buckets at load time so the
    # FIRST request doesn't pay minutes of jit compile (measured 180 s on
    # TPU for a cold tiny model at the default "highest" matmul precision)
    warmup: bool = True


class ServerState:
    """Model + scheduler, swappable under a lock for hot reload
    (parity: AppState RwLocks + SIGHUP task, api.rs:92-105)."""

    def __init__(self, config: ServerConfig):
        self.config = config
        self.engine: Engine | None = None
        self.batched: BatchedEngine | None = None
        self.model_name = config.served_model_name or "unloaded"
        self.loaded_at = 0.0
        self.lock = threading.RLock()
        self.kb = None
        if config.rag_db:
            from ..rag.knowledge_base import KnowledgeBase
            from ..rag.sqlite_store import SqliteVectorStore

            self.kb = KnowledgeBase(SqliteVectorStore(config.rag_db))
        if config.model_path:
            self.load_model(config.model_path)
        if self.kb is not None and self.engine is not None:
            self.kb.engine = self.engine

    def load_model(self, path: str) -> None:
        cfg = EngineConfig(max_batch=self.config.max_batch,
                           weight_mode=self.config.weight_mode,
                           lora=self.config.lora)
        engine = Engine.load(path, cfg)
        batched = None
        if engine.runner is not None:
            pcache = None
            if self.config.prompt_cache_bytes > 0:
                from ..engine.prompt_cache import PromptCache

                pcache = PromptCache(max_bytes=self.config.prompt_cache_bytes)
            batched = BatchedEngine(engine.runner, engine.tokenizer,
                                    max_queue=self.config.max_queue,
                                    prompt_cache=pcache)
            if self.config.warmup:
                self._warmup(engine)
        # encoder-only / encoder-decoder models serve /v1/embeddings only;
        # generation endpoints return a clear 400 (llama-server has no
        # encoder-model serving at all)
        with self.lock:
            old = self.batched
            self.engine = engine
            self.batched = batched
            self.model_name = (self.config.served_model_name
                               or path.rsplit("/", 1)[-1])
            self.config.model_path = path
            self.loaded_at = time.time()
        if old is not None:
            old.shutdown(wait=False)
        log.info("model loaded: %s", self.model_name)

    @staticmethod
    def _warmup(engine: Engine) -> None:
        """Compile the smallest prefill bucket + the batched decode step
        before serving (they cover most first requests; larger prompt
        buckets still compile on demand). With the persistent compile
        cache this is fast on every start after the first."""
        import numpy as np

        t0 = time.time()
        try:
            runner = engine.runner
            kv = runner.init_kv()
            b = runner.max_batch
            toks = np.zeros((b, 8), np.int32)
            pos = np.full((b, 8), runner.max_seq, np.int32)
            pos[0, :2] = [0, 1]
            lengths = np.zeros((b,), np.int32)
            lengths[0] = 2
            from ..engine.runner import read_bucket

            logits, kv = runner.step(toks, pos, lengths, kv,
                                     read_bound=read_bucket(
                                         2, runner.max_seq),
                                     logit_positions=np.full(
                                         (b,), 1, np.int32))
            np.asarray(logits)
            toks1 = np.zeros((b, 1), np.int32)
            pos1 = np.full((b, 1), runner.max_seq, np.int32)
            pos1[0, 0] = 2
            lengths[0] = 3
            logits, kv = runner.step(toks1, pos1, lengths, kv,
                                     read_bound=read_bucket(
                                         3, runner.max_seq))
            np.asarray(logits)
            del kv
            log.info("warmup compiled in %.1fs", time.time() - t0)
        except Exception:
            log.exception("warmup failed (continuing)")

    def reload(self) -> None:
        if self.config.model_path:
            self.load_model(self.config.model_path)

    def shutdown(self) -> None:
        if self.batched is not None:
            self.batched.shutdown()


# ---------------------------------------------------------------------------
# request parsing helpers
# ---------------------------------------------------------------------------


def _sampler_from_request(body: dict) -> SamplerConfig:
    """Raises ValueError on malformed fields (handlers map it to 400)."""
    bias = body.get("logit_bias") or None
    if bias is not None:
        try:
            bias = {int(k): float(v) for k, v in bias.items()}
        except (TypeError, ValueError, AttributeError):
            raise ValueError(
                "logit_bias must map token ids to numeric biases")
    return SamplerConfig(
        logit_bias=bias,
        temperature=float(body.get("temperature", 0.8)),
        top_p=float(body.get("top_p", 0.95)),
        top_k=int(body.get("top_k", 40)),
        min_p=float(body.get("min_p", 0.0)),
        repetition_penalty=float(body.get("repetition_penalty", 1.1)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        seed=body.get("seed"),
    )


def _stop_list(body: dict) -> list[str]:
    stop = body.get("stop")
    if stop is None:
        return []
    return [stop] if isinstance(stop, str) else list(stop)


def _max_tokens(body: dict, default: int) -> int:
    return int(body.get("max_completion_tokens")
               or body.get("max_tokens") or default)


def _logprobs_arg(body: dict) -> int:
    """-1 = off. Chat style: logprobs: bool + top_logprobs: int.
    Legacy completions style: logprobs: int = top-N. Clamped to 20
    (the OpenAI chat maximum); invalid values are treated as off."""
    lp = body.get("logprobs")
    if lp is None or lp is False:
        return -1
    try:
        if lp is True:
            return min(max(int(body.get("top_logprobs", 0) or 0), 0), 20)
        return min(max(int(lp), 0), 20)
    except (TypeError, ValueError):
        return -1


def _chat_logprobs(handle: RequestHandle) -> dict | None:
    if not handle.logprobs:
        return None
    return {"content": [
        {"token": e["token"], "logprob": e["logprob"],
         "bytes": list(e["token"].encode("utf-8", "replace")),
         "top_logprobs": [
             {"token": t["token"], "logprob": t["logprob"],
              "bytes": list(t["token"].encode("utf-8", "replace"))}
             for t in e.get("top_logprobs", [])]}
        for e in handle.logprobs]}


def _completion_logprobs(handle: RequestHandle,
                         offset_base: int = 0) -> dict | None:
    """``offset_base``: with echo=true the returned text is prompt +
    completion, so text_offset must index past the prompt (OpenAI offsets
    index into the full returned text)."""
    if not handle.logprobs:
        return None
    has_top = any("top_logprobs" in e for e in handle.logprobs)
    offsets, pos = [], offset_base
    for e in handle.logprobs:  # parallel array: start offset of each token
        offsets.append(pos)
        pos += len(e["token"])
    return {
        "tokens": [e["token"] for e in handle.logprobs],
        "token_logprobs": [e["logprob"] for e in handle.logprobs],
        "top_logprobs": [
            {t["token"]: t["logprob"] for t in e.get("top_logprobs", [])}
            for e in handle.logprobs] if has_top else None,
        "text_offset": offsets,
    }


def _sampler_n(body: dict, i: int) -> SamplerConfig:
    """Per-choice sampler for n>1: distinct seeds so choices differ."""
    cfg = _sampler_from_request(body)
    if i and cfg.seed is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, seed=cfg.seed + i)
    return cfg


def _timings_sum(handles: list) -> dict:
    """Aggregate per-request timings for n>1: earliest first token, full
    window, total decode throughput across choices."""
    if len(handles) == 1:
        return handles[0].timings
    ts = [h.timings for h in handles]
    return {
        "time_to_first_token_s": min(t["time_to_first_token_s"] for t in ts),
        "total_s": max(t["total_s"] for t in ts),
        "tokens_per_s": round(sum(t["tokens_per_s"] for t in ts), 2),
    }


def _usage_sum(handles: list) -> dict:
    return {
        "prompt_tokens": handles[0].prompt_tokens,
        "completion_tokens": sum(h.completion_tokens for h in handles),
        "total_tokens": handles[0].prompt_tokens
        + sum(h.completion_tokens for h in handles),
    }


def _usage(handle: RequestHandle) -> dict:
    return {
        "prompt_tokens": handle.prompt_tokens,
        "completion_tokens": handle.completion_tokens,
        "total_tokens": handle.prompt_tokens + handle.completion_tokens,
    }


def _tool_call_grammar(tools: list[dict], tool_choice) -> dict | None:
    """Build a JSON schema that constrains output to a valid tool call."""
    names = [t["function"]["name"] for t in tools]
    if isinstance(tool_choice, dict):
        forced = tool_choice.get("function", {}).get("name")
        tools = [t for t in tools if t["function"]["name"] == forced] or tools
        names = [t["function"]["name"] for t in tools]
    variants = []
    for t in tools:
        fn = t["function"]
        variants.append({
            "type": "object",
            "properties": {
                "name": {"const": fn["name"]},
                "arguments": fn.get("parameters") or {"type": "object"},
            },
            "required": ["name", "arguments"],
        })
    return {"anyOf": variants} if len(variants) > 1 else variants[0]


def _parse_tool_output(text: str) -> list[dict] | None:
    try:
        d = json.loads(text)
        return [{
            "id": "call_" + uuid.uuid4().hex[:12],
            "type": "function",
            "function": {"name": d["name"],
                         "arguments": json.dumps(d["arguments"])},
        }]
    except Exception:
        return None


# ---------------------------------------------------------------------------
# async bridge: pump a blocking RequestHandle into an asyncio queue
# ---------------------------------------------------------------------------


async def _stream_pieces(handle: RequestHandle):
    """Async-iterate text pieces from a scheduler handle."""
    loop = asyncio.get_running_loop()
    q: asyncio.Queue = asyncio.Queue()

    def pump():
        try:
            for piece in handle.stream(timeout=600):
                loop.call_soon_threadsafe(q.put_nowait, ("piece", piece))
            loop.call_soon_threadsafe(q.put_nowait, ("done", None))
        except Exception as exc:  # pragma: no cover
            loop.call_soon_threadsafe(q.put_nowait, ("error", exc))

    threading.Thread(target=pump, daemon=True).start()
    while True:
        kind, payload = await q.get()
        if kind == "piece":
            yield payload
        elif kind == "error":
            raise payload
        else:
            return


# ---------------------------------------------------------------------------
# handlers
# ---------------------------------------------------------------------------


def _err(status: int, message: str, etype: str = "invalid_request_error"):
    return web.json_response(
        {"error": {"message": message, "type": etype}}, status=status
    )


def _check_auth(state: ServerState, request) -> bool:
    keys = state.config.api_keys
    if not keys:
        return True
    auth = request.headers.get("Authorization", "")
    return auth.removeprefix("Bearer ").strip() in keys


def create_app(state: ServerState) -> "web.Application":
    if web is None:  # pragma: no cover
        raise RuntimeError("aiohttp is not available")
    app = web.Application()
    app["state"] = state

    def require_model(handler):
        async def wrapped(request):
            st: ServerState = request.app["state"]
            if not _check_auth(st, request):
                return _err(401, "invalid API key", "authentication_error")
            if st.engine is None:
                return _err(503, "no model loaded", "service_unavailable")
            return await handler(request)
        return wrapped

    def require_generation(handler):
        async def wrapped(request):
            st: ServerState = request.app["state"]
            if st.engine is not None and st.batched is None:
                if getattr(st.engine, "t5", None) is not None:
                    # encoder-decoder models DO generate, just not through
                    # the server's batched scheduler
                    return _err(400, "generation for encoder-decoder models"
                                     " is only available via the CLI or the"
                                     " Engine API; this server exposes"
                                     " /v1/embeddings only")
                return _err(400, "this model does not support text "
                                 "generation; use /v1/embeddings")
            return await handler(request)
        return require_model(wrapped)

    # -- info -----------------------------------------------------------------

    async def health(request):
        st: ServerState = request.app["state"]
        return web.json_response({
            "status": "ok" if st.engine is not None else "no_model",
            "model": st.model_name,
        })

    async def models(request):
        st: ServerState = request.app["state"]
        data = []
        if st.batched is not None:
            data.append({"id": st.model_name, "object": "model",
                         "created": int(st.loaded_at),
                         "owned_by": "llama_gguf_tpu"})
        return web.json_response({"object": "list", "data": data})

    async def queue_status(request):
        st: ServerState = request.app["state"]
        b = st.batched
        return web.json_response({
            "active": b.active_count if b else 0,
            "queued": b.queued_count if b else 0,
            "max_batch": st.config.max_batch,
            "max_queue": st.config.max_queue,
            "stats": {
                "submitted": b.stats.submitted if b else 0,
                "completed": b.stats.completed if b else 0,
                "rejected": b.stats.rejected if b else 0,
                "decode_tokens": b.stats.decode_tokens if b else 0,
            },
        })

    async def props(request):
        """Model/server properties (llama-server /props analogue)."""
        st: ServerState = request.app["state"]
        cfg = None
        if st.engine is not None:
            r = st.engine.runner
            t5 = st.engine.t5
            cfg = (r.cfg if r is not None
                   else t5.cfg if t5 is not None
                   else st.engine.encoder.cfg
                   if st.engine.encoder is not None else None)
        return web.json_response({
            "model": st.model_name,
            "arch": cfg.arch if cfg else None,
            "n_ctx": (st.engine.runner.max_seq
                      if st.engine is not None and st.engine.runner
                      else (cfg.max_seq_len if cfg else 0)),
            "n_layers": cfg.num_layers if cfg else 0,
            "n_embd": cfg.hidden_size if cfg else 0,
            "n_vocab": cfg.vocab_size if cfg else 0,
            "max_batch": st.config.max_batch,
            "supports_generation": st.batched is not None,
            "loaded_at": st.loaded_at,
        })

    async def metrics(request):
        """Prometheus text exposition (llama-server /metrics analogue)."""
        st: ServerState = request.app["state"]
        b = st.batched
        s = b.stats if b else None
        lines = []

        def gauge(name, help_, value, kind="counter"):
            lines.append(f"# HELP {name} {help_}")
            lines.append(f"# TYPE {name} {kind}")
            lines.append(f"{name} {value}")

        gauge("llamagguf_requests_submitted_total",
              "Requests accepted by the scheduler",
              s.submitted if s else 0)
        gauge("llamagguf_requests_completed_total",
              "Requests finished (any reason)", s.completed if s else 0)
        gauge("llamagguf_requests_rejected_total",
              "Requests rejected by admission control",
              s.rejected if s else 0)
        gauge("llamagguf_tokens_decoded_total",
              "Tokens sampled across all requests",
              s.decode_tokens if s else 0)
        gauge("llamagguf_tokens_prefilled_total",
              "Prompt tokens written to the KV cache",
              s.prefill_tokens if s else 0)
        gauge("llamagguf_decode_steps_total",
              "Batched decode steps executed", s.decode_steps if s else 0)
        gauge("llamagguf_mixed_steps_total",
              "Steps carrying both prefill and decode rows",
              s.mixed_steps if s else 0)
        gauge("llamagguf_requests_active", "Requests currently decoding",
              b.active_count if b else 0, "gauge")
        gauge("llamagguf_requests_queued", "Requests waiting for a slot",
              b.queued_count if b else 0, "gauge")
        gauge("llamagguf_decode_tokens_per_second",
              "Pure-decode throughput since start",
              round(s.decode_tps, 3) if s else 0.0, "gauge")
        gauge("llamagguf_model_loaded",
              "1 when a model is serving", int(st.engine is not None),
              "gauge")
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain", charset="utf-8")

    # -- completions ------------------------------------------------------------

    @require_generation
    async def completions(request):
        st: ServerState = request.app["state"]
        try:
            body = await request.json()
        except Exception:
            return _err(400, "invalid JSON body")
        prompt = body.get("prompt")
        if prompt is None:
            return _err(400, "missing 'prompt'")
        if isinstance(prompt, list):
            prompt = "".join(prompt) if all(
                isinstance(p, str) for p in prompt) else prompt
        n = max(int(body.get("n", 1) or 1), 1)
        if n > 1 and body.get("stream"):
            return _err(400, "n > 1 is not supported with stream=true")
        handles = []
        try:
            for i in range(n):
                handles.append(st.batched.submit(
                    prompt,
                    max_tokens=_max_tokens(
                        body, st.config.max_tokens_default),
                    sampler=_sampler_n(body, i),
                    stop=_stop_list(body),
                    logprobs=_logprobs_arg(body),
                ))
        except ValueError as e:  # malformed sampler fields (logit_bias...)
            for h in handles:
                h.cancel()
            return _err(400, str(e))
        except RuntimeError as e:
            for h in handles:  # reap partially-admitted n>1 batches
                h.cancel()
            return _err(429, str(e), "rate_limit_exceeded")
        handle = handles[0]

        rid = "cmpl-" + uuid.uuid4().hex[:24]
        created = int(time.time())
        if body.get("stream"):
            return await _sse(request, _completion_chunks(
                st, rid, created, handle))
        texts = [await asyncio.to_thread(h.text, 600) for h in handles]
        echo_len = 0
        if body.get("echo") and isinstance(prompt, str):
            texts = [prompt + t for t in texts]
            echo_len = len(prompt)
        return web.json_response({
            "id": rid, "object": "text_completion", "created": created,
            "model": st.model_name,
            "choices": [{"index": i, "text": t,
                         "finish_reason": h.finish_reason,
                         "logprobs": _completion_logprobs(h, echo_len)}
                        for i, (t, h) in enumerate(zip(texts, handles))],
            "usage": _usage_sum(handles),
            "timings": _timings_sum(handles),
        })

    async def _completion_chunks(st, rid, created, handle):
        async for piece in _stream_pieces(handle):
            yield {
                "id": rid, "object": "text_completion", "created": created,
                "model": st.model_name,
                "choices": [{"index": 0, "text": piece,
                             "finish_reason": None, "logprobs": None}],
            }
        yield {
            "id": rid, "object": "text_completion", "created": created,
            "model": st.model_name,
            # token-level logprobs ride the FINAL chunk (pieces are
            # UTF-8-safe text fragments, not 1:1 with tokens)
            "choices": [{"index": 0, "text": "",
                         "finish_reason": handle.finish_reason,
                         "logprobs": _completion_logprobs(handle)}],
            "usage": _usage(handle),
        }

    # -- chat ---------------------------------------------------------------------

    @require_generation
    async def chat_completions(request):
        st: ServerState = request.app["state"]
        try:
            body = await request.json()
        except Exception:
            return _err(400, "invalid JSON body")
        messages = body.get("messages")
        if not messages:
            return _err(400, "missing 'messages'")

        tools = body.get("tools") or []
        tool_choice = body.get("tool_choice", "auto" if tools else "none")
        response_format = body.get("response_format") or {}

        prompt = st.engine.chat_template.render(messages, tools=tools or None)

        grammar = None
        gram_schema: Any = False  # False = no grammar; None = bare JSON
        forcing_tool = bool(tools) and tool_choice not in ("none", None) and (
            tool_choice == "required" or isinstance(tool_choice, dict)
        )
        if forcing_tool:
            gram_schema = _tool_call_grammar(tools, tool_choice)
        elif response_format.get("type") == "json_object":
            gram_schema = None
        elif response_format.get("type") == "json_schema":
            gram_schema = response_format.get("json_schema", {}).get(
                "schema", {})
        if gram_schema is not False:
            grammar = await asyncio.to_thread(_make_grammar, st, gram_schema)

        n = max(int(body.get("n", 1) or 1), 1)
        if n > 1 and body.get("stream"):
            return _err(400, "n > 1 is not supported with stream=true")
        handles = []
        try:
            for i in range(n):
                # grammar machines are stateful: each choice gets its own
                g = grammar if i == 0 else (
                    await asyncio.to_thread(_make_grammar, st, gram_schema)
                    if gram_schema is not False else None)
                handles.append(st.batched.submit(
                    prompt,
                    max_tokens=_max_tokens(
                        body, st.config.max_tokens_default),
                    sampler=_sampler_n(body, i),
                    stop=_stop_list(body)
                    + list(st.engine.chat_template.stop),
                    grammar=g,
                    logprobs=_logprobs_arg(body),
                ))
        except ValueError as e:  # malformed sampler fields (logit_bias...)
            for h in handles:
                h.cancel()
            return _err(400, str(e))
        except RuntimeError as e:
            for h in handles:  # reap partially-admitted n>1 batches
                h.cancel()
            return _err(429, str(e), "rate_limit_exceeded")
        handle = handles[0]

        rid = "chatcmpl-" + uuid.uuid4().hex[:24]
        created = int(time.time())
        if body.get("stream"):
            return await _sse(request, _chat_chunks(st, rid, created, handle))

        choices = []
        for i, h in enumerate(handles):
            text = await asyncio.to_thread(h.text, 600)
            message: dict[str, Any] = {"role": "assistant", "content": text}
            finish = h.finish_reason
            if forcing_tool:
                calls = _parse_tool_output(text)
                if calls:
                    message = {"role": "assistant", "content": None,
                               "tool_calls": calls}
                    finish = "tool_calls"
            choices.append({"index": i, "message": message,
                            "finish_reason": finish,
                            "logprobs": _chat_logprobs(h)})
        return web.json_response({
            "id": rid, "object": "chat.completion", "created": created,
            "model": st.model_name,
            "choices": choices,
            "usage": _usage_sum(handles),
            "timings": _timings_sum(handles),
        })

    async def _chat_chunks(st, rid, created, handle):
        yield {
            "id": rid, "object": "chat.completion.chunk", "created": created,
            "model": st.model_name,
            "choices": [{"index": 0, "delta": {"role": "assistant",
                                               "content": ""},
                         "finish_reason": None}],
        }
        async for piece in _stream_pieces(handle):
            yield {
                "id": rid, "object": "chat.completion.chunk",
                "created": created, "model": st.model_name,
                "choices": [{"index": 0, "delta": {"content": piece},
                             "finish_reason": None}],
            }
        yield {
            "id": rid, "object": "chat.completion.chunk", "created": created,
            "model": st.model_name,
            # token-level logprobs ride the FINAL chunk (see completions)
            "choices": [{"index": 0, "delta": {},
                         "finish_reason": handle.finish_reason,
                         "logprobs": _chat_logprobs(handle)}],
            "usage": _usage(handle),
        }

    # -- embeddings ------------------------------------------------------------

    @require_model
    async def embeddings(request):
        st: ServerState = request.app["state"]
        try:
            body = await request.json()
        except Exception:
            return _err(400, "invalid JSON body")
        inputs = body.get("input")
        if inputs is None:
            return _err(400, "missing 'input'")
        if isinstance(inputs, str):
            inputs = [inputs]

        def run():
            out = []
            for i, text in enumerate(inputs):
                vec = st.engine.embed(text)
                out.append({"object": "embedding", "index": i,
                            "embedding": np.asarray(vec, np.float32).tolist()})
            return out

        data = await asyncio.to_thread(run)
        total = sum(len(st.engine.tokenizer.encode(t)) for t in inputs)
        return web.json_response({
            "object": "list", "data": data, "model": st.model_name,
            "usage": {"prompt_tokens": total, "total_tokens": total},
        })

    # -- admin -------------------------------------------------------------------

    async def load_model(request):
        st: ServerState = request.app["state"]
        if not _check_auth(st, request):
            return _err(401, "invalid API key", "authentication_error")
        try:
            body = await request.json()
            path = body["model_path"]
        except Exception:
            return _err(400, "missing 'model_path'")
        try:
            await asyncio.to_thread(st.load_model, path)
        except Exception as e:
            return _err(500, f"load failed: {e}", "server_error")
        return web.json_response({"status": "loaded", "model": st.model_name})

    # -- RAG (enabled when ServerConfig.rag_db set; parity:
    # reference handlers.rs:943-1306) ------------------------------------------

    def require_kb(handler):
        async def wrapped(request):
            st: ServerState = request.app["state"]
            if not _check_auth(st, request):
                return _err(401, "invalid API key", "authentication_error")
            if st.kb is None:
                return _err(503, "RAG not enabled (set rag_db)",
                            "service_unavailable")
            return await handler(request)
        return wrapped

    @require_kb
    async def rag_ingest(request):
        st: ServerState = request.app["state"]
        try:
            body = await request.json()
            text = body["text"]
        except Exception:
            return _err(400, "missing 'text'")
        n = await asyncio.to_thread(
            st.kb.ingest_text, text, body.get("source", ""),
            body.get("doc_id"), body.get("chunker"), body.get("metadata"))
        return web.json_response({"chunks": n,
                                  "skipped": n == 0})

    @require_kb
    async def rag_search(request):
        st: ServerState = request.app["state"]
        try:
            body = await request.json()
            query = body["query"]
        except Exception:
            return _err(400, "missing 'query'")
        hits = await asyncio.to_thread(
            st.kb.retrieve, query, int(body.get("k", 5)),
            body.get("search", "hybrid"), body.get("filters"))
        return web.json_response({"results": [
            {"text": h.text, "score": h.score, "source": h.source,
             "doc_id": h.doc_id, "chunk_index": h.chunk_index,
             "metadata": h.metadata} for h in hits]})

    @require_kb
    async def rag_query(request):
        st: ServerState = request.app["state"]
        try:
            body = await request.json()
            query = body["query"]
        except Exception:
            return _err(400, "missing 'query'")
        result = await asyncio.to_thread(
            st.kb.retrieve_and_generate, query, int(body.get("k", 5)),
            body.get("search", "hybrid"), body.get("filters"),
            int(body.get("max_tokens", 256)))
        return web.json_response({
            "answer": result.answer,
            "citations": [{"index": c.index, "source": c.source,
                           "doc_id": c.doc_id, "score": c.score}
                          for c in result.citations]})

    app.router.add_post("/v1/rag/ingest", rag_ingest)
    app.router.add_post("/v1/rag/search", rag_search)
    app.router.add_post("/v1/rag/query", rag_query)
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/props", props)
    app.router.add_get("/v1/models", models)
    app.router.add_get("/v1/queue", queue_status)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_post("/v1/embeddings", embeddings)
    app.router.add_post("/v1/internal/load_model", load_model)
    return app


def _make_grammar(st: ServerState, schema: dict | None):
    from ..sampling.grammar import json_grammar
    return st.engine.make_grammar_sampler(json_grammar(schema))


async def _sse(request, chunks) -> "web.StreamResponse":
    """Server-sent events response: one `data:` frame per chunk + [DONE]."""
    resp = web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
        "Connection": "keep-alive",
    })
    await resp.prepare(request)
    try:
        async for chunk in chunks:
            await resp.write(
                b"data: " + json.dumps(chunk).encode() + b"\n\n"
            )
        await resp.write(b"data: [DONE]\n\n")
    except (ConnectionResetError, asyncio.CancelledError):
        pass
    await resp.write_eof()
    return resp


def run_server(config: ServerConfig) -> None:
    """Blocking entry point (parity: run_server, api.rs:36). SIGHUP reloads
    the model in place (api.rs:105)."""
    state = ServerState(config)
    app = create_app(state)

    try:
        loop = asyncio.new_event_loop()
        loop.add_signal_handler(
            signal.SIGHUP,
            lambda: threading.Thread(target=state.reload, daemon=True).start(),
        )
        asyncio.set_event_loop(loop)
    except (NotImplementedError, RuntimeError):  # pragma: no cover
        loop = None

    log.info("serving on http://%s:%d", config.host, config.port)
    # handle_signals only works on the main thread; allow run_server to be
    # hosted in a background thread (examples/serve_and_query.py, tests)
    on_main = threading.current_thread() is threading.main_thread()
    web.run_app(app, host=config.host, port=config.port,
                loop=loop, print=None, handle_signals=on_main)
