"""Command-line interface.

Parity target: /root/reference/src/main.rs:28-321 — subcommands
{info, run, chat, serve, quantize, sysinfo, bench, embed, download, models,
rag, init-config, manpages}. The reference's `shard`/`cluster` gRPC
subcommands are replaced by mesh flags on run/serve (multi-host is
`jax.distributed`, SURVEY.md §2.4); `hailo-info` is intentionally dropped.
Precedence for every option: CLI flag > LLAMA_GGUF_* env > TOML config.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

from .config import Config, example_config

log = logging.getLogger(__name__)


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", help="TOML config file path")
    p.add_argument("-v", "--verbose", action="store_true")


def _add_gen_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("-n", "--max-tokens", type=int, default=None)
    p.add_argument("-t", "--temperature", type=float, default=None)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--min-p", type=float, default=None)
    p.add_argument("--repeat-penalty", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--stop", action="append", default=None)
    p.add_argument("--grammar", help="GBNF grammar file for constrained output")
    p.add_argument("--json", dest="json_mode", action="store_true",
                   help="constrain output to valid JSON")
    p.add_argument("--json-schema", help="JSON schema (inline or @file)")


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", nargs="?", help="path to .gguf model")
    p.add_argument("--ctx", type=int, default=None, help="max context length")
    p.add_argument("--weight-mode", choices=["quant", "dequant"], default=None)
    p.add_argument("--kv-cache-type", default=None,
                   choices=["f32", "bf16", "i8", "f8_e4m3", "f8_e5m2",
                            "tq2", "tq3", "tq4", "qjl"])
    p.add_argument("--context-shift", action="store_true",
                   help="generate past the window by sliding the KV cache")
    p.add_argument("--lora", default=None,
                   help="GGUF LoRA adapter to apply at load")
    p.add_argument("--lora-scale", type=float, default=None,
                   help="override the adapter's alpha/rank scaling")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel mesh axis (0 = auto-fit HBM)")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel mesh axis")
    p.add_argument("--prompt-cache", default=None, metavar="FILE",
                   help="session file: load cached KV prefixes at start, "
                        "save back after generation (llama.cpp parity)")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="llama-gguf-tpu",
        description="TPU-native GGUF LLM inference engine (JAX/XLA/Pallas).",
    )
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("info", help="show GGUF metadata and tensor inventory")
    p.add_argument("model")
    p.add_argument("--tensors", action="store_true", help="list all tensors")
    p.add_argument("--json", dest="json_out", action="store_true")
    _add_common(p)

    p = sub.add_parser("run", help="generate text from a prompt")
    _add_model_flags(p)
    p.add_argument("-p", "--prompt", default=None)
    p.add_argument("--no-stream", action="store_true")
    p.add_argument("--draft", default=None,
                   help="draft model gguf for speculative decoding")
    p.add_argument("--self-speculative", type=int, default=None,
                   metavar="N", help="early-exit self-draft after N layers")
    p.add_argument("--num-draft", type=int, default=4,
                   help="draft tokens per speculative round")
    p.add_argument("--prompt-lookup", type=int, default=None, metavar="N",
                   help="draft-free n-gram speculation, N tokens per round")
    _add_gen_flags(p)
    _add_common(p)

    p = sub.add_parser("chat", help="interactive chat")
    _add_model_flags(p)
    p.add_argument("--system", default=None, help="system prompt")
    p.add_argument("--template", default=None,
                   choices=["chatml", "llama2", "llama3", "gemma", "phi",
                            "plain"], help="override chat template style")
    _add_gen_flags(p)
    _add_common(p)

    p = sub.add_parser("serve", help="OpenAI-compatible HTTP server")
    _add_model_flags(p)
    p.add_argument("--host", default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--max-batch", type=int, default=None)
    p.add_argument("--max-queue", type=int, default=None)
    p.add_argument("--api-key", action="append", default=None)
    p.add_argument("--rag-db", default=None,
                   help="sqlite path enabling /v1/rag/* endpoints")
    _add_common(p)

    p = sub.add_parser("quantize", help="requantize a GGUF model")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("-t", "--type", default=None,
                   help="target type (q4_k, q6_k, q8_0, ...)")
    p.add_argument("--all-tensors", action="store_true",
                   help="also requantize embeddings/output")
    p.add_argument("--min-elements", type=int, default=None)
    _add_common(p)

    p = sub.add_parser("tokenize",
                       help="tokenize text / detokenize ids (debugging)")
    p.add_argument("model", help="path to .gguf model")
    p.add_argument("-p", "--prompt", default=None,
                   help="text to tokenize (default: stdin)")
    p.add_argument("--ids", default=None,
                   help="comma-separated ids to DEtokenize instead")
    p.add_argument("--no-bos", action="store_true",
                   help="do not add the BOS token")
    _add_common(p)

    p = sub.add_parser("sysinfo", help="show JAX devices / TPU topology")
    _add_common(p)

    p = sub.add_parser("bench", help="benchmark prefill/decode throughput")
    _add_model_flags(p)
    p.add_argument("--prompt-tokens", type=int, default=None)
    p.add_argument("--gen-tokens", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--json", dest="json_out", action="store_true")
    p.add_argument("--profile", nargs="?", const="/tmp/llama_gguf_tpu_profile",
                   default=None, help="write a jax.profiler trace to DIR")
    _add_common(p)

    p = sub.add_parser("perplexity", help="perplexity over a text file")
    _add_model_flags(p)
    p.add_argument("-f", "--file", required=True, help="input text file")
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--json", dest="json_out", action="store_true")
    _add_common(p)

    p = sub.add_parser("embed", help="compute text embeddings")
    _add_model_flags(p)
    p.add_argument("-p", "--text", action="append", required=True)
    p.add_argument("--pooling", default=None,
                   choices=["mean", "last", "first", "max"])
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument("--json", dest="json_out", action="store_true")
    _add_common(p)

    p = sub.add_parser("download", help="download a GGUF from HuggingFace Hub")
    p.add_argument("repo_id", help="e.g. Qwen/Qwen2.5-0.5B-Instruct-GGUF")
    p.add_argument("filename", nargs="?", help="file within the repo")
    p.add_argument("--list", action="store_true", dest="list_files",
                   help="list GGUF files in the repo")
    p.add_argument("--dir", default=None, help="download directory")
    _add_common(p)

    p = sub.add_parser("models", help="list locally cached/downloaded models")
    p.add_argument("--dir", default=None)
    _add_common(p)

    p = sub.add_parser("rag", help="RAG knowledge-base operations")
    rag_sub = p.add_subparsers(dest="rag_command", required=True)
    for name, help_ in (("ingest", "ingest documents"),
                        ("search", "search the knowledge base"),
                        ("ask", "retrieve-and-generate with citations")):
        rp = rag_sub.add_parser(name, help=help_)
        rp.add_argument("--db", default=None,
                        help="sqlite database path (default: [rag].db)")
        rp.add_argument("--model", help="embedding model gguf", default=None)
        if name == "ingest":
            rp.add_argument("paths", nargs="+")
            rp.add_argument("--chunker", default=None,
                            choices=["recursive", "markdown", "sliding",
                                     "sentence", "paragraph"])
        else:
            rp.add_argument("query")
            rp.add_argument("-k", type=int, default=None)
            rp.add_argument("--search", default=None,
                            choices=["semantic", "keyword", "hybrid"])
        _add_common(rp)

    p = sub.add_parser("init-config", help="write an example config file")
    p.add_argument("path", nargs="?", default="llama-gguf.toml")
    _add_common(p)

    p = sub.add_parser("manpages", help="generate man pages")
    p.add_argument("--dir", default="man")
    _add_common(p)

    p = sub.add_parser(
        "shard", help="join a multi-host cluster and serve SPMD "
        "(reference: gRPC shard node; here every process runs the same "
        "sharded program)")
    p.add_argument("model", nargs="?", help="GGUF model path")
    p.add_argument("--coordinator", required=True,
                   help="coordinator address host:port")
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--tp", type=int, default=0,
                   help="model-axis size (0 = all devices)")
    p.add_argument("--dp", type=int, default=1, help="data-axis size")
    p.add_argument("--prompt", default=None,
                   help="leader-only: generate for this prompt then stop")
    p.add_argument("-n", "--max-tokens", type=int, default=32)
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu) before cluster init")
    _add_common(p)

    p = sub.add_parser(
        "cluster", help="show distributed cluster topology/status")
    p.add_argument("--cluster-config", default=None,
                   help="cluster TOML file")
    p.add_argument("--model-bytes", type=int, default=0,
                   help="planned model size for auto mesh sizing")
    _add_common(p)

    return ap


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _load_config(args) -> Config:
    return Config.load(getattr(args, "config", None))


def _engine_config(cfg: Config, args):
    from .engine.engine import EngineConfig

    return EngineConfig(
        max_context_len=getattr(args, "ctx", None) or cfg.model.max_context_len,
        weight_mode=getattr(args, "weight_mode", None) or cfg.model.weight_mode,
        kv_format=getattr(args, "kv_cache_type", None) or cfg.model.kv_cache_type,
        matmul_precision=cfg.model.matmul_precision,
        chat_template=getattr(args, "template", None) or cfg.chat.template,
        context_shift=getattr(args, "context_shift", False),
        lora=getattr(args, "lora", None) or cfg.model.lora,
        lora_scale=getattr(args, "lora_scale", None),
        seed=getattr(args, "seed", None) or cfg.generation.seed,
        prompt_cache_file=getattr(args, "prompt_cache", None),
        mesh_model=(getattr(args, "tp", None)
                    if getattr(args, "tp", None) is not None
                    else cfg.parallel.model),
        mesh_data=(getattr(args, "dp", None)
                   if getattr(args, "dp", None) is not None
                   else cfg.parallel.data),
    )


def _sampler_config(cfg: Config, args):
    from .sampling.sampler import SamplerConfig

    g = cfg.generation

    def pick(flag, default):
        v = getattr(args, flag, None)
        return v if v is not None else default

    return SamplerConfig(
        temperature=pick("temperature", g.temperature),
        top_k=pick("top_k", g.top_k),
        top_p=pick("top_p", g.top_p),
        min_p=pick("min_p", g.min_p),
        repetition_penalty=pick("repeat_penalty", g.repetition_penalty),
        frequency_penalty=g.frequency_penalty,
        presence_penalty=g.presence_penalty,
        mirostat=g.mirostat, mirostat_tau=g.mirostat_tau,
        mirostat_eta=g.mirostat_eta,
        seed=pick("seed", g.seed),
    )


def _model_path(cfg: Config, args) -> str:
    path = getattr(args, "model", None) or cfg.model.path
    if not path:
        sys.exit("error: no model path (pass MODEL or set [model].path)")
    if not os.path.exists(path):
        sys.exit(f"error: model not found: {path}")
    return path


def _make_grammar(engine, args):
    if getattr(args, "grammar", None):
        from .sampling.grammar import gbnf_grammar

        with open(args.grammar) as f:
            return engine.make_grammar_sampler(gbnf_grammar(f.read()))
    if getattr(args, "json_schema", None):
        from .sampling.grammar import json_grammar

        raw = args.json_schema
        if raw.startswith("@"):
            with open(raw[1:]) as f:
                raw = f.read()
        return engine.make_grammar_sampler(json_grammar(json.loads(raw)))
    if getattr(args, "json_mode", False):
        from .sampling.grammar import json_grammar

        return engine.make_grammar_sampler(json_grammar())
    return None


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------


def cmd_info(args) -> int:
    from .gguf.reader import GGUFFile

    g = GGUFFile.open(args.model)
    try:
        by_type: dict[str, int] = {}
        total_bytes = 0
        for info in g.tensors.values():
            by_type[info.ggml_type.name] = by_type.get(info.ggml_type.name, 0) + 1
            total_bytes += info.nbytes
        # IQ1_S/IQ1_M decode to zeros here (the iq1s grid codebook is not
        # obtainable offline) — a loadable-but-garbage file must be flagged
        iq1_types = sorted(t for t in by_type if t in ("IQ1_S", "IQ1_M"))
        if args.json_out:
            meta = {k: (v.tolist() if hasattr(v, "tolist") else v)
                    for k, v in g.metadata.items()
                    if not k.startswith("tokenizer.")}
            out = {
                "path": args.model, "version": g.version,
                "tensor_count": len(g.tensors), "data_bytes": total_bytes,
                "types": by_type, "metadata": meta,
            }
            if iq1_types:
                out["warnings"] = [
                    f"{t} tensors decode to ZEROS (iq1 grid unavailable); "
                    "generation from this file will be garbage"
                    for t in iq1_types]
            print(json.dumps(out, default=str))
            return 0
        print(f"GGUF v{g.version}  {args.model}")
        if iq1_types:
            print(f"  WARNING      : {'/'.join(iq1_types)} tensors decode "
                  "to ZEROS (iq1 grid unavailable) — generation from this "
                  "file will be garbage")
        arch = g.metadata.get("general.architecture", "?")
        print(f"  architecture : {arch}")
        for key in ("general.name", f"{arch}.block_count",
                    f"{arch}.embedding_length", f"{arch}.attention.head_count",
                    f"{arch}.attention.head_count_kv", f"{arch}.context_length",
                    f"{arch}.feed_forward_length", "general.file_type"):
            if key in g.metadata:
                print(f"  {key.split('.', 1)[1]:<28}: {g.metadata[key]}")
        print(f"  tensors      : {len(g.tensors)} "
              f"({total_bytes / 1e6:.1f} MB) {by_type}")
        if args.tensors:
            for name in g.tensor_order:
                info = g.tensors[name]
                print(f"  {name:<48} {info.ggml_type.name:<8} "
                      f"{list(info.shape)}")
        return 0
    finally:
        g.close()


def cmd_run(args) -> int:
    cfg = _load_config(args)
    from .engine.engine import Engine

    engine = Engine.load(_model_path(cfg, args), _engine_config(cfg, args))
    prompt = args.prompt if args.prompt is not None else sys.stdin.read()
    sampler = _sampler_config(cfg, args)
    grammar = _make_grammar(engine, args)
    max_tokens = args.max_tokens or cfg.generation.max_tokens
    stop = args.stop if args.stop is not None else cfg.generation.stop

    if args.draft or args.self_speculative or args.prompt_lookup:
        return _run_speculative(cfg, args, engine, prompt, sampler,
                                max_tokens)
    if args.no_stream:
        print(engine.generate(prompt, max_tokens=max_tokens, sampler=sampler,
                              stop=stop, grammar=grammar))
    else:
        for piece in engine.generate_streaming(prompt, max_tokens=max_tokens,
                                               sampler=sampler, stop=stop,
                                               grammar=grammar):
            print(piece, end="", flush=True)
        print()
    s = engine.stats
    print(f"[prefill {s.prompt_tokens} tok @ {s.prefill_tps:.1f} tok/s | "
          f"decode {s.generated_tokens} tok @ {s.decode_tps:.1f} tok/s]",
          file=sys.stderr)
    if engine.save_prompt_cache():
        print(f"[prompt cache saved to {args.prompt_cache}]",
              file=sys.stderr)
    return 0


def _run_speculative(cfg, args, engine, prompt, sampler, max_tokens) -> int:
    """run --draft / --self-speculative path."""
    import time as _time

    from .engine.engine import Engine
    from .engine.speculative import PromptLookupDecoder, SpeculativeDecoder

    if args.prompt_lookup:
        dec = PromptLookupDecoder(engine.runner,
                                  num_draft=args.prompt_lookup)
    elif args.draft:
        draft_engine = Engine.load(args.draft, _engine_config(cfg, args))
        dec = SpeculativeDecoder(engine.runner, draft_engine.runner,
                                 num_draft=args.num_draft)
    else:
        dec = SpeculativeDecoder.self_speculative(
            engine.runner, exit_layer=args.self_speculative,
            num_draft=args.num_draft)
    ids = engine.tokenizer.encode(prompt)
    t0 = _time.time()
    if args.prompt_lookup and not sampler.is_greedy:
        print("warning: --prompt-lookup is greedy-only; sampling flags "
              "ignored", file=sys.stderr)
    if sampler.is_greedy or args.prompt_lookup:
        out = dec.generate_greedy(ids, max_tokens,
                                  is_eog=engine.tokenizer.is_eog)
    else:
        out = dec.generate_sampled(ids, max_tokens, sampler,
                                   seed=sampler.seed,
                                   is_eog=engine.tokenizer.is_eog)
    dt = _time.time() - t0
    print(engine.tokenizer.decode(out))
    s = dec.stats
    print(f"[speculative: {len(out)} tok @ {len(out) / dt:.1f} tok/s | "
          f"acceptance {s.acceptance_rate:.0%} | "
          f"{s.tokens_per_round:.2f} tok/round]", file=sys.stderr)
    return 0


def cmd_chat(args) -> int:
    cfg = _load_config(args)
    from .engine.engine import ChatEngine, Engine

    engine = Engine.load(_model_path(cfg, args), _engine_config(cfg, args))
    chat = ChatEngine(engine, system_prompt=args.system
                      or cfg.chat.system_prompt)
    sampler = _sampler_config(cfg, args)
    max_tokens = args.max_tokens or cfg.generation.max_tokens
    def bye() -> int:
        if engine.save_prompt_cache():
            print(f"[prompt cache saved to {args.prompt_cache}]",
                  file=sys.stderr)
        return 0

    print("(interactive chat — /exit to quit, /reset to clear)")
    while True:
        try:
            user = input("> ")
        except (EOFError, KeyboardInterrupt):
            print()
            return bye()
        if user.strip() in ("/exit", "/quit"):
            return bye()
        if user.strip() == "/reset":
            chat.reset()
            continue
        if not user.strip():
            continue
        for piece in chat.send_streaming(user, max_tokens=max_tokens,
                                         sampler=sampler):
            print(piece, end="", flush=True)
        print()


def cmd_serve(args) -> int:
    cfg = _load_config(args)
    from .server.app import ServerConfig, run_server

    run_server(ServerConfig(
        host=args.host or cfg.server.host,
        port=args.port or cfg.server.port,
        model_path=_model_path(cfg, args),
        max_batch=args.max_batch or cfg.server.max_batch,
        max_queue=args.max_queue or cfg.server.max_queue,
        max_tokens_default=cfg.generation.max_tokens,
        weight_mode=getattr(args, "weight_mode", None) or cfg.model.weight_mode,
        api_keys=args.api_key or cfg.server.api_keys,
        served_model_name=cfg.server.served_model_name,
        rag_db=args.rag_db,
        lora=getattr(args, "lora", None) or cfg.model.lora,
    ))
    return 0


def cmd_quantize(args) -> int:
    cfg = _load_config(args)
    from .gguf.constants import GGMLType
    from .gguf.requantize import QuantizeOptions, quantize_model

    tname = (args.type or cfg.quantize.type).upper()
    try:
        target = GGMLType[tname]
    except KeyError:
        sys.exit(f"error: unknown quant type {tname!r}")
    t0 = time.time()

    def progress(name, i, total):
        print(f"\r[{i}/{total}] {name[:60]:<60}", end="", flush=True)

    report = quantize_model(
        args.input, args.output,
        QuantizeOptions(
            target=target,
            weights_only=not args.all_tensors and cfg.quantize.weights_only,
            min_elements=args.min_elements or cfg.quantize.min_elements,
        ),
        progress=progress,
    )
    print(f"\n{report.converted} converted, {report.skipped} kept, "
          f"{report.fallback_f16} f16-fallback; "
          f"{report.in_bytes / 1e6:.1f} -> {report.out_bytes / 1e6:.1f} MB "
          f"in {time.time() - t0:.1f}s")
    return 0


def cmd_sysinfo(args) -> int:
    import jax

    print(f"jax {jax.__version__}")
    devices = jax.devices()
    print(f"default backend: {jax.default_backend()}")
    print(f"devices: {len(devices)} | processes: {jax.process_count()}")
    for d in devices:
        print(f"  [{d.id}] {d.platform} {d.device_kind} "
              f"(process {d.process_index})")
    try:
        stats = devices[0].memory_stats()
        if stats:
            lim = stats.get("bytes_limit", 0)
            used = stats.get("bytes_in_use", 0)
            print(f"memory: {used / 1e9:.2f} / {lim / 1e9:.2f} GB in use")
    except Exception:
        pass
    return 0


def cmd_bench(args) -> int:
    cfg = _load_config(args)
    import numpy as np

    from .engine.engine import Engine

    engine = Engine.load(_model_path(cfg, args), _engine_config(cfg, args))
    ptoks = args.prompt_tokens or cfg.bench.prompt_tokens
    gtoks = args.gen_tokens or cfg.bench.gen_tokens
    rng = np.random.default_rng(0)
    ids = rng.integers(0, engine.runner.cfg.vocab_size, size=ptoks).tolist()

    kv = engine.runner.init_kv()
    t0 = time.time()
    logits, kv, pos = engine.runner.prefill(ids, kv)
    np.asarray(logits)
    prefill_s = time.time() - t0

    import contextlib

    import jax.numpy as jnp

    first = jnp.argmax(logits)[None].astype(jnp.int32)
    # warm up decode compile before timing
    _, kv = engine.runner.greedy_decode(first, jnp.array([pos]), kv, steps=1)
    prof = contextlib.nullcontext()
    if args.profile:
        from .utils.debug import profile

        prof = profile(args.profile)
    with prof:
        t0 = time.time()
        toks, kv = engine.runner.greedy_decode(first, jnp.array([pos + 1]),
                                               kv, steps=gtoks)
        np.asarray(toks)
        decode_s = time.time() - t0
    result = {
        "prefill_tps": ptoks / prefill_s,
        "decode_tps": gtoks / decode_s,
        "prompt_tokens": ptoks, "gen_tokens": gtoks,
    }
    if args.json_out:
        print(json.dumps(result))
    else:
        print(f"prefill: {result['prefill_tps']:.1f} tok/s "
              f"({ptoks} tok in {prefill_s:.2f}s, incl. compile)")
        print(f"decode:  {result['decode_tps']:.1f} tok/s "
              f"({gtoks} tok in {decode_s:.2f}s)")
    return 0


def cmd_perplexity(args) -> int:
    cfg = _load_config(args)
    from .engine.engine import Engine
    from .engine.perplexity import perplexity

    engine = Engine.load(_model_path(cfg, args), _engine_config(cfg, args))
    with open(args.file, errors="replace") as f:
        text = f.read()
    ids = engine.tokenizer.encode(text)

    def progress(done, total, ppl):
        print(f"\r[{done}/{total}] ppl={ppl:.4f}   ", end="",
              file=sys.stderr, flush=True)

    result = perplexity(engine.runner, ids, chunk=args.chunk,
                        progress=progress)
    print(file=sys.stderr)
    if args.json_out:
        print(json.dumps({"ppl": result.ppl, "nll": result.nll,
                          "tokens": result.count}))
    else:
        print(f"perplexity: {result.ppl:.4f} over {result.count} tokens "
              f"(nll {result.nll:.4f})")
    return 0


def cmd_embed(args) -> int:
    cfg = _load_config(args)
    import numpy as np

    from .engine.engine import Engine

    engine = Engine.load(_model_path(cfg, args), _engine_config(cfg, args))
    pooling = args.pooling or cfg.embed.pooling
    normalize = not args.no_normalize and cfg.embed.normalize
    vecs = [engine.embed(t, pooling=pooling, normalize=normalize)
            for t in args.text]
    if args.json_out:
        print(json.dumps([np.asarray(v).tolist() for v in vecs]))
    else:
        for t, v in zip(args.text, vecs):
            v = np.asarray(v)
            print(f"{t[:40]!r}: dim={v.shape[0]} "
                  f"head={np.round(v[:6], 4).tolist()}")
        if len(vecs) == 2:
            from .models.embeddings import cosine_similarity

            print(f"cosine similarity: "
                  f"{cosine_similarity(vecs[0], vecs[1]):.4f}")
    return 0


def cmd_download(args) -> int:
    from .hub import HubClient

    client = HubClient(cache_dir=args.dir)
    if args.list_files or not args.filename:
        files = client.list_gguf_files(args.repo_id)
        for f in files:
            print(f)
        if not args.list_files and len(files) == 1:
            path = client.download(args.repo_id, files[0])
            print(path)
        return 0
    path = client.download(args.repo_id, args.filename)
    print(path)
    return 0


def cmd_models(args) -> int:
    from .hub import HubClient

    client = HubClient(cache_dir=args.dir)
    for path, size in client.list_local_models():
        print(f"{size / 1e6:10.1f} MB  {path}")
    return 0


def cmd_rag(args) -> int:
    from .rag.cli import run_rag_command

    return run_rag_command(args)


def cmd_init_config(args) -> int:
    if os.path.exists(args.path):
        sys.exit(f"error: {args.path} already exists")
    with open(args.path, "w") as f:
        f.write(example_config())
    print(f"wrote {args.path}")
    return 0


def cmd_manpages(args) -> int:
    from .manpages import write_manpages

    n = write_manpages(build_parser(), args.dir)
    print(f"wrote {n} man pages to {args.dir}/")
    return 0


def cmd_shard(args) -> int:
    """Join a jax.distributed cluster and run the SPMD serve loop
    (parity: reference `shard` command, src/main.rs:290-307, re-expressed:
    no weight streaming — every host loads its own shard of the GGUF)."""
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from .parallel.multihost import ClusterConfig, initialize_cluster
    from .parallel.service import serve_spmd

    info = initialize_cluster(ClusterConfig(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    ))
    print(f"[shard {args.process_id}/{args.num_processes}] cluster up: "
          f"{info}", file=sys.stderr)
    if not args.model:
        return 0

    from .engine.engine import Engine

    cfg = _load_config(args)
    ecfg = _engine_config(cfg, args)
    ecfg.mesh_model = args.tp or len(jax.devices()) // max(args.dp, 1)
    ecfg.mesh_data = args.dp
    engine = Engine.load(args.model, ecfg)

    leader = jax.process_index() == 0
    reqs = []
    if leader and args.prompt is not None:
        reqs = [(engine.tokenizer.encode(args.prompt), args.max_tokens)]
    outs = serve_spmd(
        engine.runner, engine.tokenizer, reqs,
        on_text=lambda txt: print(txt, flush=True))
    print(f"[shard {args.process_id}] served {len(outs)} request(s)",
          file=sys.stderr)
    return 0


def cmd_cluster(args) -> int:
    """Cluster status (parity: reference `cluster` command): topology from
    the TOML config / environment plus the auto-mesh plan."""
    import json

    from .parallel.multihost import ClusterConfig, auto_mesh

    cc = ClusterConfig.from_env()
    if args.cluster_config:
        import tomllib

        with open(args.cluster_config, "rb") as f:
            t = tomllib.load(f).get("cluster", {})
        cc = ClusterConfig(
            coordinator_address=t.get("coordinator_address",
                                      cc.coordinator_address),
            num_processes=t.get("num_processes", cc.num_processes),
            process_id=t.get("process_id", cc.process_id),
            data=t.get("data", 0), model=t.get("model", 0),
        )
    import jax

    out = {
        "coordinator": cc.coordinator_address,
        "num_processes": cc.num_processes,
        "local_devices": len(jax.local_devices()),
        "platform": jax.devices()[0].platform,
    }
    if args.model_bytes:
        data, model = auto_mesh(args.model_bytes)
        out["auto_mesh"] = {"data": data, "model": model}
    print(json.dumps(out, indent=2))
    return 0


def cmd_tokenize(args) -> int:
    """llama-tokenize analogue: ids + per-token pieces, or detokenize."""
    from .gguf.reader import GGUFFile
    from .tokenizer.gguf_tokenizer import Tokenizer

    tok = Tokenizer.from_gguf(GGUFFile.open(args.model).metadata)
    if args.ids is not None:
        ids = [int(x) for x in args.ids.replace(",", " ").split()]
        print(tok.decode(ids))
        return 0
    text = args.prompt if args.prompt is not None else sys.stdin.read()
    ids = tok.encode(text, add_bos=False if args.no_bos else None)
    for i in ids:
        print(f"{i:>8} -> {tok.decode([i])!r}")
    print(f"total: {len(ids)} tokens")
    return 0


COMMANDS = {
    "info": cmd_info, "run": cmd_run, "chat": cmd_chat, "serve": cmd_serve,
    "tokenize": cmd_tokenize,
    "quantize": cmd_quantize, "sysinfo": cmd_sysinfo, "bench": cmd_bench,
    "perplexity": cmd_perplexity, "embed": cmd_embed, "download": cmd_download, "models": cmd_models,
    "rag": cmd_rag, "init-config": cmd_init_config, "manpages": cmd_manpages,
    "shard": cmd_shard, "cluster": cmd_cluster,
}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if getattr(args, "verbose", False) else logging.INFO,
        format="%(levelname)s %(name)s: %(message)s",
    )
    try:
        return COMMANDS[args.command](args)
    except KeyboardInterrupt:
        return 130


if __name__ == "__main__":
    sys.exit(main())
