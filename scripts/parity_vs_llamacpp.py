#!/usr/bin/env python
"""llama.cpp parity runbook: one command, one pass/fail verdict.

Given any real GGUF plus a llama.cpp installation (either the
`llama-cli`/`llama-perplexity` binaries or the `llama_cpp` Python package),
runs the BASELINE.md parity gates:

  1. greedy-match   — N greedy tokens from the same prompt must match
                      exactly (BASELINE: "exact match on the logit-
                      comparison harness").
  2. logits-diff    — last-position logits RMS/max-abs diff (llama_cpp
                      package only; mirrors the reference's hidden-state
                      diffing, tests/hidden_state_test.rs:15-28).
  3. delta-ppl      — chunked perplexity on a text file, ours vs
                      llama-perplexity (BASELINE: dppl <= reference).

Usage:
  python scripts/parity_vs_llamacpp.py MODEL.gguf \
      [--llama-cpp-bin DIR] [--prompt TEXT] [-n N] \
      [--ppl-text FILE] [--ppl-chunk 512] [--ppl-tolerance 0.02]

Emits a human table on stderr and ONE JSON verdict line on stdout:
  {"greedy_match": true, "match_len": 64, "delta_ppl": 0.003, ...,
   "verdict": "PASS"}

Methodology matches /root/reference/scripts/compare_with_llama_cpp.py
(greedy + logits inspection) and tests/hidden_state_test.rs.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------


def load_ours(model: str, max_ctx: int):
    from llama_gguf_tpu.engine.engine import Engine, EngineConfig

    # "highest" matmul precision is the llama.cpp-parity mode (f32-accurate
    # MXU passes); quant mode exercises the fused kernels on TPU
    import jax

    platform = jax.devices()[0].platform
    mode = "quant" if platform in ("tpu", "axon") else "dequant"
    return Engine.load(model, EngineConfig(
        weight_mode=mode, matmul_precision="highest",
        max_context_len=max_ctx))


def ours_greedy(engine, prompt: str, n: int) -> list[int]:
    ids = engine.tokenizer.encode(prompt)
    return engine.greedy_tokens(ids, n)


def ours_last_logits(engine, prompt: str) -> np.ndarray:
    import jax.numpy as jnp

    ids = engine.tokenizer.encode(prompt)
    kv = engine.runner.init_kv()
    logits, _, _ = engine.runner.prefill(ids, kv)
    return np.asarray(logits, np.float32)


def ours_ppl(engine, text: str, chunk: int) -> float:
    from llama_gguf_tpu.engine.perplexity import perplexity

    ids = engine.tokenizer.encode(text)
    return perplexity(engine.runner, ids, chunk=chunk).ppl


# ---------------------------------------------------------------------------
# llama.cpp side (two backends)
# ---------------------------------------------------------------------------


class LlamaCppPackage:
    """llama_cpp (llama-cpp-python) backend — supports logits diffing."""

    def __init__(self, model: str, max_ctx: int):
        from llama_cpp import Llama

        self.llm = Llama(model_path=model, n_ctx=max_ctx, n_batch=max_ctx,
                         logits_all=True, verbose=False)

    def greedy(self, prompt: str, n: int) -> list[int]:
        toks = self.llm.tokenize(prompt.encode(), add_bos=True)
        out = []
        self.llm.reset()
        self.llm.eval(toks)
        for _ in range(n):
            logits = np.asarray(self.llm.scores[self.llm.n_tokens - 1])
            tok = int(np.argmax(logits))
            out.append(tok)
            self.llm.eval([tok])
        return out

    def last_logits(self, prompt: str) -> np.ndarray:
        toks = self.llm.tokenize(prompt.encode(), add_bos=True)
        self.llm.reset()
        self.llm.eval(toks)
        return np.asarray(self.llm.scores[self.llm.n_tokens - 1], np.float32)

    def ppl(self, text: str, chunk: int) -> float | None:
        return None  # use the binary for ppl


class SelfBackend:
    """Mirrors our own engine through the backend interface.

    `--backend self` runs the ENTIRE runbook pipeline (tokenize, greedy,
    logits diff, delta-ppl, verdict JSON) against ourselves on a synthetic
    GGUF — a CI gate that the harness itself can't rot while no real
    llama.cpp / real model is available in this environment. A real parity
    run replaces it the moment one is."""

    def __init__(self, engine):
        self.engine = engine

    def greedy(self, prompt: str, n: int) -> list[int]:
        return ours_greedy(self.engine, prompt, n)

    def last_logits(self, prompt: str) -> np.ndarray:
        return ours_last_logits(self.engine, prompt)

    def ppl(self, text_file: str, chunk: int) -> float:
        return ours_ppl(self.engine, open(text_file,
                                          errors="replace").read(), chunk)


class LlamaCppBinary:
    """llama.cpp binaries backend (llama-cli / llama-perplexity)."""

    def __init__(self, model: str, bin_dir: str | None, max_ctx: int):
        self.model = model
        self.max_ctx = max_ctx
        self.cli = self._find("llama-cli", bin_dir)
        self.ppl_bin = self._find("llama-perplexity", bin_dir)

    @staticmethod
    def _find(name: str, bin_dir: str | None) -> str | None:
        if bin_dir:
            p = os.path.join(bin_dir, name)
            return p if os.path.exists(p) else None
        return shutil.which(name)

    def greedy(self, prompt: str, n: int) -> list[int] | None:
        if not self.cli:
            return None
        # emit token ids, one per line, greedy sampling
        out = subprocess.run(
            [self.cli, "-m", self.model, "-p", prompt, "-n", str(n),
             "--temp", "0", "--top-k", "1", "--seed", "1",
             "-c", str(self.max_ctx), "--no-display-prompt",
             "--log-disable"],
            capture_output=True, text=True, timeout=1800)
        if out.returncode != 0:
            return None
        # llama-cli prints text; re-tokenize is lossy, so compare TEXT
        return out.stdout  # caller detects str => text comparison

    def last_logits(self, prompt: str):
        return None

    def ppl(self, text_file: str, chunk: int) -> float | None:
        if not self.ppl_bin:
            return None
        out = subprocess.run(
            [self.ppl_bin, "-m", self.model, "-f", text_file,
             "-c", str(chunk)],
            capture_output=True, text=True, timeout=3600)
        m = re.search(r"PPL\s*=\s*([0-9.]+)",
                      out.stdout + out.stderr)
        return float(m.group(1)) if m else None


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model", help="path to a real GGUF file")
    ap.add_argument("--llama-cpp-bin", default=None,
                    help="directory containing llama-cli/llama-perplexity")
    ap.add_argument("--prompt", default="The capital of France is")
    ap.add_argument("-n", "--n-tokens", type=int, default=64)
    ap.add_argument("--ppl-text", default=None,
                    help="text file for the delta-ppl gate")
    ap.add_argument("--ppl-chunk", type=int, default=512)
    ap.add_argument("--ppl-tolerance", type=float, default=0.02,
                    help="relative delta-ppl tolerance (default 2%%)")
    ap.add_argument("--max-ctx", type=int, default=2048)
    ap.add_argument("--backend", default="auto",
                    choices=("auto", "self"),
                    help="'self' compares the engine against itself "
                         "(harness CI mode; no llama.cpp needed)")
    args = ap.parse_args()

    log = lambda *a: print(*a, file=sys.stderr)
    result: dict = {"model": args.model}

    engine = load_ours(args.model, args.max_ctx)

    # pick the llama.cpp backend
    backend = None
    if args.backend == "self":
        backend = SelfBackend(engine)
        result["llamacpp_backend"] = "self (harness CI mode)"
    else:
        try:
            backend = LlamaCppPackage(args.model, args.max_ctx)
            result["llamacpp_backend"] = "llama_cpp (python package)"
        except ImportError:
            b = LlamaCppBinary(args.model, args.llama_cpp_bin, args.max_ctx)
            if b.cli or b.ppl_bin:
                backend = b
                result["llamacpp_backend"] = "binaries"
    if backend is None:
        log("ERROR: no llama.cpp available — install llama-cpp-python or "
            "pass --llama-cpp-bin pointing at llama-cli/llama-perplexity")
        result["verdict"] = "NO_BACKEND"
        print(json.dumps(result))
        return 2

    # gate 1: greedy match
    ours = ours_greedy(engine, args.prompt, args.n_tokens)
    theirs = backend.greedy(args.prompt, args.n_tokens)
    if theirs is None:
        result["greedy_match"] = None
    elif isinstance(theirs, str):
        ours_text = engine.tokenizer.decode(ours).strip()
        match = ours_text == theirs.strip()
        result["greedy_match"] = bool(match)
        result["greedy_mode"] = "text"
        log(f"greedy ours : {ours_text[:120]!r}")
        log(f"greedy llcpp: {theirs.strip()[:120]!r}")
    else:
        m = 0
        for a, b2 in zip(ours, theirs):
            if a != b2:
                break
            m += 1
        result["greedy_match"] = bool(m == len(ours) == len(theirs))
        result["greedy_mode"] = "tokens"
        result["match_len"] = m
        log(f"greedy match: {m}/{len(ours)} tokens")

    # gate 2: last-position logits diff (package backend only)
    their_logits = backend.last_logits(args.prompt)
    if their_logits is not None:
        our_logits = ours_last_logits(engine, args.prompt)
        v = min(len(our_logits), len(their_logits))
        diff = our_logits[:v] - their_logits[:v]
        result["logits_rms_diff"] = float(np.sqrt((diff ** 2).mean()))
        result["logits_max_abs_diff"] = float(np.abs(diff).max())
        result["argmax_match"] = bool(
            int(np.argmax(our_logits[:v])) == int(np.argmax(their_logits[:v])))
        log(f"logits rms diff {result['logits_rms_diff']:.4g}, "
            f"max {result['logits_max_abs_diff']:.4g}, "
            f"argmax match {result['argmax_match']}")

    # gate 3: delta ppl
    if args.ppl_text:
        text = open(args.ppl_text, errors="replace").read()
        our_ppl = ours_ppl(engine, text, args.ppl_chunk)
        their_ppl = backend.ppl(args.ppl_text, args.ppl_chunk)
        result["our_ppl"] = round(our_ppl, 4)
        result["llamacpp_ppl"] = (round(their_ppl, 4)
                                  if their_ppl is not None else None)
        if their_ppl:
            delta = (our_ppl - their_ppl) / their_ppl
            result["delta_ppl_rel"] = round(delta, 5)
            result["ppl_gate"] = bool(delta <= args.ppl_tolerance)
            log(f"ppl ours {our_ppl:.4f} vs llama.cpp {their_ppl:.4f} "
                f"(delta {delta:+.2%}, gate {'PASS' if result['ppl_gate'] else 'FAIL'})")

    gates = [v for k, v in result.items()
             if k in ("greedy_match", "ppl_gate", "argmax_match")
             and v is not None]
    result["verdict"] = "PASS" if gates and all(gates) else \
        "FAIL" if gates else "INCONCLUSIVE"
    print(json.dumps(result))
    return 0 if result["verdict"] == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
