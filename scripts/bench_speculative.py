#!/usr/bin/env python
"""Speculative decoding wall-clock A/B on the real chip.

VERDICT round-2 Weak #5 demanded an on-device drafting loop that BEATS
plain greedy in wall time. This measures three configurations on one
synthetic model in one process/window:

  plain    runner.greedy_decode on-device scan (the production baseline —
           NOT the host parity loop)
  lookup   PromptLookupDecoder (n-gram proposals, single-pass verify)
  selfspec SpeculativeDecoder.self_speculative (early-exit draft)

Synthetic-weight caveat (measured 2026-08-19, TinyLlama preset): random
weights give acceptance ~0 for BOTH proposers (lookup 0.07, selfspec 0.0
— greedy output did not loop within 96 tokens, and early-exit logits of
random weights are uncorrelated with the full stack's). Acceptance is a
property of REAL model distributions; with it at ~0 every round pays its
2 host dispatches (~40 ms over this tunnel) for ~1 token, so speculation
LOSES wall-clock here by construction — the measurement this script can
honestly make on synthetic weights is the per-round overhead floor
(rounds and tokens_per_round in the JSON), not the speedup. The >1
speedup demonstration needs a real checkpoint (same boat as the
llama.cpp parity gate: no model downloads in this environment).

exact_match caveat: at matmul_precision="default" the T=1 greedy scan
and the T=k+1 verify step tile the MXU differently; on random-weight
logits (tightly clustered) argmax ties break differently, so
exact_match=false is EXPECTED here. The speculative invariant (accepted
prefix == the verify pass's own argmax) is enforced by construction and
tested exactly in tests/test_speculative_lora.py; run with
--precision highest for cross-shape exactness on synthetic weights.

--mode ceiling (VERDICT r3 task 4): bound speculation's REAL value on
this chip without a real checkpoint. Two measurements in one process:

  1. identical-model draft (draft == target weights, acceptance ~= 1 at
     --precision highest): the machinery's measured BEST case — every
     round costs draft(k) + verify(k+1) and yields k+1 tokens.
  2. per-round component costs at each k: t_draft(k) (window step +
     (k-1)-token scan + k-int fetch) and t_verify(k) (one (k+1)-wide
     step + k-int fetch), vs t_plain (per-token cost of the production
     scan). Speculation wins wall-clock iff
         (t_draft + t_verify) / (a*k + 1) < t_plain
     so the break-even acceptance is
         X(k) = ((t_draft + t_verify) / t_plain - 1) / k
     — the number PERFORMANCE.md quotes. Acceptance is a property of the
     model/data distribution; X is a property of this chip + engine.

Usage: python scripts/bench_speculative.py [--preset llama3-8b] [--tokens 96]
           [--mode ab|ceiling]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ceiling(args, jnp, runner, params, cfg, prompt, N):
    """Identical-model draft (the machinery's best case) + per-round cost
    decomposition -> break-even acceptance X(k). See module docstring."""
    import jax

    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.engine.speculative import SpeculativeDecoder

    def med_of(fn, reps=3):
        """Median of the durations fn RETURNS (fn times its own hot
        section); one untimed warm-up call pays the compiles."""
        fn()
        vals = sorted(fn() for _ in range(reps))
        return vals[len(vals) // 2]

    # -- plain decode cost per token (production scan), prefill excluded --
    def plain_decode():
        kv = runner.init_kv()
        logits, kv, pos = runner.prefill(prompt, kv)
        cur = jnp.argmax(logits)[None].astype(jnp.int32)
        t0 = time.time()
        toks, kv = runner.greedy_decode(
            cur, jnp.asarray([pos], jnp.int32), kv, steps=N - 1)
        np.asarray(toks)
        return time.time() - t0

    t_plain = med_of(plain_decode)
    t_plain_tok = t_plain / (N - 1)

    # identical-model draft: same params (zero-copy), own KV cache
    draft = ModelRunner(params, cfg, max_batch=1, max_seq=runner.max_seq,
                        matmul_precision=args.precision,
                        kv_dtype=jnp.bfloat16)

    per_k = {}
    for k in (int(x) for x in args.ks.split(",")):
        dec = SpeculativeDecoder(runner, draft, num_draft=k)

        def setup_only():
            # prefill both caches + first token: the non-round overhead
            t0 = time.time()
            dec.generate_greedy(prompt, 1)
            return time.time() - t0

        def full_run():
            dec.stats.__init__()
            t0 = time.time()
            dec.generate_greedy(prompt, N)
            return time.time() - t0

        t_setup = med_of(setup_only, reps=2)
        t_full = med_of(full_run, reps=2)
        rounds = max(dec.stats.rounds, 1)
        per_round = max(t_full - t_setup, 1e-9) / rounds
        a = dec.stats.acceptance_rate
        # speculation wins iff per_round/(a*k+1) < t_plain_tok
        x_break = (per_round / t_plain_tok - 1) / k
        per_k[k] = {
            "acceptance_observed": round(a, 3),
            "rounds": dec.stats.rounds,
            "tokens_per_round": round(dec.stats.tokens_per_round, 2),
            "per_round_ms": round(per_round * 1e3, 2),
            "round_over_plain_step": round(per_round / t_plain_tok, 2),
            "breakeven_acceptance": round(x_break, 3),
            "ceiling_speedup_at_a1": round(
                (k + 1) * t_plain_tok / per_round, 2),
            "measured_speedup": round(
                t_plain / max(t_full - t_setup, 1e-9), 2),
        }
    print(json.dumps({
        "mode": "ceiling", "preset": args.preset, "tokens": N,
        "precision": args.precision,
        "platform": jax.devices()[0].platform,
        "plain_ms_per_token": round(t_plain_tok * 1e3, 2),
        "per_k": per_k,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama3-8b")
    ap.add_argument("--tokens", type=int, default=96)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--precision", default="default",
                    choices=("default", "highest"))
    ap.add_argument("--mode", default="ab", choices=("ab", "ceiling"))
    ap.add_argument("--ks", default="2,4,8,16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.engine.speculative import (
        PromptLookupDecoder, SpeculativeDecoder,
    )
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    name = args.preset.replace(".", "").replace("-", "")
    path = os.path.join(cache, f"{name}-q4km.gguf")
    if args.preset == "llama3-8b":
        path = os.path.join(cache, "llama3-8b-q4km.gguf")
    if args.preset == "tinyllama-1.1b":
        path = os.path.join(cache, "bench_tinyllama_11b_q4km.gguf")
    build_synthetic_gguf(path, preset=args.preset, quant=GGMLType.Q4_K,
                         max_ctx=2048)
    params, cfg, _ = load_model(path, mode="quant", scale_dtype="bfloat16")
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=2048,
                         matmul_precision=args.precision,
                         kv_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    # repetitive prompt: gives the n-gram proposer something to match early
    base = rng.integers(0, cfg.vocab_size, size=16).tolist()
    prompt = base * 3
    N = args.tokens

    def timed(fn, reps=3):
        fn()  # warm / compile
        ts = []
        for _ in range(reps):
            t0 = time.time()
            res = fn()
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2], res

    if args.mode == "ceiling":
        ceiling(args, jnp, runner, params, cfg, prompt, N)
        return

    # -- plain: production on-device greedy scan ---------------------------
    def plain():
        kv = runner.init_kv()
        logits, kv, pos = runner.prefill(prompt, kv)
        cur = jnp.argmax(logits)[None].astype(jnp.int32)
        toks, kv = runner.greedy_decode(
            cur, jnp.asarray([pos], jnp.int32), kv, steps=N - 1)
        out = [int(np.asarray(cur)[0])] + [int(x) for x in np.asarray(toks[0])]
        return out

    t_plain, out_plain = timed(plain)

    # -- prompt lookup ------------------------------------------------------
    lookup = PromptLookupDecoder(runner, num_draft=args.k)

    def run_lookup():
        lookup.stats.__init__()
        return lookup.generate_greedy(prompt, N)

    t_lookup, out_lookup = timed(run_lookup)
    lk_stats = {"acceptance": round(lookup.stats.acceptance_rate, 3),
                "tokens_per_round": round(lookup.stats.tokens_per_round, 2),
                "rounds": lookup.stats.rounds}

    # -- self-speculative ----------------------------------------------------
    spec = SpeculativeDecoder.self_speculative(runner, num_draft=4)

    def run_spec():
        spec.stats.__init__()
        return spec.generate_greedy(prompt, N)

    t_spec, out_spec = timed(run_spec, reps=2)
    sp_stats = {"acceptance": round(spec.stats.acceptance_rate, 3),
                "tokens_per_round": round(spec.stats.tokens_per_round, 2),
                "rounds": spec.stats.rounds}

    exact_lookup = out_lookup == out_plain[:len(out_lookup)]
    exact_spec = out_spec == out_plain[:len(out_spec)]
    print(json.dumps({
        "preset": args.preset, "tokens": N, "k": args.k,
        "plain_s": round(t_plain, 3),
        "lookup_s": round(t_lookup, 3),
        "selfspec_s": round(t_spec, 3),
        "lookup_speedup": round(t_plain / t_lookup, 2),
        "selfspec_speedup": round(t_plain / t_spec, 2),
        "lookup": lk_stats, "selfspec": sp_stats,
        "lookup_exact_match": exact_lookup,
        "selfspec_exact_match": exact_spec,
    }))


if __name__ == "__main__":
    main()
