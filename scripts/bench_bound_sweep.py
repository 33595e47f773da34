#!/usr/bin/env python
"""Why is TinyLlama B=1 long-context decode FASTER than short? (r5)

The r5 paired decode protocol (bench.run_decode_paired) measured
long-ctx (read bound 2048) at 0.94-0.95x the short-ctx (bound 256) step
time, consistently, inside one window — a bigger KV read being cheaper is
physically wrong, so some per-step cost must DEPEND on the bound in the
opposite direction (suspect: the sub-max_seq sliced KV read interacting
with the donated in-place scatter write; cf. the r2 stacked-cache copy
trap).

This script decodes from the SAME position (32) with FORCED read bounds
256/512/1024/2048 on a max_seq=2048 cache, interleaved A/B within one
process window. All four are numerically identical (bound only caps what
attention may read; live context is what it is) — only time differs.

Usage: python scripts/bench_bound_sweep.py [--steps 128] [--rounds 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bounds", type=int, nargs="+",
                    default=[256, 512, 1024, 2048])
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--preset", default="tinyllama-1.1b")
    args = ap.parse_args()

    bench.wait_for_device()
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(bench.CACHE, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    import jax.numpy as jnp

    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    path = os.path.join(bench.CACHE, bench.PRESETS[args.preset]["gguf"])
    build_synthetic_gguf(path, preset=args.preset, quant=GGMLType.Q4_K,
                         max_ctx=2048)
    print("loading", flush=True)
    params, cfg, gguf = load_model(path, mode="quant",
                                   scale_dtype="bfloat16")
    print("loaded", flush=True)
    wbytes = sum(i.nbytes for i in gguf.tensors.values())
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=args.max_seq,
                         matmul_precision="default", kv_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    kv = runner.init_kv()
    logits, kv, pos = runner.prefill(
        rng.integers(0, cfg.vocab_size, size=32).tolist(), kv)
    cur0 = jnp.argmax(logits)[None].astype(jnp.int32)
    pos0 = jnp.asarray([pos], jnp.int32)

    # compile all variants first (one scan per bound)
    fns = {}
    for b in args.bounds:
        t0 = time.time()
        fns[b] = runner._get_greedy_scan(1, b)
        toks, kv = fns[b](runner.params, cur0, pos0, kv, steps=args.steps)
        np.asarray(toks)
        print(f"compiled bound {b} in {time.time()-t0:.1f}s", flush=True)

    results = {b: [] for b in args.bounds}
    toks_ref = None
    for rnd in range(args.rounds):
        for b in args.bounds:
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                toks, kv = fns[b](runner.params, cur0, pos0, kv,
                                  steps=args.steps)
                np.asarray(toks)
                ts.append(time.time() - t0)
            ts.sort()
            med = ts[len(ts) // 2]
            results[b].append(med)
            # all bounds must emit identical tokens (correctness guard)
            t_np = np.asarray(toks)
            if toks_ref is None:
                toks_ref = t_np
            else:
                assert (t_np == toks_ref).all(), f"bound {b} diverged"
            print(json.dumps({
                "round": rnd, "bound": b,
                "ms_per_step": round(med / args.steps * 1e3, 3),
                "tok_s": round(args.steps / med, 1),
                "effective_gbps": round(wbytes / med * args.steps / 1e9, 1),
            }), flush=True)

    base = min(results[args.bounds[0]])
    print(json.dumps({"summary": {
        "ms_per_step_best": {b: round(min(v) / args.steps * 1e3, 3)
                             for b, v in results.items()},
        "vs_first_bound": {b: round(min(v) / base, 3)
                           for b, v in results.items()},
        "max_seq": args.max_seq, "steps": args.steps,
    }}), flush=True)


if __name__ == "__main__":
    main()
