#!/usr/bin/env python
"""Prefill-step decomposition: attribute the 512-token prefill step's time
to weights / attention / LM head / host dispatch, in ONE process and one
contention window.

The round-2 headline "prefill@512 = 9.6k tok/s ~= 10% MFU" was measured
host-dispatched: one `runner.step` call per measurement, which pays the
axon tunnel's fixed per-program cost on top of the compute. This script
separates the two:

  step_host   the real prefill step, host-dispatched (today's bench
              protocol): dispatch + compute + [V] logits fetch.
  step_scan   the SAME step chained N times inside one jitted lax.scan,
              differential-timed — pure device compute, no dispatch.
  weights     the full qmatmul chain at M = B*T rows (512), as prefill
              dispatches it.
  attn        prefill attention, all layers, T=512 causal at bucket 512.
  lm_head     the [T, H] @ [H, V] logits matmul alone (all T positions,
              i.e. what forward computed before logit_positions).

other = step_scan - weights - attn - lm_head  (norms, rope, embed, glue).
dispatch = step_host - step_scan              (tunnel + host overhead).

Usage: python scripts/bench_prefill_decompose.py [--preset tinyllama-1.1b]
           [--tokens 512] [--n1 4] [--n2 16]
JSON summary to stdout; human detail to stderr.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    return np.asarray(x)


def tree_sync(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        _sync(leaf)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    tree_sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        tree_sync(fn(*args))
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def timeit_diff(make_fn, args_fn, n1, n2):
    t1 = timeit(make_fn(n1), *args_fn())
    t2 = timeit(make_fn(n2), *args_fn())
    return max(t2 - t1, 1e-9) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tinyllama-1.1b")
    ap.add_argument("--tokens", type=int, default=512)
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_dir, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.models.transformer import forward
    from llama_gguf_tpu.ops.linear import QuantLinear
    from llama_gguf_tpu.ops.qmatmul import qmatmul
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    T = args.tokens
    name = args.preset.replace(".", "").replace("-", "")
    path = os.path.join(cache_dir, f"{name}-q4km.gguf")
    if args.preset == "llama3-8b":
        path = os.path.join(cache_dir, "llama3-8b-q4km.gguf")
    if args.preset == "tinyllama-1.1b":
        path = os.path.join(cache_dir, "bench_tinyllama_11b_q4km.gguf")
    t0 = time.time()
    build_synthetic_gguf(path, preset=args.preset, quant=GGMLType.Q4_K,
                         max_ctx=2048)
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    params, cfg, gguf = load_model(path, mode="quant", scale_dtype="bfloat16")
    print(f"load {time.time()-t0:.1f}s", file=sys.stderr)

    n1, n2 = args.n1, args.n2
    results = {}

    # model FLOPs per token (weights only) for MFU attribution
    quant_leaves: list[QuantLinear] = []

    def walk(tree):
        if isinstance(tree, QuantLinear):
            quant_leaves.append(tree)
        elif isinstance(tree, dict):
            for v in tree.values():
                walk(v)
        elif isinstance(tree, (list, tuple)):
            for v in tree:
                walk(v)

    walk(params)
    wflops_tok = 2 * sum(q.k * q.n for q in quant_leaves)
    L, H, D = cfg.num_layers, cfg.num_heads, cfg.head_dim
    attn_flops = 2 * 2 * L * H * D * T * T * 1  # QK^T + PV, causal ~ /2
    print(f"weight GEMM flops/token {wflops_tok/1e9:.2f} GF; "
          f"T={T} prefill total {(wflops_tok*T + attn_flops)/1e12:.2f} TF",
          file=sys.stderr)

    # ---- step_host: today's bench protocol -------------------------------
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=2048,
                         matmul_precision="default", kv_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=T).tolist()
    kv = runner.init_kv()
    lg, kv, _ = runner.prefill(prompt, kv)  # compile
    _sync(lg)
    ts = []
    for _ in range(5):
        kv = runner.init_kv()
        t0 = time.time()
        lg, kv, _ = runner.prefill(prompt, kv)
        _sync(lg)
        ts.append(time.time() - t0)
    ts.sort()
    dt_host = ts[len(ts) // 2]
    results["step_host"] = {"ms": dt_host * 1e3, "tok_s": T / dt_host}
    print(f"step_host {dt_host*1e3:8.2f} ms  {T/dt_host:8.0f} tok/s",
          file=sys.stderr, flush=True)

    # ---- step_scan: same forward chained in one program -------------------
    toks = jnp.asarray(np.asarray(prompt, np.int32)[None, :])
    pos = jnp.asarray(np.arange(T, dtype=np.int32)[None, :])
    lengths = jnp.asarray([T], jnp.int32)
    lp = jnp.asarray([T - 1], jnp.int32)
    prec = "default"

    def mk_step_scan(iters):
        seeds = jnp.arange(1, iters + 1, dtype=jnp.int32)

        @jax.jit
        def run(params, toks, pos, kv):
            def body(acc, sd):
                # vary tokens so XLA can't hoist the layer stack
                with jax.default_matmul_precision(prec):
                    logits, _ = forward(params, runner.cfg,
                                        (toks + sd) % cfg.vocab_size, pos,
                                        kv, lengths, read_bound=512,
                                        logit_positions=lp)
                return acc + logits[0, -1, :8], None
            acc, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), seeds)
            return acc
        return run

    kv_fresh = runner.init_kv()
    # runner.params, not the raw load: the runner may have attached w4a8
    # panels (LLAMA_GGUF_W4A8=1) — measure what the engine actually runs
    dt = timeit_diff(mk_step_scan,
                     lambda: (runner.params, toks, pos, kv_fresh), n1, n2)
    results["step_scan"] = {"ms": dt * 1e3, "tok_s": T / dt,
                            "mfu_pct": (wflops_tok * T + attn_flops)
                            / dt / 197e12 * 100}
    print(f"step_scan {dt*1e3:8.2f} ms  {T/dt:8.0f} tok/s  "
          f"MFU {(wflops_tok*T+attn_flops)/dt/197e12*100:.1f}%",
          file=sys.stderr, flush=True)

    # ---- weights: qmatmul chain at M = T ----------------------------------
    # re-walk from runner.params so attached w4a8 panels (if any) ride along
    quant_leaves.clear()
    walk(runner.params)
    xs = {q.k: jnp.ones((T, q.k), jnp.float32) for q in quant_leaves}

    def mk_weights(iters):
        seeds = jnp.arange(1, iters + 1, dtype=jnp.float32)

        @jax.jit
        def run(xs, leaves):
            def body(acc, s):
                tot = acc
                for q in leaves:
                    y = qmatmul(xs[q.k] * s, q, precision="default")
                    tot += jnp.sum(y[0, :8])
                return tot, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), seeds)
            return acc
        return run

    dt = timeit_diff(mk_weights, lambda: (xs, quant_leaves), n1, n2)
    gemm_flops = wflops_tok * T
    results["weights"] = {"ms": dt * 1e3,
                          "mfu_pct": gemm_flops / dt / 197e12 * 100}
    print(f"weights   {dt*1e3:8.2f} ms  GEMM-only MFU "
          f"{gemm_flops/dt/197e12*100:.1f}%", file=sys.stderr, flush=True)

    # ---- attn: prefill attention at T, all layers -------------------------
    from llama_gguf_tpu.ops.attention import attention_scores

    KV_H = cfg.num_kv_heads
    R = H // KV_H
    S = 512
    keys = [jnp.ones((1, S, KV_H, D), jnp.bfloat16) for _ in range(L)]
    vals = [jnp.ones((1, S, KV_H, D), jnp.bfloat16) for _ in range(L)]
    qpos = jnp.asarray(np.arange(T, dtype=np.int32)[None, :])
    scale = 1.0 / (D ** 0.5)

    def mk_attn(iters):
        qs = jnp.asarray(
            np.random.default_rng(1).normal(
                size=(iters, 1, T, KV_H, R, D)).astype(np.float32))

        @jax.jit
        def run(keys, vals, qs):
            def body(acc, q):
                tot = acc
                for l in range(L):
                    o = attention_scores(
                        q, keys[l].astype(jnp.float32),
                        vals[l].astype(jnp.float32),
                        qpos, lengths, scale=scale)
                    tot += jnp.sum(o[..., :8])
                return tot, None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), qs)
            return acc
        return lambda keys, vals: run(keys, vals, qs)

    dt = timeit_diff(mk_attn, lambda: (keys, vals), max(n1 // 2, 2),
                     max(n2 // 2, 6))
    results["attn"] = {"ms": dt * 1e3}
    print(f"attn      {dt*1e3:8.2f} ms", file=sys.stderr, flush=True)

    # ---- lm_head: [T, H] @ [H, V], all positions (the pre-fix cost) -------
    emb = params.get("output")
    hs = jnp.ones((T, cfg.hidden_size), jnp.float32)

    def mk_head(iters):
        seeds = jnp.arange(1, iters + 1, dtype=jnp.float32)

        @jax.jit
        def run(hs, emb_arg):
            # emb rides as an ARGUMENT: closing over the [H, V] table bakes
            # it into the HLO as a constant (525 MB at 8B) and the tunnel's
            # compile request rejects it with HTTP 413
            def body(acc, s):
                if emb_arg is not None:
                    y = qmatmul(hs * s, emb_arg, precision="default") \
                        if isinstance(emb_arg, QuantLinear) else \
                        (hs * s) @ emb_arg
                else:
                    e = params["embed"]
                    y = jnp.einsum("bh,vh->bv", hs * s, e.astype(hs.dtype),
                                   preferred_element_type=jnp.float32)
                return acc + jnp.sum(y[0, :8]), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), seeds)
            return acc
        return run

    dt = timeit_diff(mk_head, lambda: (hs, emb), n1, n2)
    results["lm_head_allpos"] = {"ms": dt * 1e3}
    print(f"lm_head   {dt*1e3:8.2f} ms (all {T} positions)", file=sys.stderr,
          flush=True)

    other = (results["step_scan"]["ms"] - results["weights"]["ms"]
             - results["attn"]["ms"])
    results["summary"] = {
        "preset": args.preset, "tokens": T,
        "step_host_ms": round(results["step_host"]["ms"], 2),
        "step_scan_ms": round(results["step_scan"]["ms"], 2),
        "dispatch_ms": round(results["step_host"]["ms"]
                             - results["step_scan"]["ms"], 2),
        "weights_ms": round(results["weights"]["ms"], 2),
        "attn_ms": round(results["attn"]["ms"], 2),
        "lm_head_allpos_ms": round(results["lm_head_allpos"]["ms"], 2),
        "other_ms": round(other, 2),
        "tok_s_host": round(results["step_host"]["tok_s"], 0),
        "tok_s_device": round(results["step_scan"]["tok_s"], 0),
        "mfu_device_pct": round(results["step_scan"]["mfu_pct"], 1),
        "gemm_mfu_pct": round(results["weights"]["mfu_pct"], 1),
    }
    print(json.dumps(results["summary"]))
    print(json.dumps(results, default=float), file=sys.stderr)


if __name__ == "__main__":
    main()
