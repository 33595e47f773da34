#!/usr/bin/env python
"""Decode-step roofline decomposition: attribute every microsecond of the
single-stream decode step to weights / attention / everything-else, in ONE
process and one contention window (CLAUDE.md: cross-process A/B numbers on
this chip are only comparable within a window; ±40% across windows).

Measured quantities (all differential-timed inside jitted lax.scans — the
tunnel has a ~25 ms fixed per-program cost and XLA hoists loop-invariant
work, so t(N2)-t(N1) over N2-N1 iterations is the only honest number):

  floor    pure HBM read of every packed weight byte the decode step reads
           (XOR-reduce over all QuantLinear panels + dense norms + the
           embedding) — the speed-of-light for a weight-bound step.
  weights  the fused qmatmul chain: every QuantLinear applied to a B=8 row
           (decode pads B=1->8), exactly as the real step dispatches them.
  attn     the decode attention path at the given KV read bucket, all
           layers: rope + cache scatter/read + masked softmax + output.
  step     the REAL greedy-decode step (runner lax.scan, argmax included),
           tg128 protocol.

other = step - weights - attn is then norms/embedding/argmax/residual glue
and inter-op scheduling gaps.

Usage: python scripts/bench_decode_decompose.py [--preset llama3-8b]
           [--bucket 256] [--n1 20] [--n2 120]
Writes a JSON line to stdout; human detail to stderr.
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


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax_tree_sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax_tree_sync(fn(*args))
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def jax_tree_sync(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        _sync(leaf)


def timeit_diff(make_fn, args_fn, n1, n2):
    t1 = timeit(make_fn(n1), *args_fn())
    t2 = timeit(make_fn(n2), *args_fn())
    return max(t2 - t1, 1e-9) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama3-8b")
    ap.add_argument("--bucket", type=int, default=256)
    ap.add_argument("--n1", type=int, default=20)
    ap.add_argument("--n2", type=int, default=120)
    ap.add_argument("--steps", type=int, default=128)
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
    from llama_gguf_tpu.ops.linear import QuantLinear, QuantEmbedding
    from llama_gguf_tpu.ops.qmatmul import qmatmul
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    name = args.preset.replace(".", "").replace("-", "")
    path = os.path.join(cache_dir, f"{name}-q4km.gguf")
    if args.preset == "llama3-8b":
        path = os.path.join(cache_dir, "llama3-8b-q4km.gguf")  # round-2 name
    t0 = time.time()
    build_synthetic_gguf(path, preset=args.preset, quant=GGMLType.Q4_K,
                         max_ctx=2048)
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    params, cfg, gguf = load_model(path, mode="quant", scale_dtype="bfloat16")
    gguf_bytes = sum(i.nbytes for i in gguf.tensors.values())
    print(f"load {time.time()-t0:.1f}s gguf_bytes={gguf_bytes/1e9:.2f}GB",
          file=sys.stderr)

    # ---- inventory: every array the decode step reads from HBM ----------
    quant_leaves: list[QuantLinear] = []
    dense_leaves = []

    def walk(tree):
        if isinstance(tree, QuantLinear):
            quant_leaves.append(tree)
        elif isinstance(tree, QuantEmbedding):
            pass  # row gather: reads ~H bytes/step, negligible
        elif isinstance(tree, dict):
            for v in tree.values():
                walk(v)
        elif isinstance(tree, (list, tuple)):
            for v in tree:
                walk(v)
        elif hasattr(tree, "nbytes") and hasattr(tree, "dtype"):
            dense_leaves.append(tree)

    walk(params)
    device_read = sum(
        q.packed.nbytes + q.scales.nbytes
        + (q.mins.nbytes if q.mins is not None else 0)
        + (q.bias.nbytes if q.bias is not None else 0)
        for q in quant_leaves) + sum(a.nbytes for a in dense_leaves)
    print(f"quant leaves={len(quant_leaves)} device_read/step="
          f"{device_read/1e9:.2f}GB (vs gguf {gguf_bytes/1e9:.2f}GB, "
          f"inflation {device_read/gguf_bytes:.3f}x)", file=sys.stderr)

    n1, n2 = args.n1, args.n2
    results = {}

    # ---- floor: pure HBM read of the step's weight bytes ----------------
    flat_u8 = []
    for q in quant_leaves:
        flat_u8.append(q.packed)
        flat_u8.append(q.scales)
        if q.mins is not None:
            flat_u8.append(q.mins)
    floor_bytes = sum(a.nbytes for a in flat_u8)

    def mk_floor(iters):
        seeds = jnp.arange(1, iters + 1, dtype=jnp.int32)

        @jax.jit
        def run(arrs):
            def body(acc, sd):
                tot = acc
                sdf = sd.astype(jnp.float32)
                for a in arrs:
                    if a.dtype in (jnp.int8, jnp.uint8):
                        tot += jnp.sum(a ^ sd.astype(a.dtype),
                                       dtype=jnp.int32).astype(jnp.float32)
                    else:
                        tot += jnp.sum(a.astype(jnp.float32)) * sdf
                return tot, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), seeds)
            return acc
        return run

    dt = timeit_diff(mk_floor, lambda: (flat_u8,), n1, n2)
    results["floor"] = {"us": dt * 1e6, "bytes": floor_bytes,
                        "gbps": floor_bytes / dt / 1e9}
    print(f"floor   {dt*1e6:9.1f} us  {floor_bytes/dt/1e9:7.1f} GB/s "
          f"({floor_bytes/1e9:.2f} GB)", file=sys.stderr, flush=True)

    # ---- weights: the fused qmatmul chain as decode dispatches it --------
    xs = {q.k: jnp.ones((8, q.k), jnp.float32) for q in quant_leaves}

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
    qbytes = sum(q.packed.nbytes + q.scales.nbytes
                 + (q.mins.nbytes if q.mins is not None else 0)
                 for q in quant_leaves)
    results["weights"] = {"us": dt * 1e6, "bytes": qbytes,
                          "gbps": qbytes / dt / 1e9}
    print(f"weights {dt*1e6:9.1f} us  {qbytes/dt/1e9:7.1f} GB/s "
          f"({qbytes/1e9:.2f} GB)", file=sys.stderr, flush=True)

    # ---- attn: decode attention at the read bucket, all layers ----------
    L, H, KV_H, D = (cfg.num_layers, cfg.num_heads, cfg.num_kv_heads,
                     cfg.head_dim)
    R = H // KV_H
    S = args.bucket
    from llama_gguf_tpu.ops.attention import attention_scores

    keys = [jnp.ones((1, S, KV_H, D), jnp.bfloat16) for _ in range(L)]
    vals = [jnp.ones((1, S, KV_H, D), jnp.bfloat16) for _ in range(L)]
    positions = jnp.full((1, 1), S - 2, jnp.int32)
    lengths = jnp.asarray([S - 1], jnp.int32)
    scale = 1.0 / (D ** 0.5)

    def mk_attn(iters):
        # per-iteration RANDOM q rides the scan: a scalar-scaled constant q
        # lets XLA hoist the (linear) q@k einsum out of the loop — measured
        # 0.0 us/iter until the q values were made loop-carried data
        qs = jnp.asarray(
            np.random.default_rng(1).normal(
                size=(iters, 1, 1, KV_H, R, D)).astype(np.float32))

        @jax.jit
        def run(keys, vals, qs):
            def body(acc, q):
                tot = acc
                for l in range(L):
                    o = attention_scores(
                        q, keys[l].astype(jnp.float32),
                        vals[l].astype(jnp.float32),
                        positions, lengths, scale=scale)
                    tot += jnp.sum(o[..., :8])
                return tot, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), qs)
            return acc
        return lambda keys, vals: run(keys, vals, qs)

    dt = timeit_diff(mk_attn, lambda: (keys, vals), n1, n2)
    kv_bytes = sum(k.nbytes for k in keys) + sum(v.nbytes for v in vals)
    results["attn"] = {"us": dt * 1e6, "bytes": kv_bytes,
                       "gbps": kv_bytes / dt / 1e9, "bucket": S}
    print(f"attn    {dt*1e6:9.1f} us  {kv_bytes/dt/1e9:7.1f} GB/s "
          f"({kv_bytes/1e6:.1f} MB @ bucket {S})", file=sys.stderr,
          flush=True)

    # ---- step: the real greedy-decode step (tg128 protocol) -------------
    def measure_step() -> float:
        runner = ModelRunner(params, cfg, max_batch=1, max_seq=2048,
                             matmul_precision="default",
                             kv_dtype=jnp.bfloat16)
        kv = runner.init_kv()
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, cfg.vocab_size, size=32).tolist()
        logits, kv, pos = runner.prefill(prompt, kv)
        _sync(logits)
        cur0 = jnp.argmax(logits)[None].astype(jnp.int32)
        pos_arr = jnp.asarray([pos], jnp.int32)
        toks, kv = runner.greedy_decode(cur0, pos_arr, kv, steps=args.steps)
        _sync(toks)
        ts = []
        for _ in range(4):
            t0 = time.time()
            toks, kv = runner.greedy_decode(cur0, pos_arr, kv,
                                            steps=args.steps)
            _sync(toks)
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2] / args.steps

    dt = measure_step()
    results["step"] = {"us": dt * 1e6,
                       "tok_s": 1.0 / dt,
                       "gguf_gbps": gguf_bytes / dt / 1e9,
                       "device_read_gbps": device_read / dt / 1e9}
    print(f"step          {dt*1e6:9.1f} us  {1/dt:7.1f} tok/s  "
          f"{gguf_bytes/dt/1e9:.1f} GB/s-of-gguf-bytes  "
          f"{device_read/dt/1e9:.1f} GB/s-device-read", file=sys.stderr,
          flush=True)

    other = results["step"]["us"] - results["weights"]["us"] - \
        results["attn"]["us"]
    results["other_us"] = other
    results["summary"] = {
        "step_us": round(results["step"]["us"], 1),
        "weights_us": round(results["weights"]["us"], 1),
        "attn_us": round(results["attn"]["us"], 1),
        "other_us": round(other, 1),
        "floor_us": round(results["floor"]["us"], 1),
        "weights_vs_floor": round(
            results["weights"]["us"] / results["floor"]["us"], 3),
        "int8_inflation": round(device_read / gguf_bytes, 3),
        "step_vs_floor": round(
            results["step"]["us"] / results["floor"]["us"], 3),
    }
    print(json.dumps({"preset": args.preset, **results["summary"]}))
    print(json.dumps(results, default=float), file=sys.stderr)


if __name__ == "__main__":
    main()
