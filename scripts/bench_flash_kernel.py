#!/usr/bin/env python
"""Isolate the flash-decode kernel's per-call cost on the real chip.

The round-3 decode decomposition found the flash-decode attention path
costs ~240 us/layer at 8B B=1 bucket-256 where the XLA bucket path costs
~2.4 us — 3.4x on the whole step. Candidates:
  (a) the pallas kernel itself (grid/scalar-prefetch/launch overhead),
  (b) the XLA-side prep (q block-diag einsum, cache minor-dim reshape,
      output diagonal extraction),
  (c) the interaction with the loop-carried donated cache in the scan
      (reshape + custom-call consumption breaking scatter aliasing ->
      full-cache copies per step).

Measures, differential, in one process:
  flash_static   flash_decode on a CONSTANT cache in a scan (a+b)
  xla_static     attention_scores on the same shapes (baseline)
  flash_carried  flash_decode + per-iter scatter write, cache loop-carried
                 through the scan (a+b+c — the real step's shape)
  xla_carried    same with the XLA path

Usage: python scripts/bench_flash_kernel.py [--b 1] [--s 2048] [--bound 256]
           [--kh 8] [--r 4] [--d 128] [--layers 32]
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
    for leaf in __import__("jax").tree_util.tree_leaves(out):
        _sync(leaf)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        for leaf in __import__("jax").tree_util.tree_leaves(out):
            _sync(leaf)
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def timeit_diff(make_fn, args_fn, n1, n2):
    t1 = timeit(make_fn(n1), *args_fn())
    t2 = timeit(make_fn(n2), *args_fn())
    return max(t2 - t1, 1e-9) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--bound", type=int, default=256)
    ap.add_argument("--kh", type=int, default=8)
    ap.add_argument("--r", type=int, default=4)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--n1", type=int, default=20)
    ap.add_argument("--n2", type=int, default=100)
    ap.add_argument("--len", type=int, default=0, dest="row_len",
                    help="per-row live length (default bound-1); short "
                    "lengths with a big bound show the per-row ragged win")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_dir, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from llama_gguf_tpu.ops.attention import attention_scores
    from llama_gguf_tpu.ops.flash_decode import flash_decode

    B, S, BOUND = args.b, args.s, args.bound
    KH, R, D, L = args.kh, args.r, args.d, args.layers
    scale = 1.0 / (D ** 0.5)
    rng = np.random.default_rng(0)
    keys = [jnp.asarray(rng.normal(size=(B, S, KH, D)).astype(np.float32))
            .astype(jnp.bfloat16) for _ in range(L)]
    vals = [jnp.asarray(rng.normal(size=(B, S, KH, D)).astype(np.float32))
            .astype(jnp.bfloat16) for _ in range(L)]
    row_len = args.row_len or (BOUND - 1)
    positions = jnp.full((B, 1), row_len - 1, jnp.int32)
    lengths = jnp.full((B,), row_len, jnp.int32)
    n1, n2 = args.n1, args.n2
    results = {}

    def flash_one(q, k, v):
        return flash_decode(q, k, v, positions, lengths, scale=scale,
                            bound=BOUND)

    def xla_one(q, k, v):
        return attention_scores(q, k[:, :BOUND].astype(jnp.float32),
                                v[:, :BOUND].astype(jnp.float32),
                                positions, lengths, scale=scale)

    # ---- static cache: kernel + prep cost only ---------------------------
    def mk_static(fn):
        def make(iters):
            qs = jnp.asarray(rng.normal(
                size=(iters, B, 1, KH, R, D)).astype(np.float32))

            @jax.jit
            def run(keys, vals, qs):
                def body(acc, q):
                    tot = acc
                    for l in range(L):
                        o = fn(q, keys[l], vals[l])
                        tot += jnp.sum(o[..., :8])
                    return tot, None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), qs)
                return acc
            return lambda keys, vals: run(keys, vals, qs)
        return make

    for label, fn in (("flash_static", flash_one), ("xla_static", xla_one)):
        dt = timeit_diff(mk_static(fn), lambda: (keys, vals), n1, n2)
        results[label] = {"us_per_iter": dt * 1e6,
                          "us_per_layer": dt * 1e6 / L}
        print(f"{label:14s} {dt*1e6:9.1f} us/iter  {dt*1e6/L:7.2f} us/layer",
              file=sys.stderr, flush=True)

    # ---- loop-carried cache: + scatter/aliasing interplay -----------------
    def mk_carried(fn):
        def make(iters):
            qs = jnp.asarray(rng.normal(
                size=(iters, B, 1, KH, R, D)).astype(np.float32))

            @jax.jit
            def run(keys, vals, qs):
                def body(carry, q):
                    ks, vs, pos = carry
                    tot = jnp.zeros(())
                    nks, nvs = [], []
                    for l in range(L):
                        o = fn(q, ks[l], vs[l])
                        tot += jnp.sum(o[..., :8])
                        # the real step's per-layer scatter at this position
                        newk = q[:, 0, :, 0, :].astype(ks[l].dtype)[:, None]
                        nks.append(jax.lax.dynamic_update_slice_in_dim(
                            ks[l], newk, pos, axis=1))
                        nvs.append(jax.lax.dynamic_update_slice_in_dim(
                            vs[l], newk, pos, axis=1))
                    return (tuple(nks), tuple(nvs), pos), tot
                (_, _, _), tots = jax.lax.scan(
                    body, (tuple(keys), tuple(vals), jnp.int32(5)), qs)
                return tots[-1]
            return lambda keys, vals: run(keys, vals, qs)
        return make

    for label, fn in (("flash_carried", flash_one), ("xla_carried", xla_one)):
        dt = timeit_diff(mk_carried(fn), lambda: (keys, vals), n1, n2)
        results[label] = {"us_per_iter": dt * 1e6,
                          "us_per_layer": dt * 1e6 / L}
        print(f"{label:14s} {dt*1e6:9.1f} us/iter  {dt*1e6/L:7.2f} us/layer",
              file=sys.stderr, flush=True)

    # ---- dynamic positions: scalar-prefetch operands loop-carried ---------
    # (the REAL greedy scan's pos/lengths advance every iteration; constant
    # scalars above can be hoisted/specialized by XLA)
    def mk_dyn(fn):
        def make(iters):
            qs = jnp.asarray(rng.normal(
                size=(iters, B, 1, KH, R, D)).astype(np.float32))

            @jax.jit
            def run(keys, vals, qs):
                def body(carry, q):
                    ks, vs, pos = carry
                    posa = jnp.full((B, 1), pos, jnp.int32)
                    lena = jnp.full((B,), pos + 1, jnp.int32)
                    tot = jnp.zeros(())
                    nks, nvs = [], []
                    for l in range(L):
                        o = fn(q, ks[l], vs[l], posa, lena)
                        tot += jnp.sum(o[..., :8])
                        newk = q[:, 0, :, 0, :].astype(ks[l].dtype)[:, None]
                        nks.append(jax.lax.dynamic_update_slice_in_dim(
                            ks[l], newk, pos, axis=1))
                        nvs.append(jax.lax.dynamic_update_slice_in_dim(
                            vs[l], newk, pos, axis=1))
                    return (tuple(nks), tuple(nvs), pos + 1), tot
                (_, _, _), tots = jax.lax.scan(
                    body, (tuple(keys), tuple(vals), jnp.int32(5)), qs)
                return tots[-1]
            return lambda keys, vals: run(keys, vals, qs)
        return make

    def flash_pos(q, k, v, posa, lena):
        return flash_decode(q, k, v, posa, lena, scale=scale, bound=BOUND)

    def xla_pos(q, k, v, posa, lena):
        return attention_scores(q, k[:, :BOUND].astype(jnp.float32),
                                v[:, :BOUND].astype(jnp.float32),
                                posa, lena, scale=scale)

    for label, fn in (("flash_dynpos", flash_pos), ("xla_dynpos", xla_pos)):
        dt = timeit_diff(mk_dyn(fn), lambda: (keys, vals), n1, n2)
        results[label] = {"us_per_iter": dt * 1e6,
                          "us_per_layer": dt * 1e6 / L}
        print(f"{label:14s} {dt*1e6:9.1f} us/iter  {dt*1e6/L:7.2f} us/layer",
              file=sys.stderr, flush=True)

    print(json.dumps({"b": B, "s": S, "bound": BOUND, "kh": KH, "r": R,
                      "d": D, "layers": L, **results}, default=float))


if __name__ == "__main__":
    main()
