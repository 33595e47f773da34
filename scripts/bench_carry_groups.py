#!/usr/bin/env python
"""Where does the stacked-KV copy cliff start? (VERDICT r4 #5)

Round-2 found that a fully stacked [L, B, S, H, D] KV cache makes XLA COPY
the whole cache every decode step (aliasing analysis gives up when sliced
reads interleave with per-layer scatter writes inside lax.scan) — per-layer
buffers alias in place, but threading 44 donated per-layer buffers through
the scan carry costs ~150 us/step at TinyLlama (~7% of the step,
docs/ROOFLINE.md r4 glue attribution). This script measures the middle
ground: stack the per-layer K (and V) buffers in GROUPS of g layers
([g, B, S, H, D] arrays, 2*ceil(L/g) carried buffers) and time a
decode-shaped scan per group size, INTERLEAVED A/B within one process
window (the repo's A/B discipline: cross-window comparisons lie by ±40%).

Decode realism: per layer the step does a ~23 MB bf16 weight-chain matmul
(HBM-bound like the real step), one dynamic_update_slice KV write at the
current position, and a read of the live KV slice [*, :bound] feeding an
attention-shaped contraction. Weights are passed as ARGUMENTS (closing
over them bakes them into the HLO; the tunnel rejects >100 MB programs)
and the KV carry is DONATED like the runner's real scan.

A group size g wins only if its per-step time beats g=1 by more than the
window noise — and a cliff (whole-group copy per step) shows up as a step
time that scales with g * bytes(cache)/L instead of the read slice.

Usage: python scripts/bench_carry_groups.py [--steps 128] [--rounds 3]
Prints one JSON line per (round, group) plus a summary verdict.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# TinyLlama-1.1B decode geometry
L, B, S, H, D = 22, 1, 2048, 4, 64
HID, FFN = 2048, 5632
BOUND = 256  # live-context read bucket


def build(jax, jnp, g: int, steps: int):
    """Jitted decode-shaped scan with KV stacked in groups of g layers.
    Returns (fn, init_carry_fn, weights)."""
    ng = -(-L // g)  # buffers per K/V set

    rng = np.random.default_rng(0)
    ws = tuple(
        jnp.asarray(rng.normal(size=(HID, FFN)).astype(np.float32) * 0.02,
                    dtype=jnp.bfloat16)
        for _ in range(L)
    )

    def init_kv():
        return (
            tuple(jnp.zeros((g, B, S, H, D), jnp.bfloat16)
                  for _ in range(ng)),
            tuple(jnp.zeros((g, B, S, H, D), jnp.bfloat16)
                  for _ in range(ng)),
        )

    def step_fn(ws, x0, pos0, kv):
        def body(carry, _):
            x, pos, (ks, vs) = carry
            ks, vs = list(ks), list(vs)
            for i in range(L):
                gi, li = divmod(i, g)
                # weight chain: HBM-bound matmul like the real step
                h = jnp.dot(x, ws[i], preferred_element_type=jnp.float32)
                xw = h[:, :HID].astype(jnp.bfloat16)
                # KV write at pos (one position, one layer plane)
                knew = xw[:, : H * D].reshape(B, 1, H, D)
                ks[gi] = jax.lax.dynamic_update_slice(
                    ks[gi], knew[None], (li, 0, pos, 0, 0))
                vs[gi] = jax.lax.dynamic_update_slice(
                    vs[gi], knew[None], (li, 0, pos, 0, 0))
                # live-slice read + attention-shaped contraction
                kr = jax.lax.dynamic_slice_in_dim(ks[gi][li], 0, BOUND,
                                                  axis=1)  # [B,BOUND,H,D]
                vr = jax.lax.dynamic_slice_in_dim(vs[gi][li], 0, BOUND,
                                                  axis=1)
                q = xw[:, : H * D].reshape(B, H, D)
                sc = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.float32),
                                kr.astype(jnp.float32))
                p = jax.nn.softmax(sc, axis=-1)
                o = jnp.einsum("bhs,bshd->bhd", p,
                               vr.astype(jnp.float32)).reshape(B, H * D)
                x = x + jnp.pad(o, ((0, 0), (0, HID - H * D))).astype(x.dtype)
            return (x, pos + 1, (tuple(ks), tuple(vs))), x[0, 0]

        (x, pos, kv), trace = jax.lax.scan(body, (x0, pos0, kv), None,
                                           length=steps)
        return x, pos, kv, trace

    fn = jax.jit(step_fn, donate_argnums=(3,))
    return fn, init_kv, ws


def time_variant(jax, jnp, fn, init_kv, ws, reps: int):
    x0 = jnp.asarray(np.random.default_rng(1).normal(size=(B, HID))
                     .astype(np.float32), dtype=jnp.bfloat16)
    pos0 = jnp.asarray(64, jnp.int32)
    kv = init_kv()
    x, pos, kv, tr = fn(ws, x0, pos0, kv)  # compile + warm
    np.asarray(tr)
    ts = []
    for _ in range(reps):
        kv2 = init_kv() if kv is None else kv
        t0 = time.time()
        x, pos, kv = fn(ws, x0, pos0, kv2)[:3]
        np.asarray(x)  # hard host-fetch sync
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--groups", type=int, nargs="+",
                    default=[1, 2, 4, 11, 22])
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".cache", "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    import jax.numpy as jnp

    variants = {}
    for g in args.groups:
        variants[g] = build(jax, jnp, g, args.steps)

    results = {g: [] for g in args.groups}
    for rnd in range(args.rounds):
        for g in args.groups:  # interleaved: every round touches every g
            fn, init_kv, ws = variants[g]
            med = time_variant(jax, jnp, fn, init_kv, ws, args.reps)
            us = med / args.steps * 1e6
            results[g].append(us)
            print(json.dumps({"round": rnd, "group": g,
                              "us_per_step": round(us, 1)}), flush=True)

    base = min(results[1])
    summary = {
        "us_per_step_best": {g: round(min(v), 1)
                             for g, v in results.items()},
        "vs_g1": {g: round(min(v) / base, 3) for g, v in results.items()},
        "steps": args.steps, "geometry": [L, B, S, H, D],
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
