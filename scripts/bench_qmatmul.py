#!/usr/bin/env python
"""Kernel microbenchmark: fused q4 dequant-matmul vs the HBM-read floor.

One PROCESS per run (CLAUDE.md: HBM pollution across model loads skews
in-process comparisons); each measurement is a jitted lax.scan of ITERS
kernel calls (per-call dispatch over the tunnel is 2-6 ms, so scans are the
only honest way to time kernels here).

Usage: python scripts/bench_qmatmul.py [variant ...]
Variants: kernel (fused q4 Pallas), floor (sum of the packed bytes = pure
HBM read), xla (dequant-in-graph XLA path). Default: all, on the TinyLlama
decode shapes.
"""

import sys
import time

import numpy as np

SHAPES = [  # (K, N) of TinyLlama-1.1B decode matmuls (fused projections)
    (2048, 2560),   # wqkv fused
    (2048, 11264),  # gate_up fused
    (5632, 2048),   # down
    (2048, 2048),   # wo
]
B = 8       # kernel batch floor (B=1 pads to 8)
# differential timing: the tunnel has a ~25 ms fixed per-program cost, so
# time(scan N2) - time(scan N1) over (N2 - N1) iterations is the only
# honest per-iteration number
N1, N2 = 50, 550
GROUP = 32


def make_lin(k, n, rng):
    import jax.numpy as jnp

    from llama_gguf_tpu.ops.linear import QuantLinear

    packed = jnp.asarray(rng.integers(0, 256, size=(k // 2, n), dtype=np.uint8))
    scales = jnp.asarray(rng.normal(size=(k // GROUP, n)).astype(np.float32) * 0.01)
    mins = jnp.asarray(np.abs(rng.normal(size=(k // GROUP, n))).astype(np.float32) * 0.01)
    return QuantLinear(packed, scales, mins, None, fmt="q4", group=GROUP,
                       k=k, n=n, source_type="bench")


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(out)  # compile+warm, hard sync
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return sorted(ts)[2]


def timeit_diff(make_fn, *args):
    """Per-iteration time via (t(N2) - t(N1)) / (N2 - N1)."""
    t1 = timeit(make_fn(N1), *args)
    t2 = timeit(make_fn(N2), *args)
    return max(t2 - t1, 1e-9) / (N2 - N1)


def main():
    variants = sys.argv[1:] or ["kernel", "floor"]
    import jax
    import jax.numpy as jnp

    from llama_gguf_tpu.ops.qmatmul import qmatmul
    from llama_gguf_tpu.ops.linear import _apply_quant_xla

    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} B={B} diff N={N1}->{N2}")
    for k, n in SHAPES:
        lin = make_lin(k, n, rng)
        x = jnp.asarray(rng.normal(size=(B, k)).astype(np.float32))
        nbytes = lin.packed.nbytes + lin.scales.nbytes + lin.mins.nbytes
        row = [f"K={k:5d} N={n:5d} ({nbytes/1e6:6.1f} MB)"]

        if "kernel" in variants:
            # x varies per iteration (scaled by a seed): pallas_call is
            # opaque to XLA so the weight reads cannot be hoisted
            def mk_kernel(iters, lin=lin):
                seeds = jnp.arange(1, iters + 1, dtype=jnp.float32)

                @jax.jit
                def run(x):
                    def body(acc, s):
                        y = qmatmul(x * s, lin, precision="default")
                        return acc + y, None
                    acc, _ = jax.lax.scan(
                        body, jnp.zeros((B, lin.n), jnp.float32), seeds)
                    return acc
                return run

            dt = timeit_diff(mk_kernel, x)
            row.append(f"kernel {dt*1e6:7.1f} us {nbytes/dt/1e9:6.1f} GB/s")

        if "floor" in variants:
            # pure HBM read of the same bytes: xor with a per-iteration
            # seed (fused into the reduce) defeats loop-invariant hoisting
            def mk_floor(iters):
                seeds = jnp.arange(1, iters + 1, dtype=jnp.uint8)

                @jax.jit
                def run(p, s, m):
                    def body(acc, sd):
                        v = (jnp.sum(p ^ sd, dtype=jnp.int32)
                             .astype(jnp.float32)
                             + jnp.sum(s * sd.astype(jnp.float32))
                             + jnp.sum(m * sd.astype(jnp.float32)))
                        return acc + v, None
                    acc, _ = jax.lax.scan(body, jnp.float32(0), seeds)
                    return acc
                return run

            dt = timeit_diff(mk_floor, lin.packed, lin.scales, lin.mins)
            row.append(f"floor {dt*1e6:7.1f} us {nbytes/dt/1e9:6.1f} GB/s")

        # NOTE: no honest "xla" variant is possible — the in-graph dequant
        # is loop-invariant, so XLA hoists it out of any timing loop.

        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
