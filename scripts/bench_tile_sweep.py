#!/usr/bin/env python
"""Sweep (tk, tn) tile choices for one qmatmul shape on the real chip.

The round-3 variant study showed the K-TILED path (tk=2048) 12-21% off the
HBM floor while full-K blocks sit at it — this sweep asks whether larger K
tiles (with narrower N to fit VMEM) recover the loss for shapes above
MAX_FULL_TK (e.g. the 8B ffn_down, K=14336).

Median-of-rounds differential timing (see bench_kernel_variants.py).
Usage: python scripts/bench_tile_sweep.py [q8|q4] [K] [N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N1, N2 = 50, 450
ROUNDS = 5
GROUP = 32


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return sorted(ts)[1]


def main():
    import jax

    import os as _os
    cache_dir = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".cache", "jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    import jax.numpy as jnp

    from llama_gguf_tpu.ops.qmatmul import _qmatmul_call

    fmt = sys.argv[1] if len(sys.argv) > 1 else "q8"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 14336
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    B = 8
    rng = np.random.default_rng(0)
    if fmt == "q8":
        packed = jnp.asarray(
            rng.integers(-127, 127, size=(K, N), dtype=np.int8))
    else:
        packed = jnp.asarray(
            rng.integers(0, 255, size=(K // 2, N), dtype=np.uint8))
    scales = jnp.asarray((rng.normal(size=(K // GROUP, N)) * 0.01)
                         .astype(np.float32)).astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    nbytes = packed.nbytes + scales.nbytes
    print(f"platform={jax.devices()[0].platform} fmt={fmt} K={K} N={N} "
          f"({nbytes/1e6:.1f} MB) rounds={ROUNDS} diff {N1}->{N2}")

    # candidate tiles: current production pick + bigger-K/narrower-N combos
    cands = []
    for tk in (2048, 3584, 7168, K):
        if K % tk:
            continue
        for tn in (512, 256, 128):
            if N % tn == 0 and (tk == K or tk % (8 * GROUP) == 0):
                cands.append((tk, tn))

    def mk(tk, tn, iters):
        seeds = jnp.arange(1, iters + 1, dtype=jnp.float32)

        @jax.jit
        def run(x, packed, scales):
            def body(acc, s):
                y = _qmatmul_call(x * s, packed, scales, None, fmt=fmt,
                                  group=GROUP, k=K, n=N, tk=tk, tn=tn,
                                  rb=B, interpret=False, precision="default")
                return acc + y[:, :8], None
            acc, _ = jax.lax.scan(body, jnp.zeros((B, 8), jnp.float32),
                                  seeds)
            return acc
        return run

    built = {}
    for tk, tn in cands:
        try:
            f1, f2 = mk(tk, tn, N1), mk(tk, tn, N2)
            f1(x, packed, scales).block_until_ready()
            built[(tk, tn)] = (f1, f2)
        except Exception as e:
            print(f"  tk={tk:6d} tn={tn:4d}  COMPILE FAIL: "
                  f"{str(e).splitlines()[0][:90]}", flush=True)

    dts = {key: [] for key in built}
    for r in range(ROUNDS):
        for key, (f1, f2) in built.items():
            t1 = timeit(f1, x, packed, scales)
            t2 = timeit(f2, x, packed, scales)
            dts[key].append(max(t2 - t1, 1e-9) / (N2 - N1))
    for (tk, tn), ds in dts.items():
        ds.sort()
        dt = ds[len(ds) // 2]
        spread = (ds[-1] - ds[0]) / dt if dt else 0
        print(f"  tk={tk:6d} tn={tn:4d} {dt*1e6:7.1f} us "
              f"{nbytes/dt/1e9:6.1f} GB/s  (spread {spread:.0%})",
              flush=True)


if __name__ == "__main__":
    main()
