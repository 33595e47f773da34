#!/usr/bin/env python
"""Does interleaving flash-decode calls with the fused qmatmul stream
destroy the weight DMA pipeline?

The round-3 decomposition: real 8B step = 18.4 ms with flash-decode, 10.7
without, yet flash_decode in isolation adds only ~0.6 ms/step
(bench_flash_kernel.py). This measures a synthetic layer loop that
interleaves BOTH custom-call types the way the real transformer does:

  weights_only      32 x qmatmul(shared 16 MB q8 panel, chained x)
  weights_xla       + XLA bucket attention per layer
  weights_flash     + flash_decode per layer (loop-carried caches)

If weights_flash >> weights_xla by far more than flash's isolated cost,
the loss is pipeline serialization between the two kernel families.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 32
BOUND = 256
S = 2048
KH, R, D = 8, 4, 128
K, N = 4096, 4096      # default panel; see --kn / --panels


def _sync(x):
    return np.asarray(x)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    # r3 ran 2 x 16.8 MB q8 panels and measured only +17 us/layer of
    # interleave cost vs the +240 in the real 8B step. The lost-DMA-overlap
    # hypothesis predicts the gap scales with per-layer weight bytes
    # (~176 MB/layer at 8B: 176 MB / ~800 GB/s = ~220 us of stream that
    # stops overlapping attention across the custom-call boundary).
    # --kn 4096 44032 --panels 4 reproduces real scale (4 x 180 MB resident).
    ap.add_argument("--kn", type=int, nargs=2, default=None)
    ap.add_argument("--panels", type=int, default=2)
    ap.add_argument("--iters", type=int, nargs=2, default=(10, 50))
    args = ap.parse_args()
    global K, N
    if args.kn:
        K, N = args.kn

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
    from llama_gguf_tpu.ops.linear import QuantLinear
    from llama_gguf_tpu.ops.qmatmul import qmatmul

    rng = np.random.default_rng(0)
    lins = []
    for _ in range(args.panels):  # distinct panels so layers don't CSE
        packed = jnp.asarray(rng.integers(-127, 127, size=(K, N),
                                          dtype=np.int8))
        scales = jnp.asarray((rng.normal(size=(K // 32, N)) * 0.01)
                             .astype(np.float32)).astype(jnp.bfloat16)
        lins.append(QuantLinear(packed, scales, None, None, fmt="q8",
                                group=32, k=K, n=N, source_type="probe"))
    wbytes = (sum(p.packed.nbytes + p.scales.nbytes for p in lins)
              / len(lins) * L)

    keys = [jnp.asarray(rng.normal(size=(1, S, KH, D)).astype(np.float32))
            .astype(jnp.bfloat16) for _ in range(L)]
    vals = [jnp.asarray(rng.normal(size=(1, S, KH, D)).astype(np.float32))
            .astype(jnp.bfloat16) for _ in range(L)]
    scale = 1.0 / (D ** 0.5)

    def attn_flash(q, k, v, posa, lena):
        return flash_decode(q, k, v, posa, lena, scale=scale, bound=BOUND)

    def attn_xla(q, k, v, posa, lena):
        return attention_scores(q, k[:, :BOUND].astype(jnp.float32),
                                v[:, :BOUND].astype(jnp.float32),
                                posa, lena, scale=scale)

    def mk(attn):
        def make(iters):
            qs = jnp.asarray(rng.normal(
                size=(iters, 1, 1, KH, R, D)).astype(np.float32))

            @jax.jit
            def run(keys, vals, qs, lins):
                def body(carry, q):
                    ks, vs, pos, x = carry
                    posa = jnp.full((1, 1), pos, jnp.int32)
                    lena = jnp.full((1,), pos + 1, jnp.int32)
                    nks, nvs = [], []
                    for l in range(L):
                        y = qmatmul(x, lins[l % len(lins)],
                                    precision="default")
                        x = x + y[:, :K] * 1e-6  # chain layers
                        if attn is not None:
                            o = attn(q, ks[l], vs[l], posa, lena)
                            x = x + jnp.sum(o) * 1e-9
                            newk = (q[:, 0, :, 0, :]
                                    .astype(ks[l].dtype)[:, None])
                            nks.append(jax.lax.dynamic_update_slice_in_dim(
                                ks[l], newk, pos, axis=1))
                            nvs.append(jax.lax.dynamic_update_slice_in_dim(
                                vs[l], newk, pos, axis=1))
                        else:
                            nks.append(ks[l])
                            nvs.append(vs[l])
                    return (tuple(nks), tuple(nvs), pos + 1, x), None
                x0 = jnp.ones((8, K), jnp.float32)
                carry, _ = jax.lax.scan(
                    body, (tuple(keys), tuple(vals), jnp.int32(5), x0), qs)
                return carry[3]
            return lambda: run(keys, vals, qs, lins)
        return make

    def timeit_diff(make, n1, n2):
        def t(n):
            fn = make(n)
            _sync(fn())
            ts = []
            for _ in range(3):
                t0 = time.time()
                _sync(fn())
                ts.append(time.time() - t0)
            return sorted(ts)[1]
        return max(t(n2) - t(n1), 1e-9) / (n2 - n1)

    res = {}
    for label, attn in (("weights_only", None), ("weights_xla", attn_xla),
                        ("weights_flash", attn_flash)):
        dt = timeit_diff(mk(attn), *args.iters)
        res[label] = {"us_per_iter": dt * 1e6,
                      "gbps": wbytes / dt / 1e9}
        print(f"{label:14s} {dt*1e6:9.1f} us/iter  {wbytes/dt/1e9:7.1f} GB/s",
              file=sys.stderr, flush=True)

    print(json.dumps(res, default=float))


if __name__ == "__main__":
    main()
