#!/usr/bin/env python
"""Per-row ragged decode: mixed-length batch cost on the real chip.

The round-2 gap (VERDICT Missing #2): the decode-step KV read bound was
batch-GLOBAL, so one long sequence in a 32-stream batch made every row's
attention read the long bucket. The flash-decode kernel clamps each row's
KV blocks to its own length; this script measures three 32-stream decode
configurations on TinyLlama:

  short   all 32 rows at ~200 ctx  (read bucket 256)
  mixed   31 rows at ~200 ctx + ONE row at ~2000 ctx (bucket 2048)
  long    all 32 rows at ~2000 ctx (bucket 2048)

Per-row ragged reads => mixed ~= short; batch-global reads => mixed ~=
long. Prints one JSON line with the three per-step times and the ratio.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 32
STEPS = 64
SHORT = 200
LONG = 2000


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    import dataclasses

    import jax.numpy as jnp

    from llama_gguf_tpu.engine.runner import ModelRunner, read_bucket
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    path = os.path.join(cache, "bench_tinyllama_11b_q4km.gguf")
    build_synthetic_gguf(path, preset="tinyllama-1.1b", quant=GGMLType.Q4_K,
                         max_ctx=2048)
    params, cfg, _ = load_model(path, mode="quant", scale_dtype="bfloat16")
    runner = ModelRunner(params, cfg, max_batch=B, max_seq=2048,
                         matmul_precision="default", kv_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def fill_rows(lengths):
        kv = runner.init_kv()
        # chunked per-row prefill (prefill pads the FULL batch to the
        # bucket, so a 2000-token row at B=32 would shape a 65k-row
        # forward and OOM HBM; 256-token chunks mirror the batched
        # engine's chunked-prefill and cap the step at 8k rows)
        chunk = 256
        for b_idx, n in enumerate(lengths):
            ids = rng.integers(0, cfg.vocab_size, size=n).tolist()
            for off in range(0, n, chunk):
                _, kv, _ = runner.prefill(ids[off: off + chunk], kv,
                                          batch_idx=b_idx, start_pos=off)
        return kv

    def decode_time(lengths):
        kv = fill_rows(lengths)
        lens = np.asarray(lengths, np.int64)
        toks0 = jnp.asarray(rng.integers(0, cfg.vocab_size, size=B),
                            jnp.int32)
        pos0 = jnp.asarray(lens, jnp.int32)
        toks, kv = runner.greedy_decode(toks0, pos0, kv, steps=STEPS)
        np.asarray(toks)  # warm/compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            toks, kv = runner.greedy_decode(toks0, pos0, kv, steps=STEPS)
            np.asarray(toks)
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2] / STEPS

    short = decode_time([SHORT] * B)
    mixed = decode_time([SHORT] * (B - 1) + [LONG])
    longt = decode_time([LONG] * B)

    # where mixed lands between short (0.0) and long (1.0)
    frac = (mixed - short) / max(longt - short, 1e-9)
    print(json.dumps({
        "batch": B,
        "short_ms_per_step": round(short * 1e3, 3),
        "mixed_ms_per_step": round(mixed * 1e3, 3),
        "long_ms_per_step": round(longt * 1e3, 3),
        "mixed_position_0is_short_1is_long": round(frac, 3),
    }))


if __name__ == "__main__":
    main()
