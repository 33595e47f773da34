#!/usr/bin/env python
"""Benchmark: Qwen2.5-0.5B-geometry Q4_K_M greedy decode on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference decodes Qwen2.5-0.5B Q4_K_M at ~1.2 tok/s on a
24-core i9-13900K (/root/reference/README.md:403, BASELINE.md).

The model is synthetic (no downloads possible here) but has the exact
tensor shapes and quantization mix of the real Q4_K_M file, so the memory
traffic and kernel mix match the real workload. Decode runs as a jitted
on-device lax.scan (no host round-trips).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, "bench_qwen25_05b_q4km.gguf")
    t0 = time.time()
    build_synthetic_gguf(path, preset="qwen2.5-0.5b", quant=GGMLType.Q4_K,
                         max_ctx=2048)
    build_s = time.time() - t0

    t0 = time.time()
    platform = jax.devices()[0].platform
    mode = "quant" if platform in ("tpu", "axon") else "dequant"
    params, cfg, _ = load_model(path, mode=mode)
    load_s = time.time() - t0

    batch = 1
    runner = ModelRunner(params, cfg, max_batch=batch, max_seq=1024,
                         matmul_precision="highest")

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=32).tolist()

    # prefill
    kv = runner.init_kv()
    t0 = time.time()
    logits, kv, pos = runner.prefill(prompt, kv)
    logits.block_until_ready()
    prefill_s = time.time() - t0

    first = jnp.argmax(logits)[None].astype(jnp.int32)
    pos0 = jnp.asarray([pos], jnp.int32)

    # warm up the decode scan (compile)
    steps = 64
    toks, kv = runner.greedy_decode(first, pos0, kv, steps)
    toks.block_until_ready()

    # timed: continue decoding from where we are
    best_tps = 0.0
    cur = toks[:, -1]
    cur_pos = pos0 + steps
    for _ in range(3):
        t0 = time.time()
        toks, kv = runner.greedy_decode(cur, cur_pos, kv, steps)
        toks.block_until_ready()
        dt = time.time() - t0
        best_tps = max(best_tps, steps / dt)
        cur = toks[:, -1]
        cur_pos = cur_pos + steps

    result = {
        "metric": "decode_tokens_per_s_qwen2.5-0.5b_q4km",
        "value": round(best_tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(best_tps / 1.2, 1),
    }
    print(json.dumps(result))
    print(
        json.dumps({
            "detail": {
                "platform": platform,
                "weight_mode": mode,
                "prefill_tokens": len(prompt),
                "prefill_s": round(prefill_s, 3),
                "build_s": round(build_s, 1),
                "load_s": round(load_s, 1),
                "total_s": round(time.time() - t_start, 1),
            }
        }),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
