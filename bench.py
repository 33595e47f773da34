#!/usr/bin/env python
"""Benchmark: TinyLlama-1.1B-geometry Q4_K_M greedy decode on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference decodes TinyLlama-1.1B Q4_K_M at ~1.5 tok/s on a
24-core i9-13900K (/root/reference/README.md:404, BASELINE.md).

The model is synthetic (no downloads possible here) but has the exact tensor
shapes of the real TinyLlama-1.1B with the Q4_K_M quantization mix — every
matmul dimension is 256-divisible, so all weights are genuinely quantized
and run through the fused dequant-matmul Pallas kernels. Decode runs as a
jitted on-device lax.scan; timing uses a full host fetch of the generated
tokens as the sync point (block_until_ready alone is not a reliable barrier
over the axon tunnel) and reports the median of several repetitions.
"""

import json
import os
import sys
import time

import numpy as np

PRESET = "tinyllama-1.1b"
BASELINE_TPS = 1.5  # reference CPU decode for this model (README.md:404)
STEPS = 128
REPS = 4


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
    path = os.path.join(cache_dir, "bench_tinyllama_11b_q4km.gguf")
    t0 = time.time()
    build_synthetic_gguf(path, preset=PRESET, quant=GGMLType.Q4_K,
                         max_ctx=2048)
    build_s = time.time() - t0

    t0 = time.time()
    platform = jax.devices()[0].platform
    mode = "quant" if platform in ("tpu", "axon") else "dequant"
    params, cfg, gguf = load_model(path, mode=mode)
    qtypes = {}
    for info in gguf.tensors.values():
        qtypes[info.ggml_type.name] = qtypes.get(info.ggml_type.name, 0) + 1
    weight_bytes = sum(i.nbytes for i in gguf.tensors.values())
    load_s = time.time() - t0

    # bf16 KV cache: llama.cpp's default KV type is f16, so this matches
    # the reference's memory traffic; decode reads the whole padded cache
    # each step, so halving it is a direct decode win
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=2048,
                         matmul_precision="default",
                         kv_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=32).tolist()

    # prefill (first call includes compile)
    kv = runner.init_kv()
    t0 = time.time()
    logits, kv, pos = runner.prefill(prompt, kv)
    np.asarray(logits)
    prefill_s = time.time() - t0

    # steady-state prefill throughput at a 512-token bucket
    long_prompt = rng.integers(0, cfg.vocab_size, size=512).tolist()
    kv2 = runner.init_kv()
    lg, kv2, _ = runner.prefill(long_prompt, kv2)  # compile
    np.asarray(lg)
    pf_times = []
    for _ in range(3):
        kv2 = runner.init_kv()
        t0 = time.time()
        lg, kv2, _ = runner.prefill(long_prompt, kv2)
        np.asarray(lg)
        pf_times.append(time.time() - t0)
    pf_times.sort()
    prefill_tps = 512 / pf_times[len(pf_times) // 2]
    del kv2

    cur = jnp.argmax(logits)[None].astype(jnp.int32)
    times = []
    for i in range(REPS + 1):
        t0 = time.time()
        toks, kv = runner.greedy_decode(
            cur, jnp.asarray([pos], jnp.int32), kv, steps=STEPS)
        np.asarray(toks)  # hard sync: full host fetch
        dt = time.time() - t0
        if i > 0:  # rep 0 pays the scan compile
            times.append(dt)
        cur = toks[:, -1]
        pos += STEPS

    times.sort()
    median = times[len(times) // 2]
    tps = STEPS / median
    result = {
        "metric": "decode_tokens_per_s_tinyllama-1.1b_q4km",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / BASELINE_TPS, 1),
    }
    print(json.dumps(result))
    print(
        json.dumps({
            "detail": {
                "platform": platform,
                "weight_mode": mode,
                "tensor_types": qtypes,
                "weight_bytes": weight_bytes,
                "effective_gbps": round(weight_bytes / median * STEPS / 1e9, 1),
                "rep_seconds": [round(t, 3) for t in times],
                "prefill_tokens": len(prompt),
                "prefill_s_incl_compile": round(prefill_s, 3),
                "prefill_tps_512": round(prefill_tps, 1),
                "build_s": round(build_s, 1),
                "load_s": round(load_s, 1),
                "total_s": round(time.time() - t_start, 1),
            }
        }),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
