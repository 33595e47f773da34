#!/usr/bin/env python
"""Benchmark: greedy decode throughput on one TPU chip.

Two models, each in its OWN subprocess (stale params polluting HBM skew
same-process comparisons 10-100x on this chip):

  * TinyLlama-1.1B Q4_K_M  — the cross-round headline metric
  * Llama-3-8B Q4_K_M      — the BASELINE.md gate config

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}
(the TinyLlama number, comparable with BENCH_r01/r02). The 8B result and
all detail go to stderr as JSON.

Baselines: the reference decodes TinyLlama-1.1B Q4_K_M at ~1.5 tok/s and
Mistral-7B (nearest 8B-class model) at ~0.3 tok/s on a 24-core i9-13900K
(/root/reference/README.md:403-405, BASELINE.md).

Models are synthetic (no downloads here) with exact real-model tensor
shapes and the Q4_K_M quantization mix; decode runs as a jitted on-device
lax.scan; timing uses a full host fetch as the sync point
(block_until_ready is not a reliable barrier over the axon tunnel) and
reports the median of several repetitions.

Contention hardening: (1) persistent JAX compile cache under .cache/;
(2) the device bandwidth probe runs the SAME fused q8 dequant-matmul
kernel the decode path uses, on a synthetic weight — so
bw_efficiency = decode_gbps / probe_gbps lands in (0, 1] and a degraded
window actually trips the detector (a plain f32-matmul probe measured
~95 GB/s while decode moved 300+ — useless as a ceiling); (3) if decode
efficiency vs the probe is implausibly low, decode reps re-run (up to
MAX_ROUNDS) and the best round wins — contention can only make us look
slower, never faster, so max across rounds is sound.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

STEPS = 128
MAX_ROUNDS = 3
PLAUSIBLE_RATIO = 0.45  # decode effective-GB/s vs fused-kernel probe GB/s

PRESETS = {
    # preset -> (metric name, reference tok/s, reps, max_ctx)
    "tinyllama-1.1b": ("decode_tokens_per_s_tinyllama-1.1b_q4km", 1.5, 4,
                       2048),
    "llama3-8b": ("decode_tokens_per_s_llama3-8b_q4km", 0.3, 3, 2048),
}

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")


def _sync_fetch(x):
    return np.asarray(x)


def wait_for_device(max_wait_s: float = 1800.0) -> None:
    """The tunneled device service has multi-minute outage windows during
    which `jax.devices()` HANGS (not errors) — measured one ~40+ min outage.
    Probe device init in a SUBPROCESS (killable on timeout, unlike the
    in-process C extension call) and only proceed once a probe succeeds."""
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=60, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            if attempt > 1:
                print(f"bench: device back after {attempt} probes",
                      file=sys.stderr)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.time() > deadline:
                print("bench: device unreachable, proceeding anyway",
                      file=sys.stderr)
                return
            print(f"bench: device probe {attempt} failed/hung, retrying",
                  file=sys.stderr)
            time.sleep(30)


def measure_kernel_gbps(jax, jnp, iters: int = 40) -> float:
    """Fused-kernel bandwidth probe: the q8 dequant-matmul Pallas kernel
    (the decode hot path) on a synthetic ~113 MB weight, differential scan
    timing. This is the honest per-kernel ceiling for the decode number —
    decode can approach but not exceed it, so efficiency lands in (0, 1]."""
    from llama_gguf_tpu.ops.linear import QuantLinear
    from llama_gguf_tpu.ops.qmatmul import qmatmul

    k, n = 4096, 26624  # ~113 MB of int8 + bf16 scales: DMA-dominated
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(-127, 127, size=(k, n), dtype=np.int8))
    scales = jnp.asarray((rng.normal(size=(k // 32, n)) * 0.01)
                         .astype(np.float32)).astype(jnp.bfloat16)
    lin = QuantLinear(packed, scales, None, None, fmt="q8", group=32,
                      k=k, n=n, source_type="probe")
    x = jnp.asarray(rng.normal(size=(8, k)).astype(np.float32))
    nbytes = packed.nbytes + scales.nbytes

    def mk(m):
        seeds = jnp.arange(1, m + 1, dtype=jnp.float32)

        @jax.jit
        def run(x):
            def body(acc, s):
                return acc + qmatmul(x * s, lin, precision="default")[:, :8], None
            acc, _ = jax.lax.scan(body, jnp.zeros((8, 8), jnp.float32), seeds)
            return acc
        return run

    def t(m):
        fn = mk(m)
        _sync_fetch(fn(x))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _sync_fetch(fn(x))
            ts.append(time.time() - t0)
        return sorted(ts)[1]

    n1, n2 = 10, 10 + iters
    dt = max(t(n2) - t(n1), 1e-9) / (n2 - n1)
    return nbytes / dt / 1e9


def measure_prefill_device(jax, jnp, runner, cfg, prompt, n1=4, n2=12):
    """Device-true prefill throughput: the 512-token step chained N times
    inside one jitted lax.scan, differential-timed — no host dispatch, no
    logits fetch. The host-protocol number (prefill_tps_512) pays ~54 ms
    of tunnel dispatch + [V]-logits fetch per 10-73 ms of actual compute
    on this box, understating real prefill 5-8x (docs/ROOFLINE.md r3)."""
    from llama_gguf_tpu.models.transformer import forward

    T = len(prompt)
    toks = jnp.asarray(np.asarray(prompt, np.int32)[None, :])
    pos = jnp.asarray(np.arange(T, dtype=np.int32)[None, :])
    lengths = jnp.asarray([T], jnp.int32)
    lp = jnp.asarray([T - 1], jnp.int32)

    def mk(iters):
        seeds = jnp.arange(1, iters + 1, dtype=jnp.int32)

        @jax.jit
        def run(params, toks, pos, kv):
            def body(acc, sd):
                with jax.default_matmul_precision("default"):
                    logits, _ = forward(params, runner.cfg,
                                        (toks + sd) % cfg.vocab_size, pos,
                                        kv, lengths, read_bound=512,
                                        logit_positions=lp)
                return acc + logits[0, -1, :8], None
            acc, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), seeds)
            return acc
        return run

    kv = runner.init_kv()

    def t(m):
        fn = mk(m)
        _sync_fetch(fn(runner.params, toks, pos, kv))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _sync_fetch(fn(runner.params, toks, pos, kv))
            ts.append(time.time() - t0)
        return sorted(ts)[1]

    dt = max(t(n2) - t(n1), 1e-9) / (n2 - n1)
    return T / dt


def measure_mixed_batch(jax, jnp, params, cfg, max_ctx, b=32, steps=64):
    """32-stream ragged serving cost (the BASELINE '@ 32 concurrent
    streams' config): ms/step for an all-short batch vs the same batch
    with ONE ~2k-context straggler. The two-tier ragged read
    (engine/runner.pick_read_bound) keeps mixed ~= short; a batch-global
    bucket would pay the straggler's bucket on all 32 rows
    (docs/ROOFLINE.md)."""
    from llama_gguf_tpu.engine.runner import ModelRunner

    rng = np.random.default_rng(1)
    runner = ModelRunner(params, cfg, max_batch=b, max_seq=max_ctx,
                         matmul_precision="default", kv_dtype=jnp.bfloat16)

    def run(lengths):
        kv = runner.init_kv()
        chunk = 256  # batched prefill pads all B rows to the bucket: chunk
        for i, n in enumerate(lengths):
            ids = rng.integers(0, cfg.vocab_size, size=n).tolist()
            for off in range(0, n, chunk):
                _, kv, _ = runner.prefill(ids[off: off + chunk], kv,
                                          batch_idx=i, start_pos=off)
        toks0 = jnp.asarray(rng.integers(0, cfg.vocab_size, size=b),
                            jnp.int32)
        pos0 = jnp.asarray(lengths, jnp.int32)
        toks, kv = runner.greedy_decode(toks0, pos0, kv, steps=steps)
        _sync_fetch(toks)
        ts = []
        for _ in range(3):
            t0 = time.time()
            toks, kv = runner.greedy_decode(toks0, pos0, kv, steps=steps)
            _sync_fetch(toks)
            ts.append(time.time() - t0)
        return sorted(ts)[1] / steps

    long_ctx = min(2000, max_ctx - steps - 8)
    short = run([200] * b)
    mixed = run([200] * (b - 1) + [long_ctx])
    return {"batch": b, "long_ctx": long_ctx,
            "short_ms_per_step": round(short * 1e3, 3),
            "mixed_ms_per_step": round(mixed * 1e3, 3),
            "mixed_over_short": round(mixed / short, 3)}


def run_decode_reps(runner, cur0, kv, pos, jnp, reps):
    """Timed greedy-decode rounds of STEPS tokens, every rep from the SAME
    start position (llama.cpp tg128 protocol) so the KV read-bound — and
    therefore the compiled scan — is identical across reps; one untimed
    warm-up rep pays the compile. Returns (times, kv)."""
    pos_arr = jnp.asarray([pos], jnp.int32)
    toks, kv = runner.greedy_decode(cur0, pos_arr, kv, steps=STEPS)  # warm
    _sync_fetch(toks)
    times = []
    for _ in range(reps):
        t0 = time.time()
        toks, kv = runner.greedy_decode(cur0, pos_arr, kv, steps=STEPS)
        _sync_fetch(toks)  # hard sync: full host fetch
        times.append(time.time() - t0)
    return times, kv


def bench_single(preset: str) -> None:
    metric, baseline_tps, reps, max_ctx = PRESETS[preset]
    t_start = time.time()
    os.makedirs(CACHE, exist_ok=True)
    wait_for_device()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(CACHE, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    import jax.numpy as jnp

    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    path = os.path.join(
        CACHE, "bench_tinyllama_11b_q4km.gguf"
        if preset == "tinyllama-1.1b" else f"{preset}-q4km.gguf")
    if preset == "llama3-8b":
        path = os.path.join(CACHE, "llama3-8b-q4km.gguf")
    t0 = time.time()
    build_synthetic_gguf(path, preset=preset, quant=GGMLType.Q4_K,
                         max_ctx=max_ctx)
    build_s = time.time() - t0

    t0 = time.time()
    platform = jax.devices()[0].platform
    mode = "quant" if platform in ("tpu", "axon") else "dequant"
    # bf16 scale/min panels: f32 panels add ~1.5 bits/weight of HBM traffic
    # on q4 layouts; bf16 halves that at ~0.4% relative dequant error — the
    # bench already trades exactness for speed with matmul_precision=
    # "default" (llama.cpp-parity runs use f32/highest).
    params, cfg, gguf = load_model(path, mode=mode, scale_dtype="bfloat16")
    qtypes = {}
    for info in gguf.tensors.values():
        qtypes[info.ggml_type.name] = qtypes.get(info.ggml_type.name, 0) + 1
    weight_bytes = sum(i.nbytes for i in gguf.tensors.values())
    load_s = time.time() - t0

    if mode == "quant":
        # Mosaic-vs-XLA numeric gate on the real chip: a kernel lowering
        # regression fails the bench loudly instead of shipping bad numbers
        from llama_gguf_tpu.ops.parity import (
            kernel_parity_check, moe_kernel_parity_check,
        )

        kernel_parity_check(params)
        moe_kernel_parity_check()

    probe_gbps = measure_kernel_gbps(jax, jnp)

    # bf16 KV cache: llama.cpp's default KV type is f16, so this matches
    # the reference's memory traffic; attention reads only the live
    # read_bucket of the cache (ragged decode), not the padded max_seq
    runner = ModelRunner(params, cfg, max_batch=1, max_seq=max_ctx,
                         matmul_precision="default",
                         kv_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=32).tolist()

    # prefill (first call includes compile)
    kv = runner.init_kv()
    t0 = time.time()
    logits, kv, pos = runner.prefill(prompt, kv)
    _sync_fetch(logits)
    prefill_s = time.time() - t0

    # steady-state prefill throughput at a 512-token bucket
    long_prompt = rng.integers(0, cfg.vocab_size, size=512).tolist()
    kv2 = runner.init_kv()
    lg, kv2, _ = runner.prefill(long_prompt, kv2)  # compile
    _sync_fetch(lg)
    pf_times = []
    for _ in range(3):
        kv2 = runner.init_kv()
        t0 = time.time()
        lg, kv2, _ = runner.prefill(long_prompt, kv2)
        _sync_fetch(lg)
        pf_times.append(time.time() - t0)
    pf_times.sort()
    prefill_tps = 512 / pf_times[len(pf_times) // 2]
    del kv2, lg
    prefill_tps_device = measure_prefill_device(jax, jnp, runner, cfg,
                                                long_prompt)

    cur0 = jnp.argmax(logits)[None].astype(jnp.int32)
    rounds = []
    best_times = None
    for rnd in range(MAX_ROUNDS):
        times, kv = run_decode_reps(runner, cur0, kv, pos, jnp, reps)
        times.sort()
        med = times[len(times) // 2]
        eff = weight_bytes / med * STEPS / 1e9
        rounds.append({"median_s": round(med, 3),
                       "effective_gbps": round(eff, 1),
                       "rep_seconds": [round(t, 3) for t in times]})
        if best_times is None or med < best_times[len(best_times) // 2]:
            best_times = times
        if eff / max(probe_gbps, 1e-9) >= PLAUSIBLE_RATIO:
            break
        # implausibly slow vs the kernel probe: likely a contention
        # window — remeasure the probe and retry
        probe_gbps = max(probe_gbps, measure_kernel_gbps(jax, jnp))

    # long-context decode: same engine at ~full cache (the ragged
    # read-bound makes this nearly as fast as short-context)
    pos_long = runner.max_seq - STEPS - 8
    long_times, kv = run_decode_reps(runner, cur0, kv, pos_long, jnp, reps=2)
    long_times.sort()
    decode_tps_long = STEPS / long_times[0]

    mixed_batch = None
    if preset == "tinyllama-1.1b":
        mixed_batch = measure_mixed_batch(jax, jnp, params, cfg, max_ctx)

    times = best_times
    median = times[len(times) // 2]
    tps = STEPS / median
    effective_gbps = weight_bytes / median * STEPS / 1e9
    probe_gbps = max(probe_gbps, measure_kernel_gbps(jax, jnp))
    ratio = effective_gbps / max(probe_gbps, 1e-9)
    result = {
        "metric": metric,
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / baseline_tps, 1),
    }
    print(json.dumps(result), flush=True)
    print(
        json.dumps({
            "detail": {
                "preset": preset,
                "platform": platform,
                "weight_mode": mode,
                "tensor_types": qtypes,
                "weight_bytes": weight_bytes,
                "effective_gbps": round(effective_gbps, 1),
                "kernel_probe_gbps": round(probe_gbps, 1),
                "bw_efficiency": round(ratio, 3),
                "degraded_window_suspected": ratio < PLAUSIBLE_RATIO,
                "decode_rounds": rounds,
                "decode_tps_long_ctx": round(decode_tps_long, 1),
                "mixed_batch_32": mixed_batch,
                "rep_seconds": [round(t, 3) for t in times],
                "prefill_tokens": len(prompt),
                "prefill_s_incl_compile": round(prefill_s, 3),
                "prefill_tps_512": round(prefill_tps, 1),
                "prefill_tps_512_device": round(prefill_tps_device, 1),
                "build_s": round(build_s, 1),
                "load_s": round(load_s, 1),
                "total_s": round(time.time() - t_start, 1),
            }
        }),
        file=sys.stderr, flush=True,
    )


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        bench_single(sys.argv[2])
        return

    presets = ["tinyllama-1.1b", "llama3-8b"]
    env_preset = os.environ.get("LLAMA_GGUF_BENCH_PRESET")
    if len(sys.argv) > 2 and sys.argv[1] == "--preset":
        presets = [sys.argv[2]]
    elif env_preset:
        presets = env_preset.split(",")

    t_start = time.time()
    results = {}
    for preset in presets:
        # one subprocess per model: a fresh process = clean HBM (stale
        # params from a previous load measurably slow the next model)
        budget = 2400 if preset == "llama3-8b" else 1500
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single",
                 preset],
                capture_output=True, text=True, timeout=budget)
        except subprocess.TimeoutExpired:
            print(f"bench: {preset} subprocess timed out", file=sys.stderr)
            results[preset] = None
            continue
        sys.stderr.write(proc.stderr)
        line = None
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = ln
        if line is None:
            print(f"bench: {preset} produced no metric (rc={proc.returncode})",
                  file=sys.stderr)
            results[preset] = None
            continue
        results[preset] = json.loads(line)

    # stdout: ONE JSON line — the TinyLlama headline (cross-round metric).
    # The 8B result (BASELINE config) rides stderr as its own JSON line.
    headline = results.get(presets[0])
    if headline is None:
        headline = {"metric": "decode_tokens_per_s", "value": 0.0,
                    "unit": "tok/s", "vs_baseline": 0.0,
                    "error": "bench failed"}
    for preset, res in results.items():
        if preset != presets[0] and res is not None:
            print(json.dumps(res), file=sys.stderr, flush=True)
    print(json.dumps({"bench_total_s": round(time.time() - t_start, 1),
                      "models": {k: (v or {"error": "failed"})
                                 for k, v in results.items()}}),
          file=sys.stderr, flush=True)
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
