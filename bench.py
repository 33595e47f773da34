#!/usr/bin/env python
"""Benchmark: greedy decode throughput on one TPU chip.

Two models, each in its OWN subprocess (stale params polluting HBM skew
same-process comparisons 10-100x on this chip):

  * TinyLlama-1.1B Q4_K_M  — the cross-round headline metric
  * Llama-3-8B Q4_K_M      — the BASELINE.md gate config

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}
(the TinyLlama number, comparable with BENCH_r01..r03) — emitted the
MOMENT preset 1 finishes, before the 8B preset even starts, so a driver
timeout can never eat the headline again (r3 post-mortem: rc=124 with
nothing on stdout because the headline printed only after all presets).
The 8B result and all detail go to stderr as JSON lines.

Budget discipline: total wall-clock budget from $LLAMA_GGUF_BENCH_BUDGET_S
(default 1650 s — r2's passing artifact took 565 s; r3 died past ~30 min;
r4 measured warm envelopes: TL ~743 s, 8B ~733 s). The flagship 8B
preset's warm envelope is RESERVED up front (r5): TinyLlama's subprocess
budget is capped at total - reserve, so the BASELINE config can no longer
lose the budget race to the warm-up act (it did, four rounds running).
The 8B preset runs only if the measured-remaining budget fits its
warm-cache estimate; otherwise it emits an honest
{"llama3-8b": {"skipped": "budget"}} instead of hanging.

Short- and long-context decode are INTERLEAVED in one window
(run_decode_paired) and the long/short ratio is reported as a paired
statistic; the kernel bandwidth probe treats a non-positive differential
as a FAILED measurement (retry, then kernel_probe_gbps: null +
probe_failed: true) instead of fabricating an impossible ceiling
(BENCH_r04 shipped 4.6e9 GB/s and a false degraded flag from that path). The 8B synthetic
GGUF + repack sidecar are built lazily on first use and cached in
.cache/ — a COLD cache (build + repack ~8 min at 8B scale) never fits a
shared budget, so cold runs skip with reason "cold-cache" and leave a
note; run `python bench.py --prepare` once (outside any timed window) to
warm it.

Baselines: the reference decodes TinyLlama-1.1B Q4_K_M at ~1.5 tok/s and
Mistral-7B (nearest 8B-class model) at ~0.3 tok/s on a 24-core i9-13900K
(/root/reference/README.md:403-405, BASELINE.md).

Models are synthetic (no downloads here) with exact real-model tensor
shapes and the Q4_K_M quantization mix; decode runs as a jitted on-device
lax.scan; timing uses a full host fetch as the sync point
(block_until_ready is not a reliable barrier over the axon tunnel) and
reports the median of several repetitions. Short-context and long-context
decode use the SAME protocol (reps, retry rounds, median statistic) so
long-vs-short is a real comparison, not best-of-2 noise-picking (r3
weak #3).

Contention hardening: (1) persistent JAX compile cache under .cache/;
(2) the device bandwidth probe runs the SAME fused q8 dequant-matmul
kernel the decode path uses, on a synthetic weight — so
bw_efficiency = decode_gbps / probe_gbps lands in (0, 1] and a degraded
window actually trips the detector; (3) if decode efficiency vs the probe
is implausibly low, decode reps re-run (up to MAX_ROUNDS) and the best
round wins — contention can only make us look slower, never faster, so
max across rounds is sound.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

STEPS = 128
MAX_ROUNDS = 3
PLAUSIBLE_RATIO = 0.40  # decode effective-GB/s vs fused-kernel probe GB/s
MARGIN_S = 45           # reserve for interpreter startup + summary prints
# The v5e HBM spec is 819 GB/s and the measured in-window floors top out
# ~840; a probe above that means the differential timing failed (t(n2)
# barely above t(n1): XLA hoisting or window noise), not that the kernel
# beat the memory bus. BENCH_r04 shipped 4.6e9 GB/s from an unchecked
# version of this failure mode (VERDICT r4 Weak #1); r5 runs slipped
# 1839 and then 926 GB/s under looser ceilings, the latter false-flagging
# the fastest TinyLlama run ever as a degraded window.
PROBE_CEILING_GBPS = 860.0

PRESETS = {
    # preset -> dict of per-model knobs. est_warm_s: measured warm-cache
    # wall-clock envelope for the whole subprocess (compile cache + gguf +
    # repack sidecar present), used by the budget gate in main().
    "tinyllama-1.1b": {
        "metric": "decode_tokens_per_s_tinyllama-1.1b_q4km",
        "baseline_tps": 1.5, "reps": 4, "max_ctx": 2048,
        # mixed steps=48: 200+48 stays inside the 256 read bucket, so the
        # timed decode is ONE compiled scan segment instead of two
        "mixed": {"b": 32, "steps": 48}, "est_warm_s": 620,
        # schedule-efficiency gate (VERDICT r4 #6): decode effective GB/s
        # vs the same-window kernel probe. Thresholds are per-preset: the
        # TinyLlama chain is only ~70% of floor with glue ~20% of the step
        # (docs/ROOFLINE.md — small shapes), r5 measured 0.41-0.52 across
        # windows (378 GB/s effective after the full-bound policy); 8B
        # measured 0.76-0.99.
        "sched_gate": 0.40,
        "gguf": "bench_tinyllama_11b_q4km.gguf",
    },
    "llama3-8b": {
        "metric": "decode_tokens_per_s_llama3-8b_q4km",
        "baseline_tps": 0.3, "reps": 3, "max_ctx": 2048,
        "mixed": {"b": 16, "steps": 32}, "est_warm_s": 750,
        "sched_gate": 0.65,
        "gguf": "llama3-8b-q4km.gguf",
    },
}

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")


def _sync_fetch(x):
    return np.asarray(x)


def wait_for_device(max_wait_s: float = 600.0) -> None:
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


def differential_gbps(time_fn, nbytes: int, n1: int, n2: int,
                      max_attempts: int = 3) -> float | None:
    """Bandwidth from differential scan timing: (t(n2) - t(n1)) / (n2 - n1)
    per iteration. A non-positive or implausibly small differential means
    the MEASUREMENT failed (XLA hoisted the kernel, or window noise swamped
    the delta) — clamping it to an epsilon fabricates a multi-billion-GB/s
    ceiling (BENCH_r04's kernel_probe_gbps: 4.6e9). Instead: retry with a
    longer second scan (a bigger delta is harder for noise to erase), and
    if every attempt is degenerate return None — an explicit probe failure
    the caller must surface, not a number."""
    for attempt in range(max_attempts):
        dt = (time_fn(n2) - time_fn(n1)) / (n2 - n1)
        if dt > 0 and nbytes / dt / 1e9 <= PROBE_CEILING_GBPS:
            return nbytes / dt / 1e9
        n2 = n1 + (n2 - n1) * 2  # double the delta and re-measure
    return None


def measure_kernel_gbps(jax, jnp, iters: int = 40) -> float | None:
    """Fused-kernel bandwidth probe: the q8 dequant-matmul Pallas kernel
    (the decode hot path) on a synthetic ~113 MB weight, differential scan
    timing. This is the honest per-kernel ceiling for the decode number —
    decode can approach but not exceed it, so efficiency lands in (0, 1].
    Returns None when the differential is degenerate after retries (failed
    measurement — callers emit probe_failed rather than a fake ceiling)."""
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

    return differential_gbps(t, nbytes, 10, 10 + iters)


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


def measure_mixed_batch(jax, jnp, params, cfg, max_ctx, b, steps):
    """Ragged serving cost (the BASELINE '@ N concurrent streams' config):
    ms/step for an all-short batch vs the same batch with ONE ~2k-context
    straggler. The two-tier ragged read (engine/runner.pick_read_bound)
    keeps mixed ~= short; a batch-global bucket would pay the straggler's
    bucket on all rows (docs/ROOFLINE.md).

    Runs in the same process AFTER the single-stream reps (a second
    runner's KV allocs can pessimize absolutes on this chip — CLAUDE.md);
    the mixed/short RATIO is internally consistent, and the JSON carries a
    same_process note so absolutes aren't over-read."""
    from llama_gguf_tpu.engine.runner import ModelRunner, read_bucket

    rng = np.random.default_rng(1)
    runner = ModelRunner(params, cfg, max_batch=b, max_seq=max_ctx,
                         matmul_precision="default", kv_dtype=jnp.bfloat16)

    def run(lengths):
        t0 = time.time()
        kv = runner.init_kv()
        # batched prefill pads ALL B rows to the chunk bucket, so the
        # forward runs B*chunk rows; cap that at 4096 — 32 streams x 256
        # tokens = 8192 rows OOM'd 18.3 GB HBM at 8B (f32 hidden temps,
        # r5; same family as the r3 65k-row prefill OOM)
        chunk = max(64, 4096 // b)
        ids = [rng.integers(0, cfg.vocab_size, size=n) for n in lengths]
        # common prefix: fill ALL rows per step call — per-row prefill
        # dispatched ~100 host round-trips per run (~100 s over the
        # tunnel); the batched fill pays len(common)/chunk calls total
        common = min(lengths)
        for off in range(0, common, chunk):
            t = min(chunk, common - off)
            toks = np.zeros((b, t), np.int32)
            pos = np.full((b, t), runner.max_seq, np.int32)  # OOB -> drop
            for i in range(b):
                toks[i, :t] = ids[i][off: off + t]
                pos[i, :t] = off + np.arange(t)
            lens_now = np.full((b,), off + t, np.int32)
            _, kv = runner.step(
                jnp.asarray(toks), jnp.asarray(pos), jnp.asarray(lens_now),
                kv, read_bound=read_bucket(off + t, runner.max_seq),
                logit_positions=np.full((b,), t - 1, np.int32))
        # per-row tails (the stragglers beyond the common prefix)
        for i, n in enumerate(lengths):
            for off in range(common, n, chunk):
                _, kv, _ = runner.prefill(ids[i][off: off + chunk].tolist(),
                                          kv, batch_idx=i, start_pos=off)
        print(f"bench: mixed_batch prefill({max(lengths)}) "
              f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
        toks0 = jnp.asarray(rng.integers(0, cfg.vocab_size, size=b),
                            jnp.int32)
        pos0 = jnp.asarray(lengths, jnp.int32)
        toks, kv = runner.greedy_decode(toks0, pos0, kv, steps=steps)
        _sync_fetch(toks)
        print(f"bench: mixed_batch warm decode {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
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
            "mixed_over_short": round(mixed / short, 3),
            "same_process": True}


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


def run_decode_rounds(runner, cur0, kv, pos, jax, jnp, reps, weight_bytes,
                      probe_gbps):
    """The full decode protocol: up to MAX_ROUNDS rounds of `reps` reps,
    median within a round, best round wins, a round retries only when its
    efficiency vs the fused-kernel probe is implausibly low (contention
    window). A failed probe (None) can't judge plausibility, so it never
    triggers retries. Returns (rounds_detail, best_times, probe_gbps, kv)."""
    rounds = []
    best_times = None
    for _ in range(MAX_ROUNDS):
        times, kv = run_decode_reps(runner, cur0, kv, pos, jnp, reps)
        times.sort()
        med = times[len(times) // 2]
        eff = weight_bytes / med * STEPS / 1e9
        rounds.append({"median_s": round(med, 3),
                       "effective_gbps": round(eff, 1),
                       "rep_seconds": [round(t, 3) for t in times]})
        if best_times is None or med < best_times[len(best_times) // 2]:
            best_times = times
        if probe_gbps is None or eff / probe_gbps >= PLAUSIBLE_RATIO:
            break
        # implausibly slow vs the kernel probe: likely a contention
        # window — remeasure the probe and retry
        p2 = measure_kernel_gbps(jax, jnp)
        if p2 is not None:
            probe_gbps = max(probe_gbps, p2)
    return rounds, best_times, probe_gbps, kv


def run_decode_paired(runner, cur0, kv, pos_short, pos_long, jax, jnp, reps,
                      weight_bytes, probe_gbps, time_left=None):
    """Interleaved short/long decode (VERDICT r4 #4): each round runs
    `reps` short-context reps immediately followed by `reps` long-context
    reps in the SAME window, so long/short is a PAIRED ratio instead of
    two phases ~4 minutes apart riding window drift (r4 shipped long 6%
    *faster* than short — physically impossible for a bigger KV read).

    Statistics: per round, median of each side and ratio = long/short;
    across rounds, each side's best median wins (contention only slows,
    never speeds) while the reported ratio is the MEDIAN of per-round
    paired ratios. At least 2 rounds always run (a 1-sample ratio is not
    a statistic); a 3rd only if the short side looks contention-degraded
    vs the probe. Returns (detail_dict, best_short, best_long, probe, kv)."""
    rounds = []
    best_s = best_l = None
    for rnd in range(MAX_ROUNDS):
        ts, kv = run_decode_reps(runner, cur0, kv, pos_short, jnp, reps)
        tl, kv = run_decode_reps(runner, cur0, kv, pos_long, jnp, reps)
        ts.sort(), tl.sort()
        ms, ml = ts[len(ts) // 2], tl[len(tl) // 2]
        eff = weight_bytes / ms * STEPS / 1e9
        rounds.append({
            "short_median_s": round(ms, 3), "long_median_s": round(ml, 3),
            "short_effective_gbps": round(eff, 1),
            "paired_long_over_short": round(ml / ms, 3),
            "short_rep_seconds": [round(t, 3) for t in ts],
            "long_rep_seconds": [round(t, 3) for t in tl]})
        if best_s is None or ms < best_s[len(best_s) // 2]:
            best_s = ts
        if best_l is None or ml < best_l[len(best_l) // 2]:
            best_l = tl
        if rnd >= 1 and (probe_gbps is None
                         or eff / probe_gbps >= PLAUSIBLE_RATIO):
            break
        if time_left is not None and time_left() < 90:
            break  # budget squeeze: ship what we have, skip extra rounds
        if 1 <= rnd < MAX_ROUNDS - 1:
            # degraded short round: refresh the probe and retry (pointless
            # on the final round — nothing would consume the new value)
            p2 = measure_kernel_gbps(jax, jnp)
            if p2 is not None:
                probe_gbps = max(probe_gbps, p2)
    ratios = sorted(r["paired_long_over_short"] for r in rounds)
    detail = {"rounds": rounds,
              "paired_long_over_short": ratios[len(ratios) // 2]}
    return detail, best_s, best_l, probe_gbps, kv


def bench_single(preset: str, budget_s: float) -> None:
    p = PRESETS[preset]
    metric, baseline_tps = p["metric"], p["baseline_tps"]
    reps, max_ctx = p["reps"], p["max_ctx"]
    t_start = time.time()
    deadline = t_start + budget_s

    def remaining():
        return deadline - time.time()

    os.makedirs(CACHE, exist_ok=True)

    phases = {}
    _last = [time.time()]

    def mark(name):
        now = time.time()
        phases[name] = round(now - _last[0], 1)
        _last[0] = now

    wait_for_device(max_wait_s=min(600.0, budget_s / 3))
    mark("device_probe")

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

    path = os.path.join(CACHE, p["gguf"])
    t0 = time.time()
    build_synthetic_gguf(path, preset=preset, quant=GGMLType.Q4_K,
                         max_ctx=max_ctx)
    build_s = time.time() - t0
    mark("build")

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
    mark("load")

    if mode == "quant":
        # Mosaic-vs-XLA numeric gate on the real chip: a kernel lowering
        # regression fails the bench loudly instead of shipping bad numbers
        from llama_gguf_tpu.ops.parity import (
            kernel_parity_check, moe_kernel_parity_check,
        )

        kernel_parity_check(params)
        # The MoE gate pays two Mosaic kernel compiles (~200-400 s in slow
        # tunnel-compile windows); one run per bench invocation is enough
        # to catch a lowering regression — the parent sets the skip for
        # presets after the first (r5: the gate cost 670 s across both
        # children in one window).
        if not os.environ.get("LLAMA_GGUF_SKIP_MOE_PARITY"):
            moe_kernel_parity_check()
    mark("parity_gate")

    probe_gbps = measure_kernel_gbps(jax, jnp)
    mark("kernel_probe")

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
    mark("prefill_first")

    # interleaved short/long decode rounds — the headline statistic AND the
    # paired long/short ratio come out of one window (VERDICT r4 #4)
    cur0 = jnp.argmax(logits)[None].astype(jnp.int32)
    pos_long = runner.max_seq - STEPS - 8
    paired, best_times, long_best, probe_gbps, kv = run_decode_paired(
        runner, cur0, kv, pos, pos_long, jax, jnp, reps, weight_bytes,
        probe_gbps, time_left=remaining)
    mark("decode_paired")

    times = best_times
    median = times[len(times) // 2]
    tps = STEPS / median
    effective_gbps = weight_bytes / median * STEPS / 1e9
    decode_long = STEPS / long_best[len(long_best) // 2]

    # EMIT THE HEADLINE NOW — everything after this point is optional
    # detail that a budget squeeze may skip, and must not gate the metric.
    result = {
        "metric": metric,
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / baseline_tps, 1),
    }
    print(json.dumps(result), flush=True)

    # mixed-batch serving FIRST among the detail phases: the BASELINE
    # flagship story needs the B=16 mixed ratio more than prefill detail
    # (r5 dry run: a 491 s tunnel stall inside one decode rep left 69 s
    # and the 8B mixed block was skipped — priority order now matches
    # metric priority)
    mixed_batch = None
    if remaining() > 120:
        mixed_batch = measure_mixed_batch(jax, jnp, params, cfg, max_ctx,
                                          **p["mixed"])
        mark("mixed_batch")
    else:
        mixed_batch = {"skipped": "budget",
                       "remaining_s": round(remaining(), 1)}

    # steady-state prefill throughput at a 512-token bucket (detail only —
    # measured after the headline so a budget squeeze can skip it)
    prefill_tps = prefill_tps_device = None
    if remaining() > 90:
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
        mark("prefill_meas")

    if remaining() > 60:
        p2 = measure_kernel_gbps(jax, jnp)
        if p2 is not None:
            probe_gbps = max(probe_gbps or 0.0, p2)
    ratio = (effective_gbps / probe_gbps) if probe_gbps else None
    print(
        json.dumps({
            "detail": {
                "preset": preset,
                "platform": platform,
                "weight_mode": mode,
                "tensor_types": qtypes,
                "weight_bytes": weight_bytes,
                "effective_gbps": round(effective_gbps, 1),
                "kernel_probe_gbps":
                    round(probe_gbps, 1) if probe_gbps else None,
                "probe_failed": probe_gbps is None,
                "bw_efficiency":
                    round(ratio, 3) if ratio is not None else None,
                "degraded_window_suspected":
                    ratio < PLAUSIBLE_RATIO if ratio is not None else None,
                # schedule-efficiency regression gate (VERDICT r4 #6): the
                # CONTROLLABLE part of the roofline story is how close the
                # full step runs to the fused-kernel ceiling measured in
                # the same window; the kernel-arithmetic gap to raw HBM
                # floor is a measured ceiling, not schedule waste
                # (docs/ROOFLINE.md). Threshold is per-preset (PRESETS
                # sched_gate) — set to trip on scheduling regressions,
                # not window noise.
                "schedule_gate_threshold": p["sched_gate"],
                "schedule_gate_pass":
                    (ratio >= p["sched_gate"]) if ratio is not None
                    else None,
                "decode_tps_long_ctx": round(decode_long, 1),
                "paired_long_over_short": paired["paired_long_over_short"],
                "decode_rounds_paired": paired["rounds"],
                "mixed_batch": mixed_batch,
                "rep_seconds": [round(t, 3) for t in times],
                "prefill_tokens": len(prompt),
                "prefill_s_incl_compile": round(prefill_s, 3),
                "prefill_tps_512":
                    round(prefill_tps, 1) if prefill_tps else None,
                "prefill_tps_512_device":
                    round(prefill_tps_device, 1) if prefill_tps_device
                    else None,
                "build_s": round(build_s, 1),
                "load_s": round(load_s, 1),
                "budget_s": round(budget_s, 1),
                "phase_s": phases,
                "total_s": round(time.time() - t_start, 1),
            }
        }),
        file=sys.stderr, flush=True,
    )


def prepare_cache() -> None:
    """Build the synthetic GGUFs + repack sidecars + compile caches OUTSIDE
    any timed window (cold 8B build + repack is ~8 min — it can never fit
    inside a shared bench budget). Run once per machine."""
    os.makedirs(CACHE, exist_ok=True)
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    for preset, p in PRESETS.items():
        path = os.path.join(CACHE, p["gguf"])
        t0 = time.time()
        build_synthetic_gguf(path, preset=preset, quant=GGMLType.Q4_K,
                             max_ctx=p["max_ctx"])
        print(f"prepare: {preset} gguf {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        # mode="quant" triggers the repack, which writes the sidecar; the
        # arrays land on whatever device is default (cpu is fine here)
        load_model(path, mode="quant", scale_dtype="bfloat16")
        print(f"prepare: {preset} repack {time.time()-t0:.1f}s", flush=True)


def _run_preset(preset: str, budget: float):
    """One subprocess per model: a fresh process = clean HBM (stale params
    from a previous load measurably slow the next model). Returns
    (headline_dict_or_None, reason)."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", preset,
             "--budget", str(int(budget))],
            capture_output=True, text=True, timeout=budget + 30)
    except subprocess.TimeoutExpired as e:
        # salvage whatever the child printed before the kill
        for stream, sink in ((e.stderr, sys.stderr), (e.stdout, None)):
            if stream:
                text = stream.decode() if isinstance(stream, bytes) else stream
                if sink is not None:
                    sink.write(text)
                else:
                    for ln in text.splitlines():
                        if ln.strip().startswith("{"):
                            return json.loads(ln.strip()), "ok-after-timeout"
        return None, "timeout"
    sys.stderr.write(proc.stderr)
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
            break  # first JSON line is the headline
    if line is None:
        return None, f"no metric (rc={proc.returncode})"
    return json.loads(line), "ok"


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--prepare":
        prepare_cache()
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        budget = 1200.0
        if "--budget" in sys.argv:
            budget = float(sys.argv[sys.argv.index("--budget") + 1])
        bench_single(sys.argv[2], budget)
        return

    presets = ["tinyllama-1.1b", "llama3-8b"]
    env_preset = os.environ.get("LLAMA_GGUF_BENCH_PRESET")
    if len(sys.argv) > 2 and sys.argv[1] == "--preset":
        presets = [sys.argv[2]]
    elif env_preset:
        presets = env_preset.split(",")

    # measured warm envelopes (r5, quiet host): TL 523 s, 8B ~570 s clean
    # (1062 s when a tunnel stall froze one rep for 491 s — the budget
    # guards absorbed it); the driver's outer timeout is believed ~1800 s
    # (r3 died "past ~30 min"). 1650 fits both presets with margin; a
    # squeezed 8B budget degrades gracefully (bench_single skips detail
    # phases by its own deadline).
    total_budget = float(os.environ.get("LLAMA_GGUF_BENCH_BUDGET_S", 1650))
    t_start = time.time()

    def remaining():
        return total_budget - (time.time() - t_start) - MARGIN_S

    results = {}

    def warm(preset):
        g = os.path.join(CACHE, PRESETS[preset]["gguf"])
        return os.path.exists(g) and os.path.exists(g + ".repack")

    # RESERVE the flagship presets' warm envelopes BEFORE sizing preset 1's
    # budget: four rounds running, the Llama-3-8B BASELINE config lost the
    # budget race because TinyLlama (the warm-up act) was the first
    # claimant on an unbounded budget (VERDICT r4 Missing #1). TinyLlama
    # keeps headline position — its metric is the cross-round comparable
    # and prints mid-child, so even a hard kill of the TinyLlama subprocess
    # is salvaged by _run_preset — but it may not eat the flagship's time.
    reserve = sum(PRESETS[q]["est_warm_s"] for q in presets[1:] if warm(q))

    # Preset 1 — the headline. Print its metric line to stdout IMMEDIATELY:
    # nothing downstream (the 8B preset, the summary) may delay or gate it.
    # The floor is preset 1's own warm envelope: the headline outranks the
    # reserve (a starved headline child that dies before printing is the
    # r3 failure mode; an honest 8B budget-skip is the lesser harm).
    first = presets[0]
    budget1 = min(PRESETS[first]["est_warm_s"] * 2.0,
                  max(remaining() - reserve, PRESETS[first]["est_warm_s"]))
    headline, why = _run_preset(first, budget1)
    results[first] = headline
    if headline is None:
        print(f"bench: {first} failed: {why}", file=sys.stderr)
        headline = {"metric": PRESETS[first]["metric"], "value": 0.0,
                    "unit": "tok/s", "vs_baseline": 0.0, "error": why}
    print(json.dumps(headline), flush=True)

    # Remaining presets (the 8B BASELINE config) within measured-remaining
    # budget; an honest skip beats a driver timeout (r3 post-mortem).
    for preset in presets[1:]:
        p = PRESETS[preset]
        warm = (os.path.exists(os.path.join(CACHE, p["gguf"])) and
                os.path.exists(os.path.join(CACHE, p["gguf"] + ".repack")))
        need = p["est_warm_s"] if warm else 3000
        if remaining() < need:
            reason = "budget" if warm else "cold-cache (run bench.py --prepare)"
            results[preset] = {"metric": p["metric"], "skipped": reason,
                               "remaining_s": round(remaining(), 1),
                               "needed_s_est": need}
            print(json.dumps({preset: results[preset]}), file=sys.stderr,
                  flush=True)
            continue
        if results[first] is not None:
            # the gate ran inside preset 1's child; don't re-pay its two
            # Mosaic compiles. If preset 1 DIED the gate may never have
            # run — keep it on so the invocation still validates the MoE
            # lowerings somewhere.
            os.environ["LLAMA_GGUF_SKIP_MOE_PARITY"] = "1"
        res, why = _run_preset(preset, remaining())
        if res is None:
            res = {"metric": p["metric"], "error": why}
        results[preset] = res
        print(json.dumps({preset: res}), file=sys.stderr, flush=True)

    print(json.dumps({"bench_total_s": round(time.time() - t_start, 1),
                      "budget_s": total_budget,
                      "models": results}),
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
