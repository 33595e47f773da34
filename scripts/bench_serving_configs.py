#!/usr/bin/env python
"""BASELINE serving-config benchmark: a scripted number for every serving
config line in BASELINE.md that fits one chip.

BASELINE.md lists five serving configs (the reference exercises them via
`llama-gguf serve`, /root/reference/README.md + man/llama-gguf-serve.1):

  1. Qwen2.5-0.5B Q4_K_M          -> qwen2.5-0.5b-q4km   (full scale)
  2. TinyLlama-1.1B Q8_0          -> tinyllama-1.1b-q8_0 (full scale)
  3. Llama-3-8B Q4_K_M @ 32 strm  -> llama3-8b-q4km-32streams (full scale)
  4. Mixtral-8x7B Q4_K_M (MoE)    -> mixtral-8x7b-l8-q4km: real per-layer
     geometry, 8 of 32 layers (the full model is ~26 GB Q4_K_M vs 16 GB
     HBM). Expert dispatch, kernel shapes and per-layer bytes are
     layer-local, so per-step cost extrapolates linearly; the JSON carries
     both the measured 8-layer number and the 32-layer extrapolation.
  5. Qwen3Next (2 hosts)          -> NOT here: an 80B 2-host config cannot
     be measured on one chip. The hybrid GQA+DeltaNet path is covered by
     the GSPMD dryrun (__graft_entry__.dryrun_multichip plan 3) and the
     tiny-qwen3next HF-oracle tests.

Protocol (same discipline as bench.py): one config per PROCESS (stale HBM
from a previous load measurably slows the next model on this chip), tg128
decode rounds with hard host-fetch sync, batched serving via
bench.measure_mixed_batch (short batch + one ~long straggler, two-tier
ragged reads). MoE effective bandwidth is computed against ACTIVE bytes
(shared weights + top_k/experts of the expert stacks): the fused
moe_qmatmul gathers only routed experts' packed bytes from HBM
(ops/qmatmul.moe_qmatmul), the TPU analogue of the reference streaming
active experts (/root/reference/src/model/moe.rs:321-416).

Usage:
  python scripts/bench_serving_configs.py --all          # orchestrate all
  python scripts/bench_serving_configs.py --config NAME  # one, in-process

Committed results: docs/PERFORMANCE.md "BASELINE serving configs".
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402  (wait_for_device, decode rounds, mixed batch)

CONFIGS = {
    "qwen2.5-0.5b-q4km": {
        "preset": "qwen2.5-0.5b", "quant": "Q4_K", "max_ctx": 2048,
        "gguf": "qwen25_05b_q4km.gguf", "reps": 4,
        "batch": {"b": 32, "steps": 64, "max_ctx": 2048},
        "baseline_tps": 1.2,  # reference README.md:403 (i9-13900K CPU)
        "est_warm_s": 420,
    },
    "tinyllama-1.1b-q8_0": {
        "preset": "tinyllama-1.1b", "quant": "Q8_0", "max_ctx": 2048,
        "gguf": "tinyllama_11b_q8_0.gguf", "reps": 4,
        "batch": None,  # the @32-streams line is the 8B config; Q4_K_M
        # TinyLlama batch numbers live in bench.py's mixed_batch block
        "baseline_tps": 1.5,  # reference README.md:404
        "est_warm_s": 360,
    },
    "llama3-8b-q4km-32streams": {
        # reuses bench.py's cached 8B gguf + repack sidecar; B=1 decode is
        # bench.py's own preset, so this config measures ONLY the
        # 32-stream serving block (max_ctx 1024: 32-row bf16 KV = 4.3 GB)
        "preset": "llama3-8b", "quant": "Q4_K", "max_ctx": 2048,
        "gguf": "llama3-8b-q4km.gguf", "reps": 0,
        "batch": {"b": 32, "steps": 32, "max_ctx": 1024},
        "est_warm_s": 600,
    },
    "mixtral-8x7b-l8-q4km": {
        "preset": "mixtral-8x7b-l8", "quant": "Q4_K", "max_ctx": 1024,
        "gguf": "mixtral_8x7b_l8_q4km.gguf", "reps": 3,
        "batch": {"b": 8, "steps": 32, "max_ctx": 1024},
        "full_layers": 32, "built_layers": 8,
        "est_warm_s": 900,
    },
}


def active_bytes_of(gguf, cfg) -> tuple[int, int]:
    """(total_bytes, active_bytes): expert stacks count top_k/experts of
    their bytes (per-token routed reads), everything else fully."""
    total = active = 0
    frac = (cfg.num_experts_per_token / cfg.num_experts
            if getattr(cfg, "num_experts", 0) else 1.0)
    for name, info in gguf.tensors.items():
        total += info.nbytes
        active += int(info.nbytes * (frac if "_exps." in name else 1.0))
    return total, active


def run_config(name: str, budget_s: float) -> None:
    c = CONFIGS[name]
    t_start = time.time()
    bench.wait_for_device(max_wait_s=min(600.0, budget_s / 3))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(bench.CACHE, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    import jax.numpy as jnp

    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    os.makedirs(bench.CACHE, exist_ok=True)
    path = os.path.join(bench.CACHE, c["gguf"])
    t0 = time.time()
    build_synthetic_gguf(path, preset=c["preset"],
                         quant=getattr(GGMLType, c["quant"]),
                         max_ctx=c["max_ctx"])
    build_s = time.time() - t0

    t0 = time.time()
    platform = jax.devices()[0].platform
    mode = "quant" if platform in ("tpu", "axon") else "dequant"
    params, cfg, gguf = load_model(path, mode=mode, scale_dtype="bfloat16")
    load_s = time.time() - t0
    weight_bytes, active_bytes = active_bytes_of(gguf, cfg)

    out = {
        "config": name,
        "preset": c["preset"],
        "quant": c["quant"],
        "platform": platform,
        "weight_bytes": weight_bytes,
        "active_bytes": active_bytes,
        "build_s": round(build_s, 1),
        "load_s": round(load_s, 1),
    }

    probe_gbps = bench.measure_kernel_gbps(jax, jnp)

    if c["reps"]:
        runner = ModelRunner(params, cfg, max_batch=1, max_seq=c["max_ctx"],
                             matmul_precision="default",
                             kv_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, cfg.vocab_size, size=32).tolist()
        kv = runner.init_kv()
        logits, kv, pos = runner.prefill(prompt, kv)
        cur0 = jnp.argmax(logits)[None].astype(jnp.int32)
        rounds, best, probe_gbps, kv = bench.run_decode_rounds(
            runner, cur0, kv, pos, jax, jnp, c["reps"], active_bytes,
            probe_gbps)
        med = best[len(best) // 2]
        out["decode_tps"] = round(bench.STEPS / med, 1)
        out["effective_gbps_active"] = round(
            active_bytes / med * bench.STEPS / 1e9, 1)
        out["kernel_probe_gbps"] = (round(probe_gbps, 1)
                                    if probe_gbps else None)
        out["decode_rounds"] = rounds
        if c.get("full_layers"):
            # linear per-layer extrapolation to the full-depth model: the
            # non-layer cost (embedding row + lm head + argmax) is shared,
            # but at B=1 it is <3% of a step — fold it in conservatively
            # by scaling the WHOLE step time
            scale = c["full_layers"] / c["built_layers"]
            out["extrapolated_full_model"] = {
                "layers": c["full_layers"],
                "decode_tps": round(bench.STEPS / (med * scale), 1),
                "weight_bytes": int(weight_bytes * scale),
                "active_bytes": int(active_bytes * scale),
                "note": "linear layer scaling incl. shared lm-head cost",
            }
        del runner, kv

    if c["batch"]:
        b = dict(c["batch"])
        batch_ctx = b.pop("max_ctx")
        mixed = bench.measure_mixed_batch(jax, jnp, params, cfg, batch_ctx,
                                          **b)
        mixed["aggregate_tps_short"] = round(
            b["b"] / mixed["short_ms_per_step"] * 1e3, 1)
        mixed["aggregate_tps_mixed"] = round(
            b["b"] / mixed["mixed_ms_per_step"] * 1e3, 1)
        if c.get("full_layers"):
            scale = c["full_layers"] / c["built_layers"]
            mixed["extrapolated_full_model_aggregate_tps"] = round(
                b["b"] / (mixed["short_ms_per_step"] * scale) * 1e3, 1)
        out["serving"] = mixed

    if c.get("baseline_tps") and "decode_tps" in out:
        out["vs_reference_cpu"] = round(out["decode_tps"]
                                        / c["baseline_tps"], 1)
    out["total_s"] = round(time.time() - t_start, 1)
    print(json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--budget", type=float, default=1200.0,
                    help="per-config wall-clock budget (s)")
    args = ap.parse_args()

    if args.config:
        run_config(args.config, args.budget)
        return
    if not args.all:
        print("pass --config NAME or --all", file=sys.stderr)
        sys.exit(2)
    results = {}
    for name in CONFIGS:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--config", name, "--budget", str(args.budget)],
                capture_output=True, text=True, timeout=args.budget + 60)
            sys.stderr.write(proc.stderr)
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.strip().startswith("{")), None)
            results[name] = (json.loads(line) if line
                             else {"error": f"rc={proc.returncode}"})
        except subprocess.TimeoutExpired:
            results[name] = {"error": "timeout"}
        print(json.dumps({name: results[name]}), flush=True)
    ok = sum(1 for r in results.values() if "error" not in r)
    print(f"serving-configs: {ok}/{len(CONFIGS)} measured", file=sys.stderr)


if __name__ == "__main__":
    main()
