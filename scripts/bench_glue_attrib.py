#!/usr/bin/env python
"""Attribute the decode step's non-weight, non-attention time ("other" in
bench_decode_decompose) by measuring the REAL greedy scan with each glue
family surgically disabled (monkeypatched to identity before compile).

The decompose for TinyLlama (docs/ROOFLINE.md r4) shows step 2083 us =
weights 1635 + attn 32 + other 417: ~20% of the step is norms / rope /
KV scatter / residual / argmax glue. This script answers WHICH of those
is worth fusing into the Pallas kernels, with the only honest number —
the real scan's step time with that family removed (fusion can never
save more than removal does; XLA fusion interactions are included).

Numerics of the patched variants are garbage (identity norms etc.) —
only the step TIME means anything. Each variant compiles its own scan
(fresh ModelRunner; params loaded once). Same-process A/B is valid here:
one model load, one contention window (CLAUDE.md rules).

Usage: python scripts/bench_glue_attrib.py [--preset tinyllama-1.1b]
           [--steps 128] [--reps 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tinyllama-1.1b")
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    try:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".cache")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    import jax.numpy as jnp

    from llama_gguf_tpu.engine.runner import ModelRunner
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.models import kv as KVmod
    from llama_gguf_tpu.models import transformer as T
    from llama_gguf_tpu.models.loader import load_model
    from llama_gguf_tpu.utils.synthetic import build_synthetic_gguf

    path = os.path.join(cache, f"bench_{args.preset.replace('-', '_').replace('.', '')}_q4km.gguf")
    if not os.path.exists(path):
        path = os.path.join("/tmp", f"glue_{args.preset}.gguf")
        build_synthetic_gguf(path, preset=args.preset, quant=GGMLType.Q4_K,
                             max_ctx=2048)
    platform = jax.devices()[0].platform
    mode = "quant" if platform in ("tpu", "axon") else "dequant"
    params, cfg, _ = load_model(path, mode=mode, scale_dtype="bfloat16")

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=32).tolist()

    def measure(tag, patches, const_next=False):
        """patches: list of (obj, attr, replacement). Applied before the
        runner compiles, restored after timing."""
        saved = [(o, a, getattr(o, a)) for o, a, _ in patches]
        for o, a, r in patches:
            setattr(o, a, r)
        try:
            runner = ModelRunner(params, cfg, max_batch=1, max_seq=2048,
                                 matmul_precision="default",
                                 kv_dtype=jnp.bfloat16)
            kv = runner.init_kv()
            logits, kv, pos = runner.prefill(prompt, kv)
            cur0 = jnp.argmax(logits)[None].astype(jnp.int32)
            pos_arr = jnp.asarray([pos], jnp.int32)

            if const_next:
                # replicate runner._get_greedy_scan with argmax replaced by
                # a constant-increment next token: isolates the [1, V]
                # argmax + logits materialization cost
                from llama_gguf_tpu.models.transformer import forward
                rb = 256

                def _scan(p, tokens0, pos0, kvv, steps):
                    def body(carry, _):
                        toks, po, kvv = carry
                        with jax.default_matmul_precision("default"):
                            logits, kvv = forward(p, cfg, toks[:, None],
                                                  po[:, None], kvv, po + 1,
                                                  read_bound=rb)
                        nxt = ((toks + 1) % cfg.vocab_size +
                               (logits[:, 0, 0] * 0).astype(jnp.int32))
                        return (nxt, po + 1, kvv), nxt
                    (_, _, kvv), toks = jax.lax.scan(
                        body, (tokens0, pos0, kvv), None, length=steps)
                    return toks.T, kvv

                fn = jax.jit(_scan, static_argnames=("steps",),
                             donate_argnums=(3,))

                def decode(kvv):
                    return fn(params, cur0, pos_arr, kvv, args.steps)
            else:
                def decode(kvv):
                    return runner.greedy_decode(cur0, pos_arr, kvv,
                                                steps=args.steps)

            toks, kv = decode(kv)  # compile + warm
            np.asarray(toks)
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                toks, kv = decode(kv)
                np.asarray(toks)
                ts.append(time.time() - t0)
            ts.sort()
            med = ts[len(ts) // 2] / args.steps
            print(f"{tag:24s} {med*1e6:9.1f} us/step", file=sys.stderr,
                  flush=True)
            return med * 1e6
        finally:
            for o, a, r in saved:
                setattr(o, a, r)

    ident2 = lambda x, *a, **k: x  # noqa: E731
    zeros_cs = lambda positions, rope_cfg: (  # noqa: E731
        jnp.float32(0.0), jnp.float32(0.0))
    kv_nowrite = lambda kv, layer, k, v, positions: kv  # noqa: E731

    out = {"preset": args.preset, "platform": platform}
    out["baseline"] = measure("baseline", [])
    out["no_norms"] = measure(
        "no_norms", [(T, "apply_norm", ident2), (T, "rms_norm", ident2)])
    out["no_rope"] = measure(
        "no_rope", [(T, "apply_rope", ident2), (T, "rope_cos_sin", zeros_cs)])
    out["no_kv_write"] = measure(
        "no_kv_write", [(KVmod, "write", kv_nowrite)])
    out["const_next_token"] = measure("const_next_token", [],
                                      const_next=True)
    out["no_all"] = measure(
        "no_all",
        [(T, "apply_norm", ident2), (T, "rms_norm", ident2),
         (T, "apply_rope", ident2), (T, "rope_cos_sin", zeros_cs),
         (KVmod, "write", kv_nowrite)])
    base = out["baseline"]
    out["delta_us"] = {k: round(base - v, 1) for k, v in out.items()
                       if isinstance(v, float) and k != "baseline"}
    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
