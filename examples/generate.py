#!/usr/bin/env python
"""Minimal generation example: load a GGUF and stream tokens."""
import sys

from llama_gguf_tpu.engine.engine import Engine, EngineConfig
from llama_gguf_tpu.sampling import SamplerConfig

engine = Engine.load(sys.argv[1], EngineConfig())
for piece in engine.generate_streaming(
        sys.argv[2] if len(sys.argv) > 2 else "Once upon a time",
        max_tokens=128, sampler=SamplerConfig(temperature=0.7, seed=0)):
    print(piece, end="", flush=True)
print()
print(f"[{engine.stats.decode_tps:.1f} tok/s]", file=sys.stderr)
