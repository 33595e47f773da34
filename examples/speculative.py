#!/usr/bin/env python
"""Self-speculative decoding: early-exit draft, exact greedy parity."""
import sys

from llama_gguf_tpu.engine.engine import Engine, EngineConfig
from llama_gguf_tpu.engine.speculative import SpeculativeDecoder

engine = Engine.load(sys.argv[1], EngineConfig())
dec = SpeculativeDecoder.self_speculative(engine.runner, num_draft=4)
ids = engine.tokenizer.encode(sys.argv[2] if len(sys.argv) > 2 else "Hello")
out = dec.generate_greedy(ids, 64, is_eog=engine.tokenizer.is_eog)
print(engine.tokenizer.decode(out))
print(f"acceptance: {dec.stats.acceptance_rate:.0%}, "
      f"{dec.stats.tokens_per_round:.2f} tok/round")
