#!/usr/bin/env python
"""Grammar-constrained generation: the output always parses as JSON
matching the schema."""
import json
import sys

from llama_gguf_tpu.engine.engine import Engine, EngineConfig
from llama_gguf_tpu.sampling import SamplerConfig, json_grammar

SCHEMA = {
    "type": "object",
    "properties": {"name": {"type": "string"}, "score": {"type": "integer"}},
    "required": ["name", "score"],
}

engine = Engine.load(sys.argv[1], EngineConfig())
gs = engine.make_grammar_sampler(json_grammar(SCHEMA))
out = engine.generate("Describe a player as JSON:", max_tokens=64,
                      sampler=SamplerConfig(temperature=0.7, seed=0),
                      grammar=gs)
print(out)
if gs.is_complete:
    print("parsed:", json.loads(out))
