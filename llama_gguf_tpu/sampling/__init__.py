from .grammar import (
    GbnfMachine,
    GrammarSampler,
    RegexMachine,
    gbnf_grammar,
    json_grammar,
    regex_grammar,
    schema_to_gbnf,
)
from .sampler import Sampler, SamplerConfig

__all__ = [
    "GbnfMachine", "GrammarSampler", "RegexMachine", "Sampler",
    "SamplerConfig", "gbnf_grammar", "json_grammar", "regex_grammar",
    "schema_to_gbnf",
]
