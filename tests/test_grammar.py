"""Grammar-constrained sampling tests (parity: reference grammar.rs tests +
the token-mask semantics of GrammarSampler)."""

import json

import numpy as np
import pytest

from llama_gguf_tpu.sampling.grammar import (
    GbnfMachine,
    GrammarSampler,
    RegexMachine,
    gbnf_grammar,
    json_grammar,
    regex_grammar,
    schema_to_gbnf,
)


def accepts(machine, s: str) -> bool:
    st = machine.start()
    for ch in s:
        st = machine.advance(st, ord(ch))
        if st is None:
            return False
    return machine.accepting(st)


def can_extend(machine, s: str) -> bool:
    """True if s is a valid prefix (machine alive after consuming s)."""
    st = machine.start()
    for ch in s:
        st = machine.advance(st, ord(ch))
        if st is None:
            return False
    return True


# -- GBNF ---------------------------------------------------------------------

def test_gbnf_literal_and_alt():
    m = GbnfMachine.parse('root ::= "yes" | "no"')
    assert accepts(m, "yes") and accepts(m, "no")
    assert not accepts(m, "maybe") and not accepts(m, "ye")
    assert can_extend(m, "ye") and not can_extend(m, "yx")


def test_gbnf_repetition():
    m = GbnfMachine.parse('root ::= "a"+ "b"*')
    assert accepts(m, "a") and accepts(m, "aaab") and accepts(m, "aabbb")
    assert not accepts(m, "") and not accepts(m, "b") and not accepts(m, "aba")


def test_gbnf_char_class_and_ranges():
    m = GbnfMachine.parse("root ::= [a-c0-9]+")
    assert accepts(m, "a0c9") and not accepts(m, "d")
    neg = GbnfMachine.parse('root ::= [^x]*')
    assert accepts(neg, "abc") and not accepts(neg, "axc")


def test_gbnf_nested_rules_and_groups():
    g = """
    root ::= greeting " " name
    greeting ::= "hi" | "hello"
    name ::= [A-Z] [a-z]*
    """
    m = GbnfMachine.parse(g)
    assert accepts(m, "hi Bob") and accepts(m, "hello X")
    assert not accepts(m, "hi bob")


def test_gbnf_bounded_repetition():
    m = GbnfMachine.parse('root ::= [0-9]{2,4}')
    assert not accepts(m, "1") and accepts(m, "12")
    assert accepts(m, "1234") and not accepts(m, "12345")
    m2 = GbnfMachine.parse('root ::= "x"{3}')
    assert accepts(m2, "xxx") and not accepts(m2, "xx") and not accepts(m2, "xxxx")


def test_gbnf_recursion():
    m = GbnfMachine.parse('root ::= "(" root ")" | ""')
    assert accepts(m, "") and accepts(m, "()") and accepts(m, "((()))")
    assert not accepts(m, "(()")


# -- JSON ---------------------------------------------------------------------

@pytest.mark.parametrize("doc", [
    "null", "true", "-12.5e3", '"hi\\nthere"', "[1, 2, 3]",
    '{"a": 1, "b": [true, null], "c": {"d": "e"}}', "[]", "{}",
])
def test_json_accepts_valid(doc):
    m = json_grammar()
    assert accepts(m, doc), doc
    assert json.loads(doc) is not None or True


@pytest.mark.parametrize("doc", [
    "tru", "{", "[1,]", '{"a" 1}', "01", "+1", '"unterminated',
])
def test_json_rejects_invalid(doc):
    m = json_grammar()
    assert not accepts(m, doc), doc


def test_json_schema_object():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    m = json_grammar(schema)
    assert accepts(m, '{"name": "bo", "age": 3}')
    assert not accepts(m, '{"name": "bo"}')          # missing required
    assert not accepts(m, '{"age": 3, "name": "x"}')  # fixed order (stricter)
    assert not accepts(m, '{"name": 5, "age": 3}')    # wrong type


def test_json_schema_enum_and_array():
    m = json_grammar({"enum": ["red", "green", 3]})
    assert accepts(m, '"red"') and accepts(m, "3") and not accepts(m, '"blue"')
    ma = json_grammar({"type": "array", "items": {"type": "boolean"}})
    assert accepts(ma, "[true, false]") and accepts(ma, "[]")
    assert not accepts(ma, "[1]")


def test_schema_to_gbnf_parses():
    g = schema_to_gbnf({"type": "object",
                        "properties": {"x": {"type": "number"}}})
    GbnfMachine.parse(g)  # must not raise


# -- Regex --------------------------------------------------------------------

def test_regex_basics():
    m = regex_grammar(r"[a-z]+@[a-z]+\.(com|org)")
    assert accepts(m, "bob@corp.com") and accepts(m, "x@y.org")
    assert not accepts(m, "bob@corp.net") and not accepts(m, "@x.com")


def test_regex_escapes_and_quantifiers():
    m = RegexMachine(r"\d{3}-\d{4}")
    assert accepts(m, "555-1234") and not accepts(m, "55-1234")
    m2 = RegexMachine(r"ab?c*")
    assert accepts(m2, "a") and accepts(m2, "abccc") and not accepts(m2, "abb")


# -- GrammarSampler masks -------------------------------------------------------

def test_sampler_mask_yes_no():
    vocab = ["yes", "no", "y", "es", "maybe", "n", "o", ""]
    s = GrammarSampler(gbnf_grammar('root ::= "yes" | "no"'), vocab,
                       eos_token_id=7)
    mask = s.get_token_mask()
    # allowed: tokens that are valid prefixes of "yes"/"no"
    assert mask[vocab.index("yes")] and mask[vocab.index("no")]
    assert mask[vocab.index("y")] and mask[vocab.index("n")]
    assert not mask[vocab.index("es")] and not mask[vocab.index("maybe")]
    assert not mask[7]  # eos not allowed before completion

    s.record_token("y")
    mask = s.get_token_mask()
    assert mask[vocab.index("es")] and not mask[vocab.index("yes")]

    s.record_token("es")
    assert s.is_complete
    assert s.get_token_mask()[7]  # eos allowed at completion


def test_sampler_mask_caching_and_apply():
    vocab = ["a", "b", "ab"]
    s = GrammarSampler(gbnf_grammar('root ::= "a"+'), vocab)
    m1 = s.get_token_mask()
    s.record_token("a")
    m2 = s.get_token_mask()
    assert np.array_equal(m1, m2)  # same machine state after 'a'* loop
    logits = s.apply_mask(np.array([1.0, 2.0, 3.0], np.float32))
    assert logits[1] == -np.inf and logits[0] == 1.0


def test_sampler_json_decode_walk():
    """Greedy walk under the JSON grammar always yields parseable JSON."""
    vocab = ['{"', 'a', '":', ' 1', ', "', 'b', '": ', 'true', '}', 'xx',
             '<eos>']
    s = GrammarSampler(json_grammar(), vocab, eos_token_id=10)
    text = ""
    rng = np.random.default_rng(0)
    for _ in range(32):
        mask = s.get_token_mask()
        ids = np.flatnonzero(mask)
        assert ids.size > 0
        tid = int(rng.choice(ids))
        if tid == 10:
            break
        text += vocab[tid]
        s.record_token(vocab[tid])
    if s.is_complete:
        json.loads(text)
