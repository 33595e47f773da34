"""Tokenizer tests: SPM/BPE round trips, special tokens, streaming decode.

BPE oracle: GPT-2's published behavior via a hand-built merge table; SPM
checked for round-trip + byte-fallback.
"""

import numpy as np
import pytest

from llama_gguf_tpu.tokenizer.gguf_tokenizer import (
    SPM_SPACE,
    StreamingDecoder,
    Tokenizer,
    TT_BYTE,
    TT_CONTROL,
    TT_NORMAL,
)


def make_spm_tokenizer():
    # vocab: specials, byte tokens, then words
    tokens = ["<unk>", "<s>", "</s>"]
    ttypes = [TT_UNKNOWN_ := 2, TT_CONTROL, TT_CONTROL]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        ttypes.append(TT_BYTE)
    words = [SPM_SPACE, SPM_SPACE + "hello", SPM_SPACE + "world", "he", "llo",
             "hello", "wor", "ld", "l", "o", "hel", "lo", "wo",
             SPM_SPACE + "the", "th", "e"]
    scores = [0.0] * len(tokens)
    for i, w in enumerate(words):
        tokens.append(w)
        ttypes.append(TT_NORMAL)
        scores.append(-float(i))  # earlier words = higher score
    md = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.array(scores, np.float32),
        "tokenizer.ggml.token_type": np.array(ttypes, np.int32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.add_bos_token": True,
    }
    return Tokenizer.from_gguf(md)


def test_spm_round_trip():
    tok = make_spm_tokenizer()
    ids = tok.encode("hello world")
    assert ids[0] == tok.bos_id
    text = tok.decode(ids)
    assert text == " hello world"  # SPM space prefix


def test_spm_merges_to_whole_words():
    tok = make_spm_tokenizer()
    ids = tok.encode("hello", add_bos=False)
    # "▁hello" exists in vocab -> should merge completely into one token
    assert len(ids) == 1
    assert tok.tokens[ids[0]] == SPM_SPACE + "hello"


def test_spm_byte_fallback():
    tok = make_spm_tokenizer()
    ids = tok.encode("héllo", add_bos=False)
    text = tok.decode(ids)
    assert text == " héllo"


def test_special_token_splitting():
    tok = make_spm_tokenizer()
    ids = tok.encode("hello</s>world", add_bos=False)
    assert tok.eos_id in ids


def test_streaming_decoder_utf8():
    tok = make_spm_tokenizer()
    # encode a multi-byte char into byte tokens and stream-decode
    ids = tok.encode("héllo", add_bos=False)
    dec = tok.streaming_decoder()
    out = ""
    for i in ids:
        out += dec.push(i)
    out += dec.flush()
    assert out == " héllo"


def make_bpe_tokenizer():
    # byte-level BPE over a toy vocab
    base = [chr(i) for i in range(33, 127)]  # printable ascii maps to itself
    tokens = ["<|endoftext|>"]
    ttypes = [TT_CONTROL]
    for c in base:
        tokens.append(c)
        ttypes.append(TT_NORMAL)
    extra = ["he", "ll", "llo", "hello", "Ġ", "Ġw", "Ġwo", "Ġwor", "Ġworld",
             "hel", "lo", "o"]
    merges = ["h e", "l l", "ll o", "he llo", "Ġ w", "Ġw o", "Ġwo r",
              "Ġwor ld", "l d"]
    for t in extra + ["ld"]:
        if t not in tokens:
            tokens.append(t)
            ttypes.append(TT_NORMAL)
    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": np.array(ttypes, np.int32),
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.eos_token_id": 0,
        "tokenizer.ggml.add_bos_token": False,
    }
    return Tokenizer.from_gguf(md)


def test_bpe_round_trip():
    tok = make_bpe_tokenizer()
    ids = tok.encode("hello world", add_bos=False)
    assert tok.decode(ids) == "hello world"
    # "hello" should fully merge
    ids2 = tok.encode("hello", add_bos=False)
    assert tok.tokens[ids2[0]] == "hello"
    assert len(ids2) == 1


def test_bpe_unicode_round_trip():
    tok = make_bpe_tokenizer()
    text = "héllo wörld ☃"
    # unknown bytes: vocab lacks the byte-level units -> ids may be unk-free
    # but decode of what was encoded must not crash
    ids = tok.encode(text, add_bos=False)
    assert isinstance(ids, list)


TT_UNKNOWN_ = 2


# -- tokenizer.json native engine (oracle: the `tokenizers` package) ----------

SAMPLES = [
    "Hello world!",
    "  leading spaces and\ttabs\nnewlines",
    "numbers 12345 and punct!?.,;:",
    "unicode: café über straße 中文字",
    "emoji \U0001f600 mixed WithCase",
    "",
]


def _compare(tmp_path, tok, samples=SAMPLES):
    """Save a `tokenizers` tokenizer, reload with our native engine, and
    require identical ids + round-trip decode on every sample."""
    from llama_gguf_tpu.tokenizer.hf_json import HFTokenizer

    path = str(tmp_path / "tokenizer.json")
    tok.save(path)
    ours = HFTokenizer(path)
    for s in samples:
        want = tok.encode(s, add_special_tokens=False).ids
        got = ours.encode(s, add_bos=False, add_special=False)
        assert got == want, (s, got, want)
        assert ours.decode(got) == tok.decode(want, skip_special_tokens=True)


def test_hf_json_byte_level_bpe(tmp_path):
    """GPT-2-style byte-level BPE trained on the fly."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.trainers import BpeTrainer

    from tokenizers.decoders import ByteLevel as ByteLevelDecoder

    tok = Tokenizer(BPE())
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False)
    tok.decoder = ByteLevelDecoder()
    trainer = BpeTrainer(vocab_size=400, special_tokens=["<|endoftext|>"],
                         initial_alphabet=ByteLevel.alphabet(),
                         show_progress=False)
    tok.train_from_iterator(
        ["hello world", "the quick brown fox", "numbers 123 and text",
         "unicode café straße", "more text for merges to appear"] * 20,
        trainer)
    _compare(tmp_path, tok)


def test_hf_json_wordpiece(tmp_path):
    """BERT-style WordPiece with lowercase normalizer."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordPiece
    from tokenizers.normalizers import Lowercase
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import WordPieceTrainer

    from tokenizers.decoders import WordPiece as WordPieceDecoder

    tok = Tokenizer(WordPiece(unk_token="[UNK]"))
    tok.normalizer = Lowercase()
    tok.pre_tokenizer = Whitespace()
    tok.decoder = WordPieceDecoder()
    trainer = WordPieceTrainer(vocab_size=300,
                               special_tokens=["[UNK]", "[CLS]", "[SEP]"],
                               show_progress=False)
    tok.train_from_iterator(
        ["hello world", "the quick brown fox jumps", "wordpiece pieces",
         "subword tokenization works"] * 20, trainer)
    _compare(tmp_path, tok, samples=[s for s in SAMPLES if s])


def test_hf_json_unigram_metaspace(tmp_path):
    """SentencePiece-style Unigram with Metaspace pre-tokenizer."""
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram
    from tokenizers.pre_tokenizers import Metaspace
    from tokenizers.trainers import UnigramTrainer

    from tokenizers.decoders import Metaspace as MetaspaceDecoder

    tok = Tokenizer(Unigram())
    tok.pre_tokenizer = Metaspace()
    tok.decoder = MetaspaceDecoder()
    trainer = UnigramTrainer(vocab_size=200, special_tokens=["<unk>"],
                             unk_token="<unk>", show_progress=False)
    tok.train_from_iterator(
        ["hello world", "the quick brown fox", "sentence piece style",
         "unigram language model"] * 20, trainer)
    _compare(tmp_path, tok, samples=["hello world", "quick fox style",
                                     "unigram model text"])


def test_hf_json_special_tokens_and_template(tmp_path):
    """added_tokens splitting + TemplateProcessing bos placement."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.processors import TemplateProcessing
    from tokenizers.trainers import BpeTrainer

    tok = Tokenizer(BPE())
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False)
    trainer = BpeTrainer(vocab_size=300, special_tokens=["<s>", "</s>"],
                         initial_alphabet=ByteLevel.alphabet(),
                         show_progress=False)
    tok.train_from_iterator(["hello world example text"] * 40, trainer)
    bos = tok.token_to_id("<s>")
    eos = tok.token_to_id("</s>")
    tok.post_processor = TemplateProcessing(
        single="<s> $A", pair="<s> $A </s> $B",
        special_tokens=[("<s>", bos), ("</s>", eos)])

    from llama_gguf_tpu.tokenizer.hf_json import HFTokenizer

    path = str(tmp_path / "tokenizer.json")
    tok.save(path)
    ours = HFTokenizer(path)
    assert ours.bos_id == bos and ours.add_bos
    s = "hello world"
    want = tok.encode(s, add_special_tokens=True).ids
    got = ours.encode(s)
    assert got == want, (got, want)
    # special tokens in the middle of text are split out and mapped
    mixed = "hello <s> world"
    got = ours.encode(mixed, add_bos=False, add_special=False)
    assert bos in got


def test_hf_json_sequence_post_processor(tmp_path):
    """Llama-3-style Sequence post-processor (ByteLevel + TemplateProcessing)
    — the nested template must still drive BOS placement."""
    import json as _json

    vocab = {"<|begin_of_text|>": 0, "h": 1, "i": 2, "hi": 3}
    tokjson = {
        "model": {"type": "BPE", "vocab": vocab, "merges": ["h i"]},
        "added_tokens": [
            {"id": 0, "content": "<|begin_of_text|>", "special": True}],
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False,
                          "use_regex": True},
        "post_processor": {
            "type": "Sequence",
            "processors": [
                {"type": "ByteLevel", "trim_offsets": True},
                {"type": "TemplateProcessing",
                 "single": [
                     {"SpecialToken": {"id": "<|begin_of_text|>",
                                       "type_id": 0}},
                     {"Sequence": {"id": "A", "type_id": 0}}],
                 "pair": [],
                 "special_tokens": {
                     "<|begin_of_text|>": {"id": "<|begin_of_text|>",
                                           "ids": [0],
                                           "tokens": ["<|begin_of_text|>"]}}},
            ],
        },
    }
    path = tmp_path / "tokenizer.json"
    path.write_text(_json.dumps(tokjson))

    from llama_gguf_tpu.tokenizer.hf_json import HFTokenizer

    tok = HFTokenizer(str(path))
    assert tok.add_bos and tok.bos_id == 0
    ids = tok.encode("hi")
    assert ids[0] == 0 and ids[1:] == [3]
    # double-BOS guard: a prompt already starting with the bos token
    ids2 = tok.encode("<|begin_of_text|>hi")
    assert ids2.count(0) == 1 and ids2 == [0, 3]


def test_hf_json_long_text_bpe_fast(tmp_path):
    """SPM-style (null pre-tokenizer) BPE on a long document must stay
    fast (heap-based merge, not the O(n^2) rescan) and exact."""
    import json as _json
    import time as _time

    letters = "abcdefgh"
    vocab = {c: i for i, c in enumerate(letters)}
    merges = []
    for a in letters[:4]:
        for b2 in letters[:4]:
            vocab.setdefault(a + b2, len(vocab))
            merges.append(f"{a} {b2}")
    tokjson = {"model": {"type": "BPE", "vocab": vocab, "merges": merges},
               "pre_tokenizer": None}
    path = tmp_path / "tokenizer.json"
    path.write_text(_json.dumps(tokjson))

    from llama_gguf_tpu.tokenizer.hf_json import HFTokenizer

    tok = HFTokenizer(str(path))
    text = "abcdabcdabab" * 2000  # 24k chars, one piece
    t0 = _time.time()
    ids = tok.encode(text, add_special=False)
    dt = _time.time() - t0
    assert dt < 2.0, f"BPE too slow: {dt:.2f}s"
    assert tok.decode(ids) == text
