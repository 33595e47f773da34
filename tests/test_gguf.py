"""GGUF reader/writer round-trip tests using synthetic in-process files.

Mirrors the reference's synthetic-GGUF fixture strategy
(/root/reference/tests/embedded_model_test.rs, gguf_reader_test.rs): build
files with our writer into tempfiles / byte buffers, reload, assert metadata
and tensor round-trip. No external model files needed.
"""

import io

import numpy as np
import pytest

from llama_gguf_tpu.gguf.constants import GGMLType, align_offset
from llama_gguf_tpu.gguf.reader import GGUFError, GGUFFile
from llama_gguf_tpu.gguf.writer import GGUFWriter
from llama_gguf_tpu.quant.dequant import dequantize
from llama_gguf_tpu.quant.quantize import quantize


def build_bytes(w: GGUFWriter) -> bytes:
    buf = io.BytesIO()
    w.write(buf)
    return buf.getvalue()


def test_metadata_round_trip():
    w = GGUFWriter()
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("general.name", "test-model")
    w.add_metadata("llama.embedding_length", 64)
    w.add_metadata("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata("some.bool", True)
    w.add_metadata("some.negative", -7)
    w.add_metadata("some.big", 2**40)
    w.add_metadata("tokenizer.ggml.tokens", ["<s>", "</s>", "hello"])
    w.add_metadata("tokenizer.ggml.scores", np.array([0.0, -1.0, -2.0], np.float32))
    w.add_metadata("some.ints", [1, 2, 3])
    f = GGUFFile.from_bytes(build_bytes(w))
    assert f.version == 3
    assert f.metadata["general.architecture"] == "llama"
    assert f.metadata["llama.embedding_length"] == 64
    assert abs(f.metadata["llama.attention.layer_norm_rms_epsilon"] - 1e-5) < 1e-12
    assert f.metadata["some.bool"] is True
    assert f.metadata["some.negative"] == -7
    assert f.metadata["some.big"] == 2**40
    assert f.metadata["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello"]
    np.testing.assert_allclose(
        f.metadata["tokenizer.ggml.scores"], [0.0, -1.0, -2.0]
    )
    np.testing.assert_array_equal(f.metadata["some.ints"], [1, 2, 3])


def test_tensor_round_trip(rng, tmp_path):
    w = GGUFWriter()
    w.add_metadata("general.architecture", "llama")
    a = rng.standard_normal((8, 64)).astype(np.float32)
    b = rng.standard_normal((4, 256)).astype(np.float32)
    w.add_tensor_np("weight.f32", a)
    q = quantize(b, GGMLType.Q4_K)
    w.add_tensor_raw("weight.q4k", (256, 4), GGMLType.Q4_K, q.tobytes())
    path = tmp_path / "t.gguf"
    w.write_to_path(str(path))

    with GGUFFile.open(path) as f:
        assert f.tensor_order == ["weight.f32", "weight.q4k"]
        ti = f.tensors["weight.f32"]
        assert ti.np_shape == (8, 64)
        assert ti.ggml_type == GGMLType.F32
        got = np.frombuffer(f.tensor_data("weight.f32"), np.float32).reshape(8, 64)
        np.testing.assert_array_equal(got, a)

        tq = f.tensors["weight.q4k"]
        assert tq.np_shape == (4, 256)
        deq = dequantize(f.tensor_bytes("weight.q4k"), GGMLType.Q4_K, shape=(4, 256))
        ref = dequantize(q, GGMLType.Q4_K, shape=(4, 256))
        np.testing.assert_array_equal(deq, ref)


def test_alignment():
    w = GGUFWriter(alignment=64)
    w.add_metadata("general.alignment", 64)
    w.add_tensor_np("a", np.ones(3, np.float32))
    w.add_tensor_np("b", np.ones(5, np.float32))
    f = GGUFFile.from_bytes(build_bytes(w))
    assert f.alignment == 64
    assert f.data_offset % 64 == 0
    assert f.tensors["a"].offset == 0
    assert f.tensors["b"].offset == align_offset(12, 64)
    np.testing.assert_array_equal(
        np.frombuffer(f.tensor_data("b"), np.float32), np.ones(5, np.float32)
    )


def test_bad_magic():
    with pytest.raises(GGUFError):
        GGUFFile.from_bytes(b"NOPE" + b"\x00" * 100)


def test_duplicate_tensor_rejected():
    w = GGUFWriter()
    w.add_tensor_np("x", np.ones(2, np.float32))
    with pytest.raises(ValueError):
        w.add_tensor_np("x", np.ones(2, np.float32))


def test_wrong_size_rejected():
    w = GGUFWriter()
    with pytest.raises(ValueError):
        w.add_tensor_raw("x", (256,), GGMLType.Q4_K, b"\x00" * 10)


def test_nested_string_array():
    w = GGUFWriter()
    w.add_metadata("tokenizer.ggml.merges", ["a b", "ab c"])
    f = GGUFFile.from_bytes(build_bytes(w))
    assert f.metadata["tokenizer.ggml.merges"] == ["a b", "ab c"]
