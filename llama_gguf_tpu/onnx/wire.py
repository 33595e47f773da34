"""Minimal protobuf wire-format reader/writer for the ONNX subset we need.

The reference uses prost codegen over proto/onnx.proto3
(/root/reference/src/onnx/, build.rs); here a ~100-line hand parser covers
the same fields (ModelProto.graph, GraphProto.{node,initializer,input,output},
TensorProto.{dims,data_type,raw_data,*_data,name,external_data,
data_location}, NodeProto.{input,output,op_type,name}) with no codegen or
onnx dependency. The writer half exists for tests/fixtures.
"""

from __future__ import annotations

from typing import Any, Iterator


def read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf: memoryview) -> Iterator[tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value). Length-delimited values are
    memoryviews; varints are ints; fixed are raw bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        field, wtype = tag >> 3, tag & 7
        if wtype == 0:  # varint
            val, pos = read_varint(buf, pos)
        elif wtype == 1:  # 64-bit
            val = bytes(buf[pos: pos + 8])
            pos += 8
        elif wtype == 2:  # length-delimited
            length, pos = read_varint(buf, pos)
            val = buf[pos: pos + length]
            pos += length
        elif wtype == 5:  # 32-bit
            val = bytes(buf[pos: pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield field, wtype, val


def packed_varints(buf: memoryview) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = read_varint(buf, pos)
        out.append(v)
    return out


def zigzag(v: int, bits: int = 64) -> int:
    """Interpret a varint as two's-complement signed (proto int64)."""
    if v >= 1 << (bits - 1):
        v -= 1 << bits
    return v


# -- writer (tests/fixtures) -----------------------------------------------------


def write_varint(v: int) -> bytes:
    out = bytearray()
    if v < 0:
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def field_varint(num: int, v: int) -> bytes:
    return write_varint(num << 3) + write_varint(v)


def field_bytes(num: int, data: bytes) -> bytes:
    return write_varint((num << 3) | 2) + write_varint(len(data)) + data


def field_str(num: int, s: str) -> bytes:
    return field_bytes(num, s.encode())
