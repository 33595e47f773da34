"""Sidecar cache of TPU-repacked weights: load big models in seconds.

The quant-mode loader repacks every tensor with single-core numpy bit
plumbing (quant/repack.py) — ~4-7 minutes for an 8B model. The repacked
layouts are deterministic, so they are written once to a ``<model>.repack``
sidecar and mmap'd on every later load (zero-copy numpy views straight
into jnp.asarray), the same trick llama.cpp plays with mmap-able GGUF.

File format: MAGIC + u32 header length + JSON header + 64-byte-aligned raw
buffers. The header records the source GGUF's (size, mtime_ns) and a format
VERSION — any mismatch (model changed, layout code changed, q6 opt-in
toggled) invalidates the cache and it is silently rebuilt.

Disable with LLAMA_GGUF_NO_REPACK_CACHE=1 (or an unwritable model dir —
failures to write are never fatal).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

from .repack import RepackedWeight

MAGIC = b"GGTPURPK"
VERSION = 3  # bump when any repack layout changes (3: +embedding row layouts)

_FIELDS = ("packed", "scales", "mins", "packed2")


def cache_path(gguf_path: str) -> str:
    return gguf_path + ".repack"


def _source_sig(gguf_path: str) -> dict:
    st = os.stat(gguf_path)
    return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}


class RepackCache:
    """Read/write access to one model's repack sidecar."""

    def __init__(self, gguf_path: str, q6: bool = False):
        self.gguf_path = gguf_path
        self.path = cache_path(gguf_path)
        self.q6 = q6
        self._mmap: np.memmap | None = None
        self._index: dict[str, dict] | None = None
        self._pending: dict[str, RepackedWeight] = {}
        self._load_index()

    @property
    def valid(self) -> bool:
        return self._index is not None

    # -- reading -------------------------------------------------------------

    def _load_index(self) -> None:
        try:
            if not os.path.exists(self.path):
                return
            with open(self.path, "rb") as f:
                if f.read(8) != MAGIC:
                    return
                hlen = int.from_bytes(f.read(4), "little")
                header = json.loads(f.read(hlen))
            if header.get("version") != VERSION:
                return
            if header.get("q6") != self.q6:
                return
            if header.get("source") != _source_sig(self.gguf_path):
                return
            self._data_base = (8 + 4 + hlen + 63) // 64 * 64
            self._mmap = np.memmap(self.path, dtype=np.uint8, mode="r")
            self._index = header["tensors"]
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            self._mmap = None
            self._index = None

    def get(self, name: str) -> RepackedWeight | None:
        """Zero-copy RepackedWeight for ``name``, or None on miss."""
        if self._index is None:
            return None
        rec = self._index.get(name)
        if rec is None:
            return None
        arrays: dict[str, np.ndarray | None] = {}
        for field in _FIELDS:
            meta = rec["arrays"].get(field)
            if meta is None:
                arrays[field] = None
                continue
            off = self._data_base + meta["offset"]  # offsets are data-relative
            nbytes = meta["nbytes"]
            buf = self._mmap[off: off + nbytes]
            arrays[field] = buf.view(np.dtype(meta["dtype"])).reshape(
                meta["shape"])
        return RepackedWeight(
            packed=arrays["packed"], scales=arrays["scales"],
            mins=arrays["mins"], fmt=rec["fmt"], group=rec["group"],
            k=rec["k"], n=rec["n"], source_type=rec["source_type"],
            packed2=arrays["packed2"])

    # -- writing -------------------------------------------------------------

    def put(self, name: str, rw: RepackedWeight) -> None:
        """Stage a repacked weight for the sidecar (written by flush())."""
        if self._index is None:  # only collect when building a fresh cache
            self._pending[name] = rw

    def flush(self) -> None:
        """Write all staged weights to the sidecar atomically (temp+rename).
        No-op if the cache is already valid or nothing was staged."""
        if self._index is not None or not self._pending:
            return
        # offsets are RELATIVE to the aligned data base (derived from the
        # header length by both writer and reader), so the header can be
        # laid out in one pass
        tensors: dict[str, dict] = {}
        records = []
        data_offset = 0
        for name, rw in self._pending.items():
            arrays = {}
            amet = {}
            for field in _FIELDS:
                arr = getattr(rw, field)
                if arr is None:
                    continue
                arr = np.ascontiguousarray(arr)
                data_offset = (data_offset + 63) // 64 * 64
                arrays[field] = arr
                amet[field] = {
                    "dtype": arr.dtype.str, "shape": list(arr.shape),
                    "offset": data_offset, "nbytes": int(arr.nbytes),
                }
                data_offset += arr.nbytes
            records.append((name, arrays))
            tensors[name] = {
                "fmt": rw.fmt, "group": rw.group, "k": rw.k, "n": rw.n,
                "source_type": getattr(rw.source_type, "name",
                                       str(rw.source_type)),
                "arrays": amet,
            }
        header = {
            "version": VERSION, "q6": self.q6,
            "source": _source_sig(self.gguf_path),
            "tensors": tensors,
        }
        hbytes = json.dumps(header).encode()
        base = 8 + 4 + len(hbytes)
        base_aligned = (base + 63) // 64 * 64

        tmp = None
        try:
            fd, tmp = tempfile.mkstemp(
                dir=os.path.dirname(self.path) or ".", suffix=".repack.tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(MAGIC)
                f.write(len(hbytes).to_bytes(4, "little"))
                f.write(hbytes)
                f.write(b"\0" * (base_aligned - base))
                pos = 0  # data-relative
                for name, arrays in records:
                    for field, arr in arrays.items():
                        want = tensors[name]["arrays"][field]["offset"]
                        if want > pos:
                            f.write(b"\0" * (want - pos))
                            pos = want
                        f.write(arr.tobytes())
                        pos += arr.nbytes
            os.replace(tmp, self.path)
            self._pending.clear()
            self._load_index()
        except OSError:
            if tmp is not None:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass


def open_cache(gguf_path: str, q6: bool = False) -> RepackCache | None:
    if os.environ.get("LLAMA_GGUF_NO_REPACK_CACHE", "0") == "1":
        return None
    try:
        return RepackCache(gguf_path, q6=q6)
    except OSError:
        return None
