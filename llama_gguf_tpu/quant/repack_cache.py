"""Sidecar cache of TPU-repacked weights: load big models in seconds.

The quant-mode loader repacks every tensor with single-core numpy bit
plumbing (quant/repack.py) — ~4-7 minutes for an 8B model. The repacked
layouts are deterministic, so they are written once to a ``<model>.repack``
sidecar and mmap'd on every later load (zero-copy numpy views straight
into jnp.asarray), the same trick llama.cpp plays with mmap-able GGUF.

File format: MAGIC + u32 header length + JSON header + 64-byte-aligned raw
buffers. The header records the source GGUF's (size, mtime_ns) and a format
VERSION — any mismatch (model changed, layout code changed) invalidates
the cache and it is silently rebuilt.

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
VERSION = 5  # bump when any repack layout changes or new entry kinds
# appear (3: +embedding row layouts; 4: +tied output head '@out' —
# put() cannot append to a valid sidecar, so new entry kinds need a
# rebuild or they would be recomputed on every load forever;
# 5: q6 plane layout deleted)

_FIELDS = ("packed", "scales", "mins")


def cache_path(gguf_path: str) -> str:
    return gguf_path + ".repack"


def _source_sig(gguf_path: str) -> dict:
    st = os.stat(gguf_path)
    return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}


class RepackCache:
    """Read/write access to one model's repack sidecar."""

    def __init__(self, gguf_path: str):
        self.gguf_path = gguf_path
        self.path = cache_path(gguf_path)
        self._mmap: np.memmap | None = None
        self._index: dict[str, dict] | None = None
        # staged metadata while building; array BYTES stream straight to a
        # temp data file (holding them in RAM doubled peak RSS on 8B loads)
        self._pending: dict[str, dict] = {}
        self._tmp_path: str | None = None
        self._tmp_file = None
        self._tmp_pos = 0
        self._failed = False  # a staging error poisons the whole build
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
                # v4 sidecars with the q6 plane layout OFF are byte-identical
                # to v5 (the deleted layout was opt-in); keep them valid so
                # existing 8B sidecars don't pay a ~5 min rebuild
                if not (header.get("version") == 4
                        and header.get("q6") is False):
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
            k=rec["k"], n=rec["n"], source_type=rec["source_type"])

    # -- writing -------------------------------------------------------------

    def put(self, name: str, rw: RepackedWeight) -> None:
        """Stage a repacked weight: bytes stream to a temp data file now,
        metadata (with data-relative offsets) is kept for flush()."""
        if self._index is not None or self._failed:
            return
        try:
            if self._tmp_file is None:
                fd, self._tmp_path = tempfile.mkstemp(
                    dir=os.path.dirname(self.path) or ".",
                    suffix=".repack.tmp")
                self._tmp_file = os.fdopen(fd, "wb")
            amet = {}
            for field in _FIELDS:
                arr = getattr(rw, field)
                if arr is None:
                    continue
                arr = np.ascontiguousarray(arr)
                pad = (-self._tmp_pos) % 64
                if pad:
                    self._tmp_file.write(b"\0" * pad)
                    self._tmp_pos += pad
                amet[field] = {
                    "dtype": arr.dtype.str, "shape": list(arr.shape),
                    "offset": self._tmp_pos, "nbytes": int(arr.nbytes),
                }
                self._tmp_file.write(arr.tobytes())
                self._tmp_pos += arr.nbytes
            self._pending[name] = {
                "fmt": rw.fmt, "group": rw.group, "k": rw.k, "n": rw.n,
                "source_type": getattr(rw.source_type, "name",
                                       str(rw.source_type)),
                "arrays": amet,
            }
        except OSError:
            # a partial sidecar must never be flushed: later puts would
            # restart staging and flush() would write a valid-looking file
            # permanently missing the earlier tensors
            self._failed = True
            self._discard_tmp()

    def _discard_tmp(self) -> None:
        if self._tmp_file is not None:
            try:
                self._tmp_file.close()
            except OSError:
                pass
            self._tmp_file = None
        if self._tmp_path is not None:
            try:
                os.unlink(self._tmp_path)
            except OSError:
                pass
            self._tmp_path = None
        self._pending.clear()
        self._tmp_pos = 0

    def flush(self) -> None:
        """Finalize the sidecar atomically: header + streamed copy of the
        temp data file, then rename. No-op if already valid or empty."""
        if self._index is not None or self._failed or \
                not self._pending or self._tmp_file is None:
            return
        header = {
            "version": VERSION,
            "source": _source_sig(self.gguf_path),
            "tensors": self._pending,
        }
        hbytes = json.dumps(header).encode()
        base = 8 + 4 + len(hbytes)
        base_aligned = (base + 63) // 64 * 64
        out_tmp = None
        try:
            self._tmp_file.close()
            self._tmp_file = None
            fd, out_tmp = tempfile.mkstemp(
                dir=os.path.dirname(self.path) or ".", suffix=".repack.hdr")
            with os.fdopen(fd, "wb") as f:
                f.write(MAGIC)
                f.write(len(hbytes).to_bytes(4, "little"))
                f.write(hbytes)
                f.write(b"\0" * (base_aligned - base))
                with open(self._tmp_path, "rb") as data:
                    while True:
                        chunk = data.read(64 << 20)
                        if not chunk:
                            break
                        f.write(chunk)
            os.replace(out_tmp, self.path)
            out_tmp = None
            self._load_index()
        except OSError:
            if out_tmp is not None:
                try:
                    os.unlink(out_tmp)
                except OSError:
                    pass
        finally:
            self._discard_tmp()


    def __del__(self):
        try:
            self._discard_tmp()
        except Exception:
            pass


def open_cache(gguf_path: str) -> RepackCache | None:
    if os.environ.get("LLAMA_GGUF_NO_REPACK_CACHE", "0") == "1":
        return None
    try:
        return RepackCache(gguf_path)
    except OSError:
        return None
