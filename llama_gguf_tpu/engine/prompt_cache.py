"""Prompt cache: prefix-sharing KV snapshots with LRU eviction.

Parity target: /root/reference/src/model/cache.rs:92-231 (PromptCache —
KV snapshots keyed by token hash, longest-prefix match at cache.rs:164, LRU
by memory budget). TPU-native twist: snapshots are host numpy copies of one
batch row of the per-layer [B,S,H,D] cache tuples (device HBM stays free), restored with a
single device_put + scatter when a new prompt shares the prefix; prefill then
continues from the shared length.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bfloat16 / float8_* live here

        return np.dtype(getattr(ml_dtypes, name))


@dataclass
class _Entry:
    tokens: tuple[int, ...]
    arrays: dict[str, np.ndarray]  # key -> [L, len(tokens), ...] host copy
    nbytes: int
    last_used: float = field(default_factory=time.monotonic)
    hits: int = 0


@dataclass
class PromptCacheStats:
    hits: int = 0
    misses: int = 0
    evictions: int = 0
    stored: int = 0

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


class PromptCache:
    """LRU cache of KV prefixes on host memory."""

    def __init__(self, max_bytes: int = 2 << 30, min_prefix: int = 8):
        self.max_bytes = max_bytes
        self.min_prefix = min_prefix
        self._entries: dict[tuple[int, ...], _Entry] = {}
        self._bytes = 0
        self.stats = PromptCacheStats()

    # -- store --------------------------------------------------------------------

    # positional cache entries: [L, B, S, ...] indexed by sequence position.
    # Recurrent state ("mamba"/"deltanet") is a running summary, not
    # positional — prefixes of it cannot be snapshotted, so hybrid models
    # bypass the prompt cache entirely.
    _POSITIONAL_KEYS = ("k", "v", "k_scale", "v_scale")

    @classmethod
    def _cacheable(cls, kv: dict[str, Any]) -> bool:
        return all(name in cls._POSITIONAL_KEYS for name in kv)

    def put(self, tokens: list[int], kv: dict[str, Any],
            batch_idx: int = 0) -> None:
        """Snapshot the first len(tokens) positions of one batch row."""
        key = tuple(tokens)
        if len(key) < self.min_prefix or key in self._entries or \
                not self._cacheable(kv):
            return
        t = len(key)
        arrays = {}
        nbytes = 0
        for name, layers_t in kv.items():
            # stack ON DEVICE, then ONE host fetch per key — per-layer
            # np.asarray calls would each pay the 2-6 ms tunnel round-trip
            host = np.asarray(
                jnp.stack([a[batch_idx, :t] for a in layers_t]))
            arrays[name] = host
            nbytes += host.nbytes
        if nbytes > self.max_bytes:
            return
        self._evict_to(self.max_bytes - nbytes)
        self._entries[key] = _Entry(key, arrays, nbytes)
        self._bytes += nbytes
        self.stats.stored += 1

    # -- lookup -------------------------------------------------------------------

    def longest_prefix(self, tokens: list[int]) -> _Entry | None:
        """Longest cached entry that is a strict prefix of ``tokens``
        (parity: cache.rs:164)."""
        best: _Entry | None = None
        t = tuple(tokens)
        for key, entry in self._entries.items():
            n = len(key)
            if n <= len(t) and t[:n] == key:
                if best is None or n > len(best.tokens):
                    best = entry
        return best

    def restore(self, tokens: list[int], kv: dict[str, Any],
                batch_idx: int = 0) -> tuple[dict[str, Any], int]:
        """Restore the longest cached prefix into one batch row.

        Returns (kv', shared_len); prefill should continue from shared_len.
        A full match restores len-1 so the caller still has a last token to
        feed for logits."""
        if not self._cacheable(kv):
            return kv, 0
        entry = self.longest_prefix(tokens)
        if entry is None:
            self.stats.misses += 1
            return kv, 0
        n = len(entry.tokens)
        if n >= len(tokens):
            n = len(tokens) - 1
            if n <= 0:
                self.stats.misses += 1
                return kv, 0
        entry.last_used = time.monotonic()
        entry.hits += 1
        self.stats.hits += 1
        out = dict(kv)
        for name, host in entry.arrays.items():
            new_layers = list(out[name])
            for layer, a in enumerate(new_layers):
                dev = jnp.asarray(host[layer, :n])
                new_layers[layer] = a.at[batch_idx, :n].set(
                    dev.astype(a.dtype))
            out[name] = tuple(new_layers)
        return out, n

    # -- eviction -----------------------------------------------------------------

    def _evict_to(self, budget: int) -> None:
        while self._bytes > max(budget, 0) and self._entries:
            lru_key = min(self._entries,
                          key=lambda k: self._entries[k].last_used)
            e = self._entries.pop(lru_key)
            self._bytes -= e.nbytes
            self.stats.evictions += 1

    def clear(self) -> None:
        self._entries.clear()
        self._bytes = 0

    @property
    def entry_count(self) -> int:
        return len(self._entries)

    @property
    def memory_bytes(self) -> int:
        return self._bytes


    # -- disk persistence (llama.cpp --prompt-cache session-file parity) -----

    def save(self, path: str) -> int:
        """Persist every entry to one .npz; returns the entry count.

        The file holds host numpy snapshots only — it is model- and
        dtype-specific, like llama.cpp session files; loading it against a
        different model produces shape/dtype mismatches at restore time."""
        import json

        blobs: dict[str, np.ndarray] = {}
        meta = []
        for idx, (key, e) in enumerate(self._entries.items()):
            # store raw bytes + (dtype, shape): npz round-trips ml_dtypes
            # arrays (bfloat16/float8) as useless void dtypes otherwise
            meta.append({
                "tokens": list(key), "hits": e.hits,
                "arrays": {name: {"dtype": str(arr.dtype),
                                  "shape": list(arr.shape)}
                           for name, arr in e.arrays.items()}})
            for name, arr in e.arrays.items():
                blobs[f"e{idx}.{name}"] = np.ascontiguousarray(arr).reshape(
                    -1).view(np.uint8)
        blobs["__meta__"] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), np.uint8).copy()
        # write through a file handle: np.savez(str) APPENDS ".npz" to the
        # filename, which would break round-tripping user-chosen paths
        with open(path, "wb") as fh:
            np.savez(fh, **blobs)
        return len(meta)

    def load(self, path: str) -> int:
        """Merge entries from a save() file (LRU budget still applies);
        returns how many entries were loaded."""
        import json

        loaded = 0
        with np.load(path) as z:
            meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
            for idx, m in enumerate(meta):
                key = tuple(m["tokens"])
                if key in self._entries:
                    continue
                arrays = {
                    name: z[f"e{idx}.{name}"]
                    .view(_np_dtype(info["dtype"]))
                    .reshape(info["shape"])
                    for name, info in m["arrays"].items()}
                nbytes = sum(a.nbytes for a in arrays.values())
                if nbytes > self.max_bytes:
                    # mirror put(): an oversized entry must not pass a
                    # negative budget to _evict_to (it would evict everything
                    # and then skip the add anyway)
                    continue
                self._evict_to(self.max_bytes - nbytes)
                if self._bytes + nbytes > self.max_bytes:
                    continue
                self._entries[key] = _Entry(tokens=key, arrays=arrays,
                                            nbytes=nbytes, hits=m["hits"])
                self._bytes += nbytes
                self.stats.stored += 1
                loaded += 1
        return loaded
