"""Paged KV cache: block pool + block tables with copy-on-write.

Parity target: /root/reference/src/model/paged.rs:13-577 (PageAllocator free
list + refcounts, BlockTable, PagedKVPool with block_size=16, PagedSequence
copy-on-write). Like the reference, this is a standalone component the main
decode path doesn't require (each batch slot owns a dense KV row there); it
exists for many-sequence serving with shared prefixes.

TPU-native shape: the pool is a static-shape array pair
    k_pool/v_pool: [L, num_blocks, block_size, H_kv, D]
so a jitted step can gather a sequence's blocks with `take` (gather) given
its block table [max_blocks] int32 — dynamic allocation happens on the host
(the allocator), the device only sees static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BLOCK_SIZE = 16  # tokens per block (paged.rs:13)


class OutOfBlocksError(RuntimeError):
    pass


class PageAllocator:
    """Free-list block allocator with refcounts (paged.rs:16-77)."""

    def __init__(self, num_blocks: int):
        self.num_blocks = num_blocks
        self._free: list[int] = list(range(num_blocks - 1, -1, -1))
        self._refs = np.zeros(num_blocks, np.int32)

    def allocate(self) -> int:
        if not self._free:
            raise OutOfBlocksError("no free KV blocks")
        b = self._free.pop()
        self._refs[b] = 1
        return b

    def retain(self, block: int) -> None:
        assert self._refs[block] > 0
        self._refs[block] += 1

    def release(self, block: int) -> None:
        assert self._refs[block] > 0
        self._refs[block] -= 1
        if self._refs[block] == 0:
            self._free.append(block)

    def ref_count(self, block: int) -> int:
        return int(self._refs[block])

    @property
    def free_blocks(self) -> int:
        return len(self._free)


@dataclass
class BlockTable:
    """One sequence's ordered block list + token count (paged.rs:82)."""
    blocks: list[int] = field(default_factory=list)
    length: int = 0

    def padded(self, max_blocks: int) -> np.ndarray:
        out = np.zeros(max_blocks, np.int32)
        out[: len(self.blocks)] = self.blocks
        return out


class PagedKVPool:
    """Block pool + per-sequence tables with copy-on-write forking.

    Device arrays are jnp; appends scatter into (layer, block, offset).
    """

    def __init__(self, num_layers: int, num_blocks: int, num_kv_heads: int,
                 head_dim: int, block_size: int = DEFAULT_BLOCK_SIZE,
                 v_head_dim: int | None = None, dtype=jnp.float32):
        vd = v_head_dim or head_dim
        self.block_size = block_size
        self.num_layers = num_layers
        self.allocator = PageAllocator(num_blocks)
        self.k = jnp.zeros((num_layers, num_blocks, block_size,
                            num_kv_heads, head_dim), dtype)
        self.v = jnp.zeros((num_layers, num_blocks, block_size,
                            num_kv_heads, vd), dtype)
        self.tables: dict[str, BlockTable] = {}

    # -- sequence lifecycle -----------------------------------------------------

    def create(self, seq_id: str) -> BlockTable:
        t = BlockTable()
        self.tables[seq_id] = t
        return t

    def fork(self, src_id: str, dst_id: str) -> BlockTable:
        """Copy-on-write fork: share all blocks, bump refcounts
        (paged.rs PagedSequence::fork / copy_block:271)."""
        src = self.tables[src_id]
        for b in src.blocks:
            self.allocator.retain(b)
        t = BlockTable(blocks=list(src.blocks), length=src.length)
        self.tables[dst_id] = t
        return t

    def free(self, seq_id: str) -> None:
        t = self.tables.pop(seq_id, None)
        if t:
            for b in t.blocks:
                self.allocator.release(b)

    # -- writes -------------------------------------------------------------------

    def _writable_block(self, table: BlockTable) -> tuple[int, int]:
        """(block, offset) for the next token, allocating / CoW-copying."""
        off = table.length % self.block_size
        if off == 0 and table.length == len(table.blocks) * self.block_size:
            table.blocks.append(self.allocator.allocate())
        blk = table.blocks[-1]
        if self.allocator.ref_count(blk) > 1:  # copy-on-write
            new = self.allocator.allocate()
            self.k = self.k.at[:, new].set(self.k[:, blk])
            self.v = self.v.at[:, new].set(self.v[:, blk])
            self.allocator.release(blk)
            table.blocks[-1] = new
            blk = new
        return blk, off

    def append(self, seq_id: str, k: jnp.ndarray, v: jnp.ndarray) -> None:
        """Append one token's K/V: k/v [L, H_kv, D]."""
        table = self.tables[seq_id]
        blk, off = self._writable_block(table)
        self.k = self.k.at[:, blk, off].set(k.astype(self.k.dtype))
        self.v = self.v.at[:, blk, off].set(v.astype(self.v.dtype))
        table.length += 1

    # -- reads --------------------------------------------------------------------

    def gather(self, seq_id: str, max_blocks: int | None = None
               ) -> tuple[jnp.ndarray, jnp.ndarray, int]:
        """Gather a sequence's cache: ([L, max_blocks*bs, H, D] k, v, length).

        With a fixed ``max_blocks`` the shapes are static, so a jitted
        attention can consume the result directly (mask positions >= length).
        """
        table = self.tables[seq_id]
        nb = max_blocks or len(table.blocks)
        idx = jnp.asarray(table.padded(nb))
        k = jnp.take(self.k, idx, axis=1)  # [L, nb, bs, H, D]
        v = jnp.take(self.v, idx, axis=1)
        L, _, bs, h, d = k.shape
        return (k.reshape(L, nb * bs, h, d),
                v.reshape(L, nb * bs, h, v.shape[-1]),
                table.length)

    @property
    def memory_bytes(self) -> int:
        return self.k.size * self.k.dtype.itemsize + \
            self.v.size * self.v.dtype.itemsize
