"""Perplexity evaluation: teacher-forced NLL over a token stream.

The parity methodology of BASELINE.md ("perplexity delta vs reference at
identical quantization"): chunked teacher-forced evaluation like
llama.cpp's perplexity tool. Each chunk is one batched prefill; the
log-softmax + target gather runs on device and only per-chunk scalar sums
cross to the host.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PerplexityResult:
    nll_sum: float = 0.0
    count: int = 0
    per_chunk_ppl: list = field(default_factory=list)

    @property
    def nll(self) -> float:
        return self.nll_sum / self.count if self.count else 0.0

    @property
    def ppl(self) -> float:
        return float(np.exp(self.nll))


def _chunk_nll(runner, ids: list[int]) -> tuple[float, int]:
    """Sum NLL of ids[1:] under teacher forcing; returns (nll_sum, n)."""
    t = len(ids)
    kv = runner.init_kv()
    toks = np.zeros((runner.max_batch, t), np.int32)
    toks[0, :t] = ids
    pos = np.full((runner.max_batch, t), runner.max_seq, np.int32)
    pos[0] = np.arange(t)
    lengths = np.zeros((runner.max_batch,), np.int32)
    lengths[0] = t
    from .runner import read_bucket

    logits, _ = runner.step(jnp.asarray(toks), jnp.asarray(pos),
                            jnp.asarray(lengths), kv,
                            read_bound=read_bucket(t, runner.max_seq))
    logp = jax.nn.log_softmax(logits[0, : t - 1].astype(jnp.float32), axis=-1)
    targets = jnp.asarray(ids[1:], jnp.int32)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1).sum()
    return float(np.asarray(nll)), t - 1


def perplexity(runner, token_ids: list[int], chunk: int = 512,
               progress=None) -> PerplexityResult:
    """Chunked perplexity over a token stream (non-overlapping windows,
    llama.cpp-style)."""
    if len(token_ids) < 2:
        raise ValueError("perplexity needs at least 2 tokens")
    chunk = min(chunk, runner.max_seq)
    result = PerplexityResult()
    # full chunks plus the trailing partial window (>= 2 tokens)
    windows = [token_ids[i: i + chunk]
               for i in range(0, len(token_ids), chunk)]
    if len(windows[-1]) < 2:
        windows.pop()
    for c, ids in enumerate(windows):
        nll, n = _chunk_nll(runner, ids)
        result.nll_sum += nll
        result.count += n
        result.per_chunk_ppl.append(float(np.exp(nll / max(n, 1))))
        if progress:
            progress(c + 1, len(windows), result.ppl)
    return result
