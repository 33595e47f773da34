"""Multi-host SPMD serving loop.

TPU-native replacement for the reference's gRPC shard service
(/root/reference/src/distributed/shard.rs:377-445 and the `shard` CLI
command, src/main.rs:290-307): instead of a coordinator streaming layer
weights and hidden states over gRPC per token, every process loads its own
shard of the GGUF (each host mmaps the file), joins one jax.distributed
cluster, and runs the SAME jitted SPMD program. The only cross-host
control traffic is a fixed-shape request broadcast per generation; the
per-token communication is XLA collectives over ICI/DCN.

Protocol (all processes in lock-step):
  leader (process 0) takes requests; each round it broadcasts
  [op, n_tokens, max_new | token_ids...] as one int32 vector via
  multihost_utils.broadcast_one_to_all; followers decode the same buffer
  and run the identical prefill + greedy-decode steps, participating in
  the sharded matmuls. op=0 means shutdown.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Iterable

import numpy as np

log = logging.getLogger(__name__)

OP_STOP = 0
OP_GENERATE = 1

# test hook: artificial per-round slowdown (seconds) for degraded-host
# simulation in the 2-process CPU tests
_SLOWDOWN_ENV = "LLAMA_GGUF_STEP_SLOWDOWN_S"


def _broadcast(vec: np.ndarray) -> np.ndarray:
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(vec))


def encode_request(op: int, tokens: list[int], max_new: int,
                   max_prompt: int) -> np.ndarray:
    buf = np.zeros(3 + max_prompt, np.int32)
    buf[0] = op
    buf[1] = len(tokens)
    buf[2] = max_new
    buf[3: 3 + len(tokens)] = tokens
    return buf


def serve_spmd(runner, tokenizer, requests: Iterable[tuple[list[int], int]],
               max_prompt: int = 1024,
               on_text: Callable[[str], None] | None = None,
               step_metrics: dict | None = None) -> list[list[int]]:
    """Run the lock-step loop. On the leader, ``requests`` yields
    (token_ids, max_new) pairs; on followers it must be an empty iterable
    (they take requests from the broadcast). Returns generated token lists
    (leader; followers return their identical copies).

    Per-round, every process's local wall time is all-gathered and fed to
    the imbalance monitor (multihost.evaluate_imbalance — the SPMD analogue
    of the reference's LoadBalancer, load_balancer.rs:143): a host running
    >1.5x slower than the fastest is logged as degraded. Pass
    ``step_metrics`` (dict) to also receive the per-host StepMetrics."""
    import jax

    from .multihost import StepMetrics, evaluate_imbalance

    leader = jax.process_index() == 0
    outs: list[list[int]] = []
    it = iter(requests) if leader else None
    metrics: dict = step_metrics if step_metrics is not None else {}
    slowdown = float(os.environ.get(_SLOWDOWN_ENV, "0") or 0)
    rounds = 0

    while True:
        if leader:
            try:
                toks, max_new = next(it)
                buf = encode_request(OP_GENERATE, toks, max_new, max_prompt)
            except StopIteration:
                buf = encode_request(OP_STOP, [], 0, max_prompt)
        else:
            buf = np.zeros(3 + max_prompt, np.int32)
        buf = _broadcast(buf)
        op, n, max_new = int(buf[0]), int(buf[1]), int(buf[2])
        if op == OP_STOP:
            return outs
        toks = buf[3: 3 + n].tolist()

        t0 = time.time()
        kv = runner.init_kv()
        logits, kv, pos = runner.prefill(toks, kv)
        first = int(np.argmax(np.asarray(logits)))
        gen = [first]
        if max_new > 1:
            more, _ = runner.greedy_decode(
                np.asarray([first]), np.asarray([pos]), kv,
                steps=max_new - 1)
            gen += np.asarray(more)[0].tolist()
        if slowdown > 0:
            time.sleep(slowdown)  # degraded-host simulation (tests)
        local_s = time.time() - t0

        # all-gather per-host round times and feed the imbalance monitor.
        # The first round is excluded: it is dominated by jit compilation
        # (tens of seconds), which would mask any real per-host skew.
        from jax.experimental import multihost_utils

        all_s = np.asarray(multihost_utils.process_allgather(
            np.asarray([local_s], np.float32))).reshape(-1)
        rounds += 1
        if rounds > 1:
            for p, s in enumerate(all_s):
                metrics.setdefault(f"host{p}", StepMetrics()).record(float(s))
        report = evaluate_imbalance(metrics)
        if report.imbalanced and leader:
            log.warning(
                "host imbalance detected: slowest %.3fs vs fastest %.3fs "
                "(ratio %.2fx) — a degraded host drags every collective; "
                "replace it or drop it from the mesh",
                report.max_ewma, report.min_ewma, report.ratio)

        outs.append(gen)
        if leader and on_text is not None and tokenizer is not None:
            on_text(tokenizer.decode(gen))
