"""MoE routing statistics: expert-selection histogram + load-balance factor.

Parity target: /root/reference/src/model/moe.rs:428-478 (MoeStats — per-expert
selection counts and the load-balance factor = max_load / mean_load; 1.0 is
perfectly balanced).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class MoeStats:
    num_experts: int
    counts: np.ndarray = field(default=None)
    tokens_routed: int = 0

    def __post_init__(self):
        if self.counts is None:
            self.counts = np.zeros(self.num_experts, np.int64)

    def record(self, top_experts: np.ndarray) -> None:
        """top_experts: int array [..., k] of selected expert ids."""
        flat = np.asarray(top_experts).reshape(-1)
        np.add.at(self.counts, flat, 1)
        self.tokens_routed += flat.size

    @property
    def load_balance_factor(self) -> float:
        """max/mean selection ratio; 1.0 = perfectly balanced
        (moe.rs:428)."""
        if self.tokens_routed == 0:
            return 1.0
        mean = self.counts.mean()
        return float(self.counts.max() / mean) if mean > 0 else 1.0

    @property
    def histogram(self) -> dict[int, int]:
        return {i: int(c) for i, c in enumerate(self.counts)}

    def reset(self) -> None:
        self.counts[:] = 0
        self.tokens_routed = 0


def route_and_record(router_logits: np.ndarray, k: int,
                     stats: MoeStats | None = None) -> np.ndarray:
    """Host-side helper: top-k expert ids from logits [..., E], recorded."""
    top = np.argsort(-np.asarray(router_logits), axis=-1)[..., :k]
    if stats is not None:
        stats.record(top)
    return top
