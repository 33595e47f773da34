"""Unit tests for bench.py's differential bandwidth probe (VERDICT r4
Weak #1 / Next #3): a non-positive or noise-swamped timing differential is
a FAILED measurement and must surface as None (probe_failed), never as a
fabricated multi-billion-GB/s ceiling. BENCH_r04 shipped
kernel_probe_gbps: 4.6e9 and a false degraded-window flag from exactly
this path (the old code clamped dt to 1e-9 s)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

NBYTES = 113 * 1024 * 1024  # the probe weight's scale


def test_negative_differential_returns_none():
    # t(n2) < t(n1): window noise reversed the ordering — every retry too
    times = {n: 1.0 - 0.0001 * n for n in range(1, 10_000)}
    assert bench.differential_gbps(times.__getitem__, NBYTES, 10, 50) is None


def test_zero_differential_returns_none():
    # t(n2) == t(n1): XLA hoisted the loop-invariant kernel out of the scan
    assert bench.differential_gbps(lambda n: 0.5, NBYTES, 10, 50) is None


def test_implausibly_fast_differential_returns_none():
    # positive but tiny dt -> implied bandwidth above any physical HBM;
    # the old clamp path turned this into "4.6e9 GB/s, efficiency 0.0"
    def t(n):
        return 0.5 + 1e-12 * n

    assert bench.differential_gbps(t, NBYTES, 10, 50) is None


def test_retry_with_longer_scan_recovers():
    # constant noise floor eats a 40-iteration delta but not a doubled one:
    # attempt 1 sees dt <= 0, the retry (n2-n1 doubled) sees the real slope
    per_iter = NBYTES / 500e9  # a 500 GB/s kernel
    calls = []

    def t(n):
        calls.append(n)
        if len(calls) <= 2:  # first attempt: a stall inflates t(n1)
            return 1.0 if n > 30 else 1.5
        return 1.0 + per_iter * n

    got = bench.differential_gbps(t, NBYTES, 10, 50)
    assert got is not None
    assert abs(got - 500.0) / 500.0 < 0.01
    # the retry widened the second scan
    assert max(calls) > 50


def test_plausible_value_passes_through():
    per_iter = NBYTES / 300e9
    got = bench.differential_gbps(lambda n: per_iter * n, NBYTES, 10, 50)
    assert got is not None
    assert abs(got - 300.0) / 300.0 < 1e-6
    assert 0 < got <= bench.PROBE_CEILING_GBPS


def test_decode_rounds_skip_retry_when_probe_failed():
    """run_decode_rounds with probe_gbps=None must run exactly one round
    (no plausibility judgement possible) instead of crashing on None
    arithmetic or spinning MAX_ROUNDS."""
    calls = []

    class FakeRunner:
        max_seq = 2048

        def greedy_decode(self, cur0, pos, kv, steps):
            calls.append(steps)
            import numpy as np

            return np.zeros((1, steps), np.int32), kv

    import numpy as jnp_stub  # run_decode_reps only uses jnp.asarray

    rounds, best, probe, kv = bench.run_decode_rounds(
        FakeRunner(), None, {}, 7, None, jnp_stub, reps=2,
        weight_bytes=10**9, probe_gbps=None)
    assert probe is None
    assert len(rounds) == 1  # one warm + `reps` timed calls, no retries
    assert len(calls) == 1 + 2
