"""Multi-host runtime pieces: cluster info, auto-mesh planning, health state
machine, recovery backoff, load metrics; plus LLAMA_DEBUG activation tracing
(all on the single-process virtual CPU mesh)."""

import time

import numpy as np
import pytest

from llama_gguf_tpu.parallel.multihost import (
    ClusterConfig,
    FaultConfig,
    HealthMonitor,
    HealthState,
    ImbalanceReport,
    RecoveryManager,
    StepMetrics,
    auto_mesh,
    evaluate_imbalance,
    initialize_cluster,
)


def test_initialize_single_host():
    info = initialize_cluster(ClusterConfig())
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1


def test_cluster_config_from_env(monkeypatch):
    monkeypatch.setenv("LLAMA_GGUF_COORDINATOR", "h0:1234")
    monkeypatch.setenv("LLAMA_GGUF_NUM_PROCESSES", "4")
    monkeypatch.setenv("LLAMA_GGUF_PROCESS_ID", "2")
    cfg = ClusterConfig.from_env()
    assert cfg.coordinator_address == "h0:1234"
    assert cfg.num_processes == 4 and cfg.process_id == 2


def test_auto_mesh_planning():
    gb = 1 << 30
    # 8 devices x 16 GB, 4.5 GB model -> fits on one device: pure DP
    assert auto_mesh(int(4.5 * gb), 0, n_devices=8, hbm_bytes=16 * gb) == (8, 1)
    # 60 GB model on 16 GB devices -> needs model axis >= 5 -> 8 (divisor)
    d, m = auto_mesh(60 * gb, 0, n_devices=8, hbm_bytes=16 * gb)
    assert m >= 5 and d * m == 8 and (60 * gb) / m <= 16 * gb * 0.85
    # KV counts toward the budget
    d2, m2 = auto_mesh(10 * gb, 30 * gb, n_devices=8, hbm_bytes=16 * gb)
    assert m2 > 1
    with pytest.raises(RuntimeError, match="does not fit"):
        auto_mesh(1000 * gb, 0, n_devices=4, hbm_bytes=16 * gb)


def test_health_state_machine():
    results = iter([True, False, False, False, True])
    states = []
    mon = HealthMonitor(
        FaultConfig(failure_threshold=3, degraded_threshold=1),
        on_state_change=states.append,
        probe=lambda: next(results),
    )
    assert mon.check_once() is HealthState.HEALTHY
    assert mon.check_once() is HealthState.DEGRADED
    assert mon.check_once() is HealthState.DEGRADED
    assert mon.check_once() is HealthState.FAILED
    assert mon.check_once() is HealthState.HEALTHY  # recovers
    assert states == [HealthState.DEGRADED, HealthState.FAILED,
                      HealthState.HEALTHY]


def test_health_device_probe_real():
    mon = HealthMonitor(FaultConfig())
    assert mon.check_once() is HealthState.HEALTHY  # real tiny device op


def test_health_background_loop():
    mon = HealthMonitor(FaultConfig(health_check_interval=0.05),
                        probe=lambda: True)
    mon.start()
    time.sleep(0.3)
    mon.stop()
    assert mon.checks >= 2


def test_recovery_backoff():
    calls = []

    def reload():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("still down")

    rm = RecoveryManager(reload, FaultConfig(recovery_backoff=0.01,
                                             recovery_max_attempts=5))
    assert rm.recover()
    assert len(calls) == 3 and rm.recoveries == 1

    rm2 = RecoveryManager(lambda: (_ for _ in ()).throw(RuntimeError("x")),
                          FaultConfig(recovery_backoff=0.01,
                                      recovery_max_attempts=2))
    assert not rm2.recover()
    assert rm2.attempts == 2


def test_step_metrics_and_imbalance():
    a, b = StepMetrics(), StepMetrics()
    for _ in range(10):
        a.record(0.010)
        b.record(0.025)
    rep = evaluate_imbalance({"h0": a, "h1": b}, threshold=1.5)
    assert rep.imbalanced and rep.ratio == pytest.approx(2.5, rel=0.05)
    rep2 = evaluate_imbalance({"h0": a}, threshold=1.5)
    assert not rep2.imbalanced


def test_llama_debug_tracing(capfd):
    """LLAMA_DEBUG inserts per-layer RMS prints into the jitted forward."""
    from fixtures import make_tiny_model
    from llama_gguf_tpu.engine.engine import Engine, EngineConfig
    from llama_gguf_tpu.utils import debug

    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "dbg.gguf")
    make_tiny_model(path, arch="qwen2", vocab=288, hidden=64, layers=2,
                    heads=4, kv_heads=2, ffn=128, ctx=64, seed=1,
                    tokenizer=True)
    debug.set_debug_activations(True)
    try:
        eng = Engine.load(path, EngineConfig(weight_mode="dequant"))
        eng.greedy_tokens([1, 2, 3], 1)
        import jax

        jax.effects_barrier()
        out = capfd.readouterr().out
        assert "[LLAMA_DEBUG]" in out and "rms=" in out
        assert "embed" in out and "layer   1 out" in out
    finally:
        debug.set_debug_activations(None)
