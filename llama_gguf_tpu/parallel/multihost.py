"""Multi-host cluster runtime: initialization, mesh planning, fault
detection, recovery, and load metrics.

Parity targets:
  * cluster config + process bootstrap — the reference's ClusterConfig /
    Coordinator/ShardServer gRPC stack (/root/reference/src/distributed/
    config.rs:17-174, coordinator.rs:26-197) collapses to
    `jax.distributed.initialize`: each host loads its own weight shards
    straight from the GGUF (no weight streaming) and GSPMD moves activations
    over ICI/DCN (SURVEY.md §2.4).
  * auto-shard — memory-proportional layer assignment (auto_shard.rs:100-239)
    becomes mesh planning: pick the smallest model axis that fits the
    weights+KV in per-device HBM, give the rest to data parallelism.
  * fault tolerance — HealthMonitor's ping loop + consecutive-failure state
    machine and RecoveryManager's backoff-reconnect-reload
    (fault.rs:19-340). Here health = device liveness probed with a tiny
    device computation; recovery = re-initialize the runtime and reload
    shard-local weights.
  * load balancing — per-shard EWMA latency + imbalance detection
    (load_balancer.rs:13-143). With GSPMD there is no layer reassignment to
    make; the monitor reports per-host step-latency imbalance instead.
"""

from __future__ import annotations

import enum
import logging
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# cluster bootstrap
# ---------------------------------------------------------------------------


@dataclass
class ClusterConfig:
    """Parity: distributed/config.rs ClusterConfig, re-expressed for
    jax.distributed. All fields optional — on TPU pods JAX autodetects."""

    coordinator_address: str | None = None  # "host0:1234"
    num_processes: int | None = None
    process_id: int | None = None
    local_device_ids: list[int] | None = None
    # mesh axes; 0 = derive via auto_mesh
    data: int = 0
    model: int = 0

    @classmethod
    def from_env(cls) -> "ClusterConfig":
        return cls(
            coordinator_address=os.environ.get("LLAMA_GGUF_COORDINATOR"),
            num_processes=_int_env("LLAMA_GGUF_NUM_PROCESSES"),
            process_id=_int_env("LLAMA_GGUF_PROCESS_ID"),
        )


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v else None


def initialize_cluster(cfg: ClusterConfig | None = None) -> dict:
    """Bring up the multi-host runtime. Returns topology info. Safe to call
    single-host (no-op init)."""
    import jax

    cfg = cfg or ClusterConfig.from_env()
    if cfg.coordinator_address or cfg.num_processes:
        jax.distributed.initialize(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id,
            local_device_ids=cfg.local_device_ids,
        )
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    log.info("cluster up: %s", info)
    return info


def device_hbm_bytes(device=None) -> int:
    """Per-device HBM capacity (falls back to 16 GiB when unreported)."""
    import jax

    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 << 30


def auto_mesh(model_bytes: int, kv_bytes: int = 0,
              n_devices: int | None = None,
              hbm_bytes: int | None = None,
              headroom: float = 0.85) -> tuple[int, int]:
    """Choose (data, model) axes: the smallest model-parallel degree whose
    per-device share of weights+KV fits in HBM; remaining devices become
    data-parallel replicas (parity: compute_vram_assignments
    auto_shard.rs:134, re-expressed for SPMD)."""
    import jax

    n = n_devices or len(jax.devices())
    hbm = (hbm_bytes or device_hbm_bytes()) * headroom
    model_axis = 1
    while model_axis <= n:
        if n % model_axis == 0 and \
                (model_bytes + kv_bytes) / model_axis <= hbm:
            return (n // model_axis, model_axis)
        model_axis += 1
    raise RuntimeError(
        f"model ({(model_bytes + kv_bytes) / 1e9:.1f} GB) does not fit on "
        f"{n} devices x {hbm / 1e9:.1f} GB")


# ---------------------------------------------------------------------------
# health / fault detection (parity: fault.rs:19-253)
# ---------------------------------------------------------------------------


class HealthState(enum.Enum):
    HEALTHY = "healthy"
    DEGRADED = "degraded"
    FAILED = "failed"


@dataclass
class FaultConfig:
    health_check_interval: float = 10.0
    failure_threshold: int = 3       # consecutive failures -> FAILED
    degraded_threshold: int = 1      # consecutive failures -> DEGRADED
    probe_timeout: float = 30.0
    recovery_backoff: float = 2.0
    recovery_max_backoff: float = 60.0
    recovery_max_attempts: int = 5


class HealthMonitor:
    """Background device-liveness monitor with a consecutive-failure state
    machine (Healthy -> Degraded -> Failed)."""

    def __init__(self, config: FaultConfig | None = None,
                 on_state_change: Callable[[HealthState], None] | None = None,
                 probe: Callable[[], bool] | None = None):
        self.config = config or FaultConfig()
        self.on_state_change = on_state_change
        self.state = HealthState.HEALTHY
        self.consecutive_failures = 0
        self.last_check: float = 0.0
        self.checks = 0
        self._probe = probe or self._device_probe
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    @staticmethod
    def _device_probe() -> bool:
        """A tiny device computation proves the chip answers."""
        try:
            import jax
            import jax.numpy as jnp

            out = jax.jit(lambda x: x + 1)(jnp.zeros((8,), jnp.float32))
            return bool(np.asarray(out)[0] == 1.0)
        except Exception:
            return False

    def check_once(self) -> HealthState:
        self.checks += 1
        self.last_check = time.monotonic()
        ok = False
        try:
            ok = self._probe()
        except Exception:
            ok = False
        if ok:
            self.consecutive_failures = 0
            self._transition(HealthState.HEALTHY)
        else:
            self.consecutive_failures += 1
            if self.consecutive_failures >= self.config.failure_threshold:
                self._transition(HealthState.FAILED)
            elif self.consecutive_failures >= self.config.degraded_threshold:
                self._transition(HealthState.DEGRADED)
        return self.state

    def _transition(self, new: HealthState) -> None:
        if new is not self.state:
            log.warning("health: %s -> %s", self.state.value, new.value)
            self.state = new
            if self.on_state_change:
                self.on_state_change(new)

    def start(self) -> None:
        if self._thread is not None:
            return

        def loop():
            while not self._stop.wait(self.config.health_check_interval):
                self.check_once()

        self._thread = threading.Thread(target=loop, daemon=True,
                                        name="health-monitor")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
            self._thread = None


class RecoveryManager:
    """Exponential-backoff recovery: re-initialize the runtime and reload
    weights (parity: RecoveryManager fault.rs:293-340 — but weights reload
    from the local GGUF instead of re-streaming over gRPC)."""

    def __init__(self, reload_fn: Callable[[], Any],
                 config: FaultConfig | None = None,
                 reinit_fn: Callable[[], Any] | None = None):
        self.reload_fn = reload_fn
        self.reinit_fn = reinit_fn
        self.config = config or FaultConfig()
        self.attempts = 0
        self.recoveries = 0

    def recover(self) -> bool:
        backoff = self.config.recovery_backoff
        for attempt in range(1, self.config.recovery_max_attempts + 1):
            self.attempts += 1
            try:
                if self.reinit_fn is not None:
                    self.reinit_fn()
                self.reload_fn()
                self.recoveries += 1
                log.info("recovery succeeded on attempt %d", attempt)
                return True
            except Exception as e:
                log.warning("recovery attempt %d failed: %s", attempt, e)
                time.sleep(min(backoff, self.config.recovery_max_backoff))
                backoff *= 2
        return False


# ---------------------------------------------------------------------------
# load metrics (parity: load_balancer.rs:13-143)
# ---------------------------------------------------------------------------


@dataclass
class StepMetrics:
    """EWMA step latency per host; detects imbalance across hosts."""

    alpha: float = 0.2
    ewma_s: float = 0.0
    count: int = 0
    total_s: float = 0.0

    def record(self, seconds: float) -> None:
        self.count += 1
        self.total_s += seconds
        self.ewma_s = (seconds if self.count == 1
                       else self.alpha * seconds
                       + (1 - self.alpha) * self.ewma_s)

    @property
    def mean_s(self) -> float:
        return self.total_s / self.count if self.count else 0.0


@dataclass
class ImbalanceReport:
    imbalanced: bool
    max_ewma: float
    min_ewma: float
    ratio: float


def evaluate_imbalance(metrics: dict[str, StepMetrics],
                       threshold: float = 1.5) -> ImbalanceReport:
    """Cross-host imbalance check (parity: LoadBalancer::evaluate
    load_balancer.rs:143). With SPMD this is diagnostic — a slow host drags
    every collective, so the fix is operational (replace the host), not a
    layer reassignment."""
    vals = [m.ewma_s for m in metrics.values() if m.count]
    if len(vals) < 2:
        return ImbalanceReport(False, vals[0] if vals else 0.0,
                               vals[0] if vals else 0.0, 1.0)
    hi, lo = max(vals), min(vals)
    ratio = hi / lo if lo > 0 else float("inf")
    return ImbalanceReport(ratio > threshold, hi, lo, ratio)
