"""Tracing / profiling utilities.

Parity targets (/root/reference SURVEY.md §5.1):
  * LLAMA_DEBUG activation tracing — the reference prints embed rows and
    per-layer RMS (llama.rs:309-314, 347-354). Here the jitted forward
    inserts jax.debug.print taps when tracing is enabled (zero cost when
    off: the flag is read at trace time).
  * profiling — the reference defers to external flamegraph/perf
    (docs/PROFILING.md); the TPU-native equivalent is jax.profiler traces
    viewable in TensorBoard/Perfetto, exposed as a context manager and a
    CLI flag.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger(__name__)

_DEBUG_ACTIVATIONS: bool | None = None


def debug_activations_enabled() -> bool:
    """True when LLAMA_DEBUG is set (checked once, trace-time)."""
    global _DEBUG_ACTIVATIONS
    if _DEBUG_ACTIVATIONS is None:
        _DEBUG_ACTIVATIONS = bool(os.environ.get("LLAMA_DEBUG"))
    return _DEBUG_ACTIVATIONS


def set_debug_activations(value: bool | None) -> None:
    global _DEBUG_ACTIVATIONS
    _DEBUG_ACTIVATIONS = value


def trace_activation(tag: str, layer: int, x) -> None:
    """Print the RMS of an activation inside a jitted function
    (parity: LLAMA_DEBUG per-layer RMS, llama.rs:347-354)."""
    if not debug_activations_enabled():
        return
    import jax
    import jax.numpy as jnp

    rms = jnp.sqrt(jnp.mean(jnp.square(x.astype(jnp.float32))))
    jax.debug.print("[LLAMA_DEBUG] layer {l:>3} {t}: rms={r:.6f}",
                    l=layer, t=tag, r=rms)


@contextlib.contextmanager
def profile(logdir: str = "/tmp/llama_gguf_tpu_profile",
            host_tracer_level: int = 2):
    """jax.profiler trace context; view with TensorBoard or Perfetto."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    t0 = time.time()
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        log.info("profile trace (%.1fs) written to %s", time.time() - t0,
                 logdir)


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler timelines (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
