"""On-device kernel parity gate: fused Pallas qmatmul vs the XLA dequant
oracle, run on the REAL backend.

Tests exercise the Pallas kernels only in interpret mode on CPU; a Mosaic
lowering divergence (e.g. a precision-mode regression) would otherwise ship
undetected. This gate runs at bench startup and in the driver's
__graft_entry__ compile check, mirroring how the reference validates its
CUDA kernels against scalar dequant in tests/quantization_test.rs.
"""

from __future__ import annotations

import jax
import numpy as np


def kernel_parity_check(params, rtol: float = 2e-2, atol: float = 2e-2) -> int:
    """Run every distinct QuantLinear (fmt, group, source_type) in ``params``
    through the fused Pallas qmatmul and the XLA oracle; raise on divergence.
    Returns the number of kernel variants checked."""
    import jax.numpy as jnp

    from .linear import QuantLinear, _apply_quant_xla
    from .qmatmul import qmatmul

    seen: dict[tuple, QuantLinear] = {}

    def collect(t):
        if isinstance(t, QuantLinear):
            seen.setdefault((t.fmt, t.group, t.source_type), t)

    jax.tree_util.tree_map(
        collect, params, is_leaf=lambda t: isinstance(t, QuantLinear))
    rng = np.random.default_rng(1234)
    for lin in seen.values():
        x = jnp.asarray(rng.normal(size=(8, lin.k)).astype(np.float32))
        got = np.asarray(qmatmul(x, lin, precision="highest"))
        want = np.asarray(_apply_quant_xla(x, lin))
        scale = max(float(np.abs(want).max()), 1e-6)
        err = float(np.abs(got - want).max()) / scale
        if not np.allclose(got, want, rtol=rtol, atol=atol * scale):
            raise AssertionError(
                f"Pallas qmatmul diverges from XLA oracle for fmt={lin.fmt} "
                f"group={lin.group} src={lin.source_type}: "
                f"max rel err {err:.2e}")
    return len(seen)
