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


def moe_kernel_parity_check(rtol: float = 2e-2, atol: float = 2e-2) -> int:
    """On-device Mosaic-vs-XLA gate for the fused MoE dispatch kernel
    (ops.qmatmul.moe_qmatmul) — the bench/entry models carry no MoE, so
    without this the expert kernel's real lowering would only ever run on
    user models. Builds a small synthetic Q4_K expert stack, routes a few
    rows, and compares against the gathered-dequant einsum."""
    import jax.numpy as jnp

    from ..gguf.constants import GGMLType
    from ..quant.quantize import quantize
    from ..quant.repack import repack
    from .linear import QuantExpertStack
    from .qmatmul import moe_qmatmul

    rng = np.random.default_rng(7)
    E, K, N = 2, 256, 128  # small: the gate pays a real Mosaic compile
    packs, scales, mins = [], [], []
    fmt = group = None
    for _ in range(E):
        w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
        rw = repack(quantize(w, GGMLType.Q4_K).tobytes(), GGMLType.Q4_K,
                    (N, K))
        packs.append(rw.packed)
        scales.append(rw.scales)
        mins.append(rw.mins)
        fmt, group = rw.fmt, rw.group
    stack = QuantExpertStack(
        packed=jnp.asarray(np.stack(packs)),
        scales=jnp.asarray(np.stack(scales)),
        mins=jnp.asarray(np.stack(mins)) if mins[0] is not None else None,
        fmt=fmt, group=group, k=K, n=N)
    from .qmatmul import MOE_GROUPED_MIN_SLOTS

    checks = 0
    # slot-major (decode-sized S) AND grouped (prefill-sized S) kernels:
    # both lowerings gate here, with real Mosaic compiles
    for s_slots in (4, MOE_GROUPED_MIN_SLOTS + 5):
        x = jnp.asarray(rng.standard_normal((s_slots, K)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, E, size=s_slots), jnp.int32)
        # default precision: "highest" multi-pass dots balloon the Mosaic
        # compile of this kernel from minutes to tens of minutes on-device
        got = moe_qmatmul(x, stack, idx)
        if got is None:
            raise AssertionError("moe_qmatmul declined a tileable shape")
        got = np.asarray(got)
        w_sel = np.asarray(stack.gather_dequant(idx))
        want = np.einsum("ek,ekn->en", np.asarray(x), w_sel)
        scale = max(float(np.abs(want).max()), 1e-6)
        err = float(np.abs(got - want).max()) / scale
        if not np.allclose(got, want, rtol=max(rtol, 5e-2),
                           atol=max(atol, 5e-2) * scale):
            raise AssertionError(
                f"Pallas moe_qmatmul (S={s_slots}) diverges from "
                f"gathered-dequant oracle: max rel err {err:.2e}")
        checks += 1

    # grouped gate/up + GLU epilogue lowering (prefill-scale MoE path).
    # DISTINCT up stack: silu(g)*u is asymmetric, so a half-swap
    # regression in the kernel wiring fails this gate
    from .qmatmul import moe_qmatmul_glu

    up_packs, up_scales, up_mins = [], [], []
    for _ in range(E):
        wu = rng.standard_normal((N, K)).astype(np.float32) * 0.1
        rwu = repack(quantize(wu, GGMLType.Q4_K).tobytes(), GGMLType.Q4_K,
                     (N, K))
        up_packs.append(rwu.packed)
        up_scales.append(rwu.scales)
        up_mins.append(rwu.mins)
    up_stack = QuantExpertStack(
        packed=jnp.asarray(np.stack(up_packs)),
        scales=jnp.asarray(np.stack(up_scales)),
        mins=jnp.asarray(np.stack(up_mins)),
        fmt=fmt, group=group, k=K, n=N)
    s_slots = MOE_GROUPED_MIN_SLOTS + 5
    x = jnp.asarray(rng.standard_normal((s_slots, K)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, E, size=s_slots), jnp.int32)
    got = moe_qmatmul_glu(x, stack, up_stack, idx, "silu")
    if got is None:
        raise AssertionError("moe_qmatmul_glu declined a tileable shape")
    got = np.asarray(got, np.float32)
    gg = np.einsum("ek,ekn->en", np.asarray(x),
                   np.asarray(stack.gather_dequant(idx)))
    uu = np.einsum("ek,ekn->en", np.asarray(x),
                   np.asarray(up_stack.gather_dequant(idx)))
    want = gg / (1.0 + np.exp(-gg)) * uu
    scale = max(float(np.abs(want).max()), 1e-6)
    if not np.allclose(got, want, rtol=max(rtol, 5e-2),
                       atol=max(atol, 5e-2) * scale):
        err = float(np.abs(got - want).max()) / scale
        raise AssertionError(
            f"Pallas moe_qmatmul_glu diverges: max rel err {err:.2e}")
    return checks + 1
