"""Fused Pallas qmatmul vs XLA dequant-matmul oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_gguf_tpu.gguf.constants import GGMLType
from llama_gguf_tpu.ops.linear import QuantLinear, _apply_quant_xla
from llama_gguf_tpu.ops.qmatmul import qmatmul
from llama_gguf_tpu.quant.quantize import quantize
from llama_gguf_tpu.quant.repack import repack

CASES = [
    (GGMLType.Q4_K, 4, 512, 256),
    (GGMLType.Q4_K, 2, 10240, 256),  # K-TILED affine: min-fold across tiles
    (GGMLType.Q4_0, 8, 512, 128),
    (GGMLType.Q2_K, 8, 512, 128),
    (GGMLType.Q8_0, 8, 512, 256),
    (GGMLType.Q6_K, 1, 512, 128),
    (GGMLType.Q6_K, 2, 5632, 256),  # int8 layout, full-K, llama down-proj K
    (GGMLType.Q5_K, 16, 1024, 128),
    (GGMLType.Q3_K, 3, 768, 128),
]


def make_lin(t, n, k, rng):
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.1
    raw = quantize(w, t)
    rw = repack(raw, t, (n, k))
    return QuantLinear(
        packed=jnp.asarray(rw.packed),
        scales=jnp.asarray(rw.scales),
        mins=jnp.asarray(rw.mins) if rw.mins is not None else None,
        bias=None,
        fmt=rw.fmt, group=rw.group, k=rw.k, n=rw.n, source_type=t.name,
    )


@pytest.mark.parametrize("t,b,k,n", CASES, ids=lambda c: str(c))
def test_qmatmul_matches_xla(t, b, k, n, rng):
    lin = make_lin(t, n, k, rng)
    x = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32))
    want = np.asarray(_apply_quant_xla(x, lin))
    got = np.asarray(qmatmul(x, lin, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("b", [600, 1088])
def test_qmatmul_row_tiled_big_batch(b, rng):
    """B > RB_MAX runs a row-tiled grid (nb > 1) with padding to a
    row-block multiple — the 32-stream mixed-step shape that OOM'd
    scoped VMEM when rows were un-tiled. Affine (mins) format so the
    lane-sliced transposed-xg block is exercised too."""
    t = GGMLType.Q4_K
    lin = make_lin(t, 256, 512, rng)
    x = jnp.asarray(rng.standard_normal((b, 512)).astype(np.float32))
    want = np.asarray(_apply_quant_xla(x, lin))
    got = np.asarray(qmatmul(x, lin, interpret=True))
    assert got.shape == (b, 256)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qmatmul_fallback_on_odd_shapes(rng):
    # N not multiple of 128 -> falls back to XLA path, still correct
    t = GGMLType.Q8_0
    lin = make_lin(t, 96, 512, rng)
    x = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
    want = np.asarray(_apply_quant_xla(x, lin))
    got = np.asarray(qmatmul(x, lin, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("t", [GGMLType.Q5_1, GGMLType.Q8_0])
def test_qmatmul_non_256_k(rng, t):
    """k=896 (Qwen2.5-0.5B geometry): legacy 32-block formats must run
    through the fused kernel path (tk=896 tiles), matching the XLA oracle."""
    k, n = 896, 256
    w = rng.normal(size=(n, k)).astype(np.float32) * 0.05
    raw = quantize(w, t)
    rw = repack(raw, t, (n, k))
    lin = QuantLinear(
        jnp.asarray(rw.packed), jnp.asarray(rw.scales),
        jnp.asarray(rw.mins) if rw.mins is not None else None,
        None, rw.fmt, rw.group, rw.k, rw.n, t.name,
    )
    x = jnp.asarray(rng.normal(size=(2, k)).astype(np.float32))
    got = np.asarray(qmatmul(x, lin, interpret=True))
    from llama_gguf_tpu.quant.dequant import dequantize as _dq

    want = np.asarray(x) @ _dq(raw, t, (n, k)).T
    assert np.allclose(got, want, atol=2e-3, rtol=2e-3), \
        np.abs(got - want).max()


def test_loader_keeps_896_wide_quantized(tmp_path):
    """Loader keeps k=896 legacy-format tensors in fused layouts instead of
    falling back to dense f32."""
    from llama_gguf_tpu.gguf.writer import GGUFWriter
    from llama_gguf_tpu.models.loader import ModelLoader
    from llama_gguf_tpu.gguf.reader import GGUFFile

    rng = np.random.default_rng(0)
    w = GGUFWriter()
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("llama.embedding_length", 896)
    w.add_metadata("llama.block_count", 1)
    w.add_metadata("llama.attention.head_count", 4)
    arr = rng.normal(size=(128, 896)).astype(np.float32) * 0.05
    w.add_tensor_raw("x.weight", (896, 128), GGMLType.Q5_1,
                     quantize(arr, GGMLType.Q5_1).tobytes())
    p = str(tmp_path / "w.gguf")
    w.write_to_path(p)
    loader = ModelLoader(GGUFFile.open(p), mode="quant")
    lin = loader.linear("x")
    assert isinstance(lin, QuantLinear)
    assert lin.k == 896 and lin.n == 128


def test_moe_qmatmul_matches_gather_dequant():
    """Batched per-expert fused kernel == gather_dequant + einsum, both
    q4 (affine, K-grouped split nibbles) and q8 layouts."""
    from llama_gguf_tpu.gguf.constants import GGMLType
    from llama_gguf_tpu.ops.linear import QuantExpertStack
    from llama_gguf_tpu.ops.qmatmul import moe_qmatmul
    from llama_gguf_tpu.quant.quantize import quantize
    from llama_gguf_tpu.quant.repack import repack

    rng = np.random.default_rng(17)
    E, K, N = 4, 256, 128
    for t in (GGMLType.Q4_K, GGMLType.Q8_0):
        packs, scales, mins = [], [], []
        fmt = group = None
        ws = []
        for e in range(E):
            w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
            ws.append(w)
            rw = repack(quantize(w, t).tobytes(), t, (N, K))
            packs.append(rw.packed)
            scales.append(rw.scales)
            mins.append(rw.mins)
            fmt, group = rw.fmt, rw.group
        has_mins = mins[0] is not None
        stack = QuantExpertStack(
            packed=jnp.asarray(np.stack(packs)),
            scales=jnp.asarray(np.stack(scales)),
            mins=jnp.asarray(np.stack(mins)) if has_mins else None,
            fmt=fmt, group=group, k=K, n=N,
        )
        x = jnp.asarray(rng.standard_normal((6, K)), jnp.float32)
        idx = jnp.asarray([0, 3, 1, 1, 2, 0], jnp.int32)
        got = moe_qmatmul(x, stack, idx, interpret=True,
                          precision="highest")
        # baseline einsum on HOST f32: on TPU a device einsum without an
        # explicit precision runs bf16 passes and would mask kernel bugs
        w_sel = np.asarray(stack.gather_dequant(idx))  # [6, K, N]
        want = np.einsum("ek,ekn->en", np.asarray(x), w_sel)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)

        # GROUPED path (prefill-scale S): sorted C-row single-expert
        # blocks, exact routing with heavy imbalance (expert 2 takes half
        # the slots, expert 1 none) and a non-multiple-of-C slot count
        from llama_gguf_tpu.ops import qmatmul as qm

        s_big = qm.MOE_GROUPED_MIN_SLOTS + 13
        xb = jnp.asarray(rng.standard_normal((s_big, K)), jnp.float32)
        idxb = jnp.asarray(
            np.where(np.arange(s_big) % 2 == 0, 2,
                     rng.integers(0, E, size=s_big)), jnp.int32)
        idxb = jnp.where(idxb == 1, 3, idxb)  # expert 1 gets zero slots
        got_b = moe_qmatmul(xb, stack, idxb, interpret=True,
                            precision="highest")
        w_sel = np.asarray(stack.gather_dequant(idxb))
        want_b = np.einsum("ek,ekn->en", np.asarray(xb), w_sel)
        np.testing.assert_allclose(np.asarray(got_b), want_b,
                                   rtol=2e-5, atol=2e-5)

        # fused gate/up + silu epilogue (grouped) with DISTINCT gate and
        # up stacks — silu(g)*u is asymmetric, so a half-swap regression
        # (reading the gate stack for both dots) fails loudly here
        from llama_gguf_tpu.ops.qmatmul import moe_qmatmul_glu

        up_packs, up_scales, up_mins = [], [], []
        up_ws = []
        for e in range(E):
            wu = rng.standard_normal((N, K)).astype(np.float32) * 0.1
            up_ws.append(wu)
            rwu = repack(quantize(wu, t).tobytes(), t, (N, K))
            up_packs.append(rwu.packed)
            up_scales.append(rwu.scales)
            up_mins.append(rwu.mins)
        up_stack = QuantExpertStack(
            packed=jnp.asarray(np.stack(up_packs)),
            scales=jnp.asarray(np.stack(up_scales)),
            mins=jnp.asarray(np.stack(up_mins)) if has_mins else None,
            fmt=fmt, group=group, k=K, n=N,
        )
        got_glu = moe_qmatmul_glu(xb, stack, up_stack, idxb, "silu",
                                  interpret=True, precision="highest")
        assert got_glu is not None
        gg = np.asarray(got_b, np.float32)
        uu = np.einsum("ek,ekn->en", np.asarray(xb),
                       np.asarray(up_stack.gather_dequant(idxb)))
        want_glu = gg / (1.0 + np.exp(-gg)) * uu
        np.testing.assert_allclose(np.asarray(got_glu), want_glu,
                                   rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("t,act", [
    (GGMLType.Q4_K, "silu"),        # affine: min panels ride both halves
    (GGMLType.Q8_0, "silu"),
    (GGMLType.Q4_K, "gelu"),
    (GGMLType.Q8_0, "swiglu_oai"),
    (GGMLType.Q6_K, "relu2"),
], ids=lambda v: str(v))
def test_qmatmul_glu_matches_two_step(t, act, rng):
    """The GLU-epilogue kernel (act(x@Wg) * (x@Wu) fused) must match the
    two-step qmatmul + elementwise path bit-for-bit-ish."""
    from llama_gguf_tpu.models.config import Activation
    from llama_gguf_tpu.models.transformer import _glu
    from llama_gguf_tpu.ops.linear import fuse_linears
    from llama_gguf_tpu.ops.qmatmul import qmatmul_glu

    k, f = 512, 256
    g_lin = make_lin(t, f, k, rng)
    u_lin = make_lin(t, f, k, rng)
    fused = fuse_linears([g_lin, u_lin])
    assert fused is not None and fused.splits == (f, f)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    got = qmatmul_glu(x, fused, act, interpret=True)
    assert got is not None and got.shape == (4, f)
    gg = qmatmul(x, g_lin, interpret=True)
    uu = qmatmul(x, u_lin, interpret=True)
    want = np.asarray(_glu(gg.astype(jnp.float32),
                           uu.astype(jnp.float32), Activation(act)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_qmatmul_glu_refuses_unfusable(rng):
    from llama_gguf_tpu.ops.qmatmul import qmatmul_glu

    lin = make_lin(GGMLType.Q8_0, 256, 512, rng)  # no splits
    x = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
    assert qmatmul_glu(x, lin, "silu", interpret=True) is None
    assert qmatmul_glu(x, lin, "xielu", interpret=True) is None


def test_pick_tiles_vmem_budgets():
    """Tile selection must respect the VMEM budgets: the x block is
    [rb, TK] f32 and the out block + accumulator are [rb, tn] f32 — a
    32-stream x 256-token mixed step (B = 8192 rows) OOM'd the 16 MB
    scoped-VMEM limit through the un-tiled output before rows were
    grid-tiled at RB_MAX."""
    from llama_gguf_tpu.ops.qmatmul import (
        FULL_TK_X_BUDGET, RB_MAX, TILED_X_BUDGET, _pick_tiles,
    )

    # decode-ish batches take the whole K axis in one block, one row block
    tk, tn, rb = _pick_tiles("q4", 32, 5632, 2048, b=8)
    assert tk == 5632 and rb == 8
    # large prefill batches tile rows at RB_MAX; the K tile fits the
    # [rb, tk] x block, not the whole batch
    tk, tn, rb = _pick_tiles("q4", 32, 4096, 6144, b=1024)
    assert rb == RB_MAX and 0 < tk and rb * tk * 4 <= TILED_X_BUDGET
    assert 4096 % tk == 0 and (tk == 4096 or tk % (8 * 32) == 0)
    # the 32-stream x 256-token mixed step that OOM'd on-device
    tk, tn, rb = _pick_tiles("q8", 16, 5632, 2048, b=8192)
    assert rb == RB_MAX and 0 < tk and rb * tk * 4 <= TILED_X_BUDGET
    # group=16 formats shrink on 128-aligned steps too
    tk, tn, rb = _pick_tiles("q4", 16, 4096, 256, b=2048)
    assert tk == 0 or (4096 % tk == 0
                       and (tk == 4096 or tk % (8 * 16) == 0))
    # the standard bench prefill (512 rows) keeps the full 2048 tile
    tk, tn, rb = _pick_tiles("q4", 32, 2048, 11264, b=512)
    assert tk == 2048 and rb == 512 and 512 * tk * 4 <= TILED_X_BUDGET
    # un-padded big batches (not a row-block multiple) refuse tiling;
    # qmatmul() pads b to a RB_MAX multiple before calling
    tk, tn, rb = _pick_tiles("q4", 32, 128, 256, b=RB_MAX * 3 + 8)
    assert tk == 0


def test_qmatmul_bf16_epilogue_in_default_mode(rng):
    """Kernel outputs emit bf16 when the effective matmul precision is
    "default" (halving the activation traffic across the Pallas call
    boundary — docs/ROOFLINE.md r3 'other' term); "highest" (parity mode)
    and unset-ambient keep exact f32 outputs."""
    lin = make_lin(GGMLType.Q4_K, 256, 512, rng)
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    want = np.asarray(_apply_quant_xla(x, lin))

    y_plain = qmatmul(x, lin, interpret=True)
    assert y_plain.dtype == jnp.float32  # no ambient: f32
    y_hi = qmatmul(x, lin, interpret=True, precision="highest")
    assert y_hi.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y_hi), want, rtol=1e-4, atol=1e-4)

    y_def = qmatmul(x, lin, interpret=True, precision="default")
    assert y_def.dtype == jnp.bfloat16
    scale = max(float(np.abs(want).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(y_def, np.float32), want,
                               rtol=2e-2, atol=2e-2 * scale)

    # ambient context (what the runner sets) resolves the same way
    with jax.default_matmul_precision("default"):
        y_amb = qmatmul(x, lin, interpret=True)
    assert y_amb.dtype == jnp.bfloat16
    with jax.default_matmul_precision("highest"):
        y_amb_hi = qmatmul(x, lin, interpret=True)
    assert y_amb_hi.dtype == jnp.float32


def test_qmatmul_glu_bf16_epilogue_in_default_mode(rng):
    from llama_gguf_tpu.ops.linear import fuse_linears
    from llama_gguf_tpu.ops.qmatmul import qmatmul_glu

    k, f = 512, 256
    gate = make_lin(GGMLType.Q4_K, f, k, rng)
    up = make_lin(GGMLType.Q4_K, f, k, rng)
    fused = fuse_linears([gate, up])
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    y_hi = qmatmul_glu(x, fused, "silu", interpret=True,
                       precision="highest")
    assert y_hi is not None and y_hi.dtype == jnp.float32
    y_def = qmatmul_glu(x, fused, "silu", interpret=True,
                        precision="default")
    assert y_def is not None and y_def.dtype == jnp.bfloat16
    want = np.asarray(y_hi)
    scale = max(float(np.abs(want).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(y_def, np.float32), want,
                               rtol=2e-2, atol=2e-2 * scale)

