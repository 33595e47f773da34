"""Fused dequant-matmul Pallas kernels.

The TPU analogue of the reference's fused CUDA dequant-matvec family
(/root/reference/src/backend/cuda/kernels.rs:443-700): quantized weights are
DMA'd from HBM as packed integers, dequantized in VMEM and fed straight to
the MXU — HBM traffic stays at the quantized bit-width (the decode-phase
bottleneck). Unlike the reference's matvec-only kernels, these are batched
matmuls (x is [B, K]) for continuous batching.

Two canonical layouts (see quant/repack.py):
  q4: packed uint8 [K/2, N] in GROUP-LOCAL split order: within each scale
      group of ``group`` elements, byte j holds q[j] | q[j + group/2] << 4.
      Unpack is one mask + one shift at i32 width; the caller rearranges x
      so that each K-tile's columns are [lo-plane | hi-plane] and the kernel
      does two column-sliced dots — pure lane slicing, no sublane shuffles.
  q8: int8 [K, N], tiled directly.

Per-group scales s [K/g, N] multiply in VMEM. For affine formats the
per-group min term is factored OUT of the per-element dequant and onto the
MXU:   y = x @ (s ∘ q)  −  xg @ m,   where xg [K/g, B] holds the per-group
sums of x (computed in XLA outside the kernel — trivially fused there; a
round-1 attempt to do the whole factored min path in XLA was 50x slower
because the strided lane reduction + the full dequant lived outside the
kernel). This removes two VPU passes per element — the round-3
decomposition measured the decode kernel chain VPU-dequant-bound at ~530
GB/s in an ~800 GB/s window, so every deleted per-element pass is HBM
bandwidth recovered. xg rides transposed ([K/g, B], lanes = B) because a
[B, tk/g] block violates Mosaic's 128-lane divisibility at tiled K.

The K axis is tiled on the grid with an f32 VMEM accumulator so arbitrarily
large K fits in VMEM. Measured on v5e at B=8, 4096x4096: ~16-17us for both
layouts (≈500-1000 GB/s effective — memory-bound roofline regime).

Precision: Mosaic's MXU dot defaults to a single bf16 pass (~2e-3 rel err).
``precision="highest"`` (default) uses the f32-accurate multi-pass mode for
llama.cpp greedy-token parity; pass "default" to trade parity for speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear import QuantLinear

DEFAULT_TK = 2048  # minimum preferred K elements per grid step (tiled)
MAX_FULL_TK = 8192  # below this K, full-K needs no budget check
# Per-weight-tile budget (tk*tn*4, the f32 dequant plane): the round-3
# tile sweep measured q8 K=14336 at (tk=14336, tn=256) = 693 GB/s vs the
# old (2048, 256) = 623 — Mosaic streams the dequant, so tiles far above
# the old 2048 cap compile and win; (14336, 512) = 29 MB failed compile,
# (14336, 256) = 14.7 MB passed. q4 kernels materialize ~2x more
# intermediate per logical element (i32 widen + two planes), so their
# budget is halved.
DEQ_TILE_BUDGET_Q8 = 15 << 20
DEQ_TILE_BUDGET_Q4 = 8650752  # 8.25 MB — the historical 8192x256 point
FULL_TK_X_BUDGET = 4 << 20  # max bytes of the [B, K] x block for full-K
# max bytes of the [B, TK] x block (tiled path). Pallas double-buffers
# every input block, so the real VMEM need is ~2x this plus the weight
# tiles. 5 MB keeps the long-measured 512-row prefill block (4.19 MB,
# ~10 MB scoped, compiles) while rejecting the failing 8.4 MB block
# (19.6 MB scoped > the 16 MB limit).
TILED_X_BUDGET = 5 << 20
DEFAULT_TN = 256

_PREC = {
    None: None,  # inherit the ambient jax.default_matmul_precision
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _out_dtype(precision: str | None):
    """Kernel OUTPUT dtype: bf16 in default-precision mode, f32 otherwise.

    The [rows, N] f32 outputs of the fused kernels are pure activation
    traffic across the Pallas custom-call boundary — ~160 MB/layer at
    8B/512-token prefill, 16.9 ms of the 73.2 ms step (docs/ROOFLINE.md
    r3). In "default" mode the MXU dot is a single bf16 pass anyway
    (~2e-3 rel err), so rounding the f32 accumulator to bf16 on the way
    out adds no meaningful error while halving the boundary bytes;
    "highest" (llama.cpp-parity) keeps exact f32 outputs. The explicit
    ``precision`` argument wins; None resolves the ambient
    jax.default_matmul_precision at trace time (the runner sets it)."""
    eff = precision if precision is not None \
        else jax.config.jax_default_matmul_precision
    return jnp.bfloat16 if eff == "default" else jnp.float32


def _repeat_rows(s: jnp.ndarray, rep: int) -> jnp.ndarray:
    """np.repeat along axis 0 ([G, N] -> [G*rep, N]) via broadcast+reshape
    (pltpu.repeat is tile-style and unsuitable for per-group scales)."""
    g, n = s.shape
    return jnp.broadcast_to(s[:, None, :], (g, rep, n)).reshape(g * rep, n)


def _min_dot(acc_ref, xg_ref, m_ref, prec):
    """acc -= xg^T @ m: the factored-out affine min term on the MXU.
    xg_ref [TK/g, B] (transposed; lanes = B); m_ref [TK/g, TN]."""
    acc_ref[:] -= jax.lax.dot_general(
        xg_ref[:].astype(jnp.float32), m_ref[:].astype(jnp.float32),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _acc_q4(acc_ref, x, p_ref, s_ref, m_ref, xg_ref, *, group, tk, prec,
            has_mins):
    """Accumulate one group-split q4 tile into acc_ref. ``x``: the
    already-loaded f32 [B, TK] block, tile-arranged [lo-plane | hi-plane].
    Mosaic can't shift at 8-bit vector width; widen to i32 first.
    u8 zero-extends, so the high nibble needs no mask after the shift."""
    w32 = p_ref[:].astype(jnp.int32)
    lo = (w32 & 0x0F).astype(jnp.float32)
    hi = (w32 >> 4).astype(jnp.float32)
    srep = _repeat_rows(s_ref[:].astype(jnp.float32), group // 2)  # [TK/2, TN]
    acc_ref[:] += jnp.dot(x[:, : tk // 2], lo * srep,
                          preferred_element_type=jnp.float32, precision=prec)
    acc_ref[:] += jnp.dot(x[:, tk // 2 :], hi * srep,
                          preferred_element_type=jnp.float32, precision=prec)
    if has_mins:
        _min_dot(acc_ref, xg_ref, m_ref, prec)


def _acc_q8(acc_ref, x, p_ref, s_ref, m_ref, xg_ref, *, group, tk, prec,
            has_mins):
    q = p_ref[:].astype(jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    acc_ref[:] += jnp.dot(x, q * _repeat_rows(s, group),
                          preferred_element_type=jnp.float32, precision=prec)
    if has_mins:
        _min_dot(acc_ref, xg_ref, m_ref, prec)


def _q4_kernel(x_ref, p_ref, s_ref, m_ref, xg_ref, o_ref, acc_ref, *,
               group: int, tk: int, prec, has_mins: bool, k_axis: int = 1):
    """One (n, k) grid step for the group-split q4 layout.

    x_ref: [B, TK] — tile-arranged so columns [0, TK/2) hold the lo-plane
    elements (j < group/2 of each scale group) and [TK/2, TK) the hi-plane;
    p_ref: [TK//2, TN] uint8; s_ref: [TK//group, TN]; m_ref/xg_ref: min
    panel + transposed per-group x sums (affine formats only); o_ref:
    [B, TN]. Packed row r belongs to scale group r // (group/2). ``k_axis``
    is the grid axis that tiles K (last for the MoE batched-expert variant).
    """
    ki = pl.program_id(k_axis)
    nk = pl.num_programs(k_axis)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _acc_q4(acc_ref, x_ref[:].astype(jnp.float32), p_ref, s_ref, m_ref,
            xg_ref, group=group, tk=tk, prec=prec, has_mins=has_mins)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q8_kernel(x_ref, p_ref, s_ref, m_ref, xg_ref, o_ref, acc_ref, *,
               group: int, tk: int, prec, has_mins: bool, k_axis: int = 1):
    k_idx = pl.program_id(k_axis)
    nk = pl.num_programs(k_axis)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _acc_q8(acc_ref, x_ref[:].astype(jnp.float32), p_ref, s_ref, m_ref,
            xg_ref, group=group, tk=tk, prec=prec, has_mins=has_mins)

    @pl.when(k_idx == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _glu_combine(g: jnp.ndarray, u: jnp.ndarray, act: str) -> jnp.ndarray:
    """The gated-activation epilogue, f32 in/out (mirrors
    models/transformer._glu — keep the two in sync)."""
    if act == "swiglu_oai":  # gpt-oss clamped SwiGLU
        g = jnp.minimum(g, 7.0)
        u = jnp.clip(u, -7.0, 7.0)
        return (g * jax.lax.logistic(1.702 * g)) * (u + 1.0)
    if act == "gelu":  # tanh approximation (ggml_gelu)
        c = 0.7978845608028654  # sqrt(2/pi)
        return 0.5 * g * (1.0 + jnp.tanh(c * (g + 0.044715 * g * g * g))) * u
    if act == "relu":
        return jnp.maximum(g, 0.0) * u
    if act == "relu2":
        return jnp.square(jnp.maximum(g, 0.0)) * u
    return g * jax.lax.logistic(g) * u  # silu


def _glu_kernel(x_ref, pg_ref, pu_ref, sg_ref, su_ref, m_refs, xg_ref,
                o_ref, accg_ref, accu_ref, *, fmt: str, group: int, tk: int,
                prec, has_mins: bool, act: str):
    """Fused gate/up projection + gated activation: one (b, n, k) grid step
    computes BOTH halves' dequant-dots and, on the last K step, writes
    act(gate) * up — the [rb, 2F] intermediate never touches HBM. At
    8B/512-token prefill the two f32 round-trips of that intermediate are
    ~90 MB/layer of pure activation traffic (docs/ROOFLINE.md)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    acc = _acc_q4 if fmt == "q4" else _acc_q8
    x = x_ref[:].astype(jnp.float32)
    mg, mu = m_refs if has_mins else (None, None)
    acc(accg_ref, x, pg_ref, sg_ref, mg, xg_ref,
        group=group, tk=tk, prec=prec, has_mins=has_mins)
    acc(accu_ref, x, pu_ref, su_ref, mu, xg_ref,
        group=group, tk=tk, prec=prec, has_mins=has_mins)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[:] = _glu_combine(accg_ref[:], accu_ref[:], act).astype(
            o_ref.dtype)


def _arrange_x_q4(x: jnp.ndarray, group: int, tk: int) -> jnp.ndarray:
    """Rearrange x so each TK-column block is [lo-plane | hi-plane] for that
    K-tile, matching the group-split packed nibble order."""
    b, k = x.shape
    h = group // 2
    nk = k // tk
    gpt = tk // group
    x4 = x.reshape(b, nk, gpt, group)
    return jnp.concatenate(
        [x4[:, :, :, :h].reshape(b, nk, tk // 2),
         x4[:, :, :, h:].reshape(b, nk, tk // 2)],
        axis=-1,
    ).reshape(b, k)


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "group", "k", "n", "tk", "tn", "rb", "interpret",
                     "precision", "out_dtype"),
)
def _qmatmul_call(x, packed, scales, mins, *, fmt, group, k, n,
                  tk, tn, rb, interpret, precision=None,
                  out_dtype=jnp.float32):
    """``rb``: row-block size. Decode-sized batches run as one row block
    (rb == B, grid row axis of 1 — identical to the historical 2-D grid);
    big prefill/mixed steps (B*T in the thousands) tile rows so the
    [rb, tn] output block + f32 accumulator stay inside scoped VMEM — a
    32-stream x 256-token mixed step (B = 8192 rows) OOM'd the 16 MB
    scoped limit through the un-tiled [B, tn] output before this."""
    b = x.shape[0]
    nk = k // tk
    nn = n // tn
    nb = b // rb
    grid = (nb, nn, nk)
    prec = _PREC[precision]
    has_mins = mins is not None

    scale_spec = pl.BlockSpec((tk // group, tn), lambda bi, ni, ki: (ki, ni),
                              memory_space=pltpu.VMEM)

    if fmt == "q4":
        kernel = functools.partial(_q4_kernel, group=group, tk=tk, prec=prec,
                                   has_mins=has_mins, k_axis=2)
        in_specs = [
            pl.BlockSpec((rb, tk), lambda bi, ni, ki: (bi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            scale_spec,
        ]
        inputs = [_arrange_x_q4(x, group, tk), packed, scales]
    else:
        kernel = functools.partial(_q8_kernel, group=group, tk=tk, prec=prec,
                                   has_mins=has_mins, k_axis=2)
        in_specs = [
            pl.BlockSpec((rb, tk), lambda bi, ni, ki: (bi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            scale_spec,
        ]
        inputs = [x, packed, scales]
    if has_mins:
        # min panel + TRANSPOSED per-group x sums ([K/g, B]: lanes = B,
        # legal at any tk when the row axis is un-tiled (block == full
        # lanes); tiled rows need rb % 128 == 0 (lane-sliced block)
        in_specs.append(scale_spec)
        inputs.append(mins)
        in_specs.append(pl.BlockSpec((tk // group, rb),
                                     lambda bi, ni, ki: (ki, bi),
                                     memory_space=pltpu.VMEM))
        inputs.append(
            x.reshape(b, k // group, group).sum(-1).T.astype(jnp.float32))
    else:
        # dummy placeholders so kernel arity stays fixed
        def _wrap(kern):
            def inner(x_ref, p_ref, s_ref, o_ref, acc_ref):
                return kern(x_ref, p_ref, s_ref, None, None, o_ref, acc_ref)
            return inner
        kernel = _wrap(kernel)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rb, tn), lambda bi, ni, ki: (bi, ni), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((rb, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    return out


RB_MAX = 512  # rows per row-block when B*T exceeds it (must be % 128 == 0:
# the transposed xg block lane-slices [K/g, B] at rb boundaries)


def _pick_tiles(fmt: str, group: int, k: int, n: int,
                b: int = 8, deq_scale: int = 1) -> tuple[int, int, int]:
    """(K-tile, N-tile, row-block) choice under Mosaic's block constraints
    (the scale panel's rows must be divisible by 8, i.e. tk % 8*group == 0
    — OR the block must equal the full array).

    Prefer tk == K whenever it fits VMEM: one grid K-step, no accumulator
    revisits. This matters for shapes like K=5632 (llama FFN down), whose
    only legal PARTIAL tile <= 2048 is 512 — 11 small K-steps measured
    ~2.8x slower than the HBM floor; the round-3 tile sweep extended the
    finding to K=14336 (full-K 693 GB/s vs tk=2048 623). When full-K is
    over budget, pick the LARGEST multiple of 8*group dividing K that fits
    the per-tile dequant budget (not the old 2048 cap).

    ``b``: batch rows of x (caller pads to a multiple of the returned rb).
    Rows beyond RB_MAX are GRID-TILED: the x block is [rb, tk] f32 and the
    output block + f32 accumulator are [rb, tn] — un-tiled rows made a
    32-stream x 256-token mixed step (B = 8192) allocate a 16 MB out+acc
    pair and OOM the 16 MB scoped-VMEM limit on the real chip."""
    tn = DEFAULT_TN if n % DEFAULT_TN == 0 else 128
    if n % tn != 0:
        return 0, 0, 0
    rb = b if b <= RB_MAX else RB_MAX
    if b % rb != 0:
        return 0, 0, 0
    deq_budget = (DEQ_TILE_BUDGET_Q8 if fmt == "q8"
                  else DEQ_TILE_BUDGET_Q4) // deq_scale
    if (k % (2 * group) == 0 and rb * k * 4 <= FULL_TK_X_BUDGET
            and (k <= MAX_FULL_TK or k * tn * 4 <= deq_budget)):
        return k, tn, rb

    def fit_rows(tk: int) -> int:
        # shrink tk while the [rb, tk] f32 x block blows the VMEM budget.
        # Shrunk tiles must keep the Mosaic constraint tk % (8*group) == 0
        # (scale-panel rows divisible by 8) since they no longer equal the
        # full K axis.
        astep = 8 * group
        while tk >= astep and rb * tk * 4 > TILED_X_BUDGET:
            nt = tk // 2 // astep * astep
            while nt >= astep and k % nt:
                nt -= astep
            if nt < astep or nt == tk:
                return 0
            tk = nt
        return tk if rb * tk * 4 <= TILED_X_BUDGET else 0

    step = 8 * group
    cap = max(min(k, deq_budget // (tn * 4)), DEFAULT_TK)
    for tk in range(cap // step * step, step - 1, -step):
        if k % tk == 0:
            tk = fit_rows(tk)
            return (tk, tn, rb) if tk else (0, 0, 0)
    return 0, 0, 0


_INTERPRET = False  # tests force interpret-mode kernels on the CPU mesh


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def qmatmul(x: jnp.ndarray, lin: QuantLinear, interpret: bool = False,
            precision: str | None = None) -> jnp.ndarray:
    """x [B, K] @ quantized W [K, N] -> [B, N] float32 (bias NOT applied)."""
    interpret = interpret or _INTERPRET
    b, k = x.shape
    assert k == lin.k, (k, lin.k)
    n = lin.n
    # pad batch to the f32 sublane tile; big batches pad to a row-block
    # multiple so the grid can tile rows
    unit = 8 if b <= RB_MAX else RB_MAX
    b_pad = -(-max(b, 8) // unit) * unit
    tk, tn, rb = _pick_tiles(lin.fmt, lin.group, k, n, b=b_pad)
    if tk == 0 or n % tn != 0 or n % 128 != 0:
        from .linear import _apply_quant_xla
        return _apply_quant_xla(x, lin)

    xp = jnp.pad(x, ((0, b_pad - b), (0, 0))) if b_pad != b else x
    y = _qmatmul_call(
        xp, lin.packed, lin.scales, lin.mins,
        fmt=lin.fmt, group=lin.group, k=k, n=n, tk=tk, tn=tn, rb=rb,
        interpret=interpret, precision=precision,
        out_dtype=_out_dtype(precision),
    )
    if b_pad != b:
        y = y[:b]
    return y


# ---------------------------------------------------------------------------
# w4a8 (int8-activation MXU path): BUILT, MEASURED, DELETED in round 4.
# The v7 structural probe (int8 dots, no scales) beats the f32 chain by up
# to +51% — but every practical way to apply the per-group scales costs
# more VPU passes than the int8 dot saves: the full production chain
# (u = round(127*s/S) panel multiply + exact q*u = a + 128*b plane split +
# four int8 dots) measured 0.68x of the f32 chain at decode shapes and a
# wash at 512-row prefill (the integer dequant ate the 2x int8 MXU rate).
# Implementation preserved in commit ef99fe2; measurements and the v9/v10
# cost attribution in docs/ROOFLINE.md and scripts/bench_kernel_variants.py.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Fused gate/up + gated activation (GLU epilogue)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "group", "k", "f", "tk", "tn", "rb", "act",
                     "interpret", "precision", "out_dtype"),
)
def _qmatmul_glu_call(x, packed, scales, mins, *, fmt, group, k, f,
                      tk, tn, rb, act, interpret, precision=None,
                      out_dtype=jnp.float32):
    """packed/scales/mins hold the FUSED [gate | up] halves along N
    (ops.linear.fuse_linears order); grid covers F = one half. The packed
    array rides twice with index maps offset by F//tn — XLA dedups the
    buffer, the kernel sees two disjoint weight blocks per step."""
    b = x.shape[0]
    nk = k // tk
    nf = f // tn
    grid = (b // rb, nf, nk)
    prec = _PREC[precision]
    has_mins = mins is not None

    def wblocks(rows):
        return [
            pl.BlockSpec((rows, tn), lambda bi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, tn), lambda bi, ni, ki: (ki, ni + nf),
                         memory_space=pltpu.VMEM),
        ]

    in_specs = [pl.BlockSpec((rb, tk), lambda bi, ni, ki: (bi, ki),
                             memory_space=pltpu.VMEM)]
    if fmt == "q4":
        inputs = [_arrange_x_q4(x, group, tk), packed, packed,
                  scales, scales]
        in_specs += wblocks(tk // 2)
    else:
        inputs = [x, packed, packed, scales, scales]
        in_specs += wblocks(tk)
    in_specs += wblocks(tk // group)

    kernel = functools.partial(_glu_kernel, fmt=fmt, group=group, tk=tk,
                               prec=prec, has_mins=has_mins, act=act)
    if has_mins:
        inputs += [mins, mins,
                   x.reshape(b, k // group, group).sum(-1).T
                   .astype(jnp.float32)]
        in_specs += wblocks(tk // group)
        in_specs.append(pl.BlockSpec((tk // group, rb),
                                     lambda bi, ni, ki: (ki, bi),
                                     memory_space=pltpu.VMEM))

        def _wrap(kern):
            def inner(x_ref, pg, pu, sg, su, mg, mu, xg, o_ref, ag, au):
                return kern(x_ref, pg, pu, sg, su, (mg, mu), xg, o_ref,
                            ag, au)
            return inner
    else:
        def _wrap(kern):
            def inner(x_ref, pg, pu, sg, su, o_ref, ag, au):
                return kern(x_ref, pg, pu, sg, su, None, None, o_ref,
                            ag, au)
            return inner
    kernel = _wrap(kernel)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rb, tn), lambda bi, ni, ki: (bi, ni), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, f), out_dtype),
        scratch_shapes=[pltpu.VMEM((rb, tn), jnp.float32),
                        pltpu.VMEM((rb, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    return out


GLU_ACTS = ("silu", "gelu", "relu", "relu2", "swiglu_oai")


def qmatmul_glu(x: jnp.ndarray, lin, act: str,
                interpret: bool = False,
                precision: str | None = None) -> jnp.ndarray | None:
    """act(x @ W_gate) * (x @ W_up) for a FUSED gate/up QuantLinear
    (equal splits) — the [B, 2F] intermediate stays in VMEM. Returns None
    when the shapes don't tile or the fusion doesn't apply (caller falls
    back to the two-step path)."""
    interpret = interpret or _INTERPRET
    if act not in GLU_ACTS or lin.bias is not None:
        return None
    splits = getattr(lin, "splits", None)
    if not splits or len(splits) != 2 or splits[0] != splits[1]:
        return None
    b, k = x.shape
    assert k == lin.k, (k, lin.k)
    f = splits[0]
    unit = 8 if b <= RB_MAX else RB_MAX
    b_pad = -(-max(b, 8) // unit) * unit
    tk, tn, rb = _pick_tiles(lin.fmt, lin.group, k, f, b=b_pad, deq_scale=2)
    if tk == 0 or f % tn != 0 or f % 128 != 0:
        return None
    xp = jnp.pad(x, ((0, b_pad - b), (0, 0))) if b_pad != b else x
    y = _qmatmul_glu_call(
        xp, lin.packed, lin.scales, lin.mins,
        fmt=lin.fmt, group=lin.group, k=k, f=f, tk=tk, tn=tn, rb=rb,
        act=act, interpret=interpret, precision=precision,
        out_dtype=_out_dtype(precision),
    )
    if b_pad != b:
        y = y[:b]
    return y


# ---------------------------------------------------------------------------
# MoE: batched per-expert fused dequant-matvec
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "group", "k", "n", "tk", "tn", "interpret",
                     "precision", "out_dtype"),
)
def _moe_qmatmul_call(x, idx, packed, scales, mins, *, fmt, group, k, n,
                      tk, tn, interpret, precision=None,
                      out_dtype=jnp.float32):
    """x [S, K] (one input row per routed expert slot), idx [S] int32
    expert ids; packed/scales/mins are the FULL compressed expert stacks
    [E, ...] -> [S, N].

    Grid (S, N-tiles, K-tiles) with ``idx`` as a SCALAR-PREFETCH operand:
    each slot's weight blocks are DMA'd straight out of the full stack via
    the prefetched index (BlockSpec index_map reads idx_ref) — no gather,
    no HBM materialization of selected experts. The previous design
    (jnp.take of the packed stacks before the kernel) tripled decode
    traffic (gather read + write + kernel read) and allocated
    slots x expert-bytes of temps — a 32-row prefill chunk on 8-layer
    Mixtral Q4_K needed 19 GB of HBM and OOM'd (r5). This is the TPU
    analogue of the reference's CUDA expert streaming (moe.rs:321-416),
    done as in-kernel indexed DMA."""
    s_slots = x.shape[0]
    grid = (s_slots, n // tn, k // tk)
    prec = _PREC[precision]
    has_mins = mins is not None
    scale_spec = pl.BlockSpec((None, tk // group, tn),
                              lambda si, ni, ki, idx_ref: (idx_ref[si], ki, ni),
                              memory_space=pltpu.VMEM)
    # x as [S, 8, K] with rows 1-7 zero: the f32 sublane tile is 8, so a
    # 1-row block would be padded to 8 sublanes by Mosaic anyway; the zero
    # rows cost nothing — the kernel is bound by the packed-weight reads
    x_spec = pl.BlockSpec((None, 8, tk),
                          lambda si, ni, ki, idx_ref: (si, 0, ki),
                          memory_space=pltpu.VMEM)

    if fmt == "q4":
        kernel = functools.partial(_q4_kernel, group=group, tk=tk, prec=prec,
                                   has_mins=has_mins, k_axis=2)
        in_specs = [
            x_spec,
            pl.BlockSpec((None, tk // 2, tn),
                         lambda si, ni, ki, idx_ref: (idx_ref[si], ki, ni),
                         memory_space=pltpu.VMEM),
            scale_spec,
        ]
        inputs = [jnp.pad(_arrange_x_q4(x, group, tk)[:, None, :],
                          ((0, 0), (0, 7), (0, 0))), packed, scales]
    else:
        kernel = functools.partial(_q8_kernel, group=group, tk=tk, prec=prec,
                                   has_mins=has_mins, k_axis=2)
        in_specs = [
            x_spec,
            pl.BlockSpec((None, tk, tn),
                         lambda si, ni, ki, idx_ref: (idx_ref[si], ki, ni),
                         memory_space=pltpu.VMEM),
            scale_spec,
        ]
        inputs = [jnp.pad(x[:, None, :], ((0, 0), (0, 7), (0, 0))),
                  packed, scales]
    if has_mins:
        in_specs.append(scale_spec)
        inputs.append(mins)
        # transposed per-slot group sums [S, K/g, 8] (rows 1-7 of the padded
        # x are zero, so only column 0 of xg is nonzero — the min dot's
        # extra columns cost nothing)
        in_specs.append(pl.BlockSpec((None, tk // group, 8),
                                     lambda si, ni, ki, idx_ref: (si, ki, 0),
                                     memory_space=pltpu.VMEM))
        xg = x.reshape(s_slots, k // group, group).sum(-1)  # [S, K/g]
        inputs.append(jnp.pad(xg[:, :, None], ((0, 0), (0, 0), (0, 7)))
                      .astype(jnp.float32))
        kern = kernel

        def kernel(idx_ref, x_ref, p_ref, s_ref, m_ref, xg_ref, o_ref,
                   acc_ref):
            return kern(x_ref, p_ref, s_ref, m_ref, xg_ref, o_ref, acc_ref)
    else:
        kern = kernel

        def kernel(idx_ref, x_ref, p_ref, s_ref, o_ref, acc_ref):
            return kern(x_ref, p_ref, s_ref, None, None, o_ref, acc_ref)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (None, 8, tn), lambda si, ni, ki, idx_ref: (si, 0, ni),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((s_slots, 8, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            # all-"arbitrary": measured 50s vs 238s Mosaic compile for the
            # ("parallel","parallel","arbitrary") marking on this chip —
            # the parallel hints buy nothing for this expert-major grid
            # and balloon compile time ~5x
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32), *inputs)
    return out[:, 0, :]


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "group", "k", "n", "tk", "tn", "c_rows",
                     "interpret", "precision", "out_dtype"),
)
def _moe_qmatmul_grouped_call(xs, eg, packed, scales, mins, *, fmt, group,
                              k, n, tk, tn, c_rows, interpret,
                              precision=None, out_dtype=jnp.float32):
    """Grouped (megablocks-style) MoE matmul: xs [G, C, K] holds the slot
    input rows SORTED by expert and padded into G blocks of C rows, every
    block single-expert; eg [G] int32 is each block's expert id (scalar
    prefetch). packed/scales/mins are the full compressed stacks [E, ...].
    Returns [G, C, N].

    Grid (G, N-tiles, K-tiles): each block DMAs its expert's quantized
    tiles straight from the stack (indexed via the prefetched eg) and
    runs the same fused dequant-dot as the dense kernel on C rows at
    once. Weight traffic is ceil(S/C)+E expert-sweeps instead of the
    slot-major kernel's S sweeps — the difference between 114 GB and
    0.7 GB of HBM reads per Mixtral layer at a 4096-slot prefill chunk.
    Dummy padding blocks (expert-imbalance headroom) read expert 0's
    tiles and compute garbage rows that the caller's inverse map never
    touches."""
    g_blocks = xs.shape[0]
    grid = (g_blocks, n // tn, k // tk)
    prec = _PREC[precision]
    has_mins = mins is not None
    x2 = xs.reshape(g_blocks * c_rows, k)
    scale_spec = pl.BlockSpec((None, tk // group, tn),
                              lambda gi, ni, ki, eg_ref: (eg_ref[gi], ki, ni),
                              memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((None, c_rows, tk),
                          lambda gi, ni, ki, eg_ref: (gi, 0, ki),
                          memory_space=pltpu.VMEM)
    if fmt == "q4":
        kernel = functools.partial(_q4_kernel, group=group, tk=tk, prec=prec,
                                   has_mins=has_mins, k_axis=2)
        w_spec = pl.BlockSpec((None, tk // 2, tn),
                              lambda gi, ni, ki, eg_ref: (eg_ref[gi], ki, ni),
                              memory_space=pltpu.VMEM)
        xin = _arrange_x_q4(x2, group, tk)
    else:
        kernel = functools.partial(_q8_kernel, group=group, tk=tk, prec=prec,
                                   has_mins=has_mins, k_axis=2)
        w_spec = pl.BlockSpec((None, tk, tn),
                              lambda gi, ni, ki, eg_ref: (eg_ref[gi], ki, ni),
                              memory_space=pltpu.VMEM)
        xin = x2
    in_specs = [x_spec, w_spec, scale_spec]
    inputs = [xin.reshape(g_blocks, c_rows, k), packed, scales]
    if has_mins:
        in_specs.append(scale_spec)
        inputs.append(mins)
        # transposed per-row group sums [G, K/g, C] (lanes = C)
        in_specs.append(pl.BlockSpec((None, tk // group, c_rows),
                                     lambda gi, ni, ki, eg_ref: (gi, ki, 0),
                                     memory_space=pltpu.VMEM))
        xg = xs.reshape(g_blocks, c_rows, k // group, group).sum(-1)
        inputs.append(xg.transpose(0, 2, 1).astype(jnp.float32))
        kern = kernel

        def kernel(eg_ref, x_ref, p_ref, s_ref, m_ref, xg_ref, o_ref,
                   acc_ref):
            return kern(x_ref, p_ref, s_ref, m_ref, xg_ref, o_ref, acc_ref)
    else:
        kern = kernel

        def kernel(eg_ref, x_ref, p_ref, s_ref, o_ref, acc_ref):
            return kern(x_ref, p_ref, s_ref, None, None, o_ref, acc_ref)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (None, c_rows, tn),
                lambda gi, ni, ki, eg_ref: (gi, 0, ni),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((c_rows, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((g_blocks, c_rows, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(eg, jnp.int32), *inputs)


def _moe_group_plan(idx: jnp.ndarray, e_num: int, c_rows: int,
                    g_blocks: int):
    """Static-shape dispatch plan for the grouped MoE kernel: sort slots
    by expert, cut each expert's run into C-row blocks (last block of each
    expert padded), and build the inverse map. EXACT routing — no token
    dropping; imbalance is absorbed by the E extra padding blocks in
    ``g_blocks`` (the static worst case sum(ceil(c_e/C)) <= ceil(S/C)+E).
    Returns (eg [G], rows [G, C] slot ids with S as the padding sentinel,
    flat [S] inverse index into the [G*C, N] kernel output)."""
    s = idx.shape[0]
    idx = idx.astype(jnp.int32)
    order = jnp.argsort(idx, stable=True)                       # [S]
    counts = jnp.bincount(idx, length=e_num)                    # [E]
    starts = jnp.cumsum(counts) - counts                        # excl [E]
    nb = -(-counts // c_rows)                                   # ceil [E]
    bend = jnp.cumsum(nb)                                       # [E]
    bstart = bend - nb
    gids = jnp.arange(g_blocks)
    # owner of block g: first e with bend[e] > g; dummy blocks -> expert 0
    eg = jnp.searchsorted(bend, gids, side="right").astype(jnp.int32)
    live = eg < e_num
    eg = jnp.where(live, eg, 0)
    bi = gids - bstart[eg]                                       # [G]
    pos = starts[eg][:, None] + bi[:, None] * c_rows \
        + jnp.arange(c_rows)[None, :]                            # [G, C]
    valid = live[:, None] & (pos < (starts[eg] + counts[eg])[:, None])
    rows = jnp.where(valid, order[jnp.clip(pos, 0, s - 1)], s)
    # inverse: slot -> (block, row-in-block) flattened
    rank = jnp.zeros((s,), jnp.int32).at[order].set(
        jnp.arange(s, dtype=jnp.int32))                          # [S]
    off = rank - starts[idx]
    flat = (bstart[idx] + off // c_rows) * c_rows + off % c_rows
    return eg, rows, flat


# slot-major kernel below this many slots; grouped above. The crossover is
# where ceil(S/C)+E expert-weight sweeps beat S sweeps — with the E-block
# padding and the activation sort/gather overhead, decode-sized S stays
# slot-major and prefill/mixed steps go grouped.
MOE_GROUPED_MIN_SLOTS = 32
MOE_GROUP_ROWS = 256  # C: rows per single-expert block


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "group", "k", "n", "tk", "tn", "c_rows", "act",
                     "interpret", "precision", "out_dtype"),
)
def _moe_glu_grouped_call(xs, eg, pg, sg, mg, pu, su, mu, *, fmt, group,
                          k, n, tk, tn, c_rows, act, interpret,
                          precision=None, out_dtype=jnp.float32):
    """Grouped MoE gate/up + gated-activation epilogue: one kernel reads
    BOTH expert stacks' tiles (indexed via the prefetched eg) and writes
    act(gate) * up — the [G, C, 2F] intermediate never leaves VMEM, and
    the [G, C, K] sorted-activation gather is paid once instead of twice.
    Same grid/plan contract as _moe_qmatmul_grouped_call."""
    g_blocks = xs.shape[0]
    grid = (g_blocks, n // tn, k // tk)
    prec = _PREC[precision]
    has_mins = mg is not None
    x2 = xs.reshape(g_blocks * c_rows, k)

    def wspec(rows):
        return pl.BlockSpec((None, rows, tn),
                            lambda gi, ni, ki, eg_ref: (eg_ref[gi], ki, ni),
                            memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((None, c_rows, tk),
                          lambda gi, ni, ki, eg_ref: (gi, 0, ki),
                          memory_space=pltpu.VMEM)
    if fmt == "q4":
        xin = _arrange_x_q4(x2, group, tk)
        wrows = tk // 2
    else:
        xin = x2
        wrows = tk
    in_specs = [x_spec, wspec(wrows), wspec(wrows),
                wspec(tk // group), wspec(tk // group)]
    inputs = [xin.reshape(g_blocks, c_rows, k), pg, pu, sg, su]

    kernel = functools.partial(_glu_kernel, fmt=fmt, group=group, tk=tk,
                               prec=prec, has_mins=has_mins, act=act)
    if has_mins:
        in_specs += [wspec(tk // group),
                     wspec(tk // group),
                     pl.BlockSpec((None, tk // group, c_rows),
                                  lambda gi, ni, ki, eg_ref: (gi, ki, 0),
                                  memory_space=pltpu.VMEM)]
        xg = xs.reshape(g_blocks, c_rows, k // group, group).sum(-1)
        inputs += [mg, mu, xg.transpose(0, 2, 1).astype(jnp.float32)]

        def _wrap(kern):
            def inner(eg_ref, x_ref, pgr, pur, sgr, sur, mgr, mur, xg_ref,
                      o_ref, ag, au):
                return kern(x_ref, pgr, pur, sgr, sur, (mgr, mur), xg_ref,
                            o_ref, ag, au)
            return inner
    else:
        def _wrap(kern):
            def inner(eg_ref, x_ref, pgr, pur, sgr, sur, o_ref, ag, au):
                return kern(x_ref, pgr, pur, sgr, sur, None, None, o_ref,
                            ag, au)
            return inner
    kernel = _wrap(kernel)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (None, c_rows, tn),
                lambda gi, ni, ki, eg_ref: (gi, 0, ni),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((c_rows, tn), jnp.float32),
                            pltpu.VMEM((c_rows, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((g_blocks, c_rows, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(eg, jnp.int32), *inputs)


def moe_qmatmul_glu(x_rows: jnp.ndarray, gate_stack, up_stack,
                    idx_flat: jnp.ndarray, act: str,
                    interpret: bool = False,
                    precision: str | None = None) -> jnp.ndarray | None:
    """act(x @ W_gate[e]) * (x @ W_up[e]) for routed expert slots, fused in
    one grouped kernel (prefill/mixed-scale S only — decode-sized S keeps
    the two slot-major calls, where the intermediate is negligible).
    Returns None when the fusion doesn't apply; caller falls back to the
    separate gate/up dispatches."""
    interpret = interpret or _INTERPRET
    s_slots, k = x_rows.shape
    g_st, u_st = gate_stack, up_stack
    if act not in GLU_ACTS:
        return None
    if (g_st.fmt != u_st.fmt or g_st.group != u_st.group
            or g_st.k != k or u_st.k != k or g_st.n != u_st.n
            or g_st.packed.shape[0] != u_st.packed.shape[0]
            or (g_st.mins is None) != (u_st.mins is None)):
        return None
    n = g_st.n
    e_num = g_st.packed.shape[0]
    c_rows = min(MOE_GROUP_ROWS, max(8, 1 << (s_slots - 1).bit_length()))
    g_blocks = -(-s_slots // c_rows) + e_num
    if not (s_slots >= MOE_GROUPED_MIN_SLOTS and g_blocks < s_slots):
        return None
    tk, tn, rb = _pick_tiles(g_st.fmt, g_st.group, k, n, b=c_rows,
                             deq_scale=2)
    if not (tk and rb == c_rows and n % tn == 0 and n % 128 == 0):
        return None
    eg, rows, flat = _moe_group_plan(idx_flat, e_num, c_rows, g_blocks)
    xz = jnp.concatenate([x_rows, jnp.zeros((1, k), x_rows.dtype)], axis=0)
    xs = xz[rows]
    out = _moe_glu_grouped_call(
        xs, eg, g_st.packed, g_st.scales, g_st.mins,
        u_st.packed, u_st.scales, u_st.mins,
        fmt=g_st.fmt, group=g_st.group, k=k, n=n, tk=tk, tn=tn,
        c_rows=c_rows, act=act, interpret=interpret, precision=precision,
        out_dtype=_out_dtype(precision))
    return out.reshape(g_blocks * c_rows, n)[flat]


def moe_qmatmul(x_rows: jnp.ndarray, stack, idx_flat: jnp.ndarray,
                interpret: bool = False,
                precision: str | None = None) -> jnp.ndarray | None:
    """Fused MoE dispatch: per-slot input rows [S, K] times the SELECTED
    experts' quantized weights -> [S, N]; only routed experts' packed
    bytes leave HBM via in-kernel indexed DMA (scalar prefetch — no
    gathered weight copies; the old jnp.take pre-gather allocated
    slots x expert-bytes of temps and OOM'd 8-layer Mixtral prefill at
    19 GB). Decode-sized S runs the slot-major kernel; larger S sorts
    slots by expert and runs C-row single-expert blocks so each routed
    expert's weights stream from HBM ~once instead of once per slot.
    Returns None when the shapes don't tile (caller falls back to
    QuantExpertStack.gather_dequant + einsum)."""
    interpret = interpret or _INTERPRET
    s_slots, k = x_rows.shape
    assert k == stack.k, (k, stack.k)
    n = stack.n
    e_num = stack.packed.shape[0]
    c_rows = min(MOE_GROUP_ROWS, max(8, 1 << (s_slots - 1).bit_length()))
    g_blocks = -(-s_slots // c_rows) + e_num
    # grouped only when its weight traffic (ceil(S/C)+E expert sweeps,
    # dummy blocks included) actually undercuts the slot-major kernel's S
    # sweeps — high-expert-count stacks (deepseek-v3 E=256, qwen3moe
    # E=128) at decode-sized S would otherwise pay E padding sweeps for
    # nothing
    if s_slots >= MOE_GROUPED_MIN_SLOTS and g_blocks < s_slots:
        tk, tn, rb = _pick_tiles(stack.fmt, stack.group, k, n, b=c_rows)
        if tk and rb == c_rows and n % tn == 0 and n % 128 == 0:
            eg, rows, flat = _moe_group_plan(idx_flat, e_num, c_rows,
                                             g_blocks)
            xz = jnp.concatenate(
                [x_rows, jnp.zeros((1, k), x_rows.dtype)], axis=0)
            xs = xz[rows]                                   # [G, C, K]
            out = _moe_qmatmul_grouped_call(
                xs, eg, stack.packed, stack.scales, stack.mins,
                fmt=stack.fmt, group=stack.group, k=k, n=n, tk=tk, tn=tn,
                c_rows=c_rows, interpret=interpret, precision=precision,
                out_dtype=_out_dtype(precision))
            return out.reshape(g_blocks * c_rows, n)[flat]
    tk, tn, _ = _pick_tiles(stack.fmt, stack.group, k, n)
    if tk == 0 or n % tn != 0 or n % 128 != 0:
        return None
    return _moe_qmatmul_call(
        x_rows, idx_flat, stack.packed, stack.scales, stack.mins,
        fmt=stack.fmt, group=stack.group,
        k=k, n=n, tk=tk, tn=tn, interpret=interpret, precision=precision,
        out_dtype=_out_dtype(precision))
