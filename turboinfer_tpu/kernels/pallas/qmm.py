"""Fused group-wise dequant × matmul Pallas TPU kernel.

The TPU-native replacement for the reference's dequantize-then-matmul
consumption path (reference: src/core/tensor_engine.cpp:497-505 converts
quantized weights to fp32 BEFORE the GEMM — quantized weights never stay
compressed through the hot loop). Here int8 / packed-int4 weights stream
from HBM at their compressed width and are unpacked + scaled in VMEM
inside the MXU pipeline, so decode stays weight-bandwidth-bound at the
compressed byte count (SURVEY.md §7 hard part #1).

Design notes:
  - Grid (M/TM, N/TN, K/TK), K innermost, f32 accumulator in VMEM
    scratch written out on the last K step. TK always covers whole
    scale groups.
  - int4 uses the planar-within-group packing from core/qtensor
    (first g/2 rows of each group in low nibbles): dequant becomes two
    contiguous half-tiles and the matmul two half-dots — no sublane
    interleave shuffles, which dominated a naive even/odd unpack.
  - MXU runs bf16×bf16→f32 (native); dequantized weights are rounded
    to bf16, which is exact for int4 and ~8-mantissa-bit for int8
    (the reference rounds weights to fp32 from int the same way).
  - Nibble/int math stays in int32 — Mosaic has no int8 vector sub and
    no uint8→f32 cast.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turboinfer_tpu.core.qtensor import QTensor


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel_int8(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk: int,
                 group_size: int, out_dtype):
    """x_ref: [TM, TK]; q_ref: [TK, TN] int8; s_ref: [TK//g, TN] scales;
    o_ref: [TM, TN] out; acc_ref: [TM, TN] f32 scratch."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)                   # [TM, TK]
    q = q_ref[:]                                        # [TK, TN] int8
    s = s_ref[0].astype(jnp.float32)                    # [1, G, TN] -> [G, TN]
    TK, TN = q.shape
    G = TK // group_size
    w = q.astype(jnp.int32).astype(jnp.float32).reshape(G, group_size, TN)
    w = (w * s[:, None, :]).reshape(TK, TN).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel_int4(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, nk: int,
                 group_size: int, out_dtype):
    """int4 planar-within-group variant.

    q_ref: [TK//2, TN] uint8 — byte row (gi, p) holds logical rows
    (gi, p) in the low nibble and (gi, p + g/2) in the high nibble.
    The contraction runs as two half-dots whose K order is
    (group, offset-in-half) on both sides; xlo/xhi are the activation
    columns pre-gathered into that order outside the kernel (Mosaic
    cannot split the lane dim in-kernel).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x_lo = xlo_ref[:].astype(jnp.bfloat16)              # [TM, TK//2]
    x_hi = xhi_ref[:].astype(jnp.bfloat16)
    qp = q_ref[:]                                       # [TK//2, TN] u8
    s = s_ref[0].astype(jnp.float32)                    # [1, G, TN] -> [G, TN]
    TK2, TN = qp.shape
    G = 2 * TK2 // group_size
    g2 = group_size // 2

    w_lo, w_hi = _dequant_int4_halves(qp, s, G, g2, TN)

    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _dequant_int4_halves(qp, s, G, g2, TN):
    """Unpack + scale both nibble planes of a [TK/2, TN] uint8 block.

    Value math stays in f32: an all-bf16 variant (i32→bf16 casts +
    bf16 broadcast-multiply) measured ~30% SLOWER end-to-end — Mosaic
    lowers those through f32 with extra relayouts.
    """
    qi = qp.astype(jnp.int32)
    lo = ((qi & 0x0F) - 8).astype(jnp.float32).reshape(G, g2, TN)
    hi = ((qi >> 4) - 8).astype(jnp.float32).reshape(G, g2, TN)
    TK2 = G * g2
    w_lo = (lo * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)
    w_hi = (hi * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)
    return w_lo, w_hi


def _fact_eligible(bits: int, group_size: int) -> bool:
    """The factored-scale int4 variant needs each half-group to span
    whole 128-lane slices of the pre-gathered activations (Mosaic only
    slices the lane dim at 128 alignment)."""
    import os
    if os.environ.get("TURBOINFER_QMM_NO_FACT") == "1":
        return False
    return bits == 4 and group_size >= 256 and (group_size // 2) % 128 == 0


def _int4_fact_body(x_lo, x_hi, qp, s, acc_ref, *, group_size: int):
    """Factored-scale int4 accumulation (one K tile).

    The baseline kernel dequantizes every weight on the VPU (unpack,
    subtract 8, scale-multiply, two dtype casts ≈ 5.5 vector passes per
    weight) — at 7B decode shapes that outruns the DMA and makes the
    pipeline compute-bound. Here the group scale is factored OUT of the
    contraction:

        acc[m,n] += sum_g s[g,n] * ( sum_{k in g} x[m,k]*u[k,n]
                                     - 8 * sum_{k in g} x[m,k] )

    so the MXU dots run on raw unpacked nibbles u in [0,16) (exact in
    bf16) and the VPU only touches per-weight data for unpack + cast
    (~3.5 passes); the scale/zero-point algebra runs on the [TM, TN]
    per-group partial, which is group_size× smaller. Each group is one
    full-depth pair of [TM, g/2] @ [g/2, TN] dots (g/2 = 128k lanes).

    x_lo/x_hi: [TM, TK//2] bf16 pre-gathered halves; qp: [TK//2, TN]
    uint8; s: [G, TN] f32; acc_ref: [TM, TN] f32.
    """
    TK2, TN = qp.shape
    g2 = group_size // 2
    G = TK2 // g2
    acc = acc_ref[:]
    for gi in range(G):
        lo_sl = slice(gi * g2, (gi + 1) * g2)
        qg = qp[lo_sl].astype(jnp.int32)
        u_lo = (qg & 0x0F).astype(jnp.bfloat16)
        u_hi = (qg >> 4).astype(jnp.bfloat16)
        xl = x_lo[:, lo_sl]
        xh = x_hi[:, lo_sl]
        p = (jnp.dot(xl, u_lo, preferred_element_type=jnp.float32)
             + jnp.dot(xh, u_hi, preferred_element_type=jnp.float32))
        rsum = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True) \
            + jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (p - 8.0 * rsum) * s[gi][None, :]
    acc_ref[:] = acc


def _kernel_int4_fact(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *,
                      nk: int, group_size: int, out_dtype):
    """Factored-scale int4 (see _int4_fact_body); same interface as
    _kernel_int4."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _int4_fact_body(xlo_ref[:].astype(jnp.bfloat16),
                    xhi_ref[:].astype(jnp.bfloat16),
                    q_ref[:], s_ref[0].astype(jnp.float32), acc_ref,
                    group_size=group_size)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel_int4_fact_idx(idx_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref,
                          acc_ref, *, nk: int, group_size: int, out_dtype):
    """Stacked-layer factored-scale int4 (see _int4_fact_body)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _int4_fact_body(xlo_ref[:].astype(jnp.bfloat16),
                    xhi_ref[:].astype(jnp.bfloat16),
                    q_ref[0], s_ref[0, 0].astype(jnp.float32), acc_ref,
                    group_size=group_size)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _a8_enabled() -> bool:
    """W4A8 prefill path (int8 activations x raw int4 nibbles on the
    MXU at 2x bf16 peak) — opt-in while accuracy is user-judged."""
    import os
    return os.environ.get("TURBOINFER_QMM_A8", "0") == "1"


def _int4_a8_body(x_lo, x_hi, qp, s, sx, acc_ref, *, group_size: int):
    """W4A8 factored accumulation (one K tile).

    Same factored-scale algebra as _int4_fact_body, but the activations
    arrive PRE-QUANTIZED to int8 (per-row absmax/127, done by the
    caller) so the per-group dots run int8 x int8 -> int32 on the MXU —
    2x the bf16 MXU peak on v5e. The raw nibbles u stay in [0, 16) (the
    -8 shift is factored into the row-sum term: Mosaic has no int8
    vector subtract), partials fit int32 comfortably
    (127 * 15 * K < 2^31 for any real K tile), and the two scales are
    applied on the [TM, TN] group partial:

        acc[m,n] += s[g,n] * ( p[m,n] - 8 * rsum[m] )
        out[m,n]  = sx[m] * acc[m,n]          (sx applied by the caller)

    x_lo/x_hi: [TM, TK//2] int8 pre-gathered halves; qp: [TK//2, TN]
    uint8; s: [G, TN] f32; sx: unused here (kept out of the kernel —
    the caller multiplies the output rows); acc_ref: [TM, TN] f32.
    """
    del sx
    TK2, TN = qp.shape
    g2 = group_size // 2
    G = TK2 // g2
    acc = acc_ref[:]
    for gi in range(G):
        lo_sl = slice(gi * g2, (gi + 1) * g2)
        qg = qp[lo_sl].astype(jnp.int32)
        u_lo = (qg & 0x0F).astype(jnp.int8)
        u_hi = (qg >> 4).astype(jnp.int8)
        xl = x_lo[:, lo_sl]
        xh = x_hi[:, lo_sl]
        p = (jax.lax.dot_general(xl, u_lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
             + jax.lax.dot_general(xh, u_hi, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32))
        rsum = jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True) \
            + jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True)
        acc = acc + (p - 8 * rsum).astype(jnp.float32) * s[gi][None, :]
    acc_ref[:] = acc


def _kernel_int4_a8(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *,
                    nk: int, group_size: int, out_dtype):
    """W4A8 2-D kernel (see _int4_a8_body)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _int4_a8_body(xlo_ref[:], xhi_ref[:], q_ref[:],
                  s_ref[0].astype(jnp.float32), None, acc_ref,
                  group_size=group_size)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel_int4_a8_idx(idx_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref,
                        acc_ref, *, nk: int, group_size: int, out_dtype):
    """Stacked-layer W4A8 kernel (see _int4_a8_body)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _int4_a8_body(xlo_ref[:], xhi_ref[:], q_ref[0],
                  s_ref[0, 0].astype(jnp.float32), None, acc_ref,
                  group_size=group_size)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _a8_quantize_rows(x2):
    """Per-row symmetric int8 activation quantization: returns
    (xq int8 [M, K], sx f32 [M])."""
    xf = x2.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx[:, None]), -127, 127).astype(jnp.int8)
    return xq, sx


def _pick_tile(dim: int, candidates) -> Optional[int]:
    for t in candidates:
        if dim % t == 0:
            return t
    return None


def _pick_tiles(M, K, N, bits, group_size):
    """Tile selection shared by the 2-D and stacked paths.

    Default: FULL-width N tiles — each weight block is TK/kd contiguous
    rows, so DMA runs at full burst width (measured +13% decode tok/s
    over 256-wide tiles on 7B shapes); narrow tiles only when N is too
    wide for VMEM. TK covers whole scale groups, capped so the streamed
    weight block stays ~2 MB (double-buffered; v5e has ~16 MB usable).
    """
    import os
    tn_pref = os.environ.get("TURBOINFER_QMM_TN", "")
    tk_pref = os.environ.get("TURBOINFER_QMM_TK", "")
    if tn_pref.isdigit() and N % int(tn_pref) == 0:
        TN = int(tn_pref)
    elif N <= 16384 and tn_pref != "narrow":
        TN = N
    else:
        TN = _pick_tile(N, (512, 384, 256, 128))
    TK = None
    if tk_pref.isdigit() and K % int(tk_pref) == 0 \
            and int(tk_pref) % group_size == 0:
        TK = int(tk_pref)
    else:
        for mult in (2048, 1024, 512, 256, 128, 64, 32):
            if mult % group_size == 0 and K % mult == 0 \
                    and mult >= group_size:
                TK = mult
                break
    if TK is None and K % group_size == 0:
        TK = group_size
    if TN is None or TK is None:
        return None
    kd = 1 if bits == 8 else 2
    if (TK // kd) % 128 and TK != K:
        # Mosaic lane alignment: the x (half-)block's last dim must be a
        # multiple of 128 OR span the whole array axis. K values with no
        # 128*kd-aligned divisor (DeepSeek's 10944 / 1408 FFN widths)
        # fall back to whole-K tiles — block dim == array dim is always
        # legal — and the VMEM budget narrows TN instead of TK below.
        TK = K
    fixed_tk = (TK // kd) % 128 != 0      # can't halve without misaligning
    while not fixed_tk \
            and TK > max(group_size, min(128 * kd, K)) \
            and (TK // kd) * TN > 2_097_152:
        TK //= 2
    if fixed_tk:
        while TN > 128 and (TK // kd) * TN > 2_097_152:
            nxt = _pick_tile(N, tuple(t for t in (2048, 1024, 768, 512,
                                                  384, 256, 128) if t < TN))
            if nxt is None:
                break
            TN = nxt
        if (TK // kd) * TN > 2_097_152:
            # TN has no small-enough divisor (or TN=128 still blows the
            # budget with a whole-K block): an oversized tile would fail
            # Mosaic compilation outright — fall back to the jnp path.
            return None
    if TK % group_size or (bits == 4 and (TK % 2 or group_size % 2)):
        return None
    TM = min(_round_up(M, 8), 256)
    # x half-blocks have lane dim TK/kd: keep it >= 128 (Mosaic lane
    # constraint) unless it already spans the full K axis.
    tk_floor = min(128 * kd, K)
    if M > 8:
        # Prefill-sized M. The grid re-streams (and re-dequantizes) the
        # whole weight matrix once per M tile, so weight traffic is
        # (M/TM)x — maximize TM (up to one pass over the weights) and
        # NARROW TN to fit VMEM, the opposite of the decode-tuned
        # full-width-N choice (measured: S=512 7B-int4 prefill 124 ->
        # 75 ms). TK shrinks first so the streamed block stays modest.
        while not fixed_tk and TK > max(group_size, tk_floor) \
                and (TK // kd) * 512 > 262144:
            TK //= 2
        if TK % group_size:
            return None
        tm_pref = os.environ.get("TURBOINFER_QMM_PREFILL_TM", "512")
        TM = min(_round_up(M, 8), int(tm_pref))
        # 8 MB measured best at 7B S=512 (61.6 -> 60.0 ms, 115 TFLOP/s);
        # 10 MB fails Mosaic VMEM allocation.
        cap = int(os.environ.get("TURBOINFER_QMM_PREFILL_BUDGET",
                                 str(8 * 1024 * 1024)))

        def budget(tn):
            # double-buffered weight block + x halves + f32 acc + out
            return ((TK // kd) * tn * 2 + TM * TK * 2
                    + TM * tn * (4 + 2))
        for tn in (2048, 1024, 768, 512, 384, 256, 128):
            if N % tn == 0 and budget(tn) <= cap:
                TN = tn
                break
        else:
            TN = _pick_tile(N, (512, 384, 256, 128))
            if TN is None:
                return None
        while TM > 8 and budget(TN) > cap:
            TM = max(8, TM // 2)
        return TM, TN, TK

    def vmem_budget(tm):
        # weight block (double-buffered) + x blocks + f32 acc + out.
        w = (TK // kd) * TN * 2
        x = tm * TK * 2 * 2
        out = tm * TN * (4 + 4 + 2)
        return w + x + out

    while TM > 8 and vmem_budget(TM) > 5 * 1024 * 1024:
        TM = max(8, TM // 2)
    return TM, TN, TK


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "K", "N",
                                             "out_dtype", "interpret", "a8"))
def _qmm_2d(x2, data, scales, *, bits: int, group_size: int, K: int, N: int,
            out_dtype, interpret: bool = False, a8: bool = False):
    """x2: [M, K] -> [M, N]. data/scales as stored in the QTensor."""
    M = x2.shape[0]
    tiles = _pick_tiles(M, K, N, bits, group_size)
    if tiles is None:
        return None
    TM, TN, TK = tiles
    pad_m = _round_up(M, TM) - M
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    nk = K // TK

    a8 = a8 and bits == 4 and M > 8 and _fact_eligible(bits, group_size)
    if bits == 8:
        kern = _kernel_int8
    elif a8:
        kern = _kernel_int4_a8
    elif _fact_eligible(bits, group_size):
        kern = _kernel_int4_fact
    else:
        kern = _kernel_int4
    kern = functools.partial(kern, nk=nk, group_size=group_size,
                             out_dtype=out_dtype)
    common = dict(
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=(Mp * K * x2.dtype.itemsize + K * N * bits // 8
                            + (K // group_size) * N * 4 + Mp * N * 2),
            transcendentals=0),
        interpret=interpret,
    )
    w_spec = pl.BlockSpec((TK // (1 if bits == 8 else 2), TN),
                          lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
    # Scales reshaped to [nk, TK/g, N] so the block covers the whole
    # (possibly <8-sublane) group axis — Mosaic requires the last two
    # block dims be (8k, 128k) or equal to the array dims.
    gk = TK // group_size
    scales3 = scales.reshape(nk, gk, N)
    s_spec = pl.BlockSpec((1, gk, TN), lambda i, j, k: (k, 0, j),
                          memory_space=pltpu.VMEM)

    if bits == 8:
        out = pl.pallas_call(
            kern,
            grid=(Mp // TM, N // TN, nk),
            in_specs=[
                pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                w_spec, s_spec,
            ],
            **common,
        )(x2, data, scales3)
    else:
        # Pre-gather activation columns into (group, offset-in-half)
        # order so each K block pairs with contiguous w_lo / w_hi rows.
        sx = None
        if a8:
            x2, sx = _a8_quantize_rows(x2)
        g2 = group_size // 2
        xg = x2.reshape(Mp, K // group_size, group_size)
        x_lo = xg[:, :, :g2].reshape(Mp, K // 2)
        x_hi = xg[:, :, g2:].reshape(Mp, K // 2)
        half_spec = pl.BlockSpec((TM, TK // 2), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern,
            grid=(Mp // TM, N // TN, nk),
            in_specs=[half_spec, half_spec, w_spec, s_spec],
            **common,
        )(x_lo, x_hi, data, scales3)
        if sx is not None:
            out = (out.astype(jnp.float32) * sx[:, None]).astype(out_dtype)
    return out[:M] if pad_m else out


def _kernel_int8_idx(idx_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                     nk: int, group_size: int, out_dtype):
    """Stacked-layer int8: q_ref [1, TK, TN] indexed by the prefetched
    layer id in the BlockSpec; body identical to _kernel_int8."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    q = q_ref[0]
    s = s_ref[0, 0].astype(jnp.float32)
    TK, TN = q.shape
    G = TK // group_size
    w = q.astype(jnp.int32).astype(jnp.float32).reshape(G, group_size, TN)
    w = (w * s[:, None, :]).reshape(TK, TN).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel_int4_idx(idx_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref,
                     *, nk: int, group_size: int, out_dtype):
    """Stacked-layer int4 planar variant (see _kernel_int4)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x_lo = xlo_ref[:].astype(jnp.bfloat16)
    x_hi = xhi_ref[:].astype(jnp.bfloat16)
    qp = q_ref[0]
    s = s_ref[0, 0].astype(jnp.float32)
    TK2, TN = qp.shape
    G = 2 * TK2 // group_size
    g2 = group_size // 2

    w_lo, w_hi = _dequant_int4_halves(qp, s, G, g2, TN)

    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "K", "N",
                                             "out_dtype", "interpret",
                                             "a8"))
def _qmm_stacked(x2, data3, scales3, layer_idx, *, bits: int,
                 group_size: int, K: int, N: int, out_dtype,
                 interpret: bool = False, a8: bool = False):
    """x2: [M, K] @ layer `layer_idx` of data3 [L, K/kd, N] -> [M, N].

    The layer id rides scalar prefetch and lands in the BlockSpec index
    maps, so the kernel streams directly from the stacked HBM weight
    array — no per-layer slice materialization (XLA copy-insertion would
    otherwise duplicate ~100 MB of weights per layer per decode step
    when a lax.scan slices the stack).
    """
    M = x2.shape[0]
    tiles = _pick_tiles(M, K, N, bits, group_size)
    if tiles is None:
        return None
    TM, TN, TK = tiles
    pad_m = _round_up(M, TM) - M
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    nk = K // TK
    L = data3.shape[0]
    gk = TK // group_size
    if scales3.ndim == 4 and scales3.shape[1] == nk \
            and scales3.shape[2] == gk:
        scales4 = scales3          # pre-tiled [L, nk, gk, N] (prepare_scales)
    else:
        # Different tiling than prepared (e.g. prefill picked a smaller
        # TK): re-tile. Costs one scales copy per call — fine for
        # prefill (once per request), avoided on the decode path.
        scales4 = scales3.reshape(L, nk, gk, N)

    a8 = a8 and bits == 4 and M > 8 and _fact_eligible(bits, group_size)
    if bits == 8:
        kern = _kernel_int8_idx
    elif a8:
        kern = _kernel_int4_a8_idx
    elif _fact_eligible(bits, group_size):
        kern = _kernel_int4_fact_idx
    else:
        kern = _kernel_int4_idx
    kern = functools.partial(kern, nk=nk, group_size=group_size,
                             out_dtype=out_dtype)
    kd = 1 if bits == 8 else 2
    w_spec = pl.BlockSpec((1, TK // kd, TN),
                          lambda i, j, k, idx: (idx[0], k, j),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, gk, TN),
                          lambda i, j, k, idx: (idx[0], k, 0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TM, TN), lambda i, j, k, idx: (i, j),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * Mp * N * K,
        bytes_accessed=(Mp * K * x2.dtype.itemsize + K * N * bits // 8
                        + (K // group_size) * N * 2 + Mp * N * 2),
        transcendentals=0)
    idx_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    if bits == 8:
        x_spec = pl.BlockSpec((TM, TK), lambda i, j, k, idx: (i, k),
                              memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(Mp // TM, N // TN, nk),
            in_specs=[x_spec, w_spec, s_spec], out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)])
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=cost, interpret=interpret,
        )(idx_arr, x2, data3, scales4)
    else:
        sx = None
        if a8:
            x2, sx = _a8_quantize_rows(x2)
        g2 = group_size // 2
        xg = x2.reshape(Mp, K // group_size, group_size)
        x_lo = xg[:, :, :g2].reshape(Mp, K // 2)
        x_hi = xg[:, :, g2:].reshape(Mp, K // 2)
        half_spec = pl.BlockSpec((TM, TK // 2), lambda i, j, k, idx: (i, k),
                                 memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(Mp // TM, N // TN, nk),
            in_specs=[half_spec, half_spec, w_spec, s_spec],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)])
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=cost, interpret=interpret,
        )(idx_arr, x_lo, x_hi, data3, scales4)
        if sx is not None:
            out = (out.astype(jnp.float32) * sx[:, None]).astype(out_dtype)
    return out[:M] if pad_m else out


def qmatmul_pallas_stacked(x: jax.Array, qt: QTensor, layer_index,
                           preferred_dtype=jnp.float32,
                           interpret: bool = False) -> Optional[jax.Array]:
    """[..., K] @ dequant(qt.data[layer_index]) for a stacked [L, ...]
    QTensor, reading directly from the stacked HBM array."""
    if qt.zero_points is not None or qt.data.ndim != 3:
        return None
    K, N = qt.shape
    if qt.bits == 4 and qt.data.shape[1] * 2 != K:
        return None
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    out = _qmm_stacked(x.reshape(M, K), qt.data, qt.scales, layer_index,
                       bits=qt.bits, group_size=qt.group_size, K=K, N=N,
                       out_dtype=x.dtype, interpret=interpret,
                       a8=_a8_enabled())
    if out is None:
        return None
    return out.reshape(*lead, N)


def _kernel_int8_grp(idx_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                     nk: int, group_size: int, out_dtype):
    """Grouped stacked-layer int8: grid (G, M/TM, N/TN, nk); group g
    contracts x_ref[0] (that group's activations) against weight slot
    idx_ref[g]."""
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.bfloat16)
    q = q_ref[0]
    s = s_ref[0, 0].astype(jnp.float32)
    TK, TN = q.shape
    G = TK // group_size
    w = q.astype(jnp.int32).astype(jnp.float32).reshape(G, group_size, TN)
    w = (w * s[:, None, :]).reshape(TK, TN).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(out_dtype)


def _kernel_int4_grp(idx_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref,
                     acc_ref, *, nk: int, group_size: int, out_dtype):
    """Grouped stacked-layer int4 planar variant (see _kernel_int4)."""
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x_lo = xlo_ref[0].astype(jnp.bfloat16)
    x_hi = xhi_ref[0].astype(jnp.bfloat16)
    qp = q_ref[0]
    s = s_ref[0, 0].astype(jnp.float32)
    TK2, TN = qp.shape
    G = 2 * TK2 // group_size
    g2 = group_size // 2
    w_lo, w_hi = _dequant_int4_halves(qp, s, G, g2, TN)
    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(out_dtype)


def _kernel_int4_fact_grp(idx_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref,
                          acc_ref, *, nk: int, group_size: int, out_dtype):
    """Grouped factored-scale int4 (see _int4_fact_body)."""
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _int4_fact_body(xlo_ref[0].astype(jnp.bfloat16),
                    xhi_ref[0].astype(jnp.bfloat16),
                    q_ref[0], s_ref[0, 0].astype(jnp.float32), acc_ref,
                    group_size=group_size)

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "K", "N",
                                             "out_dtype", "interpret"))
def _qmm_grouped(xg, data3, scales3, slots, *, bits: int, group_size: int,
                 K: int, N: int, out_dtype, interpret: bool = False):
    """xg: [G, M, K]; out[g] = xg[g] @ dequant(data3[slots[g]]) -> [G, M, N].

    One pallas_call for all G data-dependent weight slots (MoE decode:
    the k routed experts) — slot ids ride scalar prefetch into the
    BlockSpec index maps exactly like the single-layer stacked path, but
    the grid grows a leading group axis, so k expert matmuls cost ONE
    kernel launch instead of k (launch overhead dominates B=1 MoE decode:
    18 qmm launches/layer at top-6)."""
    G, M = xg.shape[0], xg.shape[1]
    tiles = _pick_tiles(M, K, N, bits, group_size)
    if tiles is None:
        return None
    TM, TN, TK = tiles
    pad_m = _round_up(M, TM) - M
    if pad_m:
        xg = jnp.pad(xg, ((0, 0), (0, pad_m), (0, 0)))
    Mp = M + pad_m
    nk = K // TK
    gk = TK // group_size
    L = data3.shape[0]
    if scales3.ndim == 4 and scales3.shape[1] == nk \
            and scales3.shape[2] == gk:
        scales4 = scales3
    else:
        scales4 = scales3.reshape(L, nk, gk, N)

    if bits == 8:
        kern = _kernel_int8_grp
    elif _fact_eligible(bits, group_size):
        kern = _kernel_int4_fact_grp
    else:
        kern = _kernel_int4_grp
    kern = functools.partial(kern, nk=nk, group_size=group_size,
                             out_dtype=out_dtype)
    kd = 1 if bits == 8 else 2
    w_spec = pl.BlockSpec((1, TK // kd, TN),
                          lambda g, i, j, k, idx: (idx[g], k, j),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, gk, TN),
                          lambda g, i, j, k, idx: (idx[g], k, 0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, TM, TN), lambda g, i, j, k, idx: (g, i, j),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * G * Mp * N * K,
        bytes_accessed=G * (Mp * K * xg.dtype.itemsize + K * N * bits // 8
                            + (K // group_size) * N * 2 + Mp * N * 2),
        transcendentals=0)
    idx_arr = jnp.asarray(slots, jnp.int32).reshape(G)
    grid = (G, Mp // TM, N // TN, nk)
    semantics = ("arbitrary", "parallel", "parallel", "arbitrary")

    if bits == 8:
        x_spec = pl.BlockSpec((1, TM, TK), lambda g, i, j, k, idx: (g, i, k),
                              memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[x_spec, w_spec, s_spec], out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)])
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((G, Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics),
            cost_estimate=cost, interpret=interpret,
        )(idx_arr, xg, data3, scales4)
    else:
        g2 = group_size // 2
        xr = xg.reshape(G, Mp, K // group_size, group_size)
        x_lo = xr[:, :, :, :g2].reshape(G, Mp, K // 2)
        x_hi = xr[:, :, :, g2:].reshape(G, Mp, K // 2)
        half_spec = pl.BlockSpec((1, TM, TK // 2),
                                 lambda g, i, j, k, idx: (g, i, k),
                                 memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[half_spec, half_spec, w_spec, s_spec],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)])
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((G, Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics),
            cost_estimate=cost, interpret=interpret,
        )(idx_arr, x_lo, x_hi, data3, scales4)
    return out[:, :M] if pad_m else out


def qmatmul_pallas_grouped(x: jax.Array, qt: QTensor, slots: jax.Array,
                           interpret: bool = False) -> Optional[jax.Array]:
    """x: [G, ..., K] per-group activations; slots: [G] traced ids into
    a flat stacked QTensor ([L*E, ...] data). -> [G, ..., N]."""
    if qt.zero_points is not None or qt.data.ndim != 3:
        return None
    K, N = qt.shape
    if qt.bits == 4 and qt.data.shape[1] * 2 != K:
        return None
    G = x.shape[0]
    lead = x.shape[1:-1]
    M = 1
    for d in lead:
        M *= d
    out = _qmm_grouped(x.reshape(G, M, K), qt.data, qt.scales, slots,
                       bits=qt.bits, group_size=qt.group_size, K=K, N=N,
                       out_dtype=x.dtype, interpret=interpret)
    if out is None:
        return None
    return out.reshape((G,) + lead + (N,))


def qmatmul_pallas(x: jax.Array, qt: QTensor, preferred_dtype=jnp.float32,
                   interpret: bool = False) -> Optional[jax.Array]:
    """[..., K] @ dequant(qt [K, N]) -> [..., N] in x.dtype.

    Returns None when the weight isn't kernel-eligible (asymmetric
    zero-points, stacked-layer data consumed outside lax.scan, or
    non-tile-aligned K/N) — dispatch falls back to the jnp reference.
    """
    if qt.zero_points is not None:
        return None                     # asymmetric: jnp fallback for now
    if qt.data.ndim != 2:
        return None
    K, N = qt.shape
    if qt.bits == 4 and qt.data.shape[0] * 2 != K:
        return None                     # padded packing not supported
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    out = _qmm_2d(x2, qt.data, qt.scales, bits=qt.bits,
                  group_size=qt.group_size, K=K, N=N, out_dtype=x.dtype,
                  interpret=interpret, a8=_a8_enabled())
    if out is None:
        return None
    return out.reshape(*lead, N)


def prepare_scales(qt: QTensor) -> QTensor:
    """Pre-tile a STACKED QTensor's scales to the [L, nk, gk, N] layout
    the kernel consumes.

    The runtime reshape [L, G, N] -> [L, nk, gk, N] is NOT a bitcast on
    TPU (sublane tiling pads G and gk differently), so doing it inside
    the per-layer call costs a full scales copy every layer every step
    (~90 MB/layer measured on 7B). Doing it once at engine setup makes
    it free at decode time. No-op for 2-D or non-kernel-eligible
    weights.
    """
    if qt.data.ndim == 4 and qt.zero_points is None:
        # Stacked [L, E] MoE experts (quant/quantizer._quantize_experts):
        # flatten to the [L*E] stack the kernel indexes (layer*E + e,
        # models/moe._expert_ffn_quant), then tile scales as usual.
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        qt = QTensor(data=flat(qt.data), scales=flat(qt.scales),
                     zero_points=None, bits=qt.bits,
                     group_size=qt.group_size, shape=qt.shape)
    if qt.data.ndim != 3 or qt.zero_points is not None:
        return qt
    K, N = qt.shape
    tiles = _pick_tiles(8, K, N, qt.bits, qt.group_size)
    if tiles is None or qt.scales.ndim != 3:
        return qt
    _, TN, TK = tiles
    nk = K // TK
    gk = TK // qt.group_size
    L = qt.data.shape[0]
    scales4 = qt.scales.reshape(L, nk, gk, N)
    return QTensor(data=qt.data, scales=scales4, zero_points=None,
                   bits=qt.bits, group_size=qt.group_size, shape=qt.shape)
