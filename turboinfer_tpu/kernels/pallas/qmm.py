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

    qi = qp.astype(jnp.int32)
    lo = ((qi & 0x0F) - 8).astype(jnp.float32).reshape(G, g2, TN)
    hi = ((qi >> 4) - 8).astype(jnp.float32).reshape(G, g2, TN)
    w_lo = (lo * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)
    w_hi = (hi * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)

    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_tile(dim: int, candidates) -> Optional[int]:
    for t in candidates:
        if dim % t == 0:
            return t
    return None


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "K", "N",
                                             "out_dtype", "interpret"))
def _qmm_2d(x2, data, scales, *, bits: int, group_size: int, K: int, N: int,
            out_dtype, interpret: bool = False):
    """x2: [M, K] -> [M, N]. data/scales as stored in the QTensor."""
    M = x2.shape[0]

    import os
    tn_pref = os.environ.get("TURBOINFER_QMM_TN", "")
    tk_pref = os.environ.get("TURBOINFER_QMM_TK", "")
    # Default: FULL-width N tiles — each weight block is TK/kd contiguous
    # rows, so DMA runs at full burst width (measured +13% decode tok/s
    # over 256-wide tiles on 7B shapes); narrow tiles only when N is
    # too wide for VMEM.
    if tn_pref.isdigit() and N % int(tn_pref) == 0:
        TN = int(tn_pref)
    elif N <= 16384 and tn_pref != "narrow":
        TN = N
    else:
        TN = _pick_tile(N, (512, 384, 256, 128))
    # TK: multiple of group_size dividing K, targeting ~512-2048.
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
    # Cap the streamed weight block at ~3 MB of VMEM (double-buffered by
    # the pipeline; v5e has ~16 MB usable).
    while TK > group_size and (TK // (1 if bits == 8 else 2)) * TN > 3_145_728:
        TK //= 2
    if TK % group_size:
        return None
    if TN is None or TK is None or (bits == 4 and (TK % 2 or group_size % 2)):
        return None                      # not kernel-eligible
    TM = min(_round_up(M, 8), 256)
    pad_m = _round_up(M, TM) - M
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    nk = K // TK

    kern = _kernel_int8 if bits == 8 else _kernel_int4
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
    return out[:M] if pad_m else out


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
                  interpret=interpret)
    if out is None:
        return None
    return out.reshape(*lead, N)
