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


def _kernel_int8(x_ref, q_ref, s_ref, *rest, nk: int, group_size: int,
                 out_dtype, asym: bool = False):
    """x_ref: [TM, TK]; q_ref: [TK, TN] int8; s_ref: [TK//g, TN] scales;
    optional zp_ref (asym=True, same layout as s_ref);
    o_ref: [TM, TN] out; acc_ref: [TM, TN] f32 scratch."""
    if asym:
        zp_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
        zp_ref = None
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)                   # [TM, TK]
    q = q_ref[:]                                        # [TK, TN] int8
    s = s_ref[0].astype(jnp.float32)                    # [1, G, TN] -> [G, TN]
    zp = None if zp_ref is None else zp_ref[0].astype(jnp.float32)
    TK, TN = q.shape
    G = TK // group_size
    w = q.astype(jnp.int32).astype(jnp.float32).reshape(G, group_size, TN)
    if zp is not None:
        w = w - zp[:, None, :]                # dequant = (q - zp) * s
    w = (w * s[:, None, :]).reshape(TK, TN).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel_int4(xlo_ref, xhi_ref, q_ref, s_ref, *rest, nk: int,
                 group_size: int, out_dtype, asym: bool = False):
    """int4 planar-within-group variant.

    q_ref: [TK//2, TN] uint8 — byte row (gi, p) holds logical rows
    (gi, p) in the low nibble and (gi, p + g/2) in the high nibble.
    The contraction runs as two half-dots whose K order is
    (group, offset-in-half) on both sides; xlo/xhi are the activation
    columns pre-gathered into that order outside the kernel (Mosaic
    cannot split the lane dim in-kernel).
    """
    if asym:
        zp_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
        zp_ref = None
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x_lo = xlo_ref[:].astype(jnp.bfloat16)              # [TM, TK//2]
    x_hi = xhi_ref[:].astype(jnp.bfloat16)
    qp = q_ref[:]                                       # [TK//2, TN] u8
    s = s_ref[0].astype(jnp.float32)                    # [1, G, TN] -> [G, TN]
    zp = None if zp_ref is None else zp_ref[0].astype(jnp.float32)
    TK2, TN = qp.shape
    G = 2 * TK2 // group_size
    g2 = group_size // 2

    w_lo, w_hi = _dequant_int4_halves(qp, s, G, g2, TN, zp=zp)

    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _dequant_int4_halves(qp, s, G, g2, TN, zp=None):
    """Unpack + scale both nibble planes of a [TK/2, TN] uint8 block.

    Value math stays in f32: an all-bf16 variant (i32→bf16 casts +
    bf16 broadcast-multiply) measured ~30% SLOWER end-to-end — Mosaic
    lowers those through f32 with extra relayouts. zp (optional
    [G, TN] f32): asymmetric dequant = (q - zp) * s.
    """
    qi = qp.astype(jnp.int32)
    lo = ((qi & 0x0F) - 8).astype(jnp.float32).reshape(G, g2, TN)
    hi = ((qi >> 4) - 8).astype(jnp.float32).reshape(G, g2, TN)
    if zp is not None:
        lo = lo - zp[:, None, :]
        hi = hi - zp[:, None, :]
    TK2 = G * g2
    w_lo = (lo * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)
    w_hi = (hi * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)
    return w_lo, w_hi


def _fact_mode(bits: int, group_size: int, M: int, TK: int,
               a8: bool = False):
    """Pick the factored-scale int4 variant for this shape.

    "wide":   half-group >= one 128-lane slice (g >= 256) — one pair of
              full-depth dots per group (round 2 kernel).
    "masked": g in {32, 64, 128} — a 128-lane slice spans Gp = 256/g
              half-groups, so the caller pre-builds Gp MASKED copies of
              each activation half (zeros outside sub-group j); the
              kernel unpacks each weight slice ONCE and runs Gp dots
              against the masked copies, keeping per-group partials
              separate for the factored scale/zero-point algebra. The
              per-weight VPU work stays at unpack+cast (~3.5 passes) at
              the group sizes real GPTQ/AWQ checkpoints use, instead of
              the ~5.5-pass full dequant that made g=64 decode
              compute-bound (510 vs 663 GB/s). Decode-shaped M only:
              masked copies multiply x VMEM by Gp, irrelevant at TM=8
              but prohibitive for prefill tiles (prefill amortizes
              dequant over TM rows anyway).
    "folded": prefill-shaped M (> 8), any g — full-depth dots on
              scale-premultiplied weights u*s with the -8/zp shift
              folded into the rs correction dot (_folded_body): one
              VPU pass fewer per weight than the baseline dequant,
              which is the serialized VPU/MXU balance point at
              TM >= 256.
    None:     not factorable — baseline per-weight dequant kernel.
    """
    import os
    if os.environ.get("TURBOINFER_QMM_NO_FACT") == "1" or bits != 4:
        return None
    g2 = group_size // 2
    if M > 8:
        pref = os.environ.get("TURBOINFER_QMM_PREFILL_KERNEL", "plain")
        if (a8 or pref == "wide") and g2 >= 128 and g2 % 128 == 0:
            return "wide"            # a8: int8 dots need the wide layout
        if pref == "folded":
            # MEASURED DEAD END (7B S=512 g=64: 77.2 ms vs plain's
            # 63.4 same-session; compile 368 s vs 4 s): the [G, g2, TN]
            # scale broadcast forces sublane-varying multiplies that
            # Mosaic lowers through relayouts, costing far more than
            # the one VPU subtract pass the fold saves. Kept reachable
            # for re-measurement on future toolchains only.
            return "folded"
        return None
    if g2 >= 128 and g2 % 128 == 0:
        return "wide"
    if (g2 in (16, 32, 64) and M <= 8 and (TK // 2) % 128 == 0
            and os.environ.get("TURBOINFER_QMM_NO_MASKED_FACT") != "1"):
        return "masked"
    return None


def _int4_fact_body(x_lo, x_hi, qp, s, zp, acc_ref, *, group_size: int):
    """Wide factored-scale int4 accumulation (one K tile, g/2 >= 128).

    The baseline kernel dequantizes every weight on the VPU (unpack,
    subtract 8/zp, scale-multiply, two dtype casts ≈ 5.5 vector passes
    per weight) — at 7B decode shapes that outruns the DMA and makes
    the pipeline compute-bound. Here the group scale is factored OUT of
    the contraction:

        acc[m,n] += sum_g s[g,n] * ( sum_{k in g} x[m,k]*u[k,n]
                                     - (8 + zp[g,n]) * sum_{k in g} x[m,k] )

    (u = q + 8 is the raw nibble in [0,16), exact in bf16; zp = 0 when
    symmetric) so the MXU dots run on raw nibbles and the VPU only
    touches per-weight data for unpack + cast (~3.5 passes); the
    scale/zero-point algebra runs on the [TM, TN] per-group partial,
    which is group_size× smaller. Each group is one full-depth pair of
    [TM, g/2] @ [g/2, TN] dots (g/2 = 128k lanes).

    x_lo/x_hi: [TM, TK//2] bf16 pre-gathered halves; qp: [TK//2, TN]
    uint8; s (and optional zp): [G, TN] f32; acc_ref: [TM, TN] f32.
    """
    TK2, TN = qp.shape
    g2 = group_size // 2
    acc = acc_ref[:]
    for gi in range(TK2 // g2):
        sl = slice(gi * g2, (gi + 1) * g2)
        qg = qp[sl].astype(jnp.int32)
        u_lo = (qg & 0x0F).astype(jnp.bfloat16)
        u_hi = (qg >> 4).astype(jnp.bfloat16)
        xls = x_lo[:, sl]
        xhs = x_hi[:, sl]
        p = (jnp.dot(xls, u_lo, preferred_element_type=jnp.float32)
             + jnp.dot(xhs, u_hi, preferred_element_type=jnp.float32))
        rsum = jnp.sum(xls.astype(jnp.float32), axis=1, keepdims=True) \
            + jnp.sum(xhs.astype(jnp.float32), axis=1, keepdims=True)
        if zp is None:
            acc = acc + (p - 8.0 * rsum) * s[gi][None, :]
        else:
            acc = acc + (p - rsum * (zp[gi][None, :] + 8.0)) \
                * s[gi][None, :]
    acc_ref[:] = acc


def _make_fact_kernel(asym: bool, kind: str, *, nk: int, group_size: int,
                      out_dtype):
    """Wide factored-scale int4 kernel factory (see _int4_fact_body) for
    the 2-D ("2d"), stacked-layer ("stacked") or grouped-slots
    ("grouped") grid shape."""
    k_dim = 3 if kind == "grouped" else 2

    def kern(*refs):
        if kind != "2d":
            refs = refs[1:]                      # drop prefetched idx ref
        xlo_ref, xhi_ref, q_ref, s_ref = refs[:4]
        zp_ref = refs[4] if asym else None
        o_ref, acc_ref = refs[-2], refs[-1]
        k = pl.program_id(k_dim)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if kind == "2d":
            qp, s = q_ref[:], s_ref[0].astype(jnp.float32)
            zp = None if zp_ref is None else zp_ref[0].astype(jnp.float32)
        else:
            qp, s = q_ref[0], s_ref[0, 0].astype(jnp.float32)
            zp = None if zp_ref is None else zp_ref[0, 0].astype(jnp.float32)
        if kind == "grouped":                    # x blocks [1, TM, TK//2]
            xl, xh = xlo_ref[0], xhi_ref[0]
        else:                                    # x blocks [TM, TK//2]
            xl, xh = xlo_ref[:], xhi_ref[:]
        _int4_fact_body(xl.astype(jnp.bfloat16), xh.astype(jnp.bfloat16),
                        qp, s, zp, acc_ref, group_size=group_size)

        @pl.when(k == nk - 1)
        def _():
            if kind == "grouped":
                o_ref[0] = acc_ref[:].astype(out_dtype)
            else:
                o_ref[:] = acc_ref[:].astype(out_dtype)

    return kern


def _masked_x_cat(x_lo, x_hi, K: int, group_size: int, nparts: int):
    """Pre-build the masked activation halves for the "masked" factored
    mode, CONCATENATED along M: rows [j*M, (j+1)*M) hold copy j, which
    zeros every lane outside sub-group j (group index ≡ j mod nparts
    within each 128-lane slice). One wide dot per slice then yields all
    nparts per-sub-group partials at once — measured 8 narrow [8,128]
    dots per slice ran 32% SLOWER than the baseline dequant kernel;
    2 dots of [nparts*8, 128] recover the MXU issue rate. XLA fuses the
    wheres; at decode M<=8 the copies are a few KB."""
    g2 = group_size // 2
    sub = (jnp.arange(K // 2) // g2) % nparts
    los = [jnp.where(sub == j, x_lo, 0) for j in range(nparts)]
    his = [jnp.where(sub == j, x_hi, 0) for j in range(nparts)]
    return jnp.concatenate(los, axis=0), jnp.concatenate(his, axis=0)


def _group_row_sums(x2, Mp: int, K: int, group_size: int, nk: int):
    """Per-group activation row sums [nk, Mp, gk] f32 — the factored
    kernels' zero-point/-8 correction consumes them as ONE small
    [TM, gk] @ [gk, TN] dot per K tile instead of a per-group
    broadcast-subtract chain."""
    gk_total = K // group_size
    rs = x2.astype(jnp.float32).reshape(Mp, gk_total, group_size).sum(-1)
    return rs.reshape(Mp, nk, gk_total // nk).transpose(1, 0, 2)


def _masked_body(xl, xh, rs, qp, s, zp, acc_ref, *, nparts: int, TM: int):
    """Masked factored int4 accumulation for one K tile.

    xl/xh: [nparts*TM, TK//2] bf16 masked-concatenated halves; rs:
    [TM, gk] f32 per-group row sums; qp: [TK//2, TN] uint8; s (and
    optional zp): [gk, TN] f32. Per 128-lane slice the nibbles are
    unpacked ONCE and contracted with the wide masked block — rows
    [j*TM, (j+1)*TM) of the partial are sub-group j's contribution,
    scaled by its own column scales. The -8 shift (and zero-point)
    correction is a single rs @ ((zp+8)*s) dot per tile.
    """
    TK2, TN = qp.shape
    acc = acc_ref[:]
    for c in range(TK2 // 128):
        sl = slice(c * 128, (c + 1) * 128)
        qg = qp[sl].astype(jnp.int32)
        u_lo = (qg & 0x0F).astype(jnp.bfloat16)
        u_hi = (qg >> 4).astype(jnp.bfloat16)
        p = (jnp.dot(xl[:, sl], u_lo, preferred_element_type=jnp.float32)
             + jnp.dot(xh[:, sl], u_hi,
                       preferred_element_type=jnp.float32))
        for j in range(nparts):
            gi = c * nparts + j
            acc = acc + p[j * TM:(j + 1) * TM] * s[gi][None, :]
    szp = 8.0 * s if zp is None else (zp + 8.0) * s
    acc = acc - jnp.dot(rs, szp, preferred_element_type=jnp.float32)
    acc_ref[:] = acc


def _folded_body(x_lo, x_hi, rs, qp, s, zp, acc_ref, *, group_size: int):
    """Folded-shift int4 accumulation for one K tile (prefill tiles).

    At prefill TM (256-512) the baseline kernel's per-weight dequant
    chain — unpack, subtract 8 (and zp), cast, scale-multiply, cast,
    ~5.5 VPU passes — costs about as many cycles as the MXU dot itself,
    and the two serialize within a grid step: that is the measured
    ~57% MFU ceiling. Folding the constant shift out of the element
    path:

        (u - 8 - zp) * s  =  u*s  -  (8 + zp)*s

    leaves unpack, cast, multiply, cast (~4.5 passes) per weight; the
    (8+zp)*s term contracts against the per-group activation row sums
    as ONE tiny [TM, gk] @ [gk, TN] dot per tile (the same correction
    the masked decode kernel uses). Same quantization math — only the
    bf16 rounding point moves (u*s instead of (u-8)*s).

    x_lo/x_hi: [TM, TK//2] bf16 pre-gathered halves; rs: [TM, gk] f32
    per-group activation row sums; qp: [TK//2, TN] uint8; s (and
    optional zp): [gk, TN] f32; acc_ref: [TM, TN] f32.
    """
    TK2, TN = qp.shape
    g2 = group_size // 2
    G = TK2 // g2
    qi = qp.astype(jnp.int32)
    lo = (qi & 0x0F).astype(jnp.float32).reshape(G, g2, TN)
    hi = (qi >> 4).astype(jnp.float32).reshape(G, g2, TN)
    w_lo = (lo * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)
    w_hi = (hi * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)
    szp = 8.0 * s if zp is None else (zp + 8.0) * s
    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
                   - jnp.dot(rs, szp, preferred_element_type=jnp.float32))


def _make_masked_kernel(nparts: int, asym: bool, kind: str, *, nk: int,
                        group_size: int, out_dtype, folded: bool = False):
    """Masked factored int4 kernel factory (see _masked_body) for the
    2-D ("2d"), stacked-layer ("stacked") or grouped ("grouped") grid.
    folded=True swaps in _folded_body (same ref layout: the x halves
    arrive unconcatenated and rs carries the shift correction)."""
    k_dim = 3 if kind == "grouped" else 2

    def kern(*refs):
        if kind != "2d":
            refs = refs[1:]                      # drop prefetched idx ref
        xl_ref, xh_ref, rs_ref, q_ref, s_ref = refs[:5]
        zp_ref = refs[5] if asym else None
        o_ref, acc_ref = refs[-2], refs[-1]
        k = pl.program_id(k_dim)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if kind == "2d":
            xl, xh, rs = xl_ref[:], xh_ref[:], rs_ref[0]
            qp, s = q_ref[:], s_ref[0].astype(jnp.float32)
            zp = None if zp_ref is None else zp_ref[0].astype(jnp.float32)
        elif kind == "stacked":
            xl, xh, rs = xl_ref[:], xh_ref[:], rs_ref[0]
            qp, s = q_ref[0], s_ref[0, 0].astype(jnp.float32)
            zp = None if zp_ref is None else zp_ref[0, 0].astype(jnp.float32)
        else:
            xl, xh, rs = xl_ref[0], xh_ref[0], rs_ref[0, 0]
            qp, s = q_ref[0], s_ref[0, 0].astype(jnp.float32)
            zp = None if zp_ref is None else zp_ref[0, 0].astype(jnp.float32)
        TM = acc_ref.shape[0]
        if folded:
            _folded_body(xl.astype(jnp.bfloat16), xh.astype(jnp.bfloat16),
                         rs.astype(jnp.float32), qp, s, zp, acc_ref,
                         group_size=group_size)
        else:
            _masked_body(xl.astype(jnp.bfloat16), xh.astype(jnp.bfloat16),
                         rs.astype(jnp.float32), qp, s, zp, acc_ref,
                         nparts=nparts, TM=TM)

        @pl.when(k == nk - 1)
        def _():
            if kind == "grouped":
                o_ref[0] = acc_ref[:].astype(out_dtype)
            else:
                o_ref[:] = acc_ref[:].astype(out_dtype)

    return kern


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
        # 4096 first: on narrow-TN shapes (N > 16384 -> TN 512) the
        # bigger K block survives the VMEM cap and measured +5% decode
        # at 7B g=64 (w_gateup [4096, 22016]: TK 2048 -> 4096); wide-TN
        # shapes get halved back by the cap, unchanged.
        for mult in (4096, 2048, 1024, 512, 256, 128, 64, 32):
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
def _qmm_2d(x2, data, scales, zps, *, bits: int, group_size: int, K: int,
            N: int, out_dtype, interpret: bool = False, a8: bool = False):
    """x2: [M, K] -> [M, N]. data/scales/zps as stored in the QTensor
    (zps=None for symmetric weights)."""
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

    asym = zps is not None
    mode = _fact_mode(bits, group_size, M, TK, a8=a8 and not asym)
    a8 = a8 and bits == 4 and M > 8 and mode == "wide" and not asym
    kw = dict(nk=nk, group_size=group_size, out_dtype=out_dtype)
    nparts = 1
    if bits == 8:
        kern = functools.partial(_kernel_int8, asym=asym, **kw)
    elif a8:
        kern = functools.partial(_kernel_int4_a8, **kw)
    elif mode == "wide":
        kern = _make_fact_kernel(asym, "2d", **kw)
    elif mode == "folded":
        kern = _make_masked_kernel(1, asym, "2d", folded=True, **kw)
    elif mode == "masked":
        nparts = 128 // (group_size // 2)
        kern = _make_masked_kernel(nparts, asym, "2d", **kw)
    else:
        kern = functools.partial(_kernel_int4, asym=asym, **kw)
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
                            + (K // group_size) * N * 4 * (2 if asym else 1)
                            + Mp * N * 2),
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
    zp_ops, zp_specs = (), ()
    if asym:
        zp_ops = (zps.reshape(nk, gk, N),)
        zp_specs = (s_spec,)

    if bits == 8:
        out = pl.pallas_call(
            kern,
            grid=(Mp // TM, N // TN, nk),
            in_specs=[
                pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                w_spec, s_spec, *zp_specs,
            ],
            **common,
        )(x2, data, scales3, *zp_ops)
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
        if nparts > 1:
            xl, xh = _masked_x_cat(x_lo, x_hi, K, group_size, nparts)
            rs = _group_row_sums(x2, Mp, K, group_size, nk)
            cat_spec = pl.BlockSpec((nparts * TM, TK // 2),
                                    lambda i, j, k: (0, k),
                                    memory_space=pltpu.VMEM)
            rs_spec = pl.BlockSpec((1, TM, gk), lambda i, j, k: (k, i, 0),
                                   memory_space=pltpu.VMEM)
            ins = [cat_spec, cat_spec, rs_spec, w_spec, s_spec, *zp_specs]
            args = (xl, xh, rs, data, scales3, *zp_ops)
        elif mode == "folded":
            rs = _group_row_sums(x2, Mp, K, group_size, nk)
            rs_spec = pl.BlockSpec((1, TM, gk), lambda i, j, k: (k, i, 0),
                                   memory_space=pltpu.VMEM)
            ins = [half_spec, half_spec, rs_spec, w_spec, s_spec, *zp_specs]
            args = (x_lo, x_hi, rs, data, scales3, *zp_ops)
        else:
            ins = [half_spec, half_spec, w_spec, s_spec, *zp_specs]
            args = (x_lo, x_hi, data, scales3, *zp_ops)
        out = pl.pallas_call(
            kern,
            grid=(Mp // TM, N // TN, nk),
            in_specs=ins,
            **common,
        )(*args)
        if sx is not None:
            out = (out.astype(jnp.float32) * sx[:, None]).astype(out_dtype)
    return out[:M] if pad_m else out


def _kernel_int8_idx(idx_ref, x_ref, q_ref, s_ref, *rest, nk: int,
                     group_size: int, out_dtype, asym: bool = False):
    """Stacked-layer int8: q_ref [1, TK, TN] indexed by the prefetched
    layer id in the BlockSpec; body identical to _kernel_int8."""
    if asym:
        zp_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
        zp_ref = None
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
    if zp_ref is not None:
        w = w - zp_ref[0, 0].astype(jnp.float32)[:, None, :]
    w = (w * s[:, None, :]).reshape(TK, TN).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel_int4_idx(idx_ref, xlo_ref, xhi_ref, q_ref, s_ref, *rest,
                     nk: int, group_size: int, out_dtype,
                     asym: bool = False):
    """Stacked-layer int4 planar variant (see _kernel_int4)."""
    if asym:
        zp_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
        zp_ref = None
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x_lo = xlo_ref[:].astype(jnp.bfloat16)
    x_hi = xhi_ref[:].astype(jnp.bfloat16)
    qp = q_ref[0]
    s = s_ref[0, 0].astype(jnp.float32)
    zp = None if zp_ref is None else zp_ref[0, 0].astype(jnp.float32)
    TK2, TN = qp.shape
    G = 2 * TK2 // group_size
    g2 = group_size // 2

    w_lo, w_hi = _dequant_int4_halves(qp, s, G, g2, TN, zp=zp)

    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _retile_scales(arr, L, nk, gk, N):
    """[L, G, N] (or differently pre-tiled 4-D) -> [L, nk, gk, N]."""
    if arr.ndim == 4 and arr.shape[1] == nk and arr.shape[2] == gk:
        return arr                # pre-tiled (prepare_scales) — free
    # Different tiling than prepared (e.g. prefill picked a smaller
    # TK): re-tile. Costs one scales copy per call — fine for
    # prefill (once per request), avoided on the decode path.
    return arr.reshape(L, nk, gk, N)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "K", "N",
                                             "out_dtype", "interpret",
                                             "a8"))
def _qmm_stacked(x2, data3, scales3, zps3, layer_idx, scales_pf=None, *,
                 bits: int,
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
    src = (scales_pf if scales_pf is not None
           and scales_pf.shape[1:3] == (nk, gk) else scales3)
    scales4 = _retile_scales(src, L, nk, gk, N)

    asym = zps3 is not None
    mode = _fact_mode(bits, group_size, M, TK, a8=a8 and not asym)
    a8 = a8 and bits == 4 and M > 8 and mode == "wide" and not asym
    kw = dict(nk=nk, group_size=group_size, out_dtype=out_dtype)
    nparts = 1
    if bits == 8:
        kern = functools.partial(_kernel_int8_idx, asym=asym, **kw)
    elif a8:
        kern = functools.partial(_kernel_int4_a8_idx, **kw)
    elif mode == "wide":
        kern = _make_fact_kernel(asym, "stacked", **kw)
    elif mode == "folded":
        kern = _make_masked_kernel(1, asym, "stacked", folded=True, **kw)
    elif mode == "masked":
        nparts = 128 // (group_size // 2)
        kern = _make_masked_kernel(nparts, asym, "stacked", **kw)
    else:
        kern = functools.partial(_kernel_int4_idx, asym=asym, **kw)
    kd = 1 if bits == 8 else 2
    w_spec = pl.BlockSpec((1, TK // kd, TN),
                          lambda i, j, k, idx: (idx[0], k, j),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, gk, TN),
                          lambda i, j, k, idx: (idx[0], k, 0, j),
                          memory_space=pltpu.VMEM)
    zp_ops, zp_specs = (), ()
    if asym:
        zp_ops = (_retile_scales(zps3, L, nk, gk, N),)
        zp_specs = (s_spec,)
    out_spec = pl.BlockSpec((TM, TN), lambda i, j, k, idx: (i, j),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * Mp * N * K,
        bytes_accessed=(Mp * K * x2.dtype.itemsize + K * N * bits // 8
                        + (K // group_size) * N * 4 * (2 if asym else 1)
                        + Mp * N * 2),
        transcendentals=0)
    idx_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    if bits == 8:
        x_spec = pl.BlockSpec((TM, TK), lambda i, j, k, idx: (i, k),
                              memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(Mp // TM, N // TN, nk),
            in_specs=[x_spec, w_spec, s_spec, *zp_specs],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)])
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=cost, interpret=interpret,
        )(idx_arr, x2, data3, scales4, *zp_ops)
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
        if nparts > 1:
            xl, xh = _masked_x_cat(x_lo, x_hi, K, group_size, nparts)
            rs = _group_row_sums(x2, Mp, K, group_size, nk)
            cat_spec = pl.BlockSpec((nparts * TM, TK // 2),
                                    lambda i, j, k, idx: (0, k),
                                    memory_space=pltpu.VMEM)
            rs_spec = pl.BlockSpec((1, TM, gk),
                                   lambda i, j, k, idx: (k, i, 0),
                                   memory_space=pltpu.VMEM)
            ins = [cat_spec, cat_spec, rs_spec, w_spec, s_spec, *zp_specs]
            args = (idx_arr, xl, xh, rs, data3, scales4, *zp_ops)
        elif mode == "folded":
            rs = _group_row_sums(x2, Mp, K, group_size, nk)
            rs_spec = pl.BlockSpec((1, TM, gk),
                                   lambda i, j, k, idx: (k, i, 0),
                                   memory_space=pltpu.VMEM)
            ins = [half_spec, half_spec, rs_spec, w_spec, s_spec, *zp_specs]
            args = (idx_arr, x_lo, x_hi, rs, data3, scales4, *zp_ops)
        else:
            ins = [half_spec, half_spec, w_spec, s_spec, *zp_specs]
            args = (idx_arr, x_lo, x_hi, data3, scales4, *zp_ops)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(Mp // TM, N // TN, nk),
            in_specs=ins,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)])
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=cost, interpret=interpret,
        )(*args)
        if sx is not None:
            out = (out.astype(jnp.float32) * sx[:, None]).astype(out_dtype)
    return out[:M] if pad_m else out


def qmatmul_pallas_stacked(x: jax.Array, qt: QTensor, layer_index,
                           preferred_dtype=jnp.float32,
                           interpret: bool = False) -> Optional[jax.Array]:
    """[..., K] @ dequant(qt.data[layer_index]) for a stacked [L, ...]
    QTensor, reading directly from the stacked HBM array."""
    if qt.data.ndim != 3:
        return None
    K, N = qt.shape
    if qt.bits == 4 and qt.data.shape[1] * 2 != K:
        return None
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    out = _qmm_stacked(x.reshape(M, K), qt.data, qt.scales, qt.zero_points,
                       layer_index, qt.scales_pf,
                       bits=qt.bits, group_size=qt.group_size,
                       K=K, N=N, out_dtype=x.dtype, interpret=interpret,
                       a8=_a8_enabled())
    if out is None:
        return None
    return out.reshape(*lead, N)


def _kernel_int8_grp(idx_ref, x_ref, q_ref, s_ref, *rest, nk: int,
                     group_size: int, out_dtype, asym: bool = False):
    """Grouped stacked-layer int8: grid (G, M/TM, N/TN, nk); group g
    contracts x_ref[0] (that group's activations) against weight slot
    idx_ref[g]."""
    if asym:
        zp_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
        zp_ref = None
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
    if zp_ref is not None:
        w = w - zp_ref[0, 0].astype(jnp.float32)[:, None, :]
    w = (w * s[:, None, :]).reshape(TK, TN).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(out_dtype)


def _kernel_int4_grp(idx_ref, xlo_ref, xhi_ref, q_ref, s_ref, *rest,
                     nk: int, group_size: int, out_dtype,
                     asym: bool = False):
    """Grouped stacked-layer int4 planar variant (see _kernel_int4)."""
    if asym:
        zp_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
        zp_ref = None
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x_lo = xlo_ref[0].astype(jnp.bfloat16)
    x_hi = xhi_ref[0].astype(jnp.bfloat16)
    qp = q_ref[0]
    s = s_ref[0, 0].astype(jnp.float32)
    zp = None if zp_ref is None else zp_ref[0, 0].astype(jnp.float32)
    TK2, TN = qp.shape
    G = 2 * TK2 // group_size
    g2 = group_size // 2
    w_lo, w_hi = _dequant_int4_halves(qp, s, G, g2, TN, zp=zp)
    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "K", "N",
                                             "out_dtype", "interpret"))
def _qmm_grouped(xg, data3, scales3, zps3, slots, *, bits: int,
                 group_size: int, K: int, N: int, out_dtype,
                 interpret: bool = False):
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
    scales4 = _retile_scales(scales3, L, nk, gk, N)

    asym = zps3 is not None
    mode = _fact_mode(bits, group_size, M, TK)
    kw = dict(nk=nk, group_size=group_size, out_dtype=out_dtype)
    nparts = 1
    if bits == 8:
        kern = functools.partial(_kernel_int8_grp, asym=asym, **kw)
    elif mode == "wide":
        kern = _make_fact_kernel(asym, "grouped", **kw)
    elif mode == "folded":
        kern = _make_masked_kernel(1, asym, "grouped", folded=True, **kw)
    elif mode == "masked":
        nparts = 128 // (group_size // 2)
        kern = _make_masked_kernel(nparts, asym, "grouped", **kw)
    else:
        kern = functools.partial(_kernel_int4_grp, asym=asym, **kw)
    kd = 1 if bits == 8 else 2
    w_spec = pl.BlockSpec((1, TK // kd, TN),
                          lambda g, i, j, k, idx: (idx[g], k, j),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, gk, TN),
                          lambda g, i, j, k, idx: (idx[g], k, 0, j),
                          memory_space=pltpu.VMEM)
    zp_ops, zp_specs = (), ()
    if asym:
        zp_ops = (_retile_scales(zps3, L, nk, gk, N),)
        zp_specs = (s_spec,)
    out_spec = pl.BlockSpec((1, TM, TN), lambda g, i, j, k, idx: (g, i, j),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * G * Mp * N * K,
        bytes_accessed=G * (Mp * K * xg.dtype.itemsize + K * N * bits // 8
                            + (K // group_size) * N * 4 * (2 if asym else 1)
                            + Mp * N * 2),
        transcendentals=0)
    idx_arr = jnp.asarray(slots, jnp.int32).reshape(G)
    grid = (G, Mp // TM, N // TN, nk)
    semantics = ("arbitrary", "parallel", "parallel", "arbitrary")

    if bits == 8:
        x_spec = pl.BlockSpec((1, TM, TK), lambda g, i, j, k, idx: (g, i, k),
                              memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[x_spec, w_spec, s_spec, *zp_specs],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)])
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((G, Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics),
            cost_estimate=cost, interpret=interpret,
        )(idx_arr, xg, data3, scales4, *zp_ops)
    else:
        g2 = group_size // 2
        xr = xg.reshape(G, Mp, K // group_size, group_size)
        x_lo = xr[:, :, :, :g2].reshape(G, Mp, K // 2)
        x_hi = xr[:, :, :, g2:].reshape(G, Mp, K // 2)
        half_spec = pl.BlockSpec((1, TM, TK // 2),
                                 lambda g, i, j, k, idx: (g, i, k),
                                 memory_space=pltpu.VMEM)
        if nparts > 1:
            # KEEP IN SYNC with _masked_x_cat/_group_row_sums: this is
            # the same sub-group masking and row-sum tiling with a
            # leading G axis (a layout change to the helpers — e.g. a
            # pack_int4 sub-group reorder — must be mirrored here or
            # the grouped MoE path silently computes with the stale
            # layout).
            sub = (jnp.arange(K // 2) // g2) % nparts
            xl = jnp.concatenate(
                [jnp.where(sub == j, x_lo, 0) for j in range(nparts)],
                axis=1)
            xh = jnp.concatenate(
                [jnp.where(sub == j, x_hi, 0) for j in range(nparts)],
                axis=1)
            gk_total = K // group_size
            rs = xg.astype(jnp.float32).reshape(
                G, Mp, gk_total, group_size).sum(-1).reshape(
                G, Mp, nk, gk).transpose(0, 2, 1, 3)     # [G, nk, Mp, gk]
            cat_spec = pl.BlockSpec((1, nparts * TM, TK // 2),
                                    lambda g, i, j, k, idx: (g, 0, k),
                                    memory_space=pltpu.VMEM)
            rs_spec = pl.BlockSpec((1, 1, TM, gk),
                                   lambda g, i, j, k, idx: (g, k, i, 0),
                                   memory_space=pltpu.VMEM)
            ins = [cat_spec, cat_spec, rs_spec, w_spec, s_spec, *zp_specs]
            args = (idx_arr, xl, xh, rs, data3, scales4, *zp_ops)
        elif mode == "folded":
            gk_total = K // group_size
            rs = xg.astype(jnp.float32).reshape(
                G, Mp, gk_total, group_size).sum(-1).reshape(
                G, Mp, nk, gk).transpose(0, 2, 1, 3)     # [G, nk, Mp, gk]
            rs_spec = pl.BlockSpec((1, 1, TM, gk),
                                   lambda g, i, j, k, idx: (g, k, i, 0),
                                   memory_space=pltpu.VMEM)
            ins = [half_spec, half_spec, rs_spec, w_spec, s_spec, *zp_specs]
            args = (idx_arr, x_lo, x_hi, rs, data3, scales4, *zp_ops)
        else:
            ins = [half_spec, half_spec, w_spec, s_spec, *zp_specs]
            args = (idx_arr, x_lo, x_hi, data3, scales4, *zp_ops)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=ins,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)])
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((G, Mp, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics),
            cost_estimate=cost, interpret=interpret,
        )(*args)
    return out[:, :M] if pad_m else out


def qmatmul_pallas_grouped(x: jax.Array, qt: QTensor, slots: jax.Array,
                           interpret: bool = False) -> Optional[jax.Array]:
    """x: [G, ..., K] per-group activations; slots: [G] traced ids into
    a flat stacked QTensor ([L*E, ...] data). -> [G, ..., N]."""
    if qt.data.ndim != 3:
        return None
    K, N = qt.shape
    if qt.bits == 4 and qt.data.shape[1] * 2 != K:
        return None
    G = x.shape[0]
    lead = x.shape[1:-1]
    M = 1
    for d in lead:
        M *= d
    out = _qmm_grouped(x.reshape(G, M, K), qt.data, qt.scales,
                       qt.zero_points, slots, bits=qt.bits,
                       group_size=qt.group_size, K=K, N=N,
                       out_dtype=x.dtype, interpret=interpret)
    if out is None:
        return None
    return out.reshape((G,) + lead + (N,))


def qmatmul_pallas(x: jax.Array, qt: QTensor, preferred_dtype=jnp.float32,
                   interpret: bool = False) -> Optional[jax.Array]:
    """[..., K] @ dequant(qt [K, N]) -> [..., N] in x.dtype.

    Returns None when the weight isn't kernel-eligible (stacked-layer
    data consumed outside lax.scan, or non-tile-aligned K/N) — dispatch
    falls back to the jnp reference. Asymmetric weights run the same
    kernels with the zero-point folded into the dequant (baseline
    kernels) or the factored row-sum correction (factored kernels).
    """
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
    out = _qmm_2d(x2, qt.data, qt.scales, qt.zero_points, bits=qt.bits,
                  group_size=qt.group_size, K=K, N=N, out_dtype=x.dtype,
                  interpret=interpret, a8=_a8_enabled())
    if out is None:
        return None
    return out.reshape(*lead, N)


def prepare_scales(qt: QTensor) -> QTensor:
    """Pre-tile a STACKED QTensor's scales (and zero-points) to the
    [L, nk, gk, N] layout the kernel consumes.

    The runtime reshape [L, G, N] -> [L, nk, gk, N] is NOT a bitcast on
    TPU (sublane tiling pads G and gk differently), so doing it inside
    the per-layer call costs a full scales copy every layer every step
    (~90 MB/layer measured on 7B). Doing it once at engine setup makes
    it free at decode time. No-op for 2-D or non-kernel-eligible
    weights.
    """
    if qt.data.ndim == 4:
        # Stacked [L, E] MoE experts (quant/quantizer._quantize_experts):
        # flatten to the [L*E] stack the kernel indexes (layer*E + e,
        # models/moe._expert_ffn_quant), then tile scales as usual.
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        qt = QTensor(data=flat(qt.data), scales=flat(qt.scales),
                     zero_points=None if qt.zero_points is None
                     else flat(qt.zero_points), bits=qt.bits,
                     group_size=qt.group_size, shape=qt.shape)
    if qt.data.ndim != 3:
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
    zp4 = None if qt.zero_points is None \
        else qt.zero_points.reshape(L, nk, gk, N)
    # Prefill picks a different TK (M>8 branch of _pick_tiles shrinks
    # it for the bigger x blocks) — pre-tile a SECOND copy for that
    # layout so the layer scan doesn't pay a per-layer scales retile
    # every prefill (symmetric only; asym keeps the runtime retile).
    scales_pf = None
    if qt.zero_points is None:
        tiles_pf = _pick_tiles(512, K, N, qt.bits, qt.group_size)
        if tiles_pf is not None:
            _, _, TKp = tiles_pf
            nkp, gkp = K // TKp, TKp // qt.group_size
            if (nkp, gkp) != (nk, gk):
                scales_pf = qt.scales.reshape(L, nkp, gkp, N)
    return QTensor(data=qt.data, scales=scales4, zero_points=zp4,
                   bits=qt.bits, group_size=qt.group_size, shape=qt.shape,
                   scales_pf=scales_pf)
