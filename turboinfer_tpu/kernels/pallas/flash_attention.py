"""Blockwise (flash-style) causal prefill attention Pallas kernel.

TPU-native replacement for the reference's prefill attention, which
materializes the full [seq, seq] score matrix + causal mask
(reference: src/model/inference_engine.cpp:347-367, masks at :425-442).
Here scores exist only as a [TS, TT] tile in VMEM with online softmax —
memory is O(S·D) instead of O(S²) (SURVEY.md §5 long-context note).

Supports the chunked-prefill case: queries at absolute `positions`
attending to a cache [B, Hkv, T, D] whose first kv_len slots are valid,
with causality q_pos >= k_pos. Fully-masked T tiles (k_start > last
q position of the tile, or beyond kv_len) are skipped.

Grid (B, Hq, S/TS, T/TT), T innermost; q is head-major [B, Hq, S, D]
(transposed outside); running max/denom/acc in VMEM scratch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(len_ref, start_ref, q_ref, k_ref, v_ref, *rest, nt: int,
            ts: int, tt: int, gh: int, scale: float, causal: bool,
            window, softcap=None, stacked: bool = False,
            scaled: bool = False):
    """len_ref: [B] kv lens; start_ref: [B] absolute position of each
    sequence's first query (both scalar-prefetch; query s has position
    start + s). q_ref: [1, 1, TS, D]; k/v_ref: [1, 1, TT, D] (or
    [1, 1, 1, TT, D] blocks of the stacked [L, ...] cache when
    `stacked` — read through _load_kv, so uint8 e4m3 caches decode
    in-kernel); o_ref: [1, 1, TS, D]; scratch m/l: [TS, 128],
    acc: [TS, D].

    `scaled` (int8 stacked cache): ks/vs_ref [1, 1, Hkv, T] VMEM
    blocks of the per-token scale planes; the dequant multiplies ride
    the [TS, TT] score/prob tiles exactly like the decode kernel's
    (scores *= ks after q @ k^T, probs *= vs before p @ v; the
    softmax denominator uses the UNSCALED probs)."""
    if scaled:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    h = pl.program_id(1)
    si = pl.program_id(2)
    t = pl.program_id(3)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kv_len = len_ref[b]
    # Last valid q position in this S tile bounds which T tiles matter.
    q_last = start_ref[b] + si * ts + ts - 1
    k_start = t * tt
    live = (k_start < kv_len)
    if causal:
        live = jnp.logical_and(live, k_start <= q_last)
    if window is not None:
        # Tile dead when entirely below the earliest position any query
        # in this S tile can see (q_first - window + 1).
        q_first = start_ref[b] + si * ts
        live = jnp.logical_and(live,
                               k_start + tt - 1 >= q_first - window + 1)

    @pl.when(live)
    def _():
        from turboinfer_tpu.kernels.pallas.decode_attention import _load_kv
        q = q_ref[0, 0].astype(jnp.float32) * scale     # [TS, D]
        if stacked:
            k = _load_kv(k_ref[0, 0, 0], jnp.float32)   # [TT, D]
            v = _load_kv(v_ref[0, 0, 0], jnp.float32)
        else:
            k = k_ref[0, 0].astype(jnp.float32)         # [TT, D]
            v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(                        # [TS, TT]
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if scaled:
            ks_row = ks_ref[0, 0, h // gh, pl.ds(t * tt, tt)]   # [TT]
            s = s * ks_row[None, :]
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + k_start
        mask = col < kv_len
        if causal:
            qpos = (start_ref[b] + si * ts
                    + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
            mask = jnp.logical_and(mask, qpos >= col)
            if window is not None:
                mask = jnp.logical_and(mask, col > qpos - window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if scaled:
            vs_row = vs_ref[0, 0, h // gh, pl.ds(t * tt, tt)]   # [TT]
            pv = p * vs_row[None, :]
        else:
            pv = p
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(t == nt - 1)
    def _():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "gh", "window",
                                             "softcap", "interpret"))
def _prefill(qh, k_cache, v_cache, kv_len, q_start, *, causal: bool,
             gh: int, window=None, softcap=None, interpret: bool = False):
    B, Hq, S, D = qh.shape
    T = k_cache.shape[2]
    TS = min(S, 512)
    TT = min(T, 512)
    ns, nt = S // TS, T // TT
    scale = 1.0 / float(D) ** 0.5

    kern = functools.partial(_kernel, nt=nt, ts=TS, tt=TT, gh=gh,
                             scale=scale, causal=causal, window=window,
                             softcap=softcap)
    ts, tt = TS, TT

    def kv_map(b, h, s, t, len_r, st_r):
        # Clamp the T coordinate to the last LIVE tile for this
        # (sequence, S-tile): dead tiles (beyond kv_len, or beyond the
        # causal frontier) revisit the previous block index, and Pallas
        # skips the duplicate fetch — so KV traffic follows the causal
        # triangle / the valid prefix instead of the whole preallocated
        # T axis (the kernel already skipped their COMPUTE via
        # @pl.when(live); this skips their DMA too).
        lim = len_r[b]
        if causal:
            q_last = st_r[b] + s * ts + ts - 1
            lim = jnp.minimum(lim, q_last + 1)
        last = jnp.maximum(jax.lax.div(lim + tt - 1, tt) - 1, 0)
        tq = jnp.minimum(t, last)
        if window is not None and causal:
            # ...and below the window: clamp up to the first live tile.
            q_first = st_r[b] + s * ts
            first = jnp.maximum(jax.lax.div(q_first - window + 1, tt), 0)
            tq = jnp.maximum(tq, jnp.minimum(first, last))
        return (b, h // gh, tq, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hq, ns, nt),
        in_specs=[
            pl.BlockSpec((1, 1, TS, D),
                         lambda b, h, s, t, len_r, st_r: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TT, D), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TT, D), kv_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TS, D),
                               lambda b, h, s, t, len_r, st_r: (b, h, s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TS, 128), jnp.float32),
            pltpu.VMEM((TS, 128), jnp.float32),
            pltpu.VMEM((TS, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, S, D), qh.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * S * T * D,
            bytes_accessed=(B * Hq * S * D * 2 + 2 * B * (Hq // gh) * T * D
                            * 2 * nt),
            transcendentals=B * Hq * S * T),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), q_start.astype(jnp.int32),
      qh, k_cache, v_cache)


@functools.partial(jax.jit, static_argnames=("causal", "gh", "window",
                                             "softcap", "interpret"))
def _prefill_stacked(qh, k_stack, v_stack, kv_len, q_start, idx,
                     k_scale=None, v_scale=None, *,
                     causal: bool, gh: int, window=None, softcap=None,
                     interpret: bool = False):
    """Stacked-cache prefill: k/v_stack [L, B, Hkv, T, D], layer `idx`
    read straight from the stacked HBM array via scalar prefetch — the
    prefill counterpart of the decode kernels' layer indexing. Keeps
    the whole cache in the layer-scan carry: slicing layer i out first
    costs a full per-layer cache copy plus write-back per layer
    (measured ~5 ms of a 55 ms 7B S=512 prefill). uint8 (fp8) stacks
    decode in-kernel via _load_kv; int8 stacks pass their
    k_scale/v_scale planes [L, B, Hkv, T] f32."""
    B, Hq, S, D = qh.shape
    T = k_stack.shape[3]
    TS = min(S, 512)
    TT = min(T, 512)
    ns, nt = S // TS, T // TT
    scale = 1.0 / float(D) ** 0.5
    scaled = k_scale is not None

    base = functools.partial(_kernel, nt=nt, ts=TS, tt=TT, gh=gh,
                             scale=scale, causal=causal, window=window,
                             softcap=softcap, stacked=True, scaled=scaled)

    def kern(len_ref, start_ref, idx_ref, *rest):
        # The layer id is consumed by the BlockSpec index maps only.
        base(len_ref, start_ref, *rest)
    ts, tt = TS, TT

    def kv_map(b, h, s, t, len_r, st_r, idx_r):
        # Same live-tile clamping as the per-layer path (dead tiles
        # revisit the previous block index so their DMA is skipped),
        # plus the prefetched layer coordinate.
        lim = len_r[b]
        if causal:
            q_last = st_r[b] + s * ts + ts - 1
            lim = jnp.minimum(lim, q_last + 1)
        last = jnp.maximum(jax.lax.div(lim + tt - 1, tt) - 1, 0)
        tq = jnp.minimum(t, last)
        if window is not None and causal:
            q_first = st_r[b] + s * ts
            first = jnp.maximum(jax.lax.div(q_first - window + 1, tt), 0)
            tq = jnp.maximum(tq, jnp.minimum(first, last))
        return (idx_r[0], b, h // gh, tq, 0)

    Hkv = k_stack.shape[2]
    in_specs = [
        pl.BlockSpec((1, 1, TS, D),
                     lambda b, h, s, t, len_r, st_r, idx_r:
                     (b, h, s, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, TT, D), kv_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, TT, D), kv_map,
                     memory_space=pltpu.VMEM),
    ]
    ops = (qh, k_stack, v_stack)
    if scaled:
        # Whole [Hkv, T] scale plane per (layer, b) — the block's last
        # two dims equal the array dims (Mosaic requirement); rows are
        # sliced per (head, T-tile) in-kernel.
        sc_spec = pl.BlockSpec((1, 1, Hkv, T),
                               lambda b, h, s, t, len_r, st_r, idx_r:
                               (idx_r[0], b, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [sc_spec, sc_spec]
        ops = ops + (k_scale, v_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hq, ns, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, TS, D),
                               lambda b, h, s, t, len_r, st_r, idx_r:
                               (b, h, s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TS, 128), jnp.float32),
            pltpu.VMEM((TS, 128), jnp.float32),
            pltpu.VMEM((TS, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, S, D), qh.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * S * T * D,
            bytes_accessed=(B * Hq * S * D * 2 + 2 * B * (Hq // gh) * T * D
                            * k_stack.dtype.itemsize * nt),
            transcendentals=B * Hq * S * T),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), q_start.astype(jnp.int32),
      jnp.asarray(idx, jnp.int32).reshape(1), *ops)


def prefill_eligible(S: int, T: int, D: int, Hq: int, Hkv: int) -> bool:
    """Shape eligibility shared by both prefill kernel layouts —
    consulted by prefill_pallas below (models do NOT call this;
    ineligible shapes fall to the jnp reference via the dispatch and
    keep the stacked cache whole regardless)."""
    if Hq % Hkv or D % 64:
        return False
    TS, TT = min(S, 512), min(T, 512)
    return not (S % TS or T % TT or S < 8)


def prefill_pallas(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   causal: bool = True,
                   positions: Optional[jax.Array] = None,
                   kv_len: Optional[jax.Array] = None,
                   q_start: Optional[jax.Array] = None,
                   window: Optional[int] = None,
                   softcap: Optional[float] = None,
                   layer_index=None, k_scale=None, v_scale=None,
                   interpret: bool = False) -> Optional[jax.Array]:
    """q: [B, S, Hq, D]; k/v: [B, Hkv, T, D] -> [B, S, Hq, D] or None.
    With `layer_index`, k/v are the stacked [L, B, Hkv, T, D] cache and
    the kernel reads layer `layer_index` directly from HBM — including
    compressed caches: uint8 (raw e4m3 bits) decodes in-kernel, int8
    passes its per-token scale planes via k_scale/v_scale
    ([L, B, Hkv, T] f32).

    Positions must be contiguous per sequence: query s at position
    q_start[b] + s. Callers with arbitrary `positions` must pass
    q_start=positions[:, 0] only when positions are contiguous (the
    model's prefill path always is); otherwise the jnp reference runs.
    """
    B, S, Hq, D = q.shape
    stacked = layer_index is not None
    Hkv = k.shape[2] if stacked else k.shape[1]
    T = k.shape[3] if stacked else k.shape[2]
    if not prefill_eligible(S, T, D, Hq, Hkv):
        return None
    if (k.dtype == jnp.int8) != (k_scale is not None):
        return None            # int8 needs scales; scales need int8
    if k_scale is not None and not stacked:
        return None            # scale planes ride the stacked layout
    if k.dtype in (jnp.uint8, jnp.int8) and not stacked:
        return None            # per-layer compressed: jnp ref dequants
    if q_start is None:
        if positions is not None:
            return None                 # can't prove contiguity; fall back
        q_start = jnp.zeros((B,), jnp.int32)
    if kv_len is None:
        kv_len = jnp.full((B,), T, jnp.int32)
    if window is not None and not causal:
        return None                     # windowed non-causal: jnp ref
    qh = q.transpose(0, 2, 1, 3)                       # [B, Hq, S, D]
    if stacked:
        out = _prefill_stacked(qh, k, v, kv_len, q_start, layer_index,
                               k_scale, v_scale,
                               causal=causal, gh=Hq // Hkv, window=window,
                               softcap=softcap, interpret=interpret)
    else:
        out = _prefill(qh, k, v, kv_len, q_start, causal=causal,
                       gh=Hq // Hkv, window=window, softcap=softcap,
                       interpret=interpret)
    return out.transpose(0, 2, 1, 3)
