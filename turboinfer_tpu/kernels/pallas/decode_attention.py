"""Single-token KV-cache decode attention Pallas kernel.

The TPU-native replacement for the reference's
`attention_fast_incremental` (reference: src/core/tensor_engine.cpp
:1254-1388 — SIMD q·k dots + scalar softmax + weighted V sum). One
query per sequence attends to its head's contiguous [T, D] cache slab,
flash-style online softmax, scores never materialize beyond [Ghp, TT]
(SURVEY.md §7 hard part #2).

Streaming is MANUAL and length-aware: grid (B,) with ONE multi-buffered
`make_async_copy` loop per sequence over the flattened
(kv_head, chunk) space — Hkv * ceil(kv_len[b] / TT) trips.

Two measured traps shape this design:
  - A BlockSpec-pipelined T axis fetches every block of a preallocated
    cache whether or not it holds tokens (39→77 ms/step going
    T=1024→2048 at the same fill on 7B-int4 B=8). Hence the manual
    loop with a kv_len-derived trip count: decode cost scales with the
    ACTUAL context, not max_seq.
  - A grid cell per (b, kv_head) serializes the DMA latency of
    B * Hkv cells (measured 9.15 ms/step of a 18.6 ms step at B=8,
    Hkv=32, short fill — the dominant cost). Hence one cell per
    sequence with heads flattened into the pipelined loop.

Layout: cache is head-major, STACKED over layers [L, B, Hkv, T, D];
the layer id arrives by scalar prefetch (slicing layer i outside the
kernel materializes a full-layer copy + write-back per layer per step
— the same copy-insertion trap as scan-sliced weights, see qmm.py).
q is reshaped outside to [B, Hkv, Ghp, D], Ghp = q heads per kv head
padded up to 8 sublanes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# 8 buffers × 512-row chunks measured best in-model at 7B B=1 fill=960
# (kernel self-time 3.72 -> 1.07 ms/step, ~500 GB/s cache stream, vs
# ~144 GB/s at the original 4×128): deep enough to cover HBM latency,
# small enough to stay under ~2 MB VMEM. Beware: this kernel benches
# ~4x SLOWER in isolation than inside the decode scan (cold DMA
# pipeline per standalone call) — tune it in-model, not standalone.
import os
NBUF = int(os.environ.get("TURBOINFER_DECODE_NBUF", "8"))


def _chunk_rows(T: int) -> int:
    """KV chunk rows per DMA trip. Bigger chunks amortize per-trip DMA
    issue/semaphore cost (the dominant cost at long fills: 128-row
    trips move 32 KB each and the kernel runs at ~136 GB/s; 512-row
    trips reach ~3x that) at the price of up to TT-1 rows of over-fetch
    on the last chunk of each head. Measured at 7B (same-session
    pairs): fill 960 B=8 wants 1024 (bf16 20.2 -> 17.6 ms/step, int8
    20.0 -> 16.8), but fill 64 B=8 wants 512 (16.9 vs 17.9 — a
    TT-row chunk is always read WHOLE, so short fills pay the
    over-fetch). Default splits by max_seq: T <= 2048 keeps 512 (half
    of any trajectory sits below TT), longer contexts take 1024 where
    the big fills dominate total time. Clamped to divisors of T for
    the `pl.ds` window."""
    import os
    default = 512 if T <= 2048 else 1024
    pref = int(os.environ.get("TURBOINFER_DECODE_TT", str(default)))
    tt = min(T, pref)
    while T % tt:
        tt //= 2
    return max(tt, 1)


def e4m3_to_bf16(u8, out_dtype=jnp.bfloat16):
    """Software float8_e4m3fn -> bf16 on raw uint8 bit patterns.

    Mosaic's native fp8 astype is scalar-emulated (~20x slower than
    this); integer unpack + an exponent-bits bitcast run at VPU speed
    (same trick family as the int4 qmm dequant). Exact for all finite
    e4m3 codes incl. subnormals; the two NaN codes (S.1111.111) decode
    as +-480 — K/V caches never hold NaNs.

      normal   (e>0): (8+m) * 2^(e-10)
      subnormal(e=0):  m    * 2^(1-10)
    """
    qi = u8.astype(jnp.int32)
    sgn = qi >> 7
    e = (qi >> 3) & 0xF
    m = qi & 0x7
    mf = jnp.where(e == 0, m, m + 8).astype(jnp.float32)
    exp_sel = jnp.where(e == 0, 1, e)
    pow2 = jax.lax.bitcast_convert_type(
        (exp_sel + (127 - 10)) << 23, jnp.float32)
    val = mf * pow2
    val = jnp.where(sgn == 1, -val, val)
    return val.astype(out_dtype)


def _load_kv(buf_slice, out_dtype):
    """Read a K/V chunk at compute dtype: plain astype for bf16/f32
    caches, software e4m3 decode for fp8 caches (stored bitcast to
    uint8 — see decode_pallas)."""
    if buf_slice.dtype == jnp.uint8:
        return e4m3_to_bf16(buf_slice, out_dtype)
    return buf_slice.astype(out_dtype)


def _kernel(idx_ref, len_ref, q_ref, k_hbm, v_hbm, *rest,
            hkv: int, tt: int, scale: float, window=None,
            softcap=None, scaled: bool = False):
    """One sequence b: stream Hkv * ceil(kv_len/TT) cache chunks through
    NBUF VMEM buffers; trip t covers chunk (t % nchunks) of kv head
    (t // nchunks), folding into that head's online-softmax state.

    idx_ref: [1] layer id (scalar prefetch); len_ref: [B] valid lengths.
    q_ref: [1, Hkv, Ghp, D] VMEM; k_hbm/v_hbm: [L, B, Hkv, T, D] HBM;
    o_ref: [1, Hkv, Ghp, D]; kbuf/vbuf: [NBUF, TT, D] VMEM scratch;
    m/l: [Ghp, 128], acc: [Ghp, D] f32 scratch (reused head to head —
    heads complete in order).

    `scaled` (int8 cache): ks_hbm/vs_hbm are the per-token scale
    planes in the cache's own [L, B, Hkv, T] f32 layout (a per-chunk
    [TT] HBM slice would be a 1-sublane memref_slice, which Mosaic
    rejects, so no chunk-row reshape exists). The whole (layer, b)
    plane (Hkv*T*4 bytes) is DMA'd once at kernel start; trip (h, i)
    reads ksbuf[h, pl.ds(i*TT, TT)] by dynamic lane offset. The dequant multiplies
    ride the SMALL [Ghp, TT] tiles where the per-token scale is a
    natural lane broadcast: scores *= ks after the q @ k dot, probs
    *= vs before the p @ v dot (identical algebra to dequantizing
    k/v, ~D/Ghp x cheaper; the softmax denominator uses the UNSCALED
    probs). The i8->bf16 chunk cast is exact (|codes| <= 127 < 2^8
    mantissa bits).
    """
    if scaled:
        (ks_hbm, vs_hbm, o_ref, kbuf, vbuf, ksem, vsem,
         ksbuf, vsbuf, kssem, vssem, m_ref, l_ref, acc_ref) = rest
    else:
        (o_ref, kbuf, vbuf, ksem, vsem, m_ref, l_ref, acc_ref) = rest
    b = pl.program_id(0)
    li = idx_ref[0]
    kv_len = len_ref[b]
    if scaled:
        # One plane DMA up front; waited before the first trip uses it.
        pltpu.make_async_copy(ks_hbm.at[li, b], ksbuf, kssem).start()
        pltpu.make_async_copy(vs_hbm.at[li, b], vsbuf, vssem).start()
        pltpu.make_async_copy(ksbuf, ksbuf, kssem).wait()
        pltpu.make_async_copy(vsbuf, vsbuf, vssem).wait()
    # Sliding window: only chunks covering positions
    # [max(kv_len - window, 0), kv_len) are streamed; earlier cache
    # slots are dead for this query and never leave HBM.
    lo = jnp.maximum(kv_len - window, 0) if window is not None else 0
    c0 = jax.lax.div(lo, tt) if window is not None else 0
    nchunks = jax.lax.div(kv_len + tt - 1, tt) - c0  # >= 1 (kv_len >= 1)
    ntrips = hkv * nchunks
    # NOTE: a coarse+fine variant (tt-row bulk trips + 128-row tail
    # trips to bound over-fetch) measured 50% SLOWER at fill=960 —
    # the dual-width @pl.when body wrecks Mosaic's DMA pipelining.
    # Uniform chunks with tail masking win despite the over-fetch.

    def start(t):
        h = jax.lax.div(t, nchunks)
        i = c0 + jax.lax.rem(t, nchunks)
        slot = jax.lax.rem(t, NBUF)
        pltpu.make_async_copy(
            k_hbm.at[li, b, h, pl.ds(i * tt, tt)], kbuf.at[slot],
            ksem.at[slot]).start()
        pltpu.make_async_copy(
            v_hbm.at[li, b, h, pl.ds(i * tt, tt)], vbuf.at[slot],
            vsem.at[slot]).start()

    def prime(t, _):
        @pl.when(t < ntrips)
        def _():
            start(t)
        return 0
    jax.lax.fori_loop(0, NBUF - 1, prime, 0)

    def body(t, _):
        h = jax.lax.div(t, nchunks)
        ii = jax.lax.rem(t, nchunks)          # 0-based within the live run
        i = c0 + ii
        slot = jax.lax.rem(t, NBUF)

        @pl.when(t + NBUF - 1 < ntrips)
        def _():
            start(t + NBUF - 1)

        @pl.when(ii == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        pltpu.make_async_copy(kbuf.at[slot], kbuf.at[slot],
                              ksem.at[slot]).wait()
        pltpu.make_async_copy(vbuf.at[slot], vbuf.at[slot],
                              vsem.at[slot]).wait()
        # k/v feed the MXU at the QUERY dtype (bf16): a no-op cast for
        # bf16 caches, software e4m3 decode for fp8 caches, an exact
        # i8 cast for int8 (dequant rides the score/prob tiles).
        # Scores/softmax state stay f32; only the probabilities are
        # rounded to bf16 for the p @ v dot (standard flash-attention
        # practice).
        s = scale * jax.lax.dot_general(             # [Ghp, TT] f32
            q_ref[0, h], _load_kv(kbuf[slot], q_ref.dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if scaled:
            s = s * ksbuf[h, pl.ds(i * tt, tt)][None, :]
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * tt
        valid = col < kv_len
        if window is not None:
            valid = jnp.logical_and(valid, col >= lo)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, 0:1]                       # [Ghp, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                       # [Ghp, TT]
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vsbuf[h, pl.ds(i * tt, tt)][None, :] if scaled else p
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv.astype(q_ref.dtype), _load_kv(vbuf[slot], q_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(ii == nchunks - 1)
        def _():
            denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
            o_ref[0, h] = (acc_ref[:] / denom).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ntrips, body, 0)


def _kernel_wh(idx_ref, len_ref, q_ref, k_hbm, v_hbm, *rest,
               hkv: int, ghp: int, tt: int, scale: float, nbuf: int,
               window=None, softcap=None, scaled: bool = False):
    """WHOLE-HEAD variant: each DMA trip fetches the [Hkv, TT, D] slab
    of one chunk for ALL kv heads (strided HBM read), so a layer is
    2*ceil(kv_len/TT) trips instead of 2*Hkv*ceil(kv_len/TT). At B=1
    the per-trip issue cost dominates the baseline kernel (32 trips x
    ~1 us vs 4 MB of payload); this variant is DMA-payload-bound.
    Online-softmax state is per head ([Hkv*Ghp, ...] scratch) because
    trips are chunk-major."""
    if scaled:
        (ks_hbm, vs_hbm, o_ref, kbuf, vbuf, ksem, vsem,
         ksbuf, vsbuf, kssem, vssem, m_ref, l_ref, acc_ref) = rest
    else:
        (o_ref, kbuf, vbuf, ksem, vsem, m_ref, l_ref, acc_ref) = rest
    b = pl.program_id(0)
    li = idx_ref[0]
    kv_len = len_ref[b]
    if scaled:
        pltpu.make_async_copy(ks_hbm.at[li, b], ksbuf, kssem).start()
        pltpu.make_async_copy(vs_hbm.at[li, b], vsbuf, vssem).start()
        pltpu.make_async_copy(ksbuf, ksbuf, kssem).wait()
        pltpu.make_async_copy(vsbuf, vsbuf, vssem).wait()
    lo = jnp.maximum(kv_len - window, 0) if window is not None else 0
    c0 = jax.lax.div(lo, tt) if window is not None else 0
    nchunks = jax.lax.div(kv_len + tt - 1, tt) - c0

    def start(t):
        i = c0 + t
        slot = jax.lax.rem(t, nbuf)
        pltpu.make_async_copy(
            k_hbm.at[li, b, :, pl.ds(i * tt, tt)], kbuf.at[slot],
            ksem.at[slot]).start()
        pltpu.make_async_copy(
            v_hbm.at[li, b, :, pl.ds(i * tt, tt)], vbuf.at[slot],
            vsem.at[slot]).start()

    def prime(t, _):
        @pl.when(t < nchunks)
        def _():
            start(t)
        return 0
    jax.lax.fori_loop(0, nbuf - 1, prime, 0)

    def body(t, _):
        i = c0 + t
        slot = jax.lax.rem(t, nbuf)

        @pl.when(t + nbuf - 1 < nchunks)
        def _():
            start(t + nbuf - 1)

        @pl.when(t == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        pltpu.make_async_copy(kbuf.at[slot], kbuf.at[slot],
                              ksem.at[slot]).wait()
        pltpu.make_async_copy(vbuf.at[slot], vbuf.at[slot],
                              vsem.at[slot]).wait()
        col1 = jax.lax.broadcasted_iota(jnp.int32, (ghp, tt), 1) + i * tt
        valid = col1 < kv_len
        if window is not None:
            valid = jnp.logical_and(valid, col1 >= lo)
        for h in range(hkv):
            hs = slice(h * ghp, (h + 1) * ghp)
            s = scale * jax.lax.dot_general(          # [Ghp, TT] f32
                q_ref[0, h], _load_kv(kbuf[slot, h], q_ref.dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if scaled:
                s = s * ksbuf[h, pl.ds(i * tt, tt)][None, :]
            if softcap is not None:
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            s = jnp.where(valid, s, NEG_INF)
            m_prev = m_ref[hs, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = (l_ref[hs, 0:1] * alpha
                     + jnp.sum(p, axis=1, keepdims=True))
            pv = (p * vsbuf[h, pl.ds(i * tt, tt)][None, :]
                  if scaled else p)
            acc_ref[hs] = acc_ref[hs] * alpha + jax.lax.dot_general(
                pv.astype(q_ref.dtype), _load_kv(vbuf[slot, h],
                                                 q_ref.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[hs] = jnp.broadcast_to(m_new, (ghp, 128))
            l_ref[hs] = jnp.broadcast_to(l_new, (ghp, 128))

        @pl.when(t == nchunks - 1)
        def _():
            for h in range(hkv):
                hs = slice(h * ghp, (h + 1) * ghp)
                denom = jnp.maximum(l_ref[hs, 0:1], 1e-30)
                o_ref[0, h] = (acc_ref[hs] / denom).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


@functools.partial(jax.jit, static_argnames=("window", "softcap",
                                             "interpret"))
def _decode(q4, k_cache, v_cache, kv_len, layer_idx, k_scale=None,
            v_scale=None, *, window=None, softcap=None,
            interpret: bool = False):
    B, Hkv, Ghp, D = q4.shape
    T = k_cache.shape[3]
    TT = _chunk_rows(T)
    scale = 1.0 / float(D) ** 0.5
    scaled = k_scale is not None

    # Whole-head chunk fetches (TURBOINFER_DECODE_WH=1, default OFF):
    # one [Hkv, TT, D] strided DMA per (chunk, k/v) — 2*nchunks
    # trips/layer instead of 2*Hkv*nchunks. MEASURED NEUTRAL-TO-WORSE
    # in-process at 7B MHA (tt_wh=256 under the 16 MB scoped-VMEM cap):
    # B=1 fill-64 8.25 vs 8.25, B=1 fill-960 8.46 vs 8.64, B=8 fill-64
    # 12.52 vs 12.73, B=8 fill-960 16.42 vs 16.53 ms/step (per-head vs
    # whole-head; cross-PROCESS runs had shown phantom +-10% "wins" —
    # the chip's speed drifts between process launches). The per-head
    # kernel's trips pipeline well enough; kept as a measured variant.
    wh = os.environ.get("TURBOINFER_DECODE_WH", "0") == "1"
    # Scoped VMEM is hard-limited to 16 MB: size the whole-head chunk
    # so 2 double-buffered K+V slabs (+ scale planes/state) fit in
    # ~11 MB. MHA Hkv=32 lands on TT=256, GQA Hkv=8 on TT=512+.
    nbuf_wh = 2
    budget = 11 << 20
    tt_wh = min(TT, max(budget // (2 * 2 * Hkv * D
                                   * k_cache.dtype.itemsize), 1))
    tt_wh = 1 << (tt_wh.bit_length() - 1)      # power of two
    while tt_wh > 1 and T % tt_wh:
        tt_wh //= 2
    if wh and tt_wh >= 128:
        kern = functools.partial(_kernel_wh, hkv=Hkv, ghp=Ghp, tt=tt_wh,
                                 scale=scale, nbuf=nbuf_wh,
                                 window=window, softcap=softcap,
                                 scaled=scaled)
        buf_shape = (nbuf_wh, Hkv, tt_wh, D)
        state_rows = Hkv * Ghp
    else:
        kern = functools.partial(_kernel, hkv=Hkv, tt=TT, scale=scale,
                                 window=window, softcap=softcap,
                                 scaled=scaled)
        buf_shape = (NBUF, TT, D)
        state_rows = Ghp
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec((1, Hkv, Ghp, D),
                     lambda b, idx, len_ref: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        any_spec, any_spec,
    ]
    scratch = [
        pltpu.VMEM(buf_shape, k_cache.dtype),
        pltpu.VMEM(buf_shape, v_cache.dtype),
        pltpu.SemaphoreType.DMA((buf_shape[0],)),
        pltpu.SemaphoreType.DMA((buf_shape[0],)),
    ]
    ops = (q4, k_cache, v_cache)
    if scaled:
        # The whole (layer, b) scale plane [Hkv, T] is one aligned DMA
        # (a per-chunk [TT] HBM slice would be a 1-sublane memref_slice
        # Mosaic rejects; an XLA-side reshape to chunk rows copied the
        # full [L,B,Hkv,T] arrays every layer — 2.9 ms/step measured).
        in_specs += [any_spec, any_spec]
        scratch += [
            pltpu.VMEM((Hkv, T), jnp.float32),
            pltpu.VMEM((Hkv, T), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
        ops = ops + (k_scale, v_scale)
    scratch += [
        pltpu.VMEM((state_rows, 128), jnp.float32),
        pltpu.VMEM((state_rows, 128), jnp.float32),
        pltpu.VMEM((state_rows, D), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, Ghp, D),
                               lambda b, idx, len_ref: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Ghp, D), q4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * Ghp * T * D,
            bytes_accessed=2 * B * Hkv * T * D * k_cache.dtype.itemsize
            + (8 * B * Hkv * T if scaled else 0),
            transcendentals=B * Hkv * Ghp * T),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      kv_len.astype(jnp.int32), *ops)


def decode_pallas(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                  kv_len: jax.Array, layer_index=None, window=None,
                  softcap=None, k_scale=None, v_scale=None,
                  interpret: bool = False) -> Optional[jax.Array]:
    """q: [B, Hq, D]; k/v_cache: [B, Hkv, T, D] (layer_index=None) or the
    full stacked [L, B, Hkv, T, D] with `layer_index` the traced layer
    id; kv_len: [B] -> [B, Hq, D] or None if not kernel-eligible.
    k_scale/v_scale: per-token scales for int8 caches ([..., Hkv, T]
    f32, same leading layout as the cache)."""
    B, Hq, D = q.shape
    # kv_len == 0 rows would run zero DMA trips and return garbage
    # VMEM (NaN on TPU, finite on the jnp fallback — a silent
    # TPU/CPU trajectory divergence); clamp like paged_decode_pallas
    # does for inactive serving slots.
    kv_len = jnp.maximum(kv_len, 1)
    if k_cache.dtype == jnp.float8_e4m3fn:
        # Free reinterpret: the kernel decodes e4m3 with integer math
        # (e4m3_to_bf16) — Mosaic's native fp8 casts are scalar-emulated
        # and ~20x slower.
        k_cache = jax.lax.bitcast_convert_type(k_cache, jnp.uint8)
        v_cache = jax.lax.bitcast_convert_type(v_cache, jnp.uint8)
    if (k_cache.dtype == jnp.int8) != (k_scale is not None):
        return None            # int8 needs scales; scales need int8
    if layer_index is None:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer_index = 0
    Hkv, T = k_cache.shape[2], k_cache.shape[3]
    if Hq % Hkv or D % 64:
        return None            # blocks cover the full D axis
    if D % 128 and not interpret:
        return None            # Mosaic: memref_slice of the HBM cache
                               # needs the sliced D axis lane-aligned
                               # (128); D=64 models take the jnp path
    if k_scale is not None and 2 * Hkv * T * 4 > 6 * 1024 * 1024:
        return None            # int8 scale planes are held whole in
                               # VMEM; absurd Hkv*T falls back to jnp
    Gh = Hq // Hkv
    Ghp = max(Gh, 8)
    # [B, Hq, D] -> [B, Hkv, Gh, D], pad group axis to >= 8 sublanes.
    q4 = q.reshape(B, Hkv, Gh, D)
    if Ghp != Gh:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, Ghp - Gh), (0, 0)))
    out = _decode(q4, k_cache, v_cache, kv_len, layer_index,
                  k_scale, v_scale,
                  window=window, softcap=softcap, interpret=interpret)
    return out[:, :, :Gh].reshape(B, Hq, D)


# ---------------------------------------------------------------------------
# Fused-head-layout decode kernel: cache [L, B, T, Hkv*D].
#
# Mosaic cannot DMA a head-major [T, D] slab whose D is not lane-aligned
# (128), which locks every D in {32, 64, 96} model (tiny fixtures, GPT-2,
# Qwen2-0.5B, Phi-3) out of decode_pallas. Packing all kv heads into the
# lane dimension (HD = Hkv*D, HD % 128 == 0) makes every DMA and every
# MXU operand lane-aligned, and ONE pass over the T axis serves all
# heads:
#   scores  s[j, t] = sum_hd Qbd[j, hd] * K[t, hd]      (one dot)
# where Qbd is the BLOCK-DIAGONAL query: Qbd[j, kvh(j)*D + d] = q[j, d],
# zero elsewhere — the zeros cancel other heads' lanes, so no in-kernel
# lane split is ever needed. The p @ V dot computes the full cross-head
# [Hq, HD] accumulator and the caller extracts the block diagonal
# outside; the extra MXU flops are ~2*Hq per cache byte, far under the
# v5e ~240 flops/byte roofline ratio, so the kernel stays
# bandwidth-bound like the head-major one.
# ---------------------------------------------------------------------------

def _fused_chunk_rows(T: int, HD: int, itemsize: int) -> int:
    """Rows per DMA trip for [tt, HD] chunks: target ~128 KB per buffer
    (the head-major kernel's measured sweet spot is 512 rows x 128
    lanes), clamped to divisors of T."""
    import os
    target = int(os.environ.get("TURBOINFER_DECODE_FUSED_BYTES",
                                str(128 * 1024)))
    # Largest power of two <= target rows: keeps the slice sublane-
    # aligned (Mosaic needs multiples of 8) and dividing any pow2 T.
    tt = 1 << max(8, target // max(HD * itemsize, 1)).bit_length() - 1
    tt = min(tt, T)
    while T % tt:
        tt //= 2
    return max(tt, 8)


def _fused_kernel(idx_ref, len_ref, qbd_ref, *rest,
                  tt: int, scale: float, window=None, softcap=None,
                  has_sinks: bool = False, scaled: bool = False):
    """One sequence b: stream ceil(kv_len/tt) fused-lane cache chunks
    through NBUF VMEM buffers — one trip space covers ALL kv heads.

    idx_ref: [1] layer id; len_ref: [B]; qbd_ref: [1, Hqp, HD] VMEM
    (block-diagonal); optional sinks_ref [Hqp, 128] f32 (per-q-head
    attention-sink logits, GPT-OSS: the online softmax initializes
    m0 = sink, l0 = exp(sink - m0) = 1, empty accumulator — exactly
    softmax([scores, sink]) with the sink position dropped);
    k_hbm/v_hbm: [L, B, T, HD] HBM; o_ref: [1, Hqp, HD];
    kbuf/vbuf: [NBUF, tt, HD]; m/l: [Hqp, 128], acc: [Hqp, HD] f32.

    `scaled` (int8 cache): per-token-head scales live in [L, B, Hkv, T]
    planes (a [T, Hkv] minor layout would be a sub-128-lane memref
    Mosaic rejects); the whole (layer, b) plane is one DMA up front.
    Per chunk, the per-QUERY-head scale row is ONE tiny dot
    m1[Hqp, Hkv] @ ks[:, chunk] (m1 = the q-head -> kv-head one-hot):
    scores *= that, probs *= the v version before p @ v. The v-side
    multiply scales row j by vs[t, kvh(j)], which is correct exactly
    on the lanes the caller's block-diagonal extraction keeps.
    """
    off = 0
    if has_sinks:
        sinks_ref = rest[off]; off += 1
    if scaled:
        m1_ref, ks_hbm, vs_hbm = rest[off:off + 3]; off += 3
    k_hbm, v_hbm, o_ref, kbuf, vbuf, ksem, vsem = rest[off:off + 7]
    off += 7
    if scaled:
        ksbuf, vsbuf, kssem, vssem = rest[off:off + 4]; off += 4
    m_ref, l_ref, acc_ref = rest[off:off + 3]
    b = pl.program_id(0)
    li = idx_ref[0]
    kv_len = len_ref[b]
    lo = jnp.maximum(kv_len - window, 0) if window is not None else 0
    c0 = jax.lax.div(lo, tt) if window is not None else 0
    nchunks = jax.lax.div(kv_len + tt - 1, tt) - c0   # >= 1 (kv_len >= 1)
    if scaled:
        pltpu.make_async_copy(ks_hbm.at[li, b], ksbuf, kssem).start()
        pltpu.make_async_copy(vs_hbm.at[li, b], vsbuf, vssem).start()
        pltpu.make_async_copy(ksbuf, ksbuf, kssem).wait()
        pltpu.make_async_copy(vsbuf, vsbuf, vssem).wait()

    def start(t):
        i = c0 + t
        slot = jax.lax.rem(t, NBUF)
        pltpu.make_async_copy(
            k_hbm.at[li, b, pl.ds(i * tt, tt)], kbuf.at[slot],
            ksem.at[slot]).start()
        pltpu.make_async_copy(
            v_hbm.at[li, b, pl.ds(i * tt, tt)], vbuf.at[slot],
            vsem.at[slot]).start()

    def prime(t, _):
        @pl.when(t < nchunks)
        def _():
            start(t)
        return 0
    jax.lax.fori_loop(0, NBUF - 1, prime, 0)

    if has_sinks:
        m_ref[:] = sinks_ref[:]
        l_ref[:] = jnp.ones_like(l_ref)
    else:
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(t, _):
        i = c0 + t
        slot = jax.lax.rem(t, NBUF)

        @pl.when(t + NBUF - 1 < nchunks)
        def _():
            start(t + NBUF - 1)

        pltpu.make_async_copy(kbuf.at[slot], kbuf.at[slot],
                              ksem.at[slot]).wait()
        pltpu.make_async_copy(vbuf.at[slot], vbuf.at[slot],
                              vsem.at[slot]).wait()
        s = scale * jax.lax.dot_general(             # [Hqp, tt] f32
            qbd_ref[0], _load_kv(kbuf[slot], qbd_ref.dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if scaled:
            ks_q = jax.lax.dot_general(              # [Hqp, tt]
                m1_ref[:], ksbuf[:, pl.ds(i * tt, tt)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * ks_q
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * tt
        valid = col < kv_len
        if window is not None:
            valid = jnp.logical_and(valid, col >= lo)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if scaled:
            vs_q = jax.lax.dot_general(              # [Hqp, tt]
                m1_ref[:], vsbuf[:, pl.ds(i * tt, tt)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            pv = p * vs_q
        else:
            pv = p
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv.astype(qbd_ref.dtype), _load_kv(vbuf[slot], qbd_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [Hqp, HD] cross-head
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
    o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_dim", "window",
                                             "softcap", "interpret"))
def _decode_fused(qbd, k_cache, v_cache, kv_len, layer_idx, sinks=None,
                  m1=None, k_scale=None, v_scale=None, *,
                  head_dim: int, window=None, softcap=None,
                  interpret: bool = False):
    B, Hqp, HD = qbd.shape
    T = k_cache.shape[2]
    TT = _fused_chunk_rows(T, HD, k_cache.dtype.itemsize)
    scale = 1.0 / float(head_dim) ** 0.5
    has_sinks = sinks is not None
    scaled = k_scale is not None

    kern = functools.partial(_fused_kernel, tt=TT, scale=scale,
                             window=window, softcap=softcap,
                             has_sinks=has_sinks, scaled=scaled)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec((1, Hqp, HD),
                     lambda b, idx, len_ref: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qbd]
    if has_sinks:
        in_specs.append(pl.BlockSpec((Hqp, 128),
                                     lambda b, idx, len_ref: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(sinks)
    if scaled:
        Hkv = k_scale.shape[2]
        in_specs += [pl.BlockSpec((Hqp, Hkv),
                                  lambda b, idx, len_ref: (0, 0),
                                  memory_space=pltpu.VMEM),
                     any_spec, any_spec]
        args += [m1, k_scale, v_scale]
    in_specs += [any_spec, any_spec]
    args += [k_cache, v_cache]
    scratch = [
        pltpu.VMEM((NBUF, TT, HD), k_cache.dtype),
        pltpu.VMEM((NBUF, TT, HD), v_cache.dtype),
        pltpu.SemaphoreType.DMA((NBUF,)),
        pltpu.SemaphoreType.DMA((NBUF,)),
    ]
    if scaled:
        scratch += [
            pltpu.VMEM((k_scale.shape[2], T), jnp.float32),
            pltpu.VMEM((k_scale.shape[2], T), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    scratch += [
        pltpu.VMEM((Hqp, 128), jnp.float32),
        pltpu.VMEM((Hqp, 128), jnp.float32),
        pltpu.VMEM((Hqp, HD), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hqp, HD),
                               lambda b, idx, len_ref: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hqp, HD), qbd.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hqp * T * HD,
            bytes_accessed=2 * B * T * HD * k_cache.dtype.itemsize,
            transcendentals=B * Hqp * T),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      kv_len.astype(jnp.int32), *args)


def decode_fused_pallas(q: jax.Array, k_cache: jax.Array,
                        v_cache: jax.Array, kv_len: jax.Array,
                        layer_index=None, window=None, softcap=None,
                        sinks=None, k_scale=None, v_scale=None,
                        interpret: bool = False) -> Optional[jax.Array]:
    """Fused-head-layout decode attention.

    q: [B, Hq, D]; k/v_cache: [B, T, Hkv*D] (layer_index=None) or the
    stacked [L, B, T, Hkv*D] with `layer_index` the traced layer id;
    kv_len: [B]; sinks: optional [Hq] per-head attention-sink logits
    (GPT-OSS); k_scale/v_scale: int8-cache per-token scales
    ([..., Hkv, T] f32 — the HEAD-MAJOR plane layout even for the
    fused cache). Returns [B, Hq, D] or None if not kernel-eligible
    (requires (Hkv*D) % 128 == 0 and Hq % Hkv == 0).
    """
    B, Hq, D = q.shape
    if k_cache.dtype == jnp.float8_e4m3fn:
        k_cache = jax.lax.bitcast_convert_type(k_cache, jnp.uint8)
        v_cache = jax.lax.bitcast_convert_type(v_cache, jnp.uint8)
    if (k_cache.dtype == jnp.int8) != (k_scale is not None):
        return None            # int8 needs scales; scales need int8
    if layer_index is None:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer_index = 0
    HD = k_cache.shape[3]
    Hkv = HD // D
    if HD % 128 or Hkv * D != HD or Hq % Hkv:
        return None
    T = k_cache.shape[2]
    if T % 8:
        return None            # chunk rows must stay sublane-aligned
    if k_scale is not None and (T % 128 or 2 * Hkv * T * 4 > 6 * 1024 * 1024):
        return None            # scale planes: minor (T) dim 128-aligned,
                               # held whole in VMEM
    G = Hq // Hkv
    Hqp = max(8, -(-Hq // 8) * 8)
    # Block-diagonal query: Qbd[b, j, kvh(j)*D + d] = q[b, j, d].
    # (q heads j with the same kv head kvh(j) = j // G share a block.)
    M = jnp.repeat(jnp.eye(Hkv, dtype=q.dtype), G, axis=0)   # [Hq, Hkv]
    qbd = (q[:, :, None, :] * M[None, :, :, None]).reshape(B, Hq, HD)
    if Hqp != Hq:
        qbd = jnp.pad(qbd, ((0, 0), (0, Hqp - Hq), (0, 0)))
    sb = None
    if sinks is not None:
        sb = jnp.pad(sinks.astype(jnp.float32), (0, Hqp - Hq))
        sb = jnp.broadcast_to(sb[:, None], (Hqp, 128))
    m1 = None
    if k_scale is not None:
        m1 = jnp.pad(M.astype(jnp.float32), ((0, Hqp - Hq), (0, 0)))
    out = _decode_fused(qbd, k_cache, v_cache, kv_len, layer_index, sb,
                        m1, k_scale, v_scale,
                        head_dim=D, window=window, softcap=softcap,
                        interpret=interpret)
    # Extract the block diagonal of the cross-head [Hq, HD] accumulator:
    # head j's output lives in lanes [kvh(j)*D, kvh(j)*D + D).
    o4 = out[:, :Hq].reshape(B, Hq, Hkv, D)
    return jnp.einsum("bjhd,jh->bjd", o4, M.astype(o4.dtype))
