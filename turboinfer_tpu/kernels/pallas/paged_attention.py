"""Paged decode attention: block-table indirection inside the kernel.

Companion to engine/paged_cache.py (vLLM-style pool of fixed-size token
pages + per-sequence block tables). Grid (B,); each cell walks the
sequence's block table with ONE multi-buffered `make_async_copy` loop
over the flattened (kv_head, page) space — Hkv * ceil(kv_len[b] / page)
trips. Only pages that hold tokens are ever DMA'd, so decode cost
scales with the ACTUAL context, not the pool size or max_pages (a
BlockSpec-pipelined page axis fetches every table entry regardless of
kv_len), and flattening heads into the one pipelined loop keeps the
copies back-to-back instead of paying DMA latency per (b, head) grid
cell — see decode_attention.py's module docstring for both
measurements.

The pool is STACKED over layers [L, P, Hkv, page, D] and the layer id
arrives by scalar prefetch (slicing the layer outside would materialize
a full-pool copy per layer per step). Online softmax state lives in
VMEM scratch; the jnp reference is ops.attention_paged_decode_ref.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turboinfer_tpu.kernels.pallas.decode_attention import _load_kv

NEG_INF = -1e30
# Pages are small DMAs (page=64, D=128 -> 16 KB); measured NBUF 4 vs 12
# identical at 7B B=8 short fills (step is qmm-dominated there), so
# keep the shallower queue. Env-tunable for long-context paged serving.
import os
NBUF = int(os.environ.get("TURBOINFER_PAGED_NBUF", "4"))


def _kernel(idx_ref, len_ref, table_ref, q_ref, k_hbm, v_hbm, *rest,
            hkv: int, page: int, scale: float,
            window: Optional[int] = None, softcap: Optional[float] = None,
            scaled: bool = False, g_tokens: int = 1, ghp: int = 8):
    """One sequence b: stream Hkv * ceil(kv_len/page) pages through NBUF
    VMEM buffers; trip t covers page (t % npages) of kv head
    (t // npages), folding into that head's online-softmax state.

    With a sliding `window` only the pages covering positions
    [max(kv_len - window, 0), kv_len) are streamed (the query is at
    kv_len - 1), so windowed decode cost is bounded by the window, not
    the context. `softcap` applies Gemma2-style tanh score capping.

    idx_ref: [1] layer id; len_ref: [B] valid lengths; table_ref:
    [B, max_pages] page ids (scalar prefetch, pre-clamped in range).
    q_ref: [1, Hkv, G*Ghp, D]; k_hbm/v_hbm: [L, P, Hkv, page, D] HBM;
    kbuf/vbuf: [NBUF, page, D] VMEM scratch; m/l: [G*Ghp, 128],
    acc: [G*Ghp, D] f32 scratch (reused head to head).

    g_tokens > 1 (speculative VERIFY): the query tile packs G tokens'
    head groups along the sublane axis (token g owns rows
    [g*ghp, (g+1)*ghp)); query g sits at global position
    kv_len - G + g and the causal mask offsets per row — the sequence
    prefix streams ONCE for all G queries (the whole point of a
    (k+1)-wide verify vs k+1 decode steps).

    `scaled` (int8 pools): ks/vs_hbm [L, P, Hkv, page] f32 per-token
    scales stream as whole [Hkv, page] planes per page (a per-head
    [page] HBM slice is a 1-sublane memref_slice Mosaic rejects);
    dequant multiplies ride the [Ghp, page] score/prob tiles — same
    algebra as the contiguous int8 decode kernel (decode_attention).
    """
    if scaled:
        (ks_hbm, vs_hbm, o_ref, kbuf, vbuf, ksem, vsem,
         ksbuf, vsbuf, kssem, vssem, m_ref, l_ref, acc_ref) = rest
    else:
        (o_ref, kbuf, vbuf, ksem, vsem, m_ref, l_ref, acc_ref) = rest
    b = pl.program_id(0)
    li = idx_ref[0]
    kv_len = len_ref[b]
    # window start of the EARLIEST query (position kv_len - g_tokens)
    lo = (jnp.maximum(kv_len - g_tokens + 1 - window, 0)
          if window is not None else 0)
    i0 = jax.lax.div(lo, page) if window is not None else 0
    npages = jax.lax.div(kv_len + page - 1, page) - i0   # >= 1 (kv_len >= 1)
    ntrips = hkv * npages

    def start(t):
        h = jax.lax.div(t, npages)
        i = i0 + jax.lax.rem(t, npages)
        slot = jax.lax.rem(t, NBUF)
        pid = table_ref[b, i]
        pltpu.make_async_copy(
            k_hbm.at[li, pid, h], kbuf.at[slot], ksem.at[slot]).start()
        pltpu.make_async_copy(
            v_hbm.at[li, pid, h], vbuf.at[slot], vsem.at[slot]).start()
        if scaled:
            pltpu.make_async_copy(
                ks_hbm.at[li, pid], ksbuf.at[slot],
                kssem.at[slot]).start()
            pltpu.make_async_copy(
                vs_hbm.at[li, pid], vsbuf.at[slot],
                vssem.at[slot]).start()

    def prime(t, _):
        @pl.when(t < ntrips)
        def _():
            start(t)
        return 0
    jax.lax.fori_loop(0, NBUF - 1, prime, 0)

    def body(t, _):
        h = jax.lax.div(t, npages)
        r = jax.lax.rem(t, npages)
        i = i0 + r
        slot = jax.lax.rem(t, NBUF)

        @pl.when(t + NBUF - 1 < ntrips)
        def _():
            start(t + NBUF - 1)

        @pl.when(r == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        pltpu.make_async_copy(kbuf.at[slot], kbuf.at[slot],
                              ksem.at[slot]).wait()
        pltpu.make_async_copy(vbuf.at[slot], vbuf.at[slot],
                              vsem.at[slot]).wait()
        if scaled:
            pltpu.make_async_copy(ksbuf.at[slot], ksbuf.at[slot],
                                  kssem.at[slot]).wait()
            pltpu.make_async_copy(vsbuf.at[slot], vsbuf.at[slot],
                                  vssem.at[slot]).wait()
        q = q_ref[0, h].astype(jnp.float32) * scale  # [Ghp, D]
        k = _load_kv(kbuf[slot], jnp.float32)        # [page, D]
        v = _load_kv(vbuf[slot], jnp.float32)
        s = jax.lax.dot_general(                     # [Ghp, page]
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if scaled:
            s = s * ksbuf[slot, h][None, :]
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * page
        # per-row query position: row r belongs to token r // ghp at
        # global position kv_len - G + (r // ghp); G == 1 reduces to
        # the plain col < kv_len decode mask.
        qpos = (kv_len - g_tokens
                + jax.lax.div(jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 0), ghp))
        ok = col <= qpos
        if window is not None:
            ok = ok & (col > qpos - window)
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vsbuf[slot, h][None, :] if scaled else p
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(r == npages - 1)
        def _():
            denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
            o_ref[0, h] = (acc_ref[:] / denom).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ntrips, body, 0)


@functools.partial(jax.jit, static_argnames=("window", "softcap",
                                             "interpret", "g_tokens",
                                             "ghp"))
def _paged_decode(q4, k_pages, v_pages, table, kv_len, layer_idx,
                  k_scale=None, v_scale=None, *,
                  window=None, softcap=None, interpret: bool = False,
                  g_tokens: int = 1, ghp: int = 8):
    B, Hkv, GQ, D = q4.shape            # GQ = g_tokens * ghp
    P, page = k_pages.shape[1], k_pages.shape[3]
    scale = 1.0 / float(D) ** 0.5
    scaled = k_scale is not None

    # Clamp unassigned (-1) ids so any stray DMA still lands in-range
    # (only pages below ceil(kv_len/page) are ever fetched).
    table = jnp.clip(table, 0, P - 1).astype(jnp.int32)

    kern = functools.partial(_kernel, hkv=Hkv, page=page, scale=scale,
                             window=window, softcap=softcap,
                             scaled=scaled, g_tokens=g_tokens, ghp=ghp)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec((1, Hkv, GQ, D),
                     lambda b, idx, lr, tr: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        any_spec, any_spec,
    ]
    scratch = [
        pltpu.VMEM((NBUF, page, D), k_pages.dtype),
        pltpu.VMEM((NBUF, page, D), v_pages.dtype),
        pltpu.SemaphoreType.DMA((NBUF,)),
        pltpu.SemaphoreType.DMA((NBUF,)),
    ]
    ops = (q4, k_pages, v_pages)
    if scaled:
        in_specs += [any_spec, any_spec]
        scratch += [
            pltpu.VMEM((NBUF, Hkv, page), jnp.float32),
            pltpu.VMEM((NBUF, Hkv, page), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ]
        ops = ops + (k_scale, v_scale)
    scratch += [
        pltpu.VMEM((GQ, 128), jnp.float32),
        pltpu.VMEM((GQ, 128), jnp.float32),
        pltpu.VMEM((GQ, D), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, GQ, D),
                               lambda b, idx, lr, tr: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, GQ, D), q4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      kv_len.astype(jnp.int32), table, *ops)


def paged_decode_pallas(q: jax.Array, k_pages: jax.Array,
                        v_pages: jax.Array, block_table: jax.Array,
                        lengths: jax.Array, layer_index=None,
                        window: Optional[int] = None,
                        softcap: Optional[float] = None,
                        k_scale=None, v_scale=None,
                        interpret: bool = False) -> Optional[jax.Array]:
    """q: [B, Hq, D]; k/v_pages: [P, Hkv, page, D] (ONE layer's pages,
    layer_index=None) or the full stacked [L, P, Hkv, page, D] pool with
    `layer_index` the traced layer id; block_table: [B, max_pages];
    lengths: [B] -> [B, Hq, D] or None.

    Zero-length slots: the kernel's online-softmax loop runs
    ceil(kv_len/page) >= 1 trips and would leave o_ref unwritten for a
    kv_len == 0 row (garbage VMEM). Lengths are clamped to >= 1 here so
    inactive batch slots (a serving scheduler may carry them) produce a
    defined — if meaningless — row that the caller discards.
    """
    B, Hq, D = q.shape
    lengths = jnp.maximum(lengths, 1)
    if k_pages.dtype == jnp.float8_e4m3fn:
        # Kernel decodes e4m3 with integer math (see decode_attention).
        k_pages = jax.lax.bitcast_convert_type(k_pages, jnp.uint8)
        v_pages = jax.lax.bitcast_convert_type(v_pages, jnp.uint8)
    if (k_pages.dtype == jnp.int8) != (k_scale is not None):
        return None            # int8 needs scales; scales need int8
    if layer_index is None:
        k_pages = k_pages[None]
        v_pages = v_pages[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer_index = 0
    Hkv, page = k_pages.shape[2], k_pages.shape[3]
    if Hq % Hkv or D % 64 or page % 8:
        return None
    if D % 128 and not interpret:
        return None            # Mosaic: memref_slice of the HBM pool
                               # needs the sliced D axis lane-aligned
    if k_scale is not None and page % 128 and not interpret:
        return None            # int8 scale planes [Hkv, page]: Mosaic
                               # needs the minor (page) dim 128-aligned
                               # even when sliced whole; small-page int8
                               # pools take the jnp path (use page>=128
                               # — 256 is the measured sweet spot)
    Gh = Hq // Hkv
    Ghp = max(Gh, 8)
    q4 = q.reshape(B, Hkv, Gh, D)
    if Ghp != Gh:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, Ghp - Gh), (0, 0)))
    out = _paged_decode(q4, k_pages, v_pages, block_table, lengths,
                        layer_index, k_scale, v_scale,
                        window=window, softcap=softcap,
                        interpret=interpret, g_tokens=1, ghp=Ghp)
    return out[:, :, :Gh].reshape(B, Hq, D)


def paged_verify_pallas(q: jax.Array, k_pages: jax.Array,
                        v_pages: jax.Array, block_table: jax.Array,
                        lengths: jax.Array, layer_index=None,
                        window: Optional[int] = None,
                        softcap: Optional[float] = None,
                        k_scale=None, v_scale=None,
                        interpret: bool = False) -> Optional[jax.Array]:
    """Multi-query paged attention for speculative VERIFY: q
    [B, G, Hq, D] — the G chunk tokens' K/V are already written into
    their pages and `lengths` INCLUDES them (query g sits at position
    lengths - G + g; causal among the chunk). The sequence prefix
    streams once for all G queries. Same eligibility gates as
    paged_decode_pallas; returns [B, G, Hq, D] or None."""
    B, G, Hq, D = q.shape
    lengths = jnp.maximum(lengths, 1)
    if k_pages.dtype == jnp.float8_e4m3fn:
        k_pages = jax.lax.bitcast_convert_type(k_pages, jnp.uint8)
        v_pages = jax.lax.bitcast_convert_type(v_pages, jnp.uint8)
    if (k_pages.dtype == jnp.int8) != (k_scale is not None):
        return None
    if layer_index is None:
        k_pages = k_pages[None]
        v_pages = v_pages[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer_index = 0
    Hkv, page = k_pages.shape[2], k_pages.shape[3]
    if Hq % Hkv or D % 64 or page % 8:
        return None
    if D % 128 and not interpret:
        return None
    if k_scale is not None and page % 128 and not interpret:
        return None
    Gh = Hq // Hkv
    Ghp = max(Gh, 8)
    # token-major row packing: token g owns rows [g*Ghp, (g+1)*Ghp)
    q5 = q.reshape(B, G, Hkv, Gh, D).transpose(0, 2, 1, 3, 4)
    if Ghp != Gh:
        q5 = jnp.pad(q5, ((0, 0), (0, 0), (0, 0), (0, Ghp - Gh),
                          (0, 0)))
    q4 = q5.reshape(B, Hkv, G * Ghp, D)
    out = _paged_decode(q4, k_pages, v_pages, block_table, lengths,
                        layer_index, k_scale, v_scale,
                        window=window, softcap=softcap,
                        interpret=interpret, g_tokens=G, ghp=Ghp)
    out = out.reshape(B, Hkv, G, Ghp, D)[:, :, :, :Gh]
    return out.transpose(0, 2, 1, 3, 4).reshape(B, G, Hq, D)
