"""Paged decode attention: block-table indirection inside the kernel.

Companion to engine/paged_cache.py (vLLM-style pool of fixed-size token
pages + per-sequence block tables). The kernel walks a sequence's pages
directly in HBM via scalar-prefetched block tables — no gather
materialization (the jnp reference gathers pages into a contiguous
cache first; this kernel is its fused equivalent).

Grid (B, Hkv, max_pages), page axis innermost; the BlockSpec index map
reads the page id for (b, i) from the prefetched table, so the DMA
fetches exactly the page the sequence uses. Pages past a sequence's
length are skipped (compute) and clamped to page 0 (DMA target stays
in range). Online softmax state in VMEM scratch, as in
decode_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(len_ref, table_ref, q_ref, k_ref, v_ref, o_ref,
            m_ref, l_ref, acc_ref, *, n_pages: int, page: int, scale: float):
    """len_ref: [B]; table_ref: [B, max_pages] page ids (scalar prefetch).
    q_ref: [1, 1, Ghp, D]; k_ref/v_ref: [1, 1, page, D] (the page chosen
    by the index map); o_ref: [1, 1, Ghp, D]."""
    b = pl.program_id(0)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kv_len = len_ref[b]

    @pl.when(i * page < kv_len)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale     # [Ghp, D]
        k = k_ref[0, 0]                                 # [page, D]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(q, k.astype(jnp.float32),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * page
        s = jnp.where(col < kv_len, s, NEG_INF)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == n_pages - 1)
    def _():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_decode(q4, k_pages, v_pages, table, kv_len, *,
                  interpret: bool = False):
    B, Hkv, Ghp, D = q4.shape
    P, page = k_pages.shape[0], k_pages.shape[2]
    n_pages = table.shape[1]
    scale = 1.0 / float(D) ** 0.5

    # Clamp unassigned (-1) ids so skipped pages still DMA in-range.
    table = jnp.clip(table, 0, P - 1).astype(jnp.int32)

    kern = functools.partial(_kernel, n_pages=n_pages, page=page,
                             scale=scale)

    def kv_map(b, h, i, lr, tr):
        # Clamp past-the-end page indices to the LAST valid page: Mosaic
        # skips the DMA when consecutive grid steps map to the same
        # block, so unused pool pages cost zero HBM bandwidth (without
        # this, decode streams the entire empty pool every step).
        last = jnp.maximum((lr[b] + page - 1) // page - 1, 0)
        return (tr[b, jnp.minimum(i, last)], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, n_pages),
        in_specs=[
            pl.BlockSpec((1, 1, Ghp, D),
                         lambda b, h, i, lr, tr: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page, D), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page, D), kv_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Ghp, D),
                               lambda b, h, i, lr, tr: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Ghp, 128), jnp.float32),
            pltpu.VMEM((Ghp, 128), jnp.float32),
            pltpu.VMEM((Ghp, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Ghp, D), q4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), table, q4, k_pages, v_pages)


def paged_decode_pallas(q: jax.Array, k_pages: jax.Array,
                        v_pages: jax.Array, block_table: jax.Array,
                        lengths: jax.Array,
                        interpret: bool = False) -> Optional[jax.Array]:
    """q: [B, Hq, D]; k/v_pages: [P, Hkv, page, D] (ONE layer's pages);
    block_table: [B, max_pages]; lengths: [B] -> [B, Hq, D] or None.
    """
    B, Hq, D = q.shape
    Hkv, page = k_pages.shape[1], k_pages.shape[2]
    if Hq % Hkv or D % 64 or page % 8:
        return None
    Gh = Hq // Hkv
    Ghp = max(Gh, 8)
    # kernel indexes pages as [P, Hkv, page, D] with a leading block of 1
    q4 = q.reshape(B, Hkv, Gh, D)
    if Ghp != Gh:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, Ghp - Gh), (0, 0)))
    out = _paged_decode(q4, k_pages, v_pages, block_table, lengths,
                        interpret=interpret)
    return out[:, :, :Gh].reshape(B, Hq, D)
