"""Fresh-prefill KV cache writer kernel.

XLA's scanned dynamic_update_slice for the prefill cache write measured
~58 us/layer on v5e (3.7 ms of a 53 ms 7B S=512 prefill) — an order of
magnitude over the raw byte cost of the [Hkv, S, D] slab. This kernel
writes the slab with one aliased pallas_call per array: the cache
buffer aliases input→output, the grid visits exactly the (b, h, s)
blocks being written, and untouched blocks (other layers, the T tail)
are never DMA'd. FRESH prefills only — writes land at T offset 0
(cache.length == 0), so block indices stay aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(li_ref, kv_ref, cache_ref, o_ref):
    # kv_ref: [1, 1, TS, D] block of the head-major new K/V;
    # o_ref: [1, 1, 1, TS, D] block of the stacked cache at layer
    # li_ref[0]. cache_ref is the aliased whole-cache operand (ANY
    # memory space, never read here).
    o_ref[0, 0, 0] = kv_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write(cache, new_hm, li_arr, *, interpret=False):
    L, B, Hkv, T, D = cache.shape
    S = new_hm.shape[2]
    TS = min(S, 512)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, S // TS),
        in_specs=[
            pl.BlockSpec((1, 1, TS, D),
                         lambda b, h, s, li_r: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TS, D),
                               lambda b, h, s, li_r: (li_r[0], b, h, s, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(li_arr, new_hm, cache)


def cache_write_fresh(cache, new_hm, layer_index, *, interpret=False):
    """Write `new_hm` [B, Hkv, S, D] into `cache` [L, B, Hkv, T, D] at
    layer `layer_index`, T offset 0. Returns the updated cache, or None
    when the shape doesn't fit the kernel (caller falls back to DUS)."""
    if cache.ndim != 5:
        return None            # fused-head 4-D layout: DUS fallback
    L, B, Hkv, T, D = cache.shape
    S = new_hm.shape[2]
    TS = min(S, 512)
    if (D % 128 or S % TS or T % TS or S > T
            or new_hm.dtype != cache.dtype):
        # S > T would clamp the out-of-range block indices and silently
        # drop the head of the prompt — fall back to the DUS, which
        # fails loudly for such shapes.
        return None
    li_arr = jnp.reshape(jnp.asarray(layer_index, jnp.int32), (1,))
    return _write(cache, new_hm, li_arr, interpret=interpret)
