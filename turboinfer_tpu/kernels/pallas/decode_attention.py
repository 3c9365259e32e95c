"""Single-token KV-cache decode attention Pallas kernel.

The TPU-native replacement for the reference's
`attention_fast_incremental` (reference: src/core/tensor_engine.cpp
:1254-1388 — SIMD q·k dots + scalar softmax + weighted V sum). Here one
query per sequence attends to its head's contiguous [T, D] cache slab
streaming from HBM, with flash-style online softmax so scores never
materialize beyond a [Gh, TT] tile (SURVEY.md §7 hard part #2).

Layout: cache is head-major [B, Hkv, T, D]; q is reshaped outside to
[B, Hkv, Ghp, D] where Ghp = q heads per kv head padded up to 8
sublanes. Grid (B, Hkv, T/TT) with the T axis innermost; running
(max, denom, acc) live in VMEM scratch and the normalized output is
written on the last T step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref,
            m_ref, l_ref, acc_ref, *, nt: int, tt: int, scale: float):
    """One [TT] block of the cache for one (b, kv_head).

    len_ref: scalar-prefetch [B] int32 valid lengths.
    q_ref: [1, 1, Ghp, D]; k_ref/v_ref: [1, 1, TT, D];
    o_ref: [1, 1, Ghp, D]; scratch m/l: [Ghp, 128] f32, acc: [Ghp, D] f32.
    """
    b = pl.program_id(0)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kv_len = len_ref[b]

    @pl.when(t * tt < kv_len)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale     # [Ghp, D]
        k = k_ref[0, 0].astype(jnp.float32)             # [TT, D]
        v = v_ref[0, 0].astype(jnp.float32)             # [TT, D]
        s = jax.lax.dot_general(                        # [Ghp, TT]
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * tt
        s = jnp.where(col < kv_len, s, NEG_INF)

        m_prev = m_ref[:, 0:1]                          # [Ghp, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)       # [Ghp, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)                 # rescale old state
        p = jnp.exp(s - m_new)                          # [Ghp, TT]
        l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(t == nt - 1)
    def _():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode(q4, k_cache, v_cache, kv_len, *, interpret: bool = False):
    B, Hkv, Ghp, D = q4.shape
    T = k_cache.shape[2]
    TT = min(T, 512)
    nt = T // TT
    scale = 1.0 / float(D) ** 0.5

    kern = functools.partial(_kernel, nt=nt, tt=TT, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, nt),
        in_specs=[
            pl.BlockSpec((1, 1, Ghp, D), lambda b, h, t, len_ref: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TT, D), lambda b, h, t, len_ref: (b, h, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TT, D), lambda b, h, t, len_ref: (b, h, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Ghp, D),
                               lambda b, h, t, len_ref: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Ghp, 128), jnp.float32),
            pltpu.VMEM((Ghp, 128), jnp.float32),
            pltpu.VMEM((Ghp, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Ghp, D), q4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * Ghp * T * D,
            bytes_accessed=2 * B * Hkv * T * D * 2,
            transcendentals=B * Hkv * Ghp * T),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), q4, k_cache, v_cache)


def decode_pallas(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                  kv_len: jax.Array,
                  interpret: bool = False) -> Optional[jax.Array]:
    """q: [B, Hq, D]; k/v_cache: [B, Hkv, T, D]; kv_len: [B]
    -> [B, Hq, D] or None if the shape isn't kernel-eligible."""
    B, Hq, D = q.shape
    Hkv, T = k_cache.shape[1], k_cache.shape[2]
    if Hq % Hkv or D % 64:
        return None            # blocks cover the full D axis; need lane-
                               # aligned D (64 = half-lane is still legal
                               # since the block equals the array dim)
    Gh = Hq // Hkv
    Ghp = max(Gh, 8)
    TT = min(T, 512)
    if T % TT:
        return None
    # [B, Hq, D] -> [B, Hkv, Gh, D], pad group axis to >= 8 sublanes.
    q4 = q.reshape(B, Hkv, Gh, D)
    if Ghp != Gh:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, Ghp - Gh), (0, 0)))
    out = _decode(q4, k_cache, v_cache, kv_len, interpret=interpret)
    return out[:, :, :Gh].reshape(B, Hq, D)
