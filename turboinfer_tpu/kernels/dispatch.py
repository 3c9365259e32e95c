"""Kernel dispatch: Pallas TPU kernels vs pure-jnp reference ops.

Single switch point so the model/engine code never cares which backend
runs. Selection order:
  1. env TURBOINFER_FORCE_REF=1  -> always jnp reference
  2. default backend is TPU Pallas when the default JAX backend is a TPU
     and the shape is kernel-eligible; jnp reference otherwise (CPU tests,
     virtual-device sharding tests, odd shapes).

The jnp reference forms are the numerical golden models; Pallas kernels
must match them to ~1e-2 (bf16) / 1e-5 (f32) in tests/test_kernels.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _tpu_backend() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def _on_tpu() -> bool:
    # env read per CALL: caching it froze TURBOINFER_FORCE_REF at the
    # first dispatch, so in-process kernel-vs-reference A/Bs silently
    # compared the kernel against itself
    if os.environ.get("TURBOINFER_FORCE_REF", "0") == "1":
        return False
    return _tpu_backend()


def pallas_enabled() -> bool:
    return _on_tpu()


# -- fused dequant matmul ----------------------------------------------------

# Below this weight size the Pallas kernel's fixed launch cost exceeds
# the matmul itself and the XLA-fused dequant path wins (measured 3x on
# the tiny fixture). Per-layer data bytes.
_QMM_MIN_BYTES = int(os.environ.get("TURBOINFER_QMM_MIN_BYTES", "262144"))


def qmatmul(x, qt, preferred_dtype=jnp.float32, layer_index=None):
    from turboinfer_tpu.kernels import ops
    stacked = layer_index is not None and qt.data.ndim == 3
    per_layer_bytes = qt.data.size // (qt.data.shape[0] if stacked else 1)
    if per_layer_bytes < _QMM_MIN_BYTES:
        return _qmm_small(x, qt, preferred_dtype, layer_index, stacked)
    if pallas_enabled():
        from turboinfer_tpu.kernels.pallas import qmm
        if stacked:
            y = qmm.qmatmul_pallas_stacked(x, qt, layer_index,
                                           preferred_dtype)
        else:
            y = qmm.qmatmul_pallas(x, qt, preferred_dtype)
        if y is not None:
            return y
    return _qmm_small(x, qt, preferred_dtype, layer_index, stacked)


def qmatmul_grouped(x, qt, slots, preferred_dtype=jnp.float32):
    """Grouped matmul against G data-dependent slots of a flat stacked
    QTensor (MoE decode: the k routed experts of one layer).

    x: [G, ..., K] per-group activations; slots: [G] traced int32 ids
    into qt.data's leading axis. -> [G, ..., N]. One Pallas launch for
    all G groups on TPU (launch overhead dominates B=1 MoE decode);
    falls back to a per-slot qmatmul loop elsewhere.
    """
    G = x.shape[0]
    per_layer_bytes = qt.data.size // qt.data.shape[0] \
        if qt.data.ndim == 3 else qt.data.size
    if per_layer_bytes >= _QMM_MIN_BYTES and pallas_enabled():
        from turboinfer_tpu.kernels.pallas import qmm
        y = qmm.qmatmul_pallas_grouped(x, qt, slots)
        if y is not None:
            return y
    return jnp.stack([qmatmul(x[g], qt, preferred_dtype,
                              layer_index=slots[g]) for g in range(G)])


def _qmm_small(x, qt, preferred_dtype, layer_index, stacked):
    """jnp reference path (XLA fuses the dequant into the dot)."""
    from turboinfer_tpu.kernels import ops
    if stacked:
        from turboinfer_tpu.core.qtensor import QTensor
        qt = QTensor(
            data=jax.lax.dynamic_index_in_dim(qt.data, layer_index, 0,
                                              keepdims=False),
            scales=jax.lax.dynamic_index_in_dim(qt.scales, layer_index, 0,
                                                keepdims=False),
            zero_points=None if qt.zero_points is None else
            jax.lax.dynamic_index_in_dim(qt.zero_points, layer_index, 0,
                                         keepdims=False),
            bits=qt.bits, group_size=qt.group_size, shape=qt.shape)
    return ops.qmatmul_ref(x, qt, preferred_dtype)


# -- attention ---------------------------------------------------------------

def attention_prefill(q, k, v, *, causal=True, positions=None, kv_len=None,
                      q_start=None, window=None, softcap=None, alibi=None,
                      layer_index=None, k_scale=None, v_scale=None):
    """k/v: [B, Hkv, T, D], or the full stacked [L, B, Hkv, T, D] when
    `layer_index` is given — the Pallas flash kernel then reads layer
    `layer_index` directly from HBM (no per-layer slice copy; same
    copy-insertion trap as scan-sliced weights, see qmm stacked path).
    Compressed stacks ride the kernel too: uint8 = raw e4m3 bits
    (decoded in-kernel), int8 + k_scale/v_scale ([..., Hkv, T] f32)."""
    from turboinfer_tpu.kernels import ops
    if alibi is None and pallas_enabled():
        from turboinfer_tpu.kernels.pallas import flash_attention
        y = flash_attention.prefill_pallas(q, k, v, causal=causal,
                                           positions=positions, kv_len=kv_len,
                                           q_start=q_start, window=window,
                                           softcap=softcap,
                                           layer_index=layer_index,
                                           k_scale=k_scale, v_scale=v_scale)
        if y is not None:
            return y
    if layer_index is not None:
        k = jax.lax.dynamic_index_in_dim(k, layer_index, 0, keepdims=False)
        v = jax.lax.dynamic_index_in_dim(v, layer_index, 0, keepdims=False)
        if k_scale is not None:
            k_scale = jax.lax.dynamic_index_in_dim(k_scale, layer_index, 0,
                                                   keepdims=False)
            v_scale = jax.lax.dynamic_index_in_dim(v_scale, layer_index, 0,
                                                   keepdims=False)
    from turboinfer_tpu.models.common import decode_kv
    # ALiBi (Falcon-RW/BLOOM) runs the jnp path; the Pallas kernels do
    # not carry the per-head score bias (yet).
    return ops.attention_prefill_ref(q, decode_kv(k, q.dtype, k_scale),
                                     decode_kv(v, q.dtype, v_scale),
                                     causal=causal, positions=positions,
                                     kv_len=kv_len, window=window,
                                     softcap=softcap, alibi=alibi)


def attention_decode(q, k_cache, v_cache, kv_len, layer_index=None,
                     window=None, softcap=None, alibi=None,
                     k_scale=None, v_scale=None):
    """k/v_cache: [B, Hkv, T, D], or the full stacked [L, B, Hkv, T, D]
    when `layer_index` is given — the Pallas kernel then reads layer
    `layer_index` directly from HBM (no per-layer slice copy; same
    copy-insertion trap as scan-sliced weights, see qmm stacked path).
    k_scale/v_scale: int8-cache per-token scales ([..., Hkv, T] f32)."""
    from turboinfer_tpu.kernels import ops
    if alibi is None and pallas_enabled():
        from turboinfer_tpu.kernels.pallas import decode_attention
        y = decode_attention.decode_pallas(q, k_cache, v_cache, kv_len,
                                           layer_index=layer_index,
                                           window=window, softcap=softcap,
                                           k_scale=k_scale, v_scale=v_scale)
        if y is not None:
            return y
    if layer_index is not None:
        k_cache = jax.lax.dynamic_index_in_dim(k_cache, layer_index, 0,
                                               keepdims=False)
        v_cache = jax.lax.dynamic_index_in_dim(v_cache, layer_index, 0,
                                               keepdims=False)
        if k_scale is not None:
            k_scale = jax.lax.dynamic_index_in_dim(k_scale, layer_index, 0,
                                                   keepdims=False)
            v_scale = jax.lax.dynamic_index_in_dim(v_scale, layer_index, 0,
                                                   keepdims=False)
    from turboinfer_tpu.models.common import decode_kv
    return ops.attention_decode_ref(q, decode_kv(k_cache, q.dtype, k_scale),
                                    decode_kv(v_cache, q.dtype, v_scale),
                                    kv_len, window=window, softcap=softcap,
                                    alibi=alibi)


def attention_decode_fused(q, k_cache, v_cache, kv_len, layer_index=None,
                           window=None, softcap=None, sinks=None,
                           k_scale=None, v_scale=None):
    """k/v_cache in the FUSED-head layout [B, T, Hkv*D], or stacked
    [L, B, T, Hkv*D] with `layer_index` (kernel reads its layer via
    scalar prefetch). The layout that keeps D % 128 != 0 models
    (tiny fixtures, Qwen2-0.5B, Phi-3, GPT-OSS) on a Pallas decode
    kernel. sinks: optional [Hq] attention-sink logits (GPT-OSS).
    k_scale/v_scale: int8-cache per-token scales, [..., Hkv, T] f32 —
    the head-major plane layout even for the fused cache."""
    from turboinfer_tpu.kernels import ops
    if pallas_enabled():
        from turboinfer_tpu.kernels.pallas import decode_attention
        y = decode_attention.decode_fused_pallas(q, k_cache, v_cache, kv_len,
                                                 layer_index=layer_index,
                                                 window=window,
                                                 softcap=softcap,
                                                 sinks=sinks,
                                                 k_scale=k_scale,
                                                 v_scale=v_scale)
        if y is not None:
            return y
    if layer_index is not None:
        k_cache = jax.lax.dynamic_index_in_dim(k_cache, layer_index, 0,
                                               keepdims=False)
        v_cache = jax.lax.dynamic_index_in_dim(v_cache, layer_index, 0,
                                               keepdims=False)
        if k_scale is not None:
            k_scale = jax.lax.dynamic_index_in_dim(k_scale, layer_index, 0,
                                                   keepdims=False)
            v_scale = jax.lax.dynamic_index_in_dim(v_scale, layer_index, 0,
                                                   keepdims=False)
    from turboinfer_tpu.models.common import decode_kv_fused
    return ops.attention_decode_fused_ref(
        q, decode_kv_fused(k_cache, q.dtype, k_scale),
        decode_kv_fused(v_cache, q.dtype, v_scale),
        kv_len, window=window, softcap=softcap, sinks=sinks)


def attention_paged_verify(q, k_pages, v_pages, block_table, kv_len,
                           layer_index=None, window=None, softcap=None,
                           k_scale=None, v_scale=None):
    """Multi-query paged attention for speculative verify: q
    [B, G, Hq, D] with the chunk already written and kv_len including
    it. Pallas streams the prefix once for all G queries; the jnp path
    gathers pages and runs the prefill reference."""
    from turboinfer_tpu.kernels import ops
    if pallas_enabled():
        from turboinfer_tpu.kernels.pallas import paged_attention
        y = paged_attention.paged_verify_pallas(q, k_pages, v_pages,
                                                block_table, kv_len,
                                                layer_index=layer_index,
                                                window=window,
                                                softcap=softcap,
                                                k_scale=k_scale,
                                                v_scale=v_scale)
        if y is not None:
            return y
    if layer_index is not None:
        k_pages = jax.lax.dynamic_index_in_dim(k_pages, layer_index, 0,
                                               keepdims=False)
        v_pages = jax.lax.dynamic_index_in_dim(v_pages, layer_index, 0,
                                               keepdims=False)
        if k_scale is not None:
            k_scale = jax.lax.dynamic_index_in_dim(k_scale, layer_index, 0,
                                                   keepdims=False)
            v_scale = jax.lax.dynamic_index_in_dim(v_scale, layer_index, 0,
                                                   keepdims=False)
    from turboinfer_tpu.models.common import decode_kv
    # decode_kv handles every pool dtype (uint8 e4m3 bit views, int8 +
    # per-page [P, Hkv, page] scales, bf16 passthrough) — gating it on
    # int8 only left fp8 pages attended as RAW BIT PATTERNS here
    # (0/81 draft acceptance reproduced; paged_decode's fallback below
    # always decoded).
    return ops.attention_paged_verify_ref(
        q, decode_kv(k_pages, q.dtype, k_scale),
        decode_kv(v_pages, q.dtype, v_scale),
        block_table, kv_len, window=window, softcap=softcap)


def attention_paged_decode(q, k_pages, v_pages, block_table, kv_len,
                           layer_index=None, window=None, softcap=None,
                           k_scale=None, v_scale=None):
    """k/v_pages: [P, Hkv, page, D], or the full stacked
    [L, P, Hkv, page, D] pool when `layer_index` is given (the kernel
    reads its layer via scalar prefetch — no per-layer pool copy).
    k_scale/v_scale: int8-pool per-token scales ([..., Hkv, page] f32)."""
    from turboinfer_tpu.kernels import ops
    if pallas_enabled():
        from turboinfer_tpu.kernels.pallas import paged_attention
        y = paged_attention.paged_decode_pallas(q, k_pages, v_pages,
                                                block_table, kv_len,
                                                layer_index=layer_index,
                                                window=window,
                                                softcap=softcap,
                                                k_scale=k_scale,
                                                v_scale=v_scale)
        if y is not None:
            return y
    if layer_index is not None:
        k_pages = jax.lax.dynamic_index_in_dim(k_pages, layer_index, 0,
                                               keepdims=False)
        v_pages = jax.lax.dynamic_index_in_dim(v_pages, layer_index, 0,
                                               keepdims=False)
        if k_scale is not None:
            k_scale = jax.lax.dynamic_index_in_dim(k_scale, layer_index, 0,
                                                   keepdims=False)
            v_scale = jax.lax.dynamic_index_in_dim(v_scale, layer_index, 0,
                                                   keepdims=False)
    from turboinfer_tpu.models.common import decode_kv
    return ops.attention_paged_decode_ref(
        q, decode_kv(k_pages, q.dtype, k_scale),
        decode_kv(v_pages, q.dtype, v_scale),
        block_table, kv_len, window=window, softcap=softcap)


def prepare_params(params, fuse: bool = True):
    """One-time engine-setup pass.

    1. Fuse same-input projections (wq/wk/wv -> wqkv, w_gate/w_up ->
       w_gateup; see models/common.fuse_projections) — all backends,
       fewer kernel launches per decode step.
    2. Pre-tile stacked QTensor scales into the kernel's layout (see
       pallas/qmm.prepare_scales) — TPU only.
    Do NOT use for params headed into the TP/PP sharding paths (fused
    columns straddle shards); pass fuse=False there.
    """
    from turboinfer_tpu.core.qtensor import QTensor
    if fuse and os.environ.get("TURBOINFER_NO_FUSE", "0") != "1":
        from turboinfer_tpu.models.common import fuse_projections
        params = fuse_projections(params)
    if not pallas_enabled():
        return params
    from turboinfer_tpu.kernels.pallas import qmm

    def prep(leaf):
        if isinstance(leaf, QTensor):
            return qmm.prepare_scales(leaf)
        return leaf

    return jax.tree_util.tree_map(
        prep, params, is_leaf=lambda x: isinstance(x, QTensor))
