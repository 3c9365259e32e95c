"""Shared model machinery: KV cache container + param accounting.

Reference counterpart: the KVCache struct (src/model/inference_engine.cpp
:25-172) and ModelData memory helpers (model_loader.cpp:186-311).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.core.qtensor import QTensor


class KVCache(NamedTuple):
    """HBM-resident KV cache, head-major [L, B, Hkv, Tmax, D] so each
    (batch, head) slice is a contiguous [T, D] slab for the Pallas
    decode kernel. In-place updates via dynamic_update_slice — no
    per-token prefix copy (reference defect: inference_engine.cpp:78-160,
    SURVEY.md quirk #4).

    length: [B] int32 — number of valid slots per sequence.
    """
    k: jax.Array
    v: jax.Array
    length: jax.Array

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]


def init_cache(config: ModelConfig, batch_size: int,
               max_seq: Optional[int] = None, dtype=None) -> KVCache:
    T = max_seq or config.max_seq_len
    dtype = dtype or config.dtype
    shape = (config.num_layers, batch_size, config.kv_heads, T,
             config.head_dim_)
    return KVCache(k=jnp.zeros(shape, dtype),
                   v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((batch_size,), jnp.int32))


def reset_cache(cache: KVCache) -> KVCache:
    """Zero-fill (reference: KVCache::reset, inference_engine.cpp:60-69)."""
    return KVCache(k=jnp.zeros_like(cache.k), v=jnp.zeros_like(cache.v),
                   length=jnp.zeros_like(cache.length))


def param_count(params: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            n = leaf.shape[0] * leaf.shape[1]
            if leaf.data.ndim == 3:          # stacked layers
                n *= leaf.data.shape[0]
            total += n
        else:
            total += leaf.size
    return total


def param_bytes(params: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            total += leaf.nbytes()
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total


def fuse_projections(params: Any) -> Any:
    """Fuse same-input projections along the output axis: wq/wk/wv ->
    "wqkv" and w_gate/w_up -> "w_gateup".

    One decode step launches one kernel per weight; on the
    tunnel-attached chip each launch costs tens of µs of dead time, so
    collapsing 7 projection matmuls per layer to 4 is a direct
    latency win (and wider N keeps the weight DMA in full bursts).
    Numerically identical: every output column's K-reduction is
    unchanged. Model forwards accept either layout; engines fuse at
    setup (kernels/dispatch.prepare_params), while persistence,
    loaders, quantizer, and the TP/PP sharding paths keep the split
    layout (fused columns would straddle tensor-parallel shards).
    """
    if not isinstance(params, dict) or "layers" not in params:
        return params
    layers = params["layers"]
    if not isinstance(layers, dict):
        return params
    layers = dict(layers)

    def fuse(names, out):
        ws = [layers.get(n) for n in names]
        if any(w is None for w in ws):
            return
        if all(isinstance(w, QTensor) for w in ws):
            from turboinfer_tpu.core import qtensor
            from turboinfer_tpu.utils.errors import QuantizationError
            try:
                fused = qtensor.concat_n(ws)
            except QuantizationError:
                return
        elif any(isinstance(w, QTensor) for w in ws):
            return                        # mixed quantized/fp: keep split
        else:
            if len({(w.dtype, w.shape[:-1]) for w in ws}) != 1:
                return
            fused = jnp.concatenate(ws, axis=-1)
        for n in names:
            del layers[n]
        layers[out] = fused

    fuse(("wq", "wk", "wv"), "wqkv")
    fuse(("w_gate", "w_up"), "w_gateup")
    return {**params, "layers": layers}
