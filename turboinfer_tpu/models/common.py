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
    """HBM-resident KV cache. Two layouts:

    - head-major [L, B, Hkv, Tmax, D] (default): each (batch, head)
      slice is a contiguous [T, D] slab for the Pallas decode kernel.
    - fused-head [L, B, Tmax, Hkv*D] (k.ndim == 4): all kv heads packed
      into the lane dimension, the layout that keeps D % 128 != 0
      models (tiny fixtures, Qwen2-0.5B, Phi-3) on a Pallas decode
      kernel (see kernels/pallas/decode_attention.decode_fused_pallas).
      Opt-in via init_cache(fused=...); the llama-family forward
      handles both.

    In-place updates via dynamic_update_slice — no per-token prefix
    copy (reference defect: inference_engine.cpp:78-160, quirk #4).
    length: [B] int32 — number of valid slots per sequence.

    k_scale/v_scale: [L, B, Hkv, Tmax] f32 per-(token, head) absmax
    scales, present only for int8 caches (kv_cache_dtype="int8", head-
    major layout): value = int8_code * scale. Decoding int8 costs the
    kernels ~2 VPU passes (an exact i8->bf16 cast plus one lane-
    broadcast multiply on the score/prob tile) vs ~14 for software
    e4m3 — see kernels/pallas/decode_attention.
    """
    k: jax.Array
    v: jax.Array
    length: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def fused_layout(self) -> bool:
        return self.k.ndim == 4

    @property
    def max_seq(self) -> int:
        return self.k.shape[2] if self.k.ndim == 4 else self.k.shape[3]


def fused_cache_eligible(config: ModelConfig) -> bool:
    """Whether the fused-head cache layout pays off: only when the
    head-major Pallas kernel CANNOT run (D % 128 != 0) and the packed
    lane dim is 128-aligned. Env kill switch: TURBOINFER_FUSED_CACHE=0."""
    import os
    if os.environ.get("TURBOINFER_FUSED_CACHE", "1") == "0":
        return False
    D, Hkv = config.head_dim_, config.kv_heads
    return (D % 128 != 0 and (Hkv * D) % 128 == 0
            and config.num_heads % Hkv == 0)


def resolve_fused_cache(config: ModelConfig, max_seq: Optional[int] = None,
                        disallow: bool = False) -> bool:
    """Shared fused=None auto-resolution for the model modules'
    init_cache wrappers: fused-head layout when eligible, the T axis
    sublane-aligned, and not vetoed by the module (NeoX passes
    disallow=config.alibi — the fused kernel has no per-head bias)."""
    if disallow:
        return False
    T = max_seq or config.max_seq_len
    return fused_cache_eligible(config) and T % 8 == 0


def init_cache(config: ModelConfig, batch_size: int,
               max_seq: Optional[int] = None, dtype=None,
               fused: Optional[bool] = None) -> KVCache:
    """fused None/False -> head-major; True -> fused-head layout (only
    model modules whose forward understands it pass True — see
    llama.init_cache for the auto-opt-in wrapper)."""
    T = max_seq or config.max_seq_len
    dtype = dtype or config.dtype
    if fused:
        shape = (config.num_layers, batch_size, T,
                 config.kv_heads * config.head_dim_)
    else:
        shape = (config.num_layers, batch_size, config.kv_heads, T,
                 config.head_dim_)
    ks = vs = None
    if dtype == jnp.int8:
        # Scales are [L, B, Hkv, T] for BOTH layouts (for fused too:
        # a [T, Hkv] minor layout would make every kernel slice a
        # sub-128-lane memref, which Mosaic rejects). Two distinct
        # buffers: aliasing one zeros array to both fields breaks
        # donation ("donate the same buffer twice").
        sshape = (config.num_layers, batch_size, config.kv_heads, T)
        ks = jnp.zeros(sshape, jnp.float32)
        vs = jnp.zeros(sshape, jnp.float32)
    return KVCache(k=jnp.zeros(shape, dtype),
                   v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((batch_size,), jnp.int32),
                   k_scale=ks, v_scale=vs)


def reset_cache(cache: KVCache) -> KVCache:
    """Zero-fill (reference: KVCache::reset, inference_engine.cpp:60-69).
    Each scale plane resets from its OWN array (sharing one zeros array
    between the two slots is the double-donation trap init_cache's
    comment warns about)."""
    ks = (None if cache.k_scale is None
          else jnp.zeros_like(cache.k_scale))
    vs = (None if cache.v_scale is None
          else jnp.zeros_like(cache.v_scale))
    return KVCache(k=jnp.zeros_like(cache.k), v=jnp.zeros_like(cache.v),
                   length=jnp.zeros_like(cache.length),
                   k_scale=ks, v_scale=vs)


def param_count(params: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            # logical (K, N) per matrix times every stacking dim:
            # ndim 3 = [L, ...] layer stacks, ndim 4 = [L, E, ...]
            # expert stacks (the old ndim==3-only check undercounted
            # MoE experts by L*E)
            n = leaf.shape[0] * leaf.shape[1]
            for d in leaf.data.shape[:-2]:
                n *= d
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
    if "wqkv" in layers and "b_q" in layers:
        # Qwen2-style projection biases fuse iff their weights did.
        layers["b_qkv"] = jnp.concatenate(
            [layers.pop("b_q"), layers.pop("b_k"), layers.pop("b_v")],
            axis=-1)
    fuse(("w_gate", "w_up"), "w_gateup")
    return {**params, "layers": layers}


def resolve_kv_dtype(kv_cache_dtype: str, model_dtype):
    """Map InferenceConfig.kv_cache_dtype to a cache STORAGE dtype.

    "fp8" resolves to uint8: the cache holds raw float8_e4m3 bit
    patterns for its whole lifetime (encode_kv/decode_kv translate at
    the write/read points; the Pallas kernels decode bytes with integer
    math). Storing jnp.float8_e4m3fn directly also works (forward
    bitcasts to a uint8 view around the layer scan) but costs a full
    cache copy per decoded token inside a fused decode loop — the
    bitcast cannot cross the token-scan boundary.
    """
    if kv_cache_dtype == "fp8":
        return jnp.uint8
    if kv_cache_dtype == "int8":
        # Scaled int8: values quantized per (token, head) against the
        # head's absmax (scales ride KVCache.k_scale/v_scale). Faster
        # to decode than fp8 (exact i8->bf16 cast + one small-tile
        # multiply vs ~14 VPU passes of e4m3 bit math) at the same
        # halved HBM footprint.
        return jnp.int8
    if kv_cache_dtype == "bf16":
        return jnp.bfloat16
    if kv_cache_dtype in ("model", "", None):
        return model_dtype
    raise ValueError(f"unknown kv_cache_dtype {kv_cache_dtype!r} "
                     "(expected 'model', 'fp8', 'int8', or 'bf16')")


# fp8 caches travel through scan bodies BITCAST TO uint8: a bitcast (or
# any fp8 astype) inside the scan body materializes a full stacked-cache
# copy per layer per step (measured 255 ms/step at 7B B=8 — the same
# copy-insertion trap as scan-sliced weights), and Mosaic's native fp8
# loads are scalar-emulated anyway. The Pallas kernels decode raw e4m3
# bytes with integer math (pallas/decode_attention.e4m3_to_bf16).

def cache_bits_view(cache: KVCache) -> KVCache:
    """fp8 cache -> uint8 bit view (no-op for other dtypes)."""
    if cache.k.dtype == jnp.float8_e4m3fn:
        return cache._replace(
            k=jax.lax.bitcast_convert_type(cache.k, jnp.uint8),
            v=jax.lax.bitcast_convert_type(cache.v, jnp.uint8))
    return cache


def cache_from_bits(k, v, was_fp8: bool):
    """Inverse of cache_bits_view for the scan-carried k/v arrays."""
    if was_fp8:
        return (jax.lax.bitcast_convert_type(k, jnp.float8_e4m3fn),
                jax.lax.bitcast_convert_type(v, jnp.float8_e4m3fn))
    return k, v


def write_fused_prefill(k_cache, v_cache, k, v, start):
    """Per-slot in-place writes of a prefill's K/V into a per-layer
    FUSED-head cache [B, T, Hkv*D] (k/v: [B, S, Hkv, D], start: [B]).

    Unrolled over the small static B: a vmapped dynamic_update_slice
    over traced per-sequence starts lowers to a scatter XLA cannot
    update in place — it copied the whole layer cache every layer
    (measured ~4 ms of a 55 ms 7B S=512 prefill in llama before the
    same fix; gpt2/neox/moe shared the vmap bug until round 5)."""
    B, S = k.shape[:2]
    HD = 1
    for d in k.shape[2:]:          # [B,S,Hkv,D] or already [B,S,H]
        HD *= d
    newk = encode_kv(k.reshape(B, S, HD), k_cache.dtype)
    newv = encode_kv(v.reshape(B, S, HD), v_cache.dtype)
    for b in range(B):
        idx = (b, start[b], 0)
        k_cache = jax.lax.dynamic_update_slice(k_cache, newk[b][None], idx)
        v_cache = jax.lax.dynamic_update_slice(v_cache, newv[b][None], idx)
    return k_cache, v_cache


def encode_kv(x, cache_dtype):
    """Convert bf16/f32 K/V values to the cache's storage representation
    (uint8 means e4m3 bit patterns). int8 caches carry per-token scales
    and must use encode_kv_scaled instead."""
    if cache_dtype == jnp.uint8:
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.float8_e4m3fn), jnp.uint8)
    if cache_dtype == jnp.int8:
        raise ValueError("int8 KV encode requires encode_kv_scaled")
    return x.astype(cache_dtype)


def encode_kv_scaled(x, cache_dtype):
    """encode_kv variant returning (stored, scale-or-None). For int8
    caches: symmetric per-row absmax over the trailing D axis —
    stored = round(x / scale) in [-127, 127], scale shape x.shape[:-1]
    f32. Other dtypes: (encode_kv(x), None)."""
    if cache_dtype != jnp.int8:
        return encode_kv(x, cache_dtype), None
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def decode_kv_fused(x, out_dtype, scale=None):
    """decode_kv for the FUSED-head layout: x [..., T, Hkv*D] with the
    scale in head-major plane layout [..., Hkv, T]."""
    if x.dtype == jnp.int8:
        if scale is None:
            raise ValueError("int8 KV decode requires its scale array")
        HD = x.shape[-1]
        Hkv = scale.shape[-2]
        D = HD // Hkv
        xs = x.astype(jnp.float32).reshape(*x.shape[:-1], Hkv, D)
        sc = jnp.moveaxis(scale.astype(jnp.float32), -2, -1)  # [..., T, Hkv]
        return (xs * sc[..., None]).reshape(*x.shape).astype(out_dtype)
    return decode_kv(x, out_dtype)


def decode_kv(x, out_dtype, scale=None):
    """Inverse of encode_kv for non-kernel consumers (prefill attention,
    jnp reference paths): uint8 bit patterns -> values; int8 + scale
    [..., T] -> values."""
    if x.dtype == jnp.uint8:
        x = jax.lax.bitcast_convert_type(x, jnp.float8_e4m3fn)
    if x.dtype == jnp.int8:
        if scale is None:
            raise ValueError("int8 KV decode requires its scale array")
        return (x.astype(jnp.float32)
                * scale[..., None].astype(jnp.float32)).astype(out_dtype)
    return x.astype(out_dtype)

def layer_unroll(num_layers: int) -> int:
    """Unroll factor for the over-layers lax.scan.

    Default 1: unrolling LOOKS like it should help shallow stacks
    (fewer while iterations, cross-layer fusion) but measured 3.2x
    SLOWER on the headline tiny-int4 decode (6454 -> 1985 tok/s) —
    XLA's copy-insertion stops treating the carried stacked KV cache as
    in-place once the body is duplicated, so every unrolled layer pays
    a full-cache copy. Env override for experiments:
    TURBOINFER_LAYER_UNROLL (0 -> auto = 1).
    """
    import os
    env = os.environ.get("TURBOINFER_LAYER_UNROLL", "0")
    forced = int(env) if env.isdigit() else 0
    if forced > 0:
        return min(forced, num_layers)
    return 1
