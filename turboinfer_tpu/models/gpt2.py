"""GPT-2-class decoder (learned positions, LayerNorm, GELU MLP, MHA).

The reference advertises GPT-2 support through its GGUF gpt2.* metadata
mapping (reference: src/model/model_loader.cpp:752-771) but its single
TransformerLayer is LLaMA-shaped; this module is a real second
architecture: pre-LN blocks `x + attn(ln1(x))`, `x + mlp(ln2(x))` with
biases everywhere, learned positional embeddings added to the token
embedding, fused qkv projection, and tied lm_head.

Same conventions as models/llama.py: weights [in, out], per-layer
weights stacked on a leading L axis consumed by lax.scan, head-major
KV cache shared with the Pallas attention kernels.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.kernels import ops
from turboinfer_tpu.models.common import (KVCache,  # noqa: F401
                                          decode_kv, encode_kv,
                                          encode_kv_scaled,
                                          resolve_fused_cache,
                                          param_bytes, param_count,
                                          reset_cache,
                                          write_fused_prefill)
from turboinfer_tpu.models.common import init_cache as _common_init_cache


def init_cache(config: ModelConfig, batch_size: int, max_seq=None,
               dtype=None, fused=False) -> KVCache:
    """GPT-2 cache. fused None -> auto: the fused-head [L, B, T, H]
    layout whenever the head-major Pallas decode kernel can't run
    (D=64 for every GPT-2 size; H = Hq*64 is always 128-aligned), so
    TPU decode stays on a Pallas kernel. See llama.init_cache."""
    if fused is None:
        fused = resolve_fused_cache(config, max_seq)
        if fused and dtype == jnp.int8:
            fused = False     # int8 scales are head-major only
    return _common_init_cache(config, batch_size, max_seq, dtype,
                              fused=fused)


# int8 KV scales thread through the GPT-2 layer scan like llama's.
SUPPORTS_INT8_KV = True


def init_params(rng: jax.Array, config: ModelConfig,
                dtype=None) -> Dict[str, Any]:
    dtype = dtype or config.dtype
    H, V, L = config.hidden_size, config.vocab_size, config.num_layers
    F = config.intermediate_size or 4 * H
    T = config.max_seq_len
    keys = jax.random.split(rng, 6)

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * (1.0 / jnp.sqrt(fan_in))).astype(dtype)

    embed = w(keys[0], (V, H), H)
    params = {
        "embed": embed,
        "pos_embed": w(keys[1], (T, H), H),
        "layers": {
            "ln1_w": jnp.ones((L, H), dtype),
            "ln1_b": jnp.zeros((L, H), dtype),
            "ln2_w": jnp.ones((L, H), dtype),
            "ln2_b": jnp.zeros((L, H), dtype),
            "w_qkv": w(keys[2], (L, H, 3 * H), H),
            "b_qkv": jnp.zeros((L, 3 * H), dtype),
            "wo": w(keys[3], (L, H, H), H),
            "bo": jnp.zeros((L, H), dtype),
            "w_fc": w(keys[4], (L, H, F), H),
            "b_fc": jnp.zeros((L, F), dtype),
            "w_proj": w(keys[5], (L, F, H), F),
            "b_proj": jnp.zeros((L, H), dtype),
        },
        "final_norm_w": jnp.ones((H,), dtype),
        "final_norm_b": jnp.zeros((H,), dtype),
        "lm_head": embed.T,
    }
    return params


def _layer_forward(config: ModelConfig, x, lw, k_cache, v_cache,
                   start, kv_len, layer_index=None,
                   fused_cache: bool = False, k_scale=None, v_scale=None):
    """x + attn(ln1(x)); x + mlp(ln2(x)). Caches shaped like llama's.
    lw is the FULL stacked layer dict when layer_index is given."""
    B, S, H = x.shape
    Hq = config.num_heads
    D = H // Hq
    li = layer_index

    def w1(name):
        # With layer_index, lw is a stacked layer dict (per-layer slots
        # gain a leading L axis — possibly L/stages under pipeline
        # parallelism, so detect by rank, not by num_layers).
        w = lw[name]
        if li is not None and w.ndim >= 2 \
                and name not in ("w_qkv", "wo", "w_fc", "w_proj"):
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    h = ops.layer_norm(x, w1("ln1_w"), w1("ln1_b"), config.rms_norm_eps)
    qkv = ops.qmatmul(h, lw["w_qkv"], layer_index=li) + w1("b_qkv")
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, Hq, D)
    k = k.reshape(B, S, Hq, D)
    v = v.reshape(B, S, Hq, D)

    if fused_cache and k_cache.ndim == 4:
        # Fused-head stacked decode [L, B, T, Hq*D] (GPT-2 is MHA so
        # HD == H): lane-aligned writes + the fused Pallas kernel
        # (see llama._layer_forward / decode_fused_pallas).
        newk = encode_kv(k.reshape(B, S, H), k_cache.dtype)
        newv = encode_kv(v.reshape(B, S, H), v_cache.dtype)
        for b in range(B):
            idx = (li, b, start[b], 0)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk[b][None, None], idx)
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv[b][None, None], idx)
        attn = ops.attention_decode_fused(q[:, 0], k_cache, v_cache,
                                          kv_len, layer_index=li)
        attn = attn[:, None]
        attn = attn.reshape(B, S, H)
        x = x + ops.qmatmul(attn.astype(x.dtype), lw["wo"],
                            layer_index=li) + w1("bo")
        h = ops.layer_norm(x, w1("ln2_w"), w1("ln2_b"), config.rms_norm_eps)
        h = ops.gelu(ops.qmatmul(h, lw["w_fc"], layer_index=li) + w1("b_fc"))
        x = x + ops.qmatmul(h.astype(x.dtype), lw["w_proj"],
                            layer_index=li) + w1("b_proj")
        return x, k_cache, v_cache

    if fused_cache:
        # Fused-head per-layer [B, T, H] (prefill body).
        T = k_cache.shape[1]

        # per-slot unrolled writes (a vmapped DUS over traced
        # starts lowers to a scatter that copies the whole layer
        # cache every layer — common.write_fused_prefill)
        k_cache, v_cache = write_fused_prefill(k_cache, v_cache,
                                               k, v, start)
        # S==1 decode always routes through the stacked branch above.
        assert S > 1, "per-layer fused-cache path is prefill-only"
        kf = decode_kv(k_cache, q.dtype).reshape(
            B, T, Hq, D).transpose(0, 2, 1, 3)
        vf = decode_kv(v_cache, q.dtype).reshape(
            B, T, Hq, D).transpose(0, 2, 1, 3)
        attn = ops.attention_prefill(q, kf, vf, causal=True,
                                     kv_len=kv_len, q_start=start)
        attn = attn.reshape(B, S, H)
        x = x + ops.qmatmul(attn.astype(x.dtype), lw["wo"],
                            layer_index=li) + w1("bo")
        h = ops.layer_norm(x, w1("ln2_w"), w1("ln2_b"), config.rms_norm_eps)
        h = ops.gelu(ops.qmatmul(h, lw["w_fc"], layer_index=li) + w1("b_fc"))
        x = x + ops.qmatmul(h.astype(x.dtype), lw["w_proj"],
                            layer_index=li) + w1("b_proj")
        return x, k_cache, v_cache

    if k_cache.ndim == 5:
        # Stacked-cache decode (see llama._layer_forward): per-slot
        # in-place writes; attention reads layer li via scalar prefetch.
        newk, ks = encode_kv_scaled(k.transpose(0, 2, 1, 3), k_cache.dtype)
        newv, vs = encode_kv_scaled(v.transpose(0, 2, 1, 3), v_cache.dtype)
        for b in range(B):
            idx = (li, b, 0, start[b], 0)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk[b][None, None], idx)
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv[b][None, None], idx)
            if ks is not None:
                sidx = (li, b, 0, start[b])
                k_scale = jax.lax.dynamic_update_slice(
                    k_scale, ks[b][None, None], sidx)
                v_scale = jax.lax.dynamic_update_slice(
                    v_scale, vs[b][None, None], sidx)
        attn = ops.attention_decode(q[:, 0], k_cache, v_cache, kv_len,
                                    layer_index=li, k_scale=k_scale,
                                    v_scale=v_scale)
        attn = attn[:, None]
        attn = attn.reshape(B, S, H)
        x = x + ops.qmatmul(attn.astype(x.dtype), lw["wo"],
                            layer_index=li) + w1("bo")
        h = ops.layer_norm(x, w1("ln2_w"), w1("ln2_b"), config.rms_norm_eps)
        h = ops.gelu(ops.qmatmul(h, lw["w_fc"], layer_index=li) + w1("b_fc"))
        x = x + ops.qmatmul(h.astype(x.dtype), lw["w_proj"],
                            layer_index=li) + w1("b_proj")
        if k_scale is not None:
            return x, k_cache, v_cache, k_scale, v_scale
        return x, k_cache, v_cache

    # Per-slot in-place writes, unrolled over static B (a vmapped DUS
    # over traced starts is a scatter -> full-cache copy per layer;
    # see llama._layer_forward).
    newk, ks = encode_kv_scaled(k.transpose(0, 2, 1, 3), k_cache.dtype)
    newv, vs = encode_kv_scaled(v.transpose(0, 2, 1, 3), v_cache.dtype)
    for b in range(B):
        idx = (b, 0, start[b], 0)
        k_cache = jax.lax.dynamic_update_slice(k_cache, newk[b][None], idx)
        v_cache = jax.lax.dynamic_update_slice(v_cache, newv[b][None], idx)
        if ks is not None:
            k_scale = jax.lax.dynamic_update_slice(
                k_scale, ks[b][None], (b, 0, start[b]))
            v_scale = jax.lax.dynamic_update_slice(
                v_scale, vs[b][None], (b, 0, start[b]))

    if S == 1:
        attn = ops.attention_decode(q[:, 0], k_cache, v_cache, kv_len,
                                    k_scale=k_scale, v_scale=v_scale)
        attn = attn[:, None]
    else:
        attn = ops.attention_prefill(
            q, decode_kv(k_cache, q.dtype, k_scale),
            decode_kv(v_cache, q.dtype, v_scale),
            causal=True, kv_len=kv_len, q_start=start)
    attn = attn.reshape(B, S, H)
    x = x + ops.qmatmul(attn.astype(x.dtype), lw["wo"],
                        layer_index=li) + w1("bo")

    h = ops.layer_norm(x, w1("ln2_w"), w1("ln2_b"), config.rms_norm_eps)
    h = ops.gelu(ops.qmatmul(h, lw["w_fc"], layer_index=li) + w1("b_fc"))
    x = x + ops.qmatmul(h.astype(x.dtype), lw["w_proj"],
                        layer_index=li) + w1("b_proj")
    if k_scale is not None:
        return x, k_cache, v_cache, k_scale, v_scale
    return x, k_cache, v_cache


def forward(params: Dict[str, Any], config: ModelConfig, tokens: jax.Array,
            cache: KVCache, *, positions: Optional[jax.Array] = None,
            seq_lens: Optional[jax.Array] = None,
            logit_idx: Optional[jax.Array] = None
            ) -> Tuple[jax.Array, KVCache]:
    """Same contract as llama.forward: [B, S] tokens appended to cache.

    positions: must be CONTIGUOUS from cache.length if given — the
    causal mask is always built from start+arange (gpt2/neox have no
    `contiguous` flag like llama), so non-contiguous positions would
    pair custom position embeddings with a mismatched mask."""
    B, S = tokens.shape
    start = cache.length
    if positions is None:
        positions = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    kv_len = start + seq_lens

    x = ops.embed_lookup(params["embed"], tokens, config.dtype)
    x = x + jnp.take(params["pos_embed"],
                     jnp.clip(positions, 0, params["pos_embed"].shape[0] - 1),
                     axis=0).astype(config.dtype)

    layers = params["layers"]
    fused = cache.fused_layout

    scaled = cache.k_scale is not None
    if S == 1:
        # Decode: stacked cache flows through whole (no per-layer slice
        # copies — see llama.forward for the measurement).
        def body(carry, i):
            x, k_full, v_full, ksf, vsf = carry
            out = _layer_forward(config, x, layers, k_full,
                                 v_full, start, kv_len,
                                 layer_index=i, fused_cache=fused,
                                 k_scale=ksf, v_scale=vsf)
            x, k_full, v_full = out[:3]
            ksf, vsf = out[3:] if scaled else (ksf, vsf)
            return (x, k_full, v_full, ksf, vsf), None
    else:
        def body(carry, i):
            x, k_full, v_full, ksf, vsf = carry
            kc = jax.lax.dynamic_index_in_dim(k_full, i, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(v_full, i, 0, keepdims=False)
            kss = vss = None
            if scaled:
                kss = jax.lax.dynamic_index_in_dim(ksf, i, 0,
                                                   keepdims=False)
                vss = jax.lax.dynamic_index_in_dim(vsf, i, 0,
                                                   keepdims=False)
            out = _layer_forward(config, x, layers, kc, vc, start,
                                 kv_len, layer_index=i,
                                 fused_cache=fused, k_scale=kss,
                                 v_scale=vss)
            x, kc, vc = out[:3]
            k_full = jax.lax.dynamic_update_index_in_dim(k_full, kc, i, 0)
            v_full = jax.lax.dynamic_update_index_in_dim(v_full, vc, i, 0)
            if scaled:
                ksf = jax.lax.dynamic_update_index_in_dim(ksf, out[3], i, 0)
                vsf = jax.lax.dynamic_update_index_in_dim(vsf, out[4], i, 0)
            return (x, k_full, v_full, ksf, vsf), None

    (x, k_new, v_new, ks_new, vs_new), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
        jnp.arange(config.num_layers, dtype=jnp.int32))

    if logit_idx is not None:
        # last-token-only head (see llama.forward)
        x = jnp.take_along_axis(
            x, logit_idx[:, None, None].astype(jnp.int32), axis=1)
    x = ops.layer_norm(x, params["final_norm_w"], params["final_norm_b"],
                       config.rms_norm_eps)
    logits = ops.qmatmul(x, params["lm_head"], preferred_dtype=jnp.float32)
    return logits.astype(jnp.float32), KVCache(k=k_new, v=v_new,
                                               length=kv_len,
                                               k_scale=ks_new,
                                               v_scale=vs_new)


def forward_no_cache(params, config, tokens, seq_lens=None) -> jax.Array:
    B, S = tokens.shape
    cache = init_cache(config, B, max_seq=S)
    logits, _ = forward(params, config, tokens, cache, seq_lens=seq_lens)
    return logits
