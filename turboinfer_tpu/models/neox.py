"""GPT-NeoX / Pythia / Phi-1/2 / Falcon decoder.

A third distinct block structure (the reference's single layer is
LLaMA-shaped — src/model/inference_engine.cpp:203-233):
  - PARALLEL residual (default): x + attn(ln1(x)) + mlp(ln2(x)) — the
    MLP reads ln2 of the ORIGINAL x, not of the attention output;
    use_parallel_residual=False falls back to sequential pre-LN.
  - partial rotary: RoPE on the first rotary_pct·D dims of each head,
    the tail passes through unrotated (Pythia ships rotary_pct=0.25);
    rotary_pct=0 (Falcon-RW/BLOOM) disables RoPE and config.alibi adds
    the per-head linear score bias instead.
  - GQA/MQA: the fused qkv splits at q_dim/kv_dim (Falcon 7B runs one
    kv head, 40B/180B grouped kv heads); MHA is the degenerate case.
  - LayerNorm (+bias) everywhere, biased projections, GELU MLP,
    untied embed_out head.

Same runtime conventions as models/llama.py: weights [in, out], layers
stacked on a leading L axis under lax.scan, head-major KV cache shared
with the Pallas attention kernels. The fused qkv weight is stored
q|k|v-contiguous (mapping.assemble_params_neox de-interleaves HF's
per-head [Hq, 3, D] layout at load).
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
    """NeoX-family cache. fused None -> auto: fused-head layout when
    the head-major Pallas decode kernel can't run (D=64 for Pythia /
    Phi-1/2 / Falcon GQA). ALiBi models (BLOOM, Falcon-RW) stay
    head-major — the fused kernel carries no per-head score bias and
    they run the jnp path regardless. See llama.init_cache."""
    if fused is None:
        fused = resolve_fused_cache(config, max_seq,
                                    disallow=config.alibi)
        if fused and dtype == jnp.int8:
            fused = False     # int8 scales are head-major only
    return _common_init_cache(config, batch_size, max_seq, dtype,
                              fused=fused)


# int8 KV scales thread through the NeoX layer scan like llama's.
SUPPORTS_INT8_KV = True


def init_params(rng: jax.Array, config: ModelConfig,
                dtype=None) -> Dict[str, Any]:
    dtype = dtype or config.dtype
    H, V, L = config.hidden_size, config.vocab_size, config.num_layers
    F = config.intermediate_size or 4 * H
    QKV = config.q_dim + 2 * config.kv_dim
    keys = jax.random.split(rng, 6)

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * (1.0 / jnp.sqrt(fan_in))).astype(dtype)

    return {
        "embed": w(keys[0], (V, H), H),
        "layers": {
            "ln1_w": jnp.ones((L, H), dtype),
            "ln1_b": jnp.zeros((L, H), dtype),
            "ln2_w": jnp.ones((L, H), dtype),
            "ln2_b": jnp.zeros((L, H), dtype),
            "w_qkv": w(keys[2], (L, H, QKV), H),
            "b_qkv": jnp.zeros((L, QKV), dtype),
            "wo": w(keys[3], (L, H, H), H),
            "bo": jnp.zeros((L, H), dtype),
            "w_fc": w(keys[4], (L, H, F), H),
            "b_fc": jnp.zeros((L, F), dtype),
            "w_proj": w(keys[5], (L, F, H), F),
            "b_proj": jnp.zeros((L, H), dtype),
        },
        "final_norm_w": jnp.ones((H,), dtype),
        "final_norm_b": jnp.zeros((H,), dtype),
        "lm_head": w(keys[1], (H, V), H),
    }


def _partial_rope(x: jax.Array, positions: jax.Array,
                  config: ModelConfig) -> jax.Array:
    """RoPE on the first rotary_pct·D dims; tail unrotated."""
    D = x.shape[-1]
    r = int(D * config.rotary_pct)
    r -= r % 2
    if r <= 0:
        return x
    rot = ops.apply_rope(x[..., :r], positions, config.rope_theta,
                         config.rope_mode, scaling=config.rope_scaling)
    if r == D:
        return rot
    return jnp.concatenate([rot, x[..., r:]], axis=-1)


def _layer_forward(config: ModelConfig, x, lw, positions, k_cache, v_cache,
                   start, kv_len, layer_index=None,
                   fused_cache: bool = False, k_scale=None, v_scale=None):
    B, S, H = x.shape
    Hq, Hkv, D = config.num_heads, config.kv_heads, config.head_dim_
    li = layer_index
    alibi = None
    if config.alibi:
        # HF's build_alibi_tensor rounds the slopes to bfloat16 (exact
        # for power-of-two head counts).
        alibi = ops.alibi_slopes(Hq).astype(jnp.bfloat16) \
            .astype(jnp.float32)
        if config.architecture == "falcon":
            # HF Falcon computes softmax((scores + slope*kpos)/sqrt(D))
            # — the slope is scaled too. BLOOM and the ALiBi paper add
            # the bias AFTER scaling, which is what ops expects.
            alibi = alibi * float(D) ** -0.5

    def w1(name):
        # With layer_index, lw is a stacked layer dict (per-layer slots
        # gain a leading L axis — possibly L/stages under pipeline
        # parallelism, so detect by rank, not by num_layers).
        w = lw[name]
        if li is not None and w.ndim >= 2 \
                and name not in ("w_qkv", "wo", "w_fc", "w_proj"):
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    h1 = ops.layer_norm(x, w1("ln1_w"), w1("ln1_b"), config.rms_norm_eps)
    qkv = ops.qmatmul(h1, lw["w_qkv"], layer_index=li) + w1("b_qkv")
    # q|k|v contiguous along the output axis; GQA/MQA (Falcon) splits at
    # q_dim / kv_dim, the MHA case degenerates to three equal parts.
    q, k, v = jnp.split(qkv, [config.q_dim, config.q_dim + config.kv_dim],
                        axis=-1)
    q = _partial_rope(q.reshape(B, S, Hq, D), positions, config)
    k = _partial_rope(k.reshape(B, S, Hkv, D), positions, config)
    v = v.reshape(B, S, Hkv, D)

    if fused_cache and k_cache.ndim == 4:
        # Fused-head stacked decode [L, B, T, Hkv*D] (alibi models are
        # gated out in init_cache) — see llama._layer_forward.
        newk = encode_kv(k.reshape(B, S, Hkv * D), k_cache.dtype)
        newv = encode_kv(v.reshape(B, S, Hkv * D), v_cache.dtype)
        for b in range(B):
            idx = (li, b, start[b], 0)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk[b][None, None], idx)
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv[b][None, None], idx)
        attn = ops.attention_decode_fused(q[:, 0], k_cache, v_cache,
                                          kv_len, layer_index=li)[:, None]
    elif fused_cache:
        # Fused-head per-layer [B, T, Hkv*D] (prefill body).
        T = k_cache.shape[1]

        # per-slot unrolled writes (a vmapped DUS over traced
        # starts lowers to a scatter that copies the whole layer
        # cache every layer — common.write_fused_prefill)
        k_cache, v_cache = write_fused_prefill(k_cache, v_cache,
                                               k, v, start)
        # S==1 decode always routes through the stacked branch above.
        assert S > 1, "per-layer fused-cache path is prefill-only"
        kf = decode_kv(k_cache, q.dtype).reshape(
            B, T, Hkv, D).transpose(0, 2, 1, 3)
        vf = decode_kv(v_cache, q.dtype).reshape(
            B, T, Hkv, D).transpose(0, 2, 1, 3)
        attn = ops.attention_prefill(q, kf, vf, causal=True,
                                     kv_len=kv_len, q_start=start,
                                     alibi=alibi)
    elif k_cache.ndim == 5:
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
                                    layer_index=li, alibi=alibi,
                                    k_scale=k_scale,
                                    v_scale=v_scale)[:, None]
    else:
        # Per-slot in-place writes, unrolled over static B (a vmapped
        # DUS over traced starts is a scatter -> full-cache copy per
        # layer; see llama._layer_forward).
        newk, ks = encode_kv_scaled(k.transpose(0, 2, 1, 3), k_cache.dtype)
        newv, vs = encode_kv_scaled(v.transpose(0, 2, 1, 3), v_cache.dtype)
        for b in range(B):
            idx = (b, 0, start[b], 0)
            k_cache = jax.lax.dynamic_update_slice(k_cache,
                                                   newk[b][None], idx)
            v_cache = jax.lax.dynamic_update_slice(v_cache,
                                                   newv[b][None], idx)
            if ks is not None:
                k_scale = jax.lax.dynamic_update_slice(
                    k_scale, ks[b][None], (b, 0, start[b]))
                v_scale = jax.lax.dynamic_update_slice(
                    v_scale, vs[b][None], (b, 0, start[b]))
        if S == 1:
            attn = ops.attention_decode(q[:, 0], k_cache, v_cache,
                                        kv_len, alibi=alibi,
                                        k_scale=k_scale,
                                        v_scale=v_scale)[:, None]
        else:
            attn = ops.attention_prefill(
                q, decode_kv(k_cache, q.dtype, k_scale),
                decode_kv(v_cache, q.dtype, v_scale),
                causal=True, kv_len=kv_len, q_start=start, alibi=alibi)
    attn = attn.reshape(B, S, Hq * D)
    attn_out = ops.qmatmul(attn.astype(x.dtype), lw["wo"],
                           layer_index=li) + w1("bo")

    def mlp(inp):
        h = ops.layer_norm(inp, w1("ln2_w"), w1("ln2_b"),
                           config.rms_norm_eps)
        h = ops.gelu(ops.qmatmul(h, lw["w_fc"], layer_index=li)
                     + w1("b_fc"))
        return ops.qmatmul(h.astype(x.dtype), lw["w_proj"],
                           layer_index=li) + w1("b_proj")

    if config.parallel_residual:
        # x + attn(ln1(x)) + mlp(ln2(x)) — mlp reads the ORIGINAL x
        x = x + attn_out + mlp(x)
    else:
        x = x + attn_out
        x = x + mlp(x)
    if k_scale is not None:
        return x, k_cache, v_cache, k_scale, v_scale
    return x, k_cache, v_cache


def forward(params: Dict[str, Any], config: ModelConfig, tokens: jax.Array,
            cache: KVCache, *, positions: Optional[jax.Array] = None,
            seq_lens: Optional[jax.Array] = None,
            logit_idx: Optional[jax.Array] = None
            ) -> Tuple[jax.Array, KVCache]:
    """Same contract as llama.forward."""
    B, S = tokens.shape
    start = cache.length
    if positions is None:
        positions = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    kv_len = start + seq_lens

    x = ops.embed_lookup(params["embed"], tokens, config.dtype)
    if "embed_norm_w" in params:
        # BLOOM: LayerNorm over the embeddings before the first block.
        x = ops.layer_norm(x, params["embed_norm_w"],
                           params["embed_norm_b"], config.rms_norm_eps)
    layers = params["layers"]
    fused = cache.fused_layout

    scaled = cache.k_scale is not None
    if S == 1:
        def body(carry, i):
            x, k_full, v_full, ksf, vsf = carry
            out = _layer_forward(
                config, x, layers, positions, k_full, v_full, start,
                kv_len, layer_index=i, fused_cache=fused,
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
            out = _layer_forward(config, x, layers, positions, kc,
                                 vc, start, kv_len, layer_index=i,
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
    if "lm_head_b" in params:                     # Phi: biased head
        logits = logits + params["lm_head_b"]
    return logits.astype(jnp.float32), KVCache(k=k_new, v=v_new,
                                               length=kv_len,
                                               k_scale=ks_new,
                                               v_scale=vs_new)


def forward_no_cache(params, config, tokens, seq_lens=None) -> jax.Array:
    B, S = tokens.shape
    cache = init_cache(config, B, max_seq=S)
    logits, _ = forward(params, config, tokens, cache, seq_lens=seq_lens)
    return logits
