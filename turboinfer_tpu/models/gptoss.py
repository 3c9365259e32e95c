"""GPT-OSS (OpenAI gpt-oss-20b / 120b): MoE with attention sinks.

No reference counterpart (SURVEY.md §2 row 5); model-family addition
pinned against HuggingFace GptOssForCausalLM (tests/test_hf_parity.py).

Architecture facts reproduced here:
- GQA attention with q/k/v/o biases and a learned per-head SINK logit:
  softmax runs over [scores, sink] and the sink column is dropped, so
  the sink only soaks probability mass out of the real positions.
- Alternating sliding/full layers: layer_types puts sliding_attention
  on even layers, full_attention on odd — config.sliding_window_pattern
  2 in this framework's convention (global iff (i+1) % 2 == 0).
- YaRN rope (ops.rope_freqs "yarn" + rope_attention_factor).
- MoE FFN on EVERY layer: router logits WITH bias -> top-k -> softmax
  over the selected logits; experts use a fused gate_up weight with
  biases and the clamped GLU activation
  (up+1) * gate * sigmoid(1.702*gate), gate<=7, |up|<=7. The loader
  de-interleaves HF's even/odd gate_up columns into separate slots.

TPU-native expert regimes mirror models/moe.py: decode gathers only the
k selected experts' weights+biases (k=4 of E=128 — 32x less HBM
traffic); prefill computes the dense masked einsum.

Attention: prefill streams the KV cache in chunks with an online
softmax whose initial running max IS the sink logit (exact — see
_streaming_attention), so memory stays bounded at any context length
and fp8 caches decode per chunk. Contiguous-cache decode uses the
fused-head layout [L, B, T, Hkv*D] and the sink-aware Pallas kernel
(decode_fused_pallas) with the stacked cache flowing through the scan
whole — no per-layer cache slice copies.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.kernels import ops
from turboinfer_tpu.models.common import (KVCache, decode_kv, encode_kv,
                                          encode_kv_scaled,
                                          resolve_fused_cache,  # noqa: F401
                                          param_bytes,
                                          param_count, reset_cache)
from turboinfer_tpu.models.common import init_cache as _common_init_cache


# int8 KV scales thread through the GPT-OSS layer scan like llama's.
SUPPORTS_INT8_KV = True

# The CONTIGUOUS forward threads int8 scales; the paged body's
# sink-attention does not consume scale pools yet — the paged
# scheduler gates on this instead of crashing with a TypeError at the
# first decode step.
SUPPORTS_INT8_KV_PAGED = False


def init_cache(config: ModelConfig, batch_size: int, max_seq=None,
               dtype=None, fused=False) -> KVCache:
    """GPT-OSS cache. fused None -> auto: the fused-head [L, B, T,
    Hkv*D] layout (GPT-OSS: D=64, Hkv=8 -> 512 lanes), which puts
    contiguous-cache decode on the sink-aware Pallas kernel instead of
    the chunked jnp streaming path. See llama.init_cache."""
    if fused is None:
        fused = resolve_fused_cache(config, max_seq)
    return _common_init_cache(config, batch_size, max_seq, dtype,
                              fused=fused)


def init_params(rng: jax.Array, config: ModelConfig,
                dtype=None) -> Dict[str, Any]:
    if config.num_experts <= 0:
        raise ValueError("gpt_oss model needs config.num_experts > 0")
    dtype = dtype or config.dtype
    H, V, L = config.hidden_size, config.vocab_size, config.num_layers
    QD, KVD = config.q_dim, config.kv_dim
    E, F = config.num_experts, config.ffn_dim
    nH = config.num_heads
    key = iter(jax.random.split(rng, 24))

    def w(shape, fan_in):
        return (jax.random.normal(next(key), shape, jnp.float32)
                * (1.0 / jnp.sqrt(fan_in))).astype(dtype)

    def b(shape):
        return (0.02 * jax.random.normal(next(key), shape)).astype(dtype)

    params = {
        "embed": w((V, H), H),
        "layers": {
            "attn_norm": jnp.ones((L, H), dtype),
            "ffn_norm": jnp.ones((L, H), dtype),
            "wq": w((L, H, QD), H), "b_q": b((L, QD)),
            "wk": w((L, H, KVD), H), "b_k": b((L, KVD)),
            "wv": w((L, H, KVD), H), "b_v": b((L, KVD)),
            "wo": w((L, QD, H), QD), "b_o": b((L, H)),
            "sinks": b((L, nH)),
            "router": w((L, H, E), H),
            "router_bias": b((L, E)),
            "we_gate": w((L, E, H, F), H), "be_gate": b((L, E, F)),
            "we_up": w((L, E, H, F), H), "be_up": b((L, E, F)),
            "we_down": w((L, E, F, H), F), "be_down": b((L, E, H)),
        },
        "final_norm": jnp.ones((H,), dtype),
        "lm_head": w((H, V), H),
    }
    if config.tie_embeddings:
        params["lm_head"] = params["embed"].T
    return params


def _glu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """GPT-OSS clamped GLU: (up+1) * gate * sigmoid(1.702*gate)."""
    gate = jnp.clip(gate, None, 7.0)
    up = jnp.clip(up, -7.0, 7.0)
    return (up + 1.0) * gate * jax.nn.sigmoid(1.702 * gate)


def _moe_ffn(config: ModelConfig, h: jax.Array, lw: Dict[str, Any],
             li) -> jax.Array:
    """Router (+bias) top-k, softmax over selected logits, biased
    experts with the clamped GLU. h [B,S,H] -> [B,S,H]."""
    E, k = config.num_experts, config.experts_per_token
    B, S, _ = h.shape

    def w1(name):
        w = lw[name]
        if li is not None:
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    hf = h.astype(jnp.float32)
    logits = (jnp.einsum("bsh,he->bse", hf,
                         w1("router").astype(jnp.float32))
              + w1("router_bias").astype(jnp.float32))
    top_v, top_i = jax.lax.top_k(logits, k)               # [B, S, k]
    gates = jax.nn.softmax(top_v, axis=-1)

    if B * S * k < E:
        # Decode: gather only the selected experts' weights + biases.
        def flat(name):
            w = lw[name]
            if li is not None:
                return w.reshape((-1,) + w.shape[2:])
            return w
        idx = top_i if li is None else li * E + top_i     # [B, S, k]
        ge = lambda n: jnp.take(flat(n), idx, axis=0)
        g = (jnp.einsum("bsh,bskhf->bskf", h, ge("we_gate"))
             + ge("be_gate").astype(h.dtype))
        u = (jnp.einsum("bsh,bskhf->bskf", h, ge("we_up"))
             + ge("be_up").astype(h.dtype))
        act = _glu(g.astype(jnp.float32), u.astype(jnp.float32))
        out_e = (jnp.einsum("bskf,bskfh->bskh", act.astype(h.dtype),
                            ge("we_down")).astype(jnp.float32)
                 + ge("be_down").astype(jnp.float32))
        out = jnp.einsum("bskh,bsk->bsh", out_e, gates)
    else:
        onehot = jax.nn.one_hot(top_i, E, dtype=jnp.float32)
        mix = jnp.einsum("bsk,bske->bse", gates, onehot)  # [B, S, E]
        g = (jnp.einsum("bsh,ehf->bsef", h, w1("we_gate"))
             + w1("be_gate").astype(h.dtype))
        u = (jnp.einsum("bsh,ehf->bsef", h, w1("we_up"))
             + w1("be_up").astype(h.dtype))
        act = _glu(g.astype(jnp.float32), u.astype(jnp.float32))
        out_e = (jnp.einsum("bsef,efh->bseh", act.astype(h.dtype),
                            w1("we_down")).astype(jnp.float32)
                 + w1("be_down").astype(jnp.float32)[None, None])
        out = jnp.einsum("bseh,bse->bsh", out_e, mix)
    return out.astype(h.dtype)


def _attention(config: ModelConfig, h: jax.Array, lw, li, positions,
               k_cache, v_cache, start, kv_len, fused_cache=False,
               gli=None, k_scale=None, v_scale=None):
    """GQA attention with per-head sink logits and the per-layer
    sliding/full window. k_cache/v_cache: [B, Hkv, T, D] (this layer),
    or fused-head [B, T, Hkv*D] / stacked [L, B, T, Hkv*D] with
    fused_cache=True. Returns (out [B,S,QD], k_cache', v_cache')."""
    B, S, _ = h.shape
    nH, Hkv, D = config.num_heads, config.kv_heads, config.head_dim_
    if gli is None:
        gli = li

    def w1(name):
        w = lw[name]
        if li is not None:
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    from turboinfer_tpu.models.llama import qkv_proj
    q, k, v = qkv_proj(h, lw, li, B, S, nH, Hkv, D, config)
    q = ops.apply_rope(q, positions, config.rope_theta, config.rope_mode,
                       scaling=config.rope_scaling)
    k = ops.apply_rope(k, positions, config.rope_theta, config.rope_mode,
                       scaling=config.rope_scaling)
    pattern = config.sliding_window_pattern

    if fused_cache and k_cache.ndim == 4:
        # Stacked fused-head decode [L, B, T, Hkv*D]: in-place writes at
        # layer li, attention via the sink-aware fused Pallas kernel
        # reading the stack by scalar prefetch (no per-layer cache copy
        # — the head-major gptoss path slices the layer each step).
        assert S == 1
        newkq, ks = encode_kv_scaled(k, k_cache.dtype)   # [B, S, Hkv, D]
        newvq, vs = encode_kv_scaled(v, v_cache.dtype)
        newk = newkq.reshape(B, S, Hkv * D)
        newv = newvq.reshape(B, S, Hkv * D)
        for b in range(B):
            idx = (li, b, start[b], 0)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk[b][None, None], idx)
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv[b][None, None], idx)
            if ks is not None:                    # scales [L, B, Hkv, T]
                sidx = (li, b, 0, start[b])
                k_scale = jax.lax.dynamic_update_slice(
                    k_scale, ks[b].T[None, None], sidx)
                v_scale = jax.lax.dynamic_update_slice(
                    v_scale, vs[b].T[None, None], sidx)
        sinks = w1("sinks")

        def dec(window):
            return lambda: ops.attention_decode_fused(
                q[:, 0], k_cache, v_cache, kv_len, layer_index=li,
                window=window, sinks=sinks,
                k_scale=k_scale, v_scale=v_scale)
        if pattern and pattern > 1 and config.sliding_window:
            is_global = (gli + 1) % pattern == 0
            out = jax.lax.cond(is_global, dec(None),
                               dec(config.sliding_window))
        else:
            out = dec(config.sliding_window)()
        out = out[:, None].reshape(B, S, nH * D)
        if k_scale is not None:
            return out.astype(h.dtype), k_cache, v_cache, k_scale, v_scale
        return out.astype(h.dtype), k_cache, v_cache

    if fused_cache:
        # Per-layer fused-head [B, T, Hkv*D] (prefill body): write the
        # packed rows, then run the existing chunked streaming math on
        # a head-major view (one transposed copy per layer per prefill).
        T = k_cache.shape[1]
        newkq, ks = encode_kv_scaled(k, k_cache.dtype)   # [B, S, Hkv, D]
        newvq, vs = encode_kv_scaled(v, v_cache.dtype)
        newk = newkq.reshape(B, S, Hkv * D)
        newv = newvq.reshape(B, S, Hkv * D)
        for b in range(B):
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk[b][None], (b, start[b], 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv[b][None], (b, start[b], 0))
            if ks is not None:                 # per-layer [B, Hkv, T]
                k_scale = jax.lax.dynamic_update_slice(
                    k_scale, ks[b].T[None], (b, 0, start[b]))
                v_scale = jax.lax.dynamic_update_slice(
                    v_scale, vs[b].T[None], (b, 0, start[b]))
        # S==1 decode always routes through the stacked branch above.
        assert S > 1, "per-layer fused-cache path is prefill-only"
        khm = k_cache.reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        vhm = v_cache.reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        out = _streaming_attention(config, q, khm, vhm, w1("sinks"),
                                   positions, kv_len, gli,
                                   k_scale=k_scale, v_scale=v_scale)
        if k_scale is not None:
            return out.astype(h.dtype), k_cache, v_cache, k_scale, v_scale
        return out.astype(h.dtype), k_cache, v_cache

    newkq, ks = encode_kv_scaled(k.transpose(0, 2, 1, 3), k_cache.dtype)
    newvq, vs = encode_kv_scaled(v.transpose(0, 2, 1, 3), v_cache.dtype)
    for b in range(B):
        k_cache = jax.lax.dynamic_update_slice(k_cache, newkq[b][None],
                                               (b, 0, start[b], 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, newvq[b][None],
                                               (b, 0, start[b], 0))
        if ks is not None:
            k_scale = jax.lax.dynamic_update_slice(
                k_scale, ks[b][None], (b, 0, start[b]))
            v_scale = jax.lax.dynamic_update_slice(
                v_scale, vs[b][None], (b, 0, start[b]))
    out = _streaming_attention(config, q, k_cache, v_cache, w1("sinks"),
                               positions, kv_len, gli,
                               k_scale=k_scale, v_scale=v_scale)
    if k_scale is not None:
        return out.astype(h.dtype), k_cache, v_cache, k_scale, v_scale
    return out.astype(h.dtype), k_cache, v_cache


def _streaming_attention(config, q, k_cache, v_cache, sinks_flat,
                         positions, kv_len, li, k_scale=None,
                         v_scale=None):
    """Streaming (online-softmax) attention over key chunks: one
    [B, Hkv, G, S, C] score block at a time — never a full [..., T]
    tensor, and the (possibly fp8) cache decodes per chunk instead of
    wholesale. The SINK is exact: softmax([scores, sink]) with the
    sink dropped equals online softmax initialized with running
    max m0 = sink, sum l0 = 1 (= exp(sink - m0)), empty accumulator.

    q: [B, S, nH, D]; k/v_cache: head-major [B, Hkv, T, D];
    sinks_flat: [nH]. Returns [B, S, nH*D] f32. `li` is only consulted
    for the sliding/full alternation — pass the GLOBAL layer id under
    pipeline parallelism."""
    B, S = q.shape[0], q.shape[1]
    nH, Hkv, D = config.num_heads, config.kv_heads, config.head_dim_
    G = nH // Hkv
    T = k_cache.shape[2]
    cdt = q.dtype
    qf = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, S, D)
    scale = D ** -0.5
    C = T
    for cand in (512, 256, 128, 64):
        if T % cand == 0:
            C = cand
            break
    qpos = positions[:, None, None, :, None]
    pattern = config.sliding_window_pattern
    is_global = ((li + 1) % pattern == 0) if (pattern and pattern > 1
                                             ) else False

    def chunk(carry, ci):
        m, l, acc = carry
        ksc = vsc = None
        if k_scale is not None:                  # [B, Hkv, C] slices
            ksc = jax.lax.dynamic_slice_in_dim(k_scale, ci * C, C, 2)
            vsc = jax.lax.dynamic_slice_in_dim(v_scale, ci * C, C, 2)
        kc = decode_kv(jax.lax.dynamic_slice_in_dim(k_cache, ci * C, C,
                                                    2), cdt, ksc)
        vc = decode_kv(jax.lax.dynamic_slice_in_dim(v_cache, ci * C, C,
                                                    2), cdt, vsc)
        s = jnp.einsum("bhgsd,bhtd->bhgst", qf, kc,
                       preferred_element_type=jnp.float32) * scale
        tpos = (ci * C + jnp.arange(C, dtype=jnp.int32)
                )[None, None, None, None, :]
        ok = (tpos <= qpos) & (tpos < kv_len[:, None, None, None, None])
        if config.sliding_window is not None:
            win = tpos > qpos - config.sliding_window
            ok = ok & jnp.where(is_global, True, win)
        s = jnp.where(ok, s, -1e30)
        m2 = jnp.maximum(m, s.max(-1))
        w = jnp.exp(s - m2[..., None])
        corr = jnp.exp(m - m2)
        l = l * corr + w.sum(-1)
        acc = (acc * corr[..., None]
               + jnp.einsum("bhgst,bhtd->bhgsd", w.astype(cdt), vc,
                            preferred_element_type=jnp.float32))
        return (m2, l, acc), None

    sinks = sinks_flat.astype(jnp.float32).reshape(Hkv, G)
    m0 = jnp.broadcast_to(sinks[None, :, :, None],
                          (B, Hkv, G, S)).astype(jnp.float32)
    l0 = jnp.ones((B, Hkv, G, S), jnp.float32)
    a0 = jnp.zeros((B, Hkv, G, S, D), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        chunk, (m0, l0, a0), jnp.arange(T // C, dtype=jnp.int32))
    out = acc / l[..., None]
    out = out.reshape(B, nH, S, D).transpose(0, 2, 1, 3)
    return out.reshape(B, S, nH * D)


def _layer_forward(config, x, lw, positions, k_cache, v_cache, start,
                   kv_len, layer_index=None, fused_cache=False,
                   global_layer_index=None, k_scale=None, v_scale=None):
    # global_layer_index: the model-wide layer id when lw/caches are a
    # pipeline stage's LOCAL slice — the sliding/full window alternation
    # keys off the GLOBAL id while weights/caches index locally.
    li = layer_index
    gli = global_layer_index if global_layer_index is not None else li

    def w1(name):
        w = lw[name]
        if li is not None:
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    h = ops.rms_norm(x, w1("attn_norm"), config.rms_norm_eps)
    out = _attention(config, h, lw, li, positions,
                     k_cache, v_cache, start, kv_len,
                     fused_cache=fused_cache, gli=gli,
                     k_scale=k_scale, v_scale=v_scale)
    attn, k_cache, v_cache = out[:3]
    if k_scale is not None:
        k_scale, v_scale = out[3:]
    attn = ops.qmatmul(attn, lw["wo"], layer_index=li) \
        + w1("b_o").astype(x.dtype)
    x = x + attn
    h = ops.rms_norm(x, w1("ffn_norm"), config.rms_norm_eps)
    x = x + _moe_ffn(config, h, lw, li)
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
    layers = params["layers"]
    fused = cache.fused_layout

    scaled = cache.k_scale is not None
    if fused and S == 1:
        # Fused-head stacked decode: the cache flows through whole (the
        # head-major body below pays a full per-layer cache slice copy
        # per step) and attention runs on the sink-aware fused kernel.
        def body(carry, i):
            x, kf, vf, ksf, vsf = carry
            out = _layer_forward(config, x, layers, positions, kf,
                                 vf, start, kv_len, layer_index=i,
                                 fused_cache=True, k_scale=ksf,
                                 v_scale=vsf)
            x, kf, vf = out[:3]
            ksf, vsf = out[3:] if scaled else (ksf, vsf)
            return (x, kf, vf, ksf, vsf), None
    else:
        def body(carry, i):
            x, kf, vf, ksf, vsf = carry
            k1 = jax.lax.dynamic_index_in_dim(kf, i, 0, keepdims=False)
            v1 = jax.lax.dynamic_index_in_dim(vf, i, 0, keepdims=False)
            kss = vss = None
            if scaled:
                kss = jax.lax.dynamic_index_in_dim(ksf, i, 0,
                                                   keepdims=False)
                vss = jax.lax.dynamic_index_in_dim(vsf, i, 0,
                                                   keepdims=False)
            out = _layer_forward(config, x, layers, positions, k1,
                                 v1, start, kv_len, layer_index=i,
                                 fused_cache=fused, k_scale=kss,
                                 v_scale=vss)
            x, k1, v1 = out[:3]
            kf = jax.lax.dynamic_update_index_in_dim(kf, k1, i, 0)
            vf = jax.lax.dynamic_update_index_in_dim(vf, v1, i, 0)
            if scaled:
                ksf = jax.lax.dynamic_update_index_in_dim(ksf, out[3], i, 0)
                vsf = jax.lax.dynamic_update_index_in_dim(vsf, out[4], i, 0)
            return (x, kf, vf, ksf, vsf), None

    (x, k_new, v_new, ks_new, vs_new), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
        jnp.arange(config.num_layers, dtype=jnp.int32))

    if logit_idx is not None:
        # last-token-only head (see llama.forward)
        x = jnp.take_along_axis(
            x, logit_idx[:, None, None].astype(jnp.int32), axis=1)
    x = ops.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = ops.qmatmul(x, params["lm_head"], preferred_dtype=jnp.float32)
    return logits.astype(jnp.float32), KVCache(k=k_new, v=v_new,
                                               length=kv_len,
                                               k_scale=ks_new,
                                               v_scale=vs_new)


def forward_paged_decode(params: Dict[str, Any], config: ModelConfig,
                         tokens: jax.Array, k_pages: jax.Array,
                         v_pages: jax.Array, block_table: jax.Array,
                         lengths: jax.Array):
    """One decode step over a paged KV cache (same contract as
    llama.forward_paged_decode) with GPT-OSS attention: per-head sink
    logits (online-softmax initial state) and the per-layer
    sliding/full window — both fine over pages, since the window mask
    is a function of absolute positions which the block table
    preserves. Page reads are flat (layer, page) gathers."""
    B = tokens.shape[0]
    nH, Hkv, D = config.num_heads, config.kv_heads, config.head_dim_
    G = nH // Hkv
    L = config.num_layers
    page = k_pages.shape[3]
    P = k_pages.shape[1]
    max_pages = block_table.shape[1]
    positions = lengths[:, None]
    kv_len = lengths + 1
    page_idx = lengths // page
    offset = lengths % page
    write_ids = jnp.clip(jnp.take_along_axis(
        block_table, page_idx[:, None], axis=1)[:, 0], 0, P - 1)
    scale = D ** -0.5
    pattern = config.sliding_window_pattern

    x = ops.embed_lookup(params["embed"], tokens[:, None],
                     config.dtype)
    layers = params["layers"]
    cdt = x.dtype

    def body(carry, li):
        x, kp, vp = carry

        def w1(name):
            return jax.lax.dynamic_index_in_dim(layers[name], li, 0,
                                                keepdims=False)

        from turboinfer_tpu.models.llama import qkv_proj
        h = ops.rms_norm(x, w1("attn_norm"), config.rms_norm_eps)
        q, k, v = qkv_proj(h, layers, li, B, 1, nH, Hkv, D, config)
        q = ops.apply_rope(q, positions, config.rope_theta,
                           config.rope_mode, scaling=config.rope_scaling)
        k = ops.apply_rope(k, positions, config.rope_theta,
                           config.rope_mode, scaling=config.rope_scaling)

        for b in range(B):
            idx = (li, write_ids[b], 0, offset[b], 0)
            kp = jax.lax.dynamic_update_slice(
                kp, encode_kv(k[b, 0][None, None, :, None, :], kp.dtype),
                idx)
            vp = jax.lax.dynamic_update_slice(
                vp, encode_kv(v[b, 0][None, None, :, None, :], vp.dtype),
                idx)

        qf = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, 1, D)
        is_global = ((li + 1) % pattern == 0) if (pattern and pattern > 1
                                                 ) else False
        kp_flat = kp.reshape((L * P,) + kp.shape[2:])
        vp_flat = vp.reshape((L * P,) + vp.shape[2:])
        qpos = positions[:, None, None, :, None]

        def page_chunk(carry, pi):
            m, l, acc = carry
            ids = jnp.clip(block_table[:, pi], 0, P - 1)
            kc = decode_kv(jnp.take(kp_flat, li * P + ids, axis=0),
                           cdt)                           # [B,Hkv,pg,D]
            vc = decode_kv(jnp.take(vp_flat, li * P + ids, axis=0), cdt)
            s = jnp.einsum("bhgsd,bhtd->bhgst", qf, kc,
                           preferred_element_type=jnp.float32) * scale
            tpos = (pi * page + jnp.arange(page, dtype=jnp.int32)
                    )[None, None, None, None, :]
            ok = tpos < kv_len[:, None, None, None, None]
            if config.sliding_window is not None:
                win = tpos > qpos - config.sliding_window
                ok = ok & jnp.where(is_global, True, win)
            s = jnp.where(ok, s, -1e30)
            m2 = jnp.maximum(m, s.max(-1))
            w = jnp.exp(s - m2[..., None])
            corr = jnp.exp(m - m2)
            l = l * corr + w.sum(-1)
            acc = (acc * corr[..., None]
                   + jnp.einsum("bhgst,bhtd->bhgsd", w.astype(cdt), vc,
                                preferred_element_type=jnp.float32))
            return (m2, l, acc), None

        sinks = w1("sinks").astype(jnp.float32).reshape(Hkv, G)
        m0 = jnp.broadcast_to(sinks[None, :, :, None],
                              (B, Hkv, G, 1)).astype(jnp.float32)
        l0 = jnp.ones((B, Hkv, G, 1), jnp.float32)
        a0 = jnp.zeros((B, Hkv, G, 1, D), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(
            page_chunk, (m0, l0, a0),
            jnp.arange(max_pages, dtype=jnp.int32))
        out = acc / l[..., None]
        out = out.reshape(B, nH, 1, D).transpose(0, 2, 1, 3)
        attn = out.reshape(B, 1, nH * D).astype(x.dtype)
        attn = ops.qmatmul(attn, layers["wo"], layer_index=li) \
            + w1("b_o").astype(x.dtype)
        x = x + attn
        h = ops.rms_norm(x, w1("ffn_norm"), config.rms_norm_eps)
        x = x + _moe_ffn(config, h, layers, li)
        return (x, kp, vp), None

    (x, kp, vp), _ = jax.lax.scan(
        body, (x, k_pages, v_pages), jnp.arange(L, dtype=jnp.int32))
    x = ops.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = ops.qmatmul(x, params["lm_head"], preferred_dtype=jnp.float32)
    return logits.astype(jnp.float32)[:, 0], kp, vp


def forward_no_cache(params, config, tokens, seq_lens=None) -> jax.Array:
    B, S = tokens.shape
    cache = init_cache(config, B, max_seq=S)
    logits, _ = forward(params, config, tokens, cache, seq_lens=seq_lens)
    return logits
