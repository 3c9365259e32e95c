"""Sparse Mixture-of-Experts decoders: Mixtral, Qwen2-MoE, Qwen3-MoE.

No reference counterpart — the reference is a dense-only LLaMA-shaped
stack (SURVEY.md §2 row 5); this is a TPU-native model-family addition:
the LLaMA attention block (RoPE + GQA, q/k/v biases, per-head qk-norm —
shared with models/llama.py) with a top-k routed MoE FFN. Covers the
Mixtral gate convention (renormalized top-k softmax), the Qwen2-MoE one
(raw full-softmax probabilities, config.norm_topk_prob=False), and the
Qwen2-MoE shared expert (dense SwiGLU on every token scaled by a
sigmoid gate, config.shared_expert_size).

Expert parallelism falls out of sharding: expert weights carry a
leading E axis annotated with the `tp` mesh axis
(parallel/shardings.moe_param_specs), the expert computation is an
einsum over E, and XLA partitions it so each device computes only its
local experts and psums the router-weighted combination. The dense
einsum (every expert on every token) is exact and compiles to clean
MXU work for prefill; decode takes a top-k weight-gather fast path
instead (see _moe_ffn) so per-step HBM traffic is k expert FFNs, not
E. Both regimes are exact — no capacity-factor token dropping.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.core.qtensor import QTensor
from turboinfer_tpu.kernels import ops
from turboinfer_tpu.models import llama
from turboinfer_tpu.models.common import (KVCache, cache_bits_view,  # noqa: F401
                                          cache_from_bits, decode_kv,
                                          encode_kv, encode_kv_scaled,
                                          resolve_fused_cache,
                                          param_bytes, param_count,
                                          reset_cache,
                                          write_fused_prefill)
from turboinfer_tpu.models.common import init_cache as _common_init_cache


# int8 KV scales thread through the MoE layer scan like llama's.
SUPPORTS_INT8_KV = True

# Cold prefills may attend the just-computed K/V directly (see
# llama.forward's fresh_prefill contract).
SUPPORTS_FRESH_PREFILL = True


def init_cache(config: ModelConfig, batch_size: int, max_seq=None,
               dtype=None, fused=False) -> KVCache:
    """MoE-family cache. fused None -> auto: fused-head layout when the
    head-major Pallas decode kernel can't run (Qwen2-MoE, OLMoE: D=64).
    See llama.init_cache for the layout contract."""
    if fused is None:
        fused = resolve_fused_cache(config, max_seq)
        if fused and dtype == jnp.int8:
            fused = False     # int8 scales are head-major only (llama)
    return _common_init_cache(config, batch_size, max_seq, dtype,
                              fused=fused)


def init_params(rng: jax.Array, config: ModelConfig,
                dtype=None) -> Dict[str, Any]:
    if config.num_experts <= 0:
        raise ValueError("moe model needs config.num_experts > 0")
    dtype = dtype or config.dtype
    H, V, L = config.hidden_size, config.vocab_size, config.num_layers
    QD, KVD = config.q_dim, config.kv_dim
    F = config.moe_intermediate_size or config.ffn_dim
    E = config.num_experts
    keys = jax.random.split(rng, 12)

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                * (1.0 / jnp.sqrt(fan_in))).astype(dtype)

    params = {
        "embed": w(keys[0], (V, H), H),
        "layers": {
            "attn_norm": jnp.ones((L, H), dtype),
            "ffn_norm": jnp.ones((L, H), dtype),
            "wq": w(keys[1], (L, H, QD), H),
            "wk": w(keys[2], (L, H, KVD), H),
            "wv": w(keys[3], (L, H, KVD), H),
            "wo": w(keys[4], (L, QD, H), QD),
            "router": w(keys[5], (L, H, E), H),
            "we_gate": w(keys[6], (L, E, H, F), H),
            "we_up": w(keys[7], (L, E, H, F), H),
            "we_down": w(keys[8], (L, E, F, H), F),
        },
        "final_norm": jnp.ones((H,), dtype),
        "lm_head": w(keys[9], (H, V), H),
    }
    layers = params["layers"]
    if config.attn_bias:
        bk = jax.random.split(keys[10], 3)
        layers["b_q"] = (0.02 * jax.random.normal(bk[0], (L, QD))
                         ).astype(dtype)
        layers["b_k"] = (0.02 * jax.random.normal(bk[1], (L, KVD))
                         ).astype(dtype)
        layers["b_v"] = (0.02 * jax.random.normal(bk[2], (L, KVD))
                         ).astype(dtype)
    if config.qk_norm:
        D = config.head_dim_
        layers["q_norm"] = jnp.ones((L, D), dtype)
        layers["k_norm"] = jnp.ones((L, D), dtype)
    if config.shared_expert_size:
        Fs = config.shared_expert_size
        sk = jax.random.split(keys[11], 4)
        layers["ws_gate"] = w(sk[0], (L, H, Fs), H)
        layers["ws_up"] = w(sk[1], (L, H, Fs), H)
        layers["ws_down"] = w(sk[2], (L, Fs, H), Fs)
        layers["shared_gate"] = w(sk[3], (L, H, 1), H)
    if config.tie_embeddings:
        params["lm_head"] = params["embed"].T
    return params


def _moe_ffn(config: ModelConfig, h: jax.Array, lw: Dict[str, Any],
             layer_index=None) -> jax.Array:
    """Top-k routed SwiGLU experts. h: [B, S, H] -> [B, S, H].

    `lw` holds FULL stacked [L, ...] weights when `layer_index` is a
    traced layer id (decode scan), per-layer weights otherwise.

    Gate convention per config.norm_topk_prob: True renormalizes the
    top-k softmax weights to sum 1 (Mixtral; equals softmax over the
    selected logits); False keeps the raw full-softmax probabilities
    (Qwen2-MoE default). A shared expert (Qwen2-MoE) adds a dense
    SwiGLU FFN on every token, scaled by sigmoid(shared_expert_gate).

    Two expert-compute regimes, both exact (no capacity drops):
      - few tokens (B*S*k < E, i.e. decode): gather ONLY the selected
        experts' weights from the stacked array — HBM traffic per step
        is k expert FFNs instead of E (4x less for Mixtral top-2/8).
      - many tokens (prefill/large batch): dense einsum over all E
        experts — every weight is read once regardless, the MXU stays
        on large matmuls, and the E axis partitions over `tp` for
        expert parallelism.
    """
    E, k = config.num_experts, config.experts_per_token
    li = layer_index
    B, S, _ = h.shape

    def w1(name):
        w = lw[name]
        if li is not None:
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    hf = h.astype(jnp.float32)
    logits = jnp.einsum("bsh,he->bse", hf,
                        w1("router").astype(jnp.float32))
    if config.norm_topk_prob:
        top_v, top_i = jax.lax.top_k(logits, k)           # [B, S, k]
        gates = jax.nn.softmax(top_v, axis=-1)            # [B, S, k]
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        gates, top_i = jax.lax.top_k(probs, k)            # raw probs

    out = expert_mix(config, h, lw, gates, top_i, layer_index=li)

    if "ws_gate" in lw:                                   # shared expert
        s = ops.swiglu(ops.qmatmul(h, lw["ws_gate"], layer_index=li),
                       ops.qmatmul(h, lw["ws_up"], layer_index=li))
        s = ops.qmatmul(s.astype(h.dtype), lw["ws_down"], layer_index=li)
        sg = jax.nn.sigmoid(
            ops.qmatmul(h, lw["shared_gate"], layer_index=li,
                        preferred_dtype=jnp.float32))     # [B, S, 1]
        out = out + sg * s.astype(jnp.float32)
    return out.astype(h.dtype)


def expert_mix(config: ModelConfig, h: jax.Array, lw: Dict[str, Any],
               gates: jax.Array, top_i: jax.Array,
               layer_index=None) -> jax.Array:
    """Gate-weighted sum of the selected experts' SwiGLU outputs.

    gates/top_i: [B, S, k] float32 mixing weights and expert ids (any
    gating convention — Mixtral/Qwen renormalized or raw softmax,
    DeepSeek sigmoid+scaled). lw holds we_gate/we_up/we_down, stacked
    [L, E, ...] with `layer_index`, per-layer [E, ...] otherwise.
    Returns float32 [B, S, H]. Three regimes (all exact): quantized
    flat-stack qmm, few-token weight gather, dense masked einsum — see
    _moe_ffn for when each wins.
    """
    E, k = config.num_experts, config.experts_per_token
    li = layer_index
    B, S, _ = h.shape

    def w1(name):
        w = lw[name]
        if li is not None:
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    if isinstance(lw["we_gate"], QTensor):
        return _expert_ffn_quant(config, h, lw, li, gates, top_i)
    if B * S * k < E:
        # Decode fast path: gather the k selected experts per token.
        wg, wu, wd = lw["we_gate"], lw["we_up"], lw["we_down"]
        if li is not None:
            # One flat (layer, expert) gather off the stacked array —
            # never slice the [E, H, F] layer block out first.
            idx = li * E + top_i                          # [B, S, k]
            wg = wg.reshape((-1,) + wg.shape[2:])
            wu = wu.reshape((-1,) + wu.shape[2:])
            wd = wd.reshape((-1,) + wd.shape[2:])
        else:
            idx = top_i
        g = jnp.einsum("bsh,bskhf->bskf", h, jnp.take(wg, idx, axis=0))
        u = jnp.einsum("bsh,bskhf->bskf", h, jnp.take(wu, idx, axis=0))
        act = ops.swiglu(g, u)
        out_e = jnp.einsum("bskf,bskfh->bskh", act.astype(h.dtype),
                           jnp.take(wd, idx, axis=0))
        return jnp.einsum("bskh,bsk->bsh", out_e.astype(jnp.float32),
                          gates)
    # Scatter top-k gates into a dense [B, S, E] mixing vector.
    onehot = jax.nn.one_hot(top_i, E, dtype=jnp.float32)
    mix = jnp.einsum("bsk,bske->bse", gates, onehot)      # [B, S, E]
    g = jnp.einsum("bsh,ehf->bsef", h, w1("we_gate"))
    u = jnp.einsum("bsh,ehf->bsef", h, w1("we_up"))
    act = ops.swiglu(g, u)
    out_e = jnp.einsum("bsef,efh->bseh", act.astype(h.dtype),
                       w1("we_down"))
    return jnp.einsum("bseh,bse->bsh", out_e.astype(jnp.float32), mix)


def _flat_expert_qt(qt: QTensor) -> QTensor:
    """View a 4-D stacked expert QTensor ([L, E, ...] data/scales, see
    quant/quantizer._quantize_experts) as the flat [L*E] stack the qmm
    kernel indexes via scalar prefetch. Free (leading-dim reshape)."""
    if qt.data.ndim != 4:
        return qt               # already flat (engine prepare_scales)
    flat = lambda a: (None if a is None
                      else a.reshape((-1,) + a.shape[2:]))
    return QTensor(data=flat(qt.data), scales=flat(qt.scales),
                   zero_points=flat(qt.zero_points), bits=qt.bits,
                   group_size=qt.group_size, shape=qt.shape)


def _expert_ffn_quant(config: ModelConfig, h: jax.Array,
                      lw: Dict[str, Any], li, gates: jax.Array,
                      top_i: jax.Array) -> jax.Array:
    """Routed experts with QUANTIZED weights -> [B, S, H] float32.

    The experts live in a flat [L*E] qmm stack; slot layer*E + e is
    read directly from HBM via scalar prefetch (no dequantized or
    sliced copy). Decode (B=S=1) launches k qmm triples with the
    data-dependent selected-expert slots — per-step weight traffic is k
    packed expert FFNs. Larger token counts loop the E static slots and
    mask with the dense [B, S, E] mixing vector (weights read once)."""
    E, k = config.num_experts, config.experts_per_token
    B, S, _ = h.shape
    wg, wu, wd = (_flat_expert_qt(lw[n])
                  for n in ("we_gate", "we_up", "we_down"))
    base = 0 if li is None else li * E

    def expert(slot):
        g = ops.qmatmul(h, wg, layer_index=slot)
        u = ops.qmatmul(h, wu, layer_index=slot)
        act = ops.swiglu(g, u)
        return ops.qmatmul(act.astype(h.dtype), wd,
                           layer_index=slot).astype(jnp.float32)

    if B == 1 and S == 1:
        # All k experts in one grouped launch per matrix (3 kernel
        # launches instead of 3k — launch gaps dominate B=1 MoE decode:
        # measured 6.5 -> ~4 ms/step on 13-layer V2-Lite top-6).
        slots = base + top_i[0, 0]                        # [k]
        xg = jnp.broadcast_to(h, (k,) + h.shape)
        g = ops.qmatmul_grouped(xg, wg, slots)
        u = ops.qmatmul_grouped(xg, wu, slots)
        act = ops.swiglu(g, u)
        down = ops.qmatmul_grouped(act.astype(h.dtype), wd, slots)
        return jnp.einsum("kbsh,bsk->bsh", down.astype(jnp.float32),
                          gates)
    onehot = jax.nn.one_hot(top_i, E, dtype=jnp.float32)
    mix = jnp.einsum("bsk,bske->bse", gates, onehot)      # [B, S, E]
    out = jnp.zeros(h.shape, jnp.float32)
    for e in range(E):
        out = out + mix[..., e:e + 1] * expert(base + e)
    return out


def _layer_forward(config, x, lw, positions, k_cache, v_cache, start,
                   kv_len, contiguous=True, layer_index=None,
                   global_layer_index=None, fused_cache=False,
                   k_scale=None, v_scale=None, fresh_prefill=False):
    """LLaMA attention block + MoE FFN. lw is the FULL stacked layer
    dict when layer_index is given. global_layer_index is accepted for
    pipeline-parallel signature parity (MoE windows are uniform across
    layers, so only the local id matters here). k_scale/v_scale: int8
    KV scales (see llama._layer_forward) — when passed, the return
    grows to (x, k, v, ks, vs)."""
    B, S, H = x.shape
    Hq, Hkv, D = config.num_heads, config.kv_heads, config.head_dim_
    li = layer_index

    def w1(name):
        w = lw[name]
        if li is not None:
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    h = ops.rms_norm(x, w1("attn_norm"), config.rms_norm_eps)
    from turboinfer_tpu.models.llama import qkv_proj
    q, k, v = qkv_proj(h, lw, li, B, S, Hq, Hkv, D, config)
    # scaling= must match llama.forward_paged_verify (which the MoE
    # paged path delegates to): omitting it here made paged prefill
    # (unscaled) and paged decode (scaled) disagree on RoPE frequencies
    # for rope-scaled checkpoints (Qwen2-MoE/OLMoE with YaRN/linear).
    q = ops.apply_rope(q, positions, config.rope_theta, config.rope_mode,
                       scaling=config.rope_scaling)
    k = ops.apply_rope(k, positions, config.rope_theta, config.rope_mode,
                       scaling=config.rope_scaling)

    if fused_cache and k_cache.ndim == 4:
        # Fused-head stacked decode [L, B, T, Hkv*D] — the layout that
        # keeps D % 128 != 0 MoE attention (Qwen2-MoE, OLMoE: D=64) on
        # a Pallas kernel. See llama._layer_forward.
        newk = encode_kv(k.reshape(B, S, Hkv * D), k_cache.dtype)
        newv = encode_kv(v.reshape(B, S, Hkv * D), v_cache.dtype)
        for b in range(B):
            idx = (li, b, start[b], 0)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk[b][None, None], idx)
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv[b][None, None], idx)
        attn = ops.attention_decode_fused(q[:, 0], k_cache, v_cache,
                                          kv_len,
                                          window=config.sliding_window,
                                          layer_index=li)
        attn = attn[:, None].reshape(B, S, Hq * D)
        x = x + ops.qmatmul(attn.astype(x.dtype), lw["wo"], layer_index=li)
        h = ops.rms_norm(x, w1("ffn_norm"), config.rms_norm_eps)
        x = x + _moe_ffn(config, h, lw, layer_index=li)
        return x, k_cache, v_cache

    if fused_cache:
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
        attn = ops.attention_prefill(
            q, kf, vf, causal=True, positions=positions,
            kv_len=kv_len, q_start=start if contiguous else None,
            window=config.sliding_window)
        attn = attn.reshape(B, S, Hq * D)
        x = x + ops.qmatmul(attn.astype(x.dtype), lw["wo"], layer_index=li)
        h = ops.rms_norm(x, w1("ffn_norm"), config.rms_norm_eps)
        x = x + _moe_ffn(config, h, lw, layer_index=li)
        return x, k_cache, v_cache

    if k_cache.ndim == 5:
        # Stacked-cache decode/prefill (see llama._layer_forward):
        # per-slot in-place writes; attention reads layer li via scalar
        # prefetch (decode AND flash-prefill).
        newk, ks = encode_kv_scaled(k.transpose(0, 2, 1, 3),
                                    k_cache.dtype)
        newv, vs = encode_kv_scaled(v.transpose(0, 2, 1, 3),
                                    v_cache.dtype)
        if S > 1:
            newk, newv = jax.lax.optimization_barrier((newk, newv))
        import os as _os
        wrote_via_kernel = False
        if (fresh_prefill and S > 1 and ks is None
                and _os.environ.get("TURBOINFER_PREFILL_WRITER") != "0"):
            from turboinfer_tpu.kernels.dispatch import pallas_enabled
            if pallas_enabled():
                from turboinfer_tpu.kernels.pallas.cache_write import \
                    cache_write_fresh
                kc2 = cache_write_fresh(k_cache, newk, li)
                if kc2 is not None:
                    k_cache = kc2
                    v_cache = cache_write_fresh(v_cache, newv, li)
                    wrote_via_kernel = True
        for b in range(B) if not wrote_via_kernel else ():
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
        if S == 1:
            attn = ops.attention_decode(q[:, 0], k_cache, v_cache, kv_len,
                                        window=config.sliding_window,
                                        layer_index=li,
                                        k_scale=k_scale, v_scale=v_scale)
            attn = attn[:, None]
        elif fresh_prefill and ks is None and newk.dtype == q.dtype:
            # Cold prefill, uncompressed cache: attend the just-computed
            # K/V directly (see llama._layer_forward; fp8 bit-views
            # fail the dtype check).
            attn = ops.attention_prefill(
                q, newk, newv, causal=True, positions=positions,
                kv_len=kv_len, q_start=start if contiguous else None,
                window=config.sliding_window)
        else:
            attn = ops.attention_prefill(
                q, k_cache, v_cache, causal=True, positions=positions,
                kv_len=kv_len, q_start=start if contiguous else None,
                window=config.sliding_window, layer_index=li,
                k_scale=k_scale, v_scale=v_scale)
        attn = attn.reshape(B, S, Hq * D)
        x = x + ops.qmatmul(attn.astype(x.dtype), lw["wo"], layer_index=li)
        h = ops.rms_norm(x, w1("ffn_norm"), config.rms_norm_eps)
        x = x + _moe_ffn(config, h, lw, layer_index=li)
        if k_scale is not None:
            return x, k_cache, v_cache, k_scale, v_scale
        return x, k_cache, v_cache

    # Per-slot in-place writes, unrolled over static B (a vmapped DUS
    # over traced starts is a scatter -> full-cache copy per layer; see
    # llama._layer_forward).
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
                                    window=config.sliding_window,
                                    k_scale=k_scale, v_scale=v_scale)
        attn = attn[:, None]
    else:
        attn = ops.attention_prefill(
            q, decode_kv(k_cache, q.dtype, k_scale),
            decode_kv(v_cache, q.dtype, v_scale),
            causal=True, positions=positions, kv_len=kv_len,
            q_start=start if contiguous else None,
            window=config.sliding_window)
    attn = attn.reshape(B, S, Hq * D)
    x = x + ops.qmatmul(attn.astype(x.dtype), lw["wo"], layer_index=li)

    h = ops.rms_norm(x, w1("ffn_norm"), config.rms_norm_eps)
    x = x + _moe_ffn(config, h, lw, layer_index=li)
    if k_scale is not None:
        return x, k_cache, v_cache, k_scale, v_scale
    return x, k_cache, v_cache


def forward(params: Dict[str, Any], config: ModelConfig, tokens: jax.Array,
            cache: KVCache, *, positions: Optional[jax.Array] = None,
            seq_lens: Optional[jax.Array] = None,
            logit_idx: Optional[jax.Array] = None,
            fresh_prefill: bool = False
            ) -> Tuple[jax.Array, KVCache]:
    """Same contract as llama.forward."""
    B, S = tokens.shape
    start = cache.length
    contiguous = positions is None
    if positions is None:
        positions = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    kv_len = start + seq_lens

    x = ops.embed_lookup(params["embed"], tokens, config.dtype)

    layers = params["layers"]
    was_fp8 = cache.k.dtype == jnp.float8_e4m3fn
    fused = cache.fused_layout
    cache = cache_bits_view(cache)

    scaled = cache.k_scale is not None
    if S == 1 or (not fused and cache.k.ndim == 5):
        # Decode AND head-major prefill: stacked cache flows through
        # whole (no per-layer slice copies — see llama.forward for the
        # measurement); compressed caches ride the stacked flash kernel
        # (uint8 e4m3 in-kernel, int8 via scale planes).
        def body(carry, i):
            x, k_full, v_full, ksf, vsf = carry
            out = _layer_forward(
                config, x, layers, positions, k_full, v_full, start,
                kv_len, contiguous=contiguous, layer_index=i,
                fused_cache=fused, k_scale=ksf, v_scale=vsf,
                fresh_prefill=fresh_prefill)
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
            out = _layer_forward(config, x, layers, positions, kc, vc,
                                 start, kv_len, contiguous=contiguous,
                                 layer_index=i, fused_cache=fused,
                                 k_scale=kss, v_scale=vss)
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
    k_new, v_new = cache_from_bits(k_new, v_new, was_fp8)

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
                         lengths: jax.Array, *,
                         k_scale_pages=None, v_scale_pages=None):
    """One paged-cache decode step (same contract as
    llama.forward_paged_decode, incl. int8 scale pools): the shared
    paged decoder body with the MoE FFN swapped in, so MoE models run
    under the paged continuous scheduler and prefix caching like dense
    ones."""
    def moe_ffn(cfg, h, layers, i):
        return _moe_ffn(cfg, h, layers, layer_index=i)
    return llama.forward_paged_decode(params, config, tokens, k_pages,
                                      v_pages, block_table, lengths,
                                      ffn_fn=moe_ffn,
                                      k_scale_pages=k_scale_pages,
                                      v_scale_pages=v_scale_pages)


def forward_paged_verify(params: Dict[str, Any], config: ModelConfig,
                         tokens: jax.Array, k_pages: jax.Array,
                         v_pages: jax.Array, block_table: jax.Array,
                         lengths: jax.Array, *,
                         k_scale_pages=None, v_scale_pages=None):
    """Speculative (k+1)-wide paged verify with the MoE FFN (same
    contract as llama.forward_paged_verify)."""
    def moe_ffn(cfg, h, layers, i):
        return _moe_ffn(cfg, h, layers, layer_index=i)
    return llama.forward_paged_verify(params, config, tokens, k_pages,
                                      v_pages, block_table, lengths,
                                      ffn_fn=moe_ffn,
                                      k_scale_pages=k_scale_pages,
                                      v_scale_pages=v_scale_pages)


def forward_no_cache(params, config, tokens, seq_lens=None) -> jax.Array:
    B, S = tokens.shape
    cache = init_cache(config, B, max_seq=S)
    logits, _ = forward(params, config, tokens, cache, seq_lens=seq_lens)
    return logits
