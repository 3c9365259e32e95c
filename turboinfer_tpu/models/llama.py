"""LLaMA-class decoder as pure functions over a param pytree.

TPU-native replacement for the reference's TransformerLayer +
InferenceEngineImpl model stack (reference: src/model/inference_engine.cpp
:178-443 layer forward, :578-692 embedding/lm_head). Key upgrades over
the reference, per SURVEY.md quirks:
  - real embedding gather (quirk #1: the reference's live path fabricates
    embeddings at inference_engine.cpp:1444-1448),
  - real RoPE on q/k (quirk #2: reference live path no-ops RoPE),
  - true multi-head + GQA attention (quirk #3: reference is single-head),
  - KV cache updated in-place in HBM via dynamic_update_slice and read
    directly by attention (quirk #4: reference copies the whole prefix
    every token).

Layout decisions (TPU-first):
  - all 2-D weights stored [in_features, out_features] so `x @ w` hits the
    MXU without transposes; loaders transpose from HF/GGUF [out, in].
  - per-layer weights are STACKED on a leading layer axis and the forward
    runs `lax.scan` over layers: one trace regardless of depth, fast
    compiles, and the cache update is a scanned dynamic_update_slice.
  - weights may be jax.Arrays (fp) or QTensors (int8/int4 group-wise);
    qmatmul dispatches either way.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.core.qtensor import QTensor
from turboinfer_tpu.kernels import ops


# Weight pytree structure (dict of arrays / QTensors):
# {
#   "embed":      [V, H]                       (fp)
#   "layers": {
#     "attn_norm": [L, H], "ffn_norm": [L, H]  (fp)
#     "wq": [L, H, Hq*D], "wk": [L, H, Hkv*D], "wv": [L, H, Hkv*D],
#     "wo": [L, Hq*D, H],
#     "w_gate": [L, H, F], "w_up": [L, H, F], "w_down": [L, F, H],
#   }
#   "final_norm": [H]                          (fp)
#   "lm_head":    [H, V]                       (fp or QTensor; may alias embed.T)
# }


# Shared cache container + param accounting (see models/common.py).
from turboinfer_tpu.models.common import (KVCache, cache_bits_view,  # noqa: F401
                                          cache_from_bits, decode_kv,
                                          encode_kv, encode_kv_scaled,
                                          fuse_projections,
                                          resolve_fused_cache, layer_unroll,
                                          param_bytes,
                                          param_count, reset_cache)
from turboinfer_tpu.models.common import init_cache as _common_init_cache


# The llama-family forward threads int8 KV scales through the layer
# scan; other family modules raise via the engine gate until they do.
SUPPORTS_INT8_KV = True

# forward(fresh_prefill=True): attention reads the just-computed K/V
# directly on a cold prefill — engines opt in (see forward docstring).
SUPPORTS_FRESH_PREFILL = True


def init_cache(config, batch_size: int, max_seq=None, dtype=None,
               fused=False):
    """llama-family cache. fused: False (default) -> head-major
    [L, B, Hkv, T, D]; True -> fused-head [L, B, T, Hkv*D]; None ->
    auto (fused-head when the head-major Pallas decode kernel can't run
    — D % 128 != 0 — and packing makes it kernel-eligible). The engine/
    scheduler/speculative paths pass None; sharded/parallel paths keep
    the head-major default (their cache PartitionSpecs assume the 5-D
    shape). forward() handles both layouts."""
    if fused is None:
        fused = resolve_fused_cache(config, max_seq)
    return _common_init_cache(config, batch_size, max_seq, dtype,
                              fused=fused)


def _slot_w(lw, name, li, stacked_ndim=2):
    """Per-layer small weight (norm/bias): slice layer li from the
    stacked array when the full stack is passed with a traced index."""
    w = lw[name]
    if li is not None and w.ndim == stacked_ndim:
        return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
    return w


def _lora_delta(h, lw, slot, li):
    """Low-rank LoRA update for `slot`: (h @ A) @ B — the alpha/r
    scaling is folded into B at load (loader/lora.py). Returns None
    when no adapter targets the slot, so the base path compiles
    unchanged. Runs in f32 (r is tiny; precision beats speed here) and
    works on QUANTIZED bases — the adapter adds to the qmm output, no
    dequantized merge needed."""
    if f"lora_{slot}_a" not in lw:
        return None
    a = _slot_w(lw, f"lora_{slot}_a", li, stacked_ndim=3)
    b = _slot_w(lw, f"lora_{slot}_b", li, stacked_ndim=3)
    hf = h.astype(jnp.float32)
    return (hf @ a.astype(jnp.float32)) @ b.astype(jnp.float32)


def _add_lora(y, h, lw, slot, li):
    d = _lora_delta(h, lw, slot, li)
    return y if d is None else y + d.astype(y.dtype)


def qkv_proj(h, lw, li, B, S, Hq, Hkv, D, config=None):
    """q/k/v projections — one fused qmm when the params carry the
    "wqkv" slot (see common.fuse_projections), else three. Adds the
    q/k/v biases (Qwen2, config.attn_bias) and per-head q/k RMSNorm
    (Qwen3/Gemma3, config.qk_norm) when those slots are present."""
    if "wqkv" in lw:
        qkv = ops.qmatmul(h, lw["wqkv"], layer_index=li)
        if "b_qkv" in lw:
            qkv = qkv + _slot_w(lw, "b_qkv", li).astype(qkv.dtype)
        q = qkv[..., : Hq * D]
        k = qkv[..., Hq * D: (Hq + Hkv) * D]
        v = qkv[..., (Hq + Hkv) * D:]
    else:
        q = ops.qmatmul(h, lw["wq"], layer_index=li)
        k = ops.qmatmul(h, lw["wk"], layer_index=li)
        v = ops.qmatmul(h, lw["wv"], layer_index=li)
        if "b_q" in lw:
            q = q + _slot_w(lw, "b_q", li).astype(q.dtype)
            k = k + _slot_w(lw, "b_k", li).astype(k.dtype)
            v = v + _slot_w(lw, "b_v", li).astype(v.dtype)
    q = _add_lora(q, h, lw, "wq", li)
    k = _add_lora(k, h, lw, "wk", li)
    v = _add_lora(v, h, lw, "wv", li)
    whole_norm = False
    if "q_norm" in lw and config is not None and config.qk_norm:
        # OLMoE normalizes the WHOLE q/k projection (weight [Hq*D],
        # all heads jointly, pre-reshape); Qwen3/Gemma3 normalize
        # per head (weight [D]). Distinguish by the weight's width.
        off = 1.0 if config.norm_offset else 0.0
        qw = _slot_w(lw, "q_norm", li)
        whole_norm = qw.shape[-1] == Hq * D
        if whole_norm:
            q = ops.rms_norm(q, qw, config.rms_norm_eps, off)
            k = ops.rms_norm(k, _slot_w(lw, "k_norm", li),
                             config.rms_norm_eps, off)
    q = q.reshape(B, S, Hq, D)
    k = k.reshape(B, S, Hkv, D)
    v = v.reshape(B, S, Hkv, D)
    if ("q_norm" in lw and config is not None and config.qk_norm
            and not whole_norm):
        q = ops.rms_norm(q, _slot_w(lw, "q_norm", li),
                         config.rms_norm_eps, off)
        k = ops.rms_norm(k, _slot_w(lw, "k_norm", li),
                         config.rms_norm_eps, off)
    return q, k, v


def gate_up_proj(h, lw, li):
    """SwiGLU gate/up — one fused qmm when "w_gateup" is present."""
    if "w_gateup" in lw:
        gu = ops.qmatmul(h, lw["w_gateup"], layer_index=li)
        F = gu.shape[-1] // 2
        gate, up = gu[..., :F], gu[..., F:]
    else:
        gate = ops.qmatmul(h, lw["w_gate"], layer_index=li)
        up = ops.qmatmul(h, lw["w_up"], layer_index=li)
    return (_add_lora(gate, h, lw, "w_gate", li),
            _add_lora(up, h, lw, "w_up", li))


# ---------------------------------------------------------------------------
# Parameter init (synthetic fixture factory — reference counterpart:
# tests/test_kv_cache_incremental.cpp:18-118 create_kv_test_model)
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, config: ModelConfig,
                dtype=None) -> Dict[str, Any]:
    dtype = dtype or config.dtype
    H, V, L = config.hidden_size, config.vocab_size, config.num_layers
    QD, KVD, F = config.q_dim, config.kv_dim, config.ffn_dim
    keys = jax.random.split(rng, 9)

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
            "w_gate": w(keys[5], (L, H, F), H),
            "w_up": w(keys[6], (L, H, F), H),
            "w_down": w(keys[7], (L, F, H), F),
        },
        "final_norm": jnp.ones((H,), dtype),
        "lm_head": w(keys[8], (H, V), H),
    }
    layers = params["layers"]
    if config.attn_bias:
        bk = jax.random.split(keys[1], 3)
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
    if config.post_norms:
        layers["post_attn_norm"] = jnp.ones((L, H), dtype)
        layers["post_ffn_norm"] = jnp.ones((L, H), dtype)
    if config.norm_offset:
        # Gemma stores norm weights as (w - 1): ones -> zeros.
        for n in ("attn_norm", "ffn_norm", "q_norm", "k_norm",
                  "post_attn_norm", "post_ffn_norm"):
            if n in layers:
                layers[n] = jnp.zeros_like(layers[n])
        params["final_norm"] = jnp.zeros_like(params["final_norm"])
    if config.tie_embeddings:
        params["lm_head"] = params["embed"].T
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_forward(config: ModelConfig, x: jax.Array, lw: Dict[str, Any],
                   positions: jax.Array, k_cache: jax.Array,
                   v_cache: jax.Array, start: jax.Array, kv_len: jax.Array,
                   contiguous: bool = True, layer_index=None,
                   global_layer_index=None, fused_cache: bool = False,
                   k_scale=None, v_scale=None,
                   fresh_prefill: bool = False
                   ) -> Tuple[jax.Array, ...]:
    """One decoder block (reference: TransformerLayer::forward,
    inference_engine.cpp:203-233 — RMSNorm → attn → residual → RMSNorm →
    SwiGLU FFN → residual).

    x: [B, S, H]; positions: [B, S]; k_cache/v_cache: [B, Hkv, Tmax, D];
    start: [B] write offset (== cache length before this call);
    kv_len: [B] valid slots after this call's tokens are written.
    lw: per-layer weights — either already-sliced 2-D tensors
    (layer_index=None) or the FULL stacked [L, ...] dict with
    `layer_index` the traced layer id (the fast path: the qmm kernel
    then reads the stack directly, no slice materialization).
    k_scale/v_scale: int8-cache per-token scales ([..., Hkv, Tmax] f32,
    same leading layout as the cache) — written alongside the values
    and consumed by the attention kernels.
    Returns (x_out, k_cache', v_cache') — plus (k_scale', v_scale')
    when scales were passed.
    """
    B, S, H = x.shape
    Hq, Hkv, D = config.num_heads, config.kv_heads, config.head_dim_
    li = layer_index
    off = 1.0 if config.norm_offset else 0.0
    cap = config.attn_logit_softcap

    def norm_w(name):
        return _slot_w(lw, name, li)

    def norm(x, name):
        return ops.rms_norm(x, norm_w(name), config.rms_norm_eps, off)

    # Per-layer local/global pattern (Gemma2/3): layer i is global iff
    # (i + 1) % pattern == 0. With a traced layer id inside the layer
    # scan, the window/RoPE choice runs as a lax.cond over two
    # statically-shaped branches (each attention kernel keeps its
    # static window — only one branch executes per layer).
    # Under pipeline parallelism weights index by LOCAL stage layer id
    # while the local/global choice keys off the GLOBAL id —
    # global_layer_index carries the latter (parallel/pipeline.py).
    gli = li if global_layer_index is None else global_layer_index
    pattern = config.sliding_window_pattern
    alternating = bool(pattern and pattern > 1 and config.sliding_window)
    if alternating and gli is None:
        raise ValueError("sliding_window_pattern needs stacked weights "
                         "with a layer_index")
    is_global = ((gli + 1) % pattern == 0) if alternating else None

    h = norm(x, "attn_norm")
    q, k, v = qkv_proj(h, lw, li, B, S, Hq, Hkv, D, config)

    if alternating and config.rope_local_theta is not None:
        # Gemma3: local layers use a different RoPE base (and no
        # rope_scaling — scaling applies to the global layers only).
        fg = ops.rope_freqs(D, config.rope_theta,
                            scaling=config.rope_scaling)
        fl = ops.rope_freqs(D, config.rope_local_theta)
        freqs = jnp.where(is_global, fg, fl)
        q = ops.apply_rope(q, positions, mode=config.rope_mode, freqs=freqs)
        k = ops.apply_rope(k, positions, mode=config.rope_mode, freqs=freqs)
    else:
        q = ops.apply_rope(q, positions, config.rope_theta, config.rope_mode,
                           scaling=config.rope_scaling)
        k = ops.apply_rope(k, positions, config.rope_theta, config.rope_mode,
                           scaling=config.rope_scaling)
    if config.attn_scale is not None:
        # Kernels scale scores by D**-0.5; fold the override into q.
        q = (q.astype(jnp.float32)
             * (config.attn_scale * float(D) ** 0.5)).astype(q.dtype)

    # In-place HBM cache write at per-sequence offsets. All sequences in a
    # prefill share S new slots written at `start` (right-padded batches:
    # pads are written but masked out of attention by kv_len).
    if fused_cache and k_cache.ndim == 4:
        # Fused-head layout, stacked [L, B, T, Hkv*D] (decode): write one
        # [S, HD] row block per sequence, attend via the fused kernel
        # reading layer li straight from the stack (scalar prefetch).
        # int8: values quantize per (token, head); scales write into the
        # head-major [L, B, Hkv, T] planes (see decode_fused_pallas).
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
            if ks is not None:
                sidx = (li, b, 0, start[b])
                k_scale = jax.lax.dynamic_update_slice(
                    k_scale, ks[b].T[None, None], sidx)   # [1,1,Hkv,S]
                v_scale = jax.lax.dynamic_update_slice(
                    v_scale, vs[b].T[None, None], sidx)
        if S != 1:
            raise ValueError("stacked fused-cache path is decode-only")

        def dec(window):
            return lambda: ops.attention_decode_fused(
                q[:, 0], k_cache, v_cache, kv_len, layer_index=li,
                window=window, softcap=cap,
                k_scale=k_scale, v_scale=v_scale)
        if alternating:
            attn = jax.lax.cond(is_global, dec(None),
                                dec(config.sliding_window))
        else:
            attn = dec(config.sliding_window)()
        attn = attn[:, None]                                     # [B,1,Hq,D]
    elif fused_cache:
        # Fused-head layout, per-layer [B, T, Hkv*D] (prefill body).
        # Per-slot dynamic_update_slice (unrolled over the small static
        # B) — a vmapped DUS over traced per-sequence starts lowers to a
        # scatter, which XLA cannot update in place: it copied the whole
        # layer cache every layer (measured ~4 ms of a 55 ms 7B S=512
        # prefill before this fix).
        T = k_cache.shape[1]
        newkq, ks = encode_kv_scaled(k, k_cache.dtype)   # [B, S, Hkv, D]
        newvq, vs = encode_kv_scaled(v, v_cache.dtype)
        newk = newkq.reshape(B, S, Hkv * D)
        newv = newvq.reshape(B, S, Hkv * D)
        for b in range(B):
            idx = (b, start[b], 0)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk[b][None], idx)
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv[b][None], idx)
            if ks is not None:                # per-layer [B, Hkv, T]
                k_scale = jax.lax.dynamic_update_slice(
                    k_scale, ks[b].T[None], (b, 0, start[b]))
                v_scale = jax.lax.dynamic_update_slice(
                    v_scale, vs[b].T[None], (b, 0, start[b]))

        # Only the S>1 prefill body reaches the per-layer fused cache
        # (S==1 decode always goes through the stacked branch above).
        assert S > 1, "per-layer fused-cache path is prefill-only"
        if fresh_prefill and ks is None and newkq.dtype == q.dtype:
            # Cold prefill, uncompressed cache: the head-major view of
            # the just-computed K/V IS the whole valid cache — skip
            # decoding + transposing the full [B, T, Hkv*D] buffer.
            # (fp8 caches fail the dtype check: newkq holds raw e4m3
            # bits there.)
            kf = newkq.transpose(0, 2, 1, 3)
            vf = newvq.transpose(0, 2, 1, 3)
        else:
            # Prefill reads want head-major slabs: one transposed copy
            # per layer per prefill call — amortized over S tokens and
            # dwarfed by the prefill matmuls.
            from turboinfer_tpu.models.common import decode_kv_fused
            kf = decode_kv_fused(k_cache, q.dtype, k_scale).reshape(
                B, T, Hkv, D).transpose(0, 2, 1, 3)
            vf = decode_kv_fused(v_cache, q.dtype, v_scale).reshape(
                B, T, Hkv, D).transpose(0, 2, 1, 3)

        def pre(window):
            return lambda: ops.attention_prefill(
                q, kf, vf, causal=True, positions=positions,
                kv_len=kv_len, q_start=start if contiguous else None,
                window=window, softcap=cap)
        if alternating:
            attn = jax.lax.cond(is_global, pre(None),
                                pre(config.sliding_window))
        else:
            attn = pre(config.sliding_window)()
    elif k_cache.ndim == 5:
        # Decode/prefill over the FULL stacked [L, B, Hkv, T, D] cache:
        # per-slot in-place writes at (li, b, 0, start_b, 0) — a
        # vectorized scatter (or slicing layer li out first) makes XLA
        # copy the whole cache every layer — and the attention kernels
        # read layer li straight from the stacked HBM array via scalar
        # prefetch (decode AND flash-prefill).
        newk, ks = encode_kv_scaled(k.transpose(0, 2, 1, 3), k_cache.dtype)
        newv, vs = encode_kv_scaled(v.transpose(0, 2, 1, 3), v_cache.dtype)
        if S > 1:
            # Keep the transpose OUT of the update-slice fusion: fused,
            # the in-place cache write inherits the stride-swapped read
            # pattern and runs at ~68 GB/s (measured ~117 us/layer at
            # S=512); materialized first, the write is contiguous.
            newk, newv = jax.lax.optimization_barrier((newk, newv))
        import os as _os
        skip_writes = (fresh_prefill and S > 1 and ks is None
                       and _os.environ.get(
                           "TURBOINFER_PREFILL_SKIP_WRITES") == "1")
        # ^ MEASUREMENT ONLY: quantifies the cache-write cost (leaves
        # the cache stale — decode after it would be wrong).
        if (fresh_prefill and S > 1 and ks is None and not skip_writes
                and _os.environ.get("TURBOINFER_PREFILL_WRITER") != "0"):
            # Fresh prefill: write the slab with the aliased Pallas
            # writer — XLA's scanned DUS measured ~10x the raw byte
            # cost here (kernels/pallas/cache_write.py).
            from turboinfer_tpu.kernels.dispatch import pallas_enabled
            if pallas_enabled():
                from turboinfer_tpu.kernels.pallas.cache_write import \
                    cache_write_fresh
                kc2 = cache_write_fresh(k_cache, newk, li)
                if kc2 is not None:
                    k_cache = kc2
                    v_cache = cache_write_fresh(v_cache, newv, li)
                    skip_writes = True          # writer replaced the DUS
        for b in range(B) if not skip_writes else ():
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
            def dec(window):
                return lambda: ops.attention_decode(
                    q[:, 0], k_cache, v_cache, kv_len, layer_index=li,
                    window=window, softcap=cap,
                    k_scale=k_scale, v_scale=v_scale)
            if alternating:
                attn = jax.lax.cond(is_global, dec(None),
                                    dec(config.sliding_window))
            else:
                attn = dec(config.sliding_window)()
            attn = attn[:, None]                                 # [B,1,Hq,D]
        elif fresh_prefill and ks is None and newk.dtype == q.dtype:
            # Cold prefill (caller guarantees cache.length == 0,
            # uncompressed cache — fp8 bit-views fail the dtype check):
            # attend the just-computed K/V DIRECTLY — the cache
            # writes above leave the critical path (XLA overlaps them
            # with attention/FFN; they only matter for later decode),
            # and the kernel streams a contiguous [B, Hkv, S, D] block
            # instead of masked tiles of the [L, ..., Tmax, D] stack.
            def pre(window):
                return lambda: ops.attention_prefill(
                    q, newk, newv, causal=True, positions=positions,
                    kv_len=kv_len, q_start=start if contiguous else None,
                    window=window, softcap=cap)
            if alternating:
                attn = jax.lax.cond(is_global, pre(None),
                                    pre(config.sliding_window))
            else:
                attn = pre(config.sliding_window)()
        else:
            def pre(window):
                return lambda: ops.attention_prefill(
                    q, k_cache, v_cache, causal=True, positions=positions,
                    kv_len=kv_len, q_start=start if contiguous else None,
                    window=window, softcap=cap, layer_index=li,
                    k_scale=k_scale, v_scale=v_scale)
            if alternating:
                attn = jax.lax.cond(is_global, pre(None),
                                    pre(config.sliding_window))
            else:
                attn = pre(config.sliding_window)()
    else:
        # Per-slot in-place writes, unrolled over static B (a vmapped
        # DUS over traced starts is a scatter -> full-cache copy per
        # layer; same trap and fix as the stacked decode branch above).
        newk, ks = encode_kv_scaled(k.transpose(0, 2, 1, 3), k_cache.dtype)
        newv, vs = encode_kv_scaled(v.transpose(0, 2, 1, 3), v_cache.dtype)
        for b in range(B):
            idx = (b, 0, start[b], 0)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk[b][None], idx)
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv[b][None], idx)
            if ks is not None:
                k_scale = jax.lax.dynamic_update_slice(
                    k_scale, ks[b][None], (b, 0, start[b]))
                v_scale = jax.lax.dynamic_update_slice(
                    v_scale, vs[b][None], (b, 0, start[b]))

        if S == 1:
            def dec(window):
                return lambda: ops.attention_decode(
                    q[:, 0], k_cache, v_cache, kv_len, window=window,
                    softcap=cap, k_scale=k_scale, v_scale=v_scale)
            if alternating:
                attn = jax.lax.cond(is_global, dec(None),
                                    dec(config.sliding_window))
            else:
                attn = dec(config.sliding_window)()
            attn = attn[:, None]                                 # [B,1,Hq,D]
        else:
            kf = decode_kv(k_cache, q.dtype, k_scale)
            vf = decode_kv(v_cache, q.dtype, v_scale)

            def pre(window):
                return lambda: ops.attention_prefill(
                    q, kf, vf, causal=True, positions=positions,
                    kv_len=kv_len, q_start=start if contiguous else None,
                    window=window, softcap=cap)
            if alternating:
                attn = jax.lax.cond(is_global, pre(None),
                                    pre(config.sliding_window))
            else:
                attn = pre(config.sliding_window)()

    attn = attn.reshape(B, S, Hq * D).astype(x.dtype)
    attn_out = _add_lora(
        ops.qmatmul(attn, lw["wo"], layer_index=li), attn, lw, "wo", li)
    if config.post_norms:
        attn_out = norm(attn_out, "post_attn_norm")
    if config.residual_multiplier:                 # Granite
        attn_out = attn_out * jnp.asarray(config.residual_multiplier,
                                          attn_out.dtype)
    x = x + attn_out

    h = norm(x, "ffn_norm")
    gate, up = gate_up_proj(h, lw, li)
    g = ops.glu(gate, up, config.hidden_act).astype(x.dtype)
    ffn_out = _add_lora(
        ops.qmatmul(g, lw["w_down"], layer_index=li), g, lw, "w_down", li)
    if config.post_norms:
        ffn_out = norm(ffn_out, "post_ffn_norm")
    if config.residual_multiplier:
        ffn_out = ffn_out * jnp.asarray(config.residual_multiplier,
                                        ffn_out.dtype)
    x = x + ffn_out
    if k_scale is not None:
        return x, k_cache, v_cache, k_scale, v_scale
    return x, k_cache, v_cache


def forward(params: Dict[str, Any], config: ModelConfig, tokens: jax.Array,
            cache: KVCache, *, positions: Optional[jax.Array] = None,
            seq_lens: Optional[jax.Array] = None,
            logit_idx: Optional[jax.Array] = None,
            fresh_prefill: bool = False
            ) -> Tuple[jax.Array, KVCache]:
    """Forward pass over `tokens` [B, S] appending to `cache`.

    Covers both prefill (S>1, cache.length==0 or chunked) and decode (S==1)
    — the reference's forward_pass (inference_engine.cpp:1429-1491) and
    forward_pass_incremental (:1493-1552) collapse into this one function.

    positions: [B, S] absolute positions; default start + arange(S).
    seq_lens: [B] number of NEW valid tokens per sequence (<= S); default S.
    logit_idx: [B] optional per-sequence position — compute the head for
    ONLY that position (returns logits [B, 1, V]); skips S-1/S of the
    lm_head FLOPs in prefill.
    fresh_prefill: caller GUARANTEES cache.length == 0 (cold prefill of
    a whole prompt) — head-major fp prefills then attend the
    just-computed K/V directly, so the cache writes overlap with
    compute instead of gating the attention kernel (engines pass this;
    chunked prefill must not).
    Returns (logits [B, S, V] fp32, cache').
    """
    B, S = tokens.shape
    start = cache.length                                         # [B]
    contiguous = positions is None
    if positions is None:
        positions = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    kv_len = start + seq_lens                                    # [B]

    x = ops.embed_lookup(params["embed"], tokens, config.dtype)
    if config.scale_embeddings:
        # Gemma multiplies embeddings by sqrt(H) ROUNDED to the model
        # dtype (HF casts the normalizer to the activation dtype).
        x = x * jnp.asarray(config.hidden_size ** 0.5, config.dtype)
    if config.embedding_multiplier:                # Granite
        x = x * jnp.asarray(config.embedding_multiplier, config.dtype)

    # Cache rides the scan CARRY and is updated in place at layer i via
    # dynamic_update_index. Passing it through scan xs/ys instead makes
    # XLA's copy-insertion duplicate the FULL stacked cache every layer
    # (~220 MB/layer/step measured on 7B decode — the dominant cost).
    # Weights stay STACKED in the scan closure; the body only passes the
    # layer id. The qmm kernel indexes the stack via scalar prefetch, so
    # neither weights nor cache are sliced into per-layer copies.
    # fp8 caches are carried as uint8 bit views (see common.encode_kv —
    # an fp8 bitcast/astype inside the body copies the whole cache).
    layers = params["layers"]
    was_fp8 = cache.k.dtype == jnp.float8_e4m3fn
    fused = cache.fused_layout
    cache = cache_bits_view(cache)

    scaled = cache.k_scale is not None
    if S == 1 or (not fused and cache.k.ndim == 5):
        # Decode AND head-major prefill: the stacked cache flows
        # through whole — _layer_forward writes token slots in place
        # and the attention kernels read their layer via scalar
        # prefetch. Slicing layer i here instead costs a full
        # [B, Hkv, T, D] copy (plus write-back) per layer per step —
        # measured 39 -> 72 ms/step going T=1024 -> 2048 on 7B-int4
        # B=8 decode with the slice, flat ~12 ms without; for S=512
        # 7B prefill the slices cost ~5 ms of a 55 ms pass. Compressed
        # caches ride the stacked flash kernel too (uint8 e4m3 decoded
        # in-kernel, int8 via its scale planes); its jnp fallback
        # slices + dequants per layer, same cost as the old slicing
        # body.
        def body(carry, i):
            x, k_full, v_full, ks, vs = carry
            out = _layer_forward(
                config, x, layers, positions, k_full, v_full,
                start, kv_len, contiguous=contiguous, layer_index=i,
                fused_cache=fused, k_scale=ks, v_scale=vs,
                fresh_prefill=fresh_prefill)
            x, k_full, v_full = out[:3]
            ks, vs = out[3:] if scaled else (ks, vs)
            return (x, k_full, v_full, ks, vs), None
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
                                 k_scale=kss, v_scale=vss,
                                 # without this the fused-layout cold-
                                 # prefill fast path (attend the just-
                                 # computed K/V, skip the full-buffer
                                 # decode+transpose) was dead code
                                 fresh_prefill=fresh_prefill)
            x, kc, vc = out[:3]
            k_full = jax.lax.dynamic_update_index_in_dim(k_full, kc, i, 0)
            v_full = jax.lax.dynamic_update_index_in_dim(v_full, vc, i, 0)
            if scaled:
                ksf = jax.lax.dynamic_update_index_in_dim(ksf, out[3], i, 0)
                vsf = jax.lax.dynamic_update_index_in_dim(vsf, out[4], i, 0)
            return (x, k_full, v_full, ksf, vsf), None

    (x, k_new, v_new, ks_new, vs_new), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
        jnp.arange(config.num_layers, dtype=jnp.int32),
        unroll=layer_unroll(config.num_layers))
    k_new, v_new = cache_from_bits(k_new, v_new, was_fp8)

    if logit_idx is not None:
        # last-token-only head: prefill callers that need just the
        # sampling logits skip the [B, S, V] full-vocab matmul (S x the
        # needed FLOPs and a ~65 MB f32 materialization at 7B S=512)
        x = jnp.take_along_axis(
            x, logit_idx[:, None, None].astype(jnp.int32), axis=1)
    x = ops.rms_norm(x, params["final_norm"], config.rms_norm_eps,
                     1.0 if config.norm_offset else 0.0)
    logits = ops.qmatmul(x, params["lm_head"], preferred_dtype=jnp.float32)
    logits = ops.apply_softcap(logits.astype(jnp.float32),
                               config.final_logit_softcap)
    if config.logits_scaling:                      # Granite: logits / m
        logits = logits / config.logits_scaling
    return logits, KVCache(k=k_new, v=v_new, length=kv_len,
                           k_scale=ks_new, v_scale=vs_new)


def _dense_ffn(config: ModelConfig, h: jax.Array, layers: Dict[str, Any],
               i) -> jax.Array:
    """The dense GLU FFN block (paged-decode ffn_fn hook default)."""
    gate, up = gate_up_proj(h, layers, i)
    return ops.qmatmul(ops.glu(gate, up, config.hidden_act).astype(h.dtype),
                       layers["w_down"], layer_index=i)


def forward_paged_decode(params: Dict[str, Any], config: ModelConfig,
                         tokens: jax.Array, k_pages: jax.Array,
                         v_pages: jax.Array, block_table: jax.Array,
                         lengths: jax.Array, *,
                         ffn_fn=_dense_ffn,
                         k_scale_pages=None, v_scale_pages=None
                         ) -> Tuple[jax.Array, ...]:
    """One decode step over a PAGED KV cache (engine/paged_cache.py).

    tokens: [B] current token per slot; k_pages/v_pages:
    [L, P, Hkv, page, D] shared page pool; block_table: [B, max_pages];
    lengths: [B] tokens already cached (the new token is written at
    position `lengths[b]`, into page block_table[b, lengths[b]//page]).
    k_scale_pages/v_scale_pages: int8-pool per-token scales
    ([L, P, Hkv, page] f32) — written alongside and consumed by the
    paged kernel; when passed, the return grows to
    (logits, kp, vp, ksp, vsp).
    Returns (logits [B, V] fp32, k_pages', v_pages'). Same decoder body
    as `forward` (reference: forward_pass_incremental,
    inference_engine.cpp:1493-1552) but the cache write is a scatter
    into the sequence's current page and attention walks the block
    table (Pallas paged kernel on TPU; gather reference elsewhere).

    The body is the G=1 case of `forward_paged_verify` (one shared
    decoder — a feature added to one could otherwise silently miss the
    other and diverge speculative serving from plain paged decoding);
    at G=1 the verify body dispatches the single-query decode kernel,
    so this wrapper compiles to the same program as the old
    standalone body.
    """
    out = forward_paged_verify(params, config, tokens[:, None], k_pages,
                               v_pages, block_table, lengths,
                               ffn_fn=ffn_fn,
                               k_scale_pages=k_scale_pages,
                               v_scale_pages=v_scale_pages)
    return (out[0][:, 0],) + out[1:]


def forward_paged_verify(params: Dict[str, Any], config: ModelConfig,
                         tokens: jax.Array, k_pages: jax.Array,
                         v_pages: jax.Array, block_table: jax.Array,
                         lengths: jax.Array, *,
                         ffn_fn=_dense_ffn,
                         k_scale_pages=None, v_scale_pages=None
                         ) -> Tuple[jax.Array, ...]:
    """SPECULATIVE-VERIFY forward over the paged cache: G tokens per
    slot in ONE pass (tokens [B, G] = current token + G-1 drafts).
    Each token's K/V writes into its page at position lengths[b] + g;
    attention runs the multi-query paged kernel (the prefix streams
    once for all G queries — kernels/pallas/paged_attention.
    paged_verify_pallas). Returns (logits [B, G, V] f32, k_pages',
    v_pages'[, ksp', vsp']). The caller owns length rollback (host
    block-table lengths advance only by the accepted count; rejected
    drafts' K/V is dead weight past the length, overwritten later —
    the same trick as the contiguous speculative round)."""
    B, G = tokens.shape
    Hq, Hkv, D = config.num_heads, config.kv_heads, config.head_dim_
    cap = config.attn_logit_softcap
    pattern = config.sliding_window_pattern
    alternating = bool(pattern and pattern > 1 and config.sliding_window)
    page = k_pages.shape[3]
    P = k_pages.shape[1]
    positions = lengths[:, None] + jnp.arange(G, dtype=jnp.int32)[None]
    kv_len = lengths + G
    # page id + in-page offset per (b, g)
    pidx = positions // page                                 # [B, G]
    poff = positions % page
    page_ids = jnp.clip(jnp.take_along_axis(block_table, pidx, axis=1),
                        0, P - 1)

    x = ops.embed_lookup(params["embed"], tokens, config.dtype)
    if config.scale_embeddings:
        x = x * jnp.asarray(config.hidden_size ** 0.5, config.dtype)
    if config.embedding_multiplier:
        x = x * jnp.asarray(config.embedding_multiplier, config.dtype)
    off = 1.0 if config.norm_offset else 0.0
    layers = params["layers"]
    was_fp8 = k_pages.dtype == jnp.float8_e4m3fn
    if was_fp8:
        k_pages = jax.lax.bitcast_convert_type(k_pages, jnp.uint8)
        v_pages = jax.lax.bitcast_convert_type(v_pages, jnp.uint8)

    def norm_w(w, i):
        return jax.lax.dynamic_index_in_dim(w, i, 0, keepdims=False) \
            if w.ndim == 2 else w

    def body(carry, i):
        x, kp_full, vp_full, ksp_full, vsp_full = carry
        h = ops.rms_norm(x, norm_w(layers["attn_norm"], i),
                         config.rms_norm_eps, off)
        q, k, v = qkv_proj(h, layers, i, B, G, Hq, Hkv, D, config)
        is_global = ((i + 1) % pattern == 0) if alternating else None
        if alternating and config.rope_local_theta is not None:
            fg = ops.rope_freqs(D, config.rope_theta,
                                scaling=config.rope_scaling)
            fl = ops.rope_freqs(D, config.rope_local_theta)
            freqs = jnp.where(is_global, fg, fl)
            q = ops.apply_rope(q, positions, mode=config.rope_mode,
                               freqs=freqs)
            k = ops.apply_rope(k, positions, mode=config.rope_mode,
                               freqs=freqs)
        else:
            q = ops.apply_rope(q, positions, config.rope_theta,
                               config.rope_mode,
                               scaling=config.rope_scaling)
            k = ops.apply_rope(k, positions, config.rope_theta,
                               config.rope_mode,
                               scaling=config.rope_scaling)
        if config.attn_scale is not None:
            q = (q.astype(jnp.float32)
                 * (config.attn_scale * float(D) ** 0.5)).astype(q.dtype)

        # per-(slot, token) in-place page writes (B and G are small and
        # static; a vector scatter would copy the pool every layer —
        # see forward_paged_decode)
        for b in range(B):
            for g in range(G):
                idx = (i, page_ids[b, g], 0, poff[b, g], 0)
                kq, ks = encode_kv_scaled(k[b, g], kp_full.dtype)
                vq, vs = encode_kv_scaled(v[b, g], vp_full.dtype)
                kp_full = jax.lax.dynamic_update_slice(
                    kp_full, kq[None, None, :, None, :], idx)
                vp_full = jax.lax.dynamic_update_slice(
                    vp_full, vq[None, None, :, None, :], idx)
                if ks is not None:
                    sidx = (i, page_ids[b, g], 0, poff[b, g])
                    ksp_full = jax.lax.dynamic_update_slice(
                        ksp_full, ks[None, None, :, None], sidx)
                    vsp_full = jax.lax.dynamic_update_slice(
                        vsp_full, vs[None, None, :, None], sidx)

        # G == 1 (forward_paged_decode delegating here) keeps the
        # single-query decode kernel — identical dispatch to the
        # pre-unification decode body, so the hot serving path's
        # program is unchanged.
        if G == 1:
            def ver(window):
                return lambda: ops.attention_paged_decode(
                    q[:, 0], kp_full, vp_full, block_table, kv_len,
                    layer_index=i, window=window, softcap=cap,
                    k_scale=ksp_full, v_scale=vsp_full)[:, None]
        else:
            def ver(window):
                return lambda: ops.attention_paged_verify(
                    q, kp_full, vp_full, block_table, kv_len,
                    layer_index=i, window=window, softcap=cap,
                    k_scale=ksp_full, v_scale=vsp_full)
        if alternating:
            attn = jax.lax.cond(is_global, ver(None),
                                ver(config.sliding_window))
        else:
            attn = ver(config.sliding_window)()
        attn = attn.reshape(B, G, Hq * D)
        attn_out = ops.qmatmul(attn.astype(x.dtype), layers["wo"],
                               layer_index=i)
        if config.post_norms:
            attn_out = ops.rms_norm(attn_out,
                                    norm_w(layers["post_attn_norm"], i),
                                    config.rms_norm_eps, off)
        if config.residual_multiplier:
            attn_out = attn_out * jnp.asarray(config.residual_multiplier,
                                              attn_out.dtype)
        x = x + attn_out
        h = ops.rms_norm(x, norm_w(layers["ffn_norm"], i),
                         config.rms_norm_eps, off)
        ffn_out = ffn_fn(config, h, layers, i)
        if config.post_norms:
            ffn_out = ops.rms_norm(ffn_out,
                                   norm_w(layers["post_ffn_norm"], i),
                                   config.rms_norm_eps, off)
        if config.residual_multiplier:
            ffn_out = ffn_out * jnp.asarray(config.residual_multiplier,
                                            ffn_out.dtype)
        x = x + ffn_out
        return (x, kp_full, vp_full, ksp_full, vsp_full), None

    (x, k_new, v_new, ks_new, vs_new), _ = jax.lax.scan(
        body, (x, k_pages, v_pages, k_scale_pages, v_scale_pages),
        jnp.arange(config.num_layers, dtype=jnp.int32))
    k_new, v_new = cache_from_bits(k_new, v_new, was_fp8)

    x = ops.rms_norm(x, params["final_norm"], config.rms_norm_eps,
                     1.0 if config.norm_offset else 0.0)
    logits = ops.qmatmul(x, params["lm_head"], preferred_dtype=jnp.float32)
    logits = ops.apply_softcap(logits.astype(jnp.float32),
                               config.final_logit_softcap)
    if config.logits_scaling:
        logits = logits / config.logits_scaling
    if k_scale_pages is not None:
        return logits, k_new, v_new, ks_new, vs_new
    return logits, k_new, v_new


def forward_no_cache(params: Dict[str, Any], config: ModelConfig,
                     tokens: jax.Array,
                     seq_lens: Optional[jax.Array] = None) -> jax.Array:
    """Cacheless full-sequence forward (use_cache=False honored — the
    reference's flag silently does nothing, SURVEY.md quirk #9)."""
    B, S = tokens.shape
    cache = init_cache(config, B, max_seq=S)
    logits, _ = forward(params, config, tokens, cache, seq_lens=seq_lens)
    return logits
