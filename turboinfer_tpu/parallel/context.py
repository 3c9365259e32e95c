"""Context parallelism as a SERVABLE engine path.

The reference hard-caps sequence length at 2048 and materializes full
[S, S] scores in prefill (reference: src/model/inference_engine.cpp
:347-359, SURVEY.md §5 "long-context: nothing"). This module is the
piece SURVEY §5 actually calls for — a prefill+decode pipeline whose KV
cache is SEQUENCE-SHARDED over a mesh axis, so the attention working
set of a long context splits 1/P per chip and contexts larger than one
chip's HBM are servable through the ordinary InferenceEngine API
(`InferenceEngine(mesh=..., parallel="cp")`) and the continuous-batching
scheduler (`ContinuousBatchingScheduler(mesh=..., parallel="cp")`).

Design (TPU-first):
  - CPCache = (ctx, tail). The PROMPT KV (`k_ctx`/`v_ctx`,
    [L, B, Hkv, S, D]) stays sharded on the sequence axis over the mesh
    — exactly where each device computed it, no routing. The DECODE
    tail (`k_tail`/`v_tail`, [L, B, Hkv, T_tail, D]) replicates: every
    device appends the same new token K/V (decode compute is
    replicated), so appends need no collective. The huge part of a
    long-context cache is the prompt; the tail is the generation
    budget.
  - Prefill: one shard_map — each device embeds its S/P token chunk,
    computes per-layer QKV locally (weights replicated), runs RING
    attention (KV chunks rotate via ppermute, online-softmax partials
    accumulate — kernels never see an [S, S] score tile), and writes
    its cache slice in place. Logits come back sequence-sharded.
    Alternative strategy="ulysses" (when Hq and Hkv divide the ring
    size): all_to_all swaps the sharded axis seq->heads, ordinary
    full-sequence attention runs on head shards, and swaps back —
    fewer collective hops than the ring when heads >= chips
    (SURVEY §5 "Ulysses-style all-to-all head exchange").
  - Decode: replicated single-token compute; attention combines each
    device's partials over its ctx chunk with the locally-computed tail
    partials via pmax/psum — one collective pair per layer, no K/V
    movement.
  - int8 KV (kv_cache_dtype="int8"): ctx/tail store int8 with
    per-(token, head) absmax scale planes ([L, B, Hkv, T] f32; the ctx
    planes shard with the sequence axis). The compressed cache matters
    MOST at the contexts CP exists for — it halves the dominant HBM
    term. The ring rotates the quantize->dequantized values so prefill
    compute sees exactly what decode will read.

Feature coverage matches the llama-family forward (sliding windows
incl. the Gemma2/3 local/global alternation + per-layer RoPE bases,
logit softcaps, attn_scale, post-norms, residual multipliers, qk-norm,
attention biases) plus the MoE family (Mixtral/Qwen-MoE routed FFN).
Numerics match <family>.forward (same ops.* building blocks, f32
online-softmax) — greedy trajectories are identical on CPU goldens.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.kernels import ops
from turboinfer_tpu.models.common import decode_kv, encode_kv_scaled

SP_AXIS = "sp"
NEG_INF = -1e30

_CP_FAMILIES = ("llama", "moe")


class CPCache(NamedTuple):
    """Sequence-sharded prompt cache + replicated decode tail.
    *_scale planes are present only for int8 caches (per-(token, head)
    absmax, value = int8_code * scale): ctx scales shard with the ctx
    sequence axis, tail scales replicate with the tail."""
    k_ctx: jax.Array      # [L, B, Hkv, S_ctx, D] sharded on axis 3
    v_ctx: jax.Array
    k_tail: jax.Array     # [L, B, Hkv, T_tail, D] replicated
    v_tail: jax.Array
    ctx_len: jax.Array    # [B] valid prompt tokens (<= S_ctx)
    length: jax.Array     # [B] total cached tokens (prompt + decoded)
    k_ctx_scale: Optional[jax.Array] = None   # [L, B, Hkv, S_ctx] f32
    v_ctx_scale: Optional[jax.Array] = None
    k_tail_scale: Optional[jax.Array] = None  # [L, B, Hkv, T_tail] f32
    v_tail_scale: Optional[jax.Array] = None


def _family(config: ModelConfig) -> str:
    from turboinfer_tpu.models import registry
    return registry.get_model(config.architecture).__name__.rsplit(
        ".", 1)[-1]


def check_config(config: ModelConfig):
    """CP covers the llama family (all per-layer features threaded) and
    the MoE family at moe.forward's feature level; other families fail
    loudly instead of silently diverging."""
    family = _family(config)
    if family not in _CP_FAMILIES:
        raise NotImplementedError(
            f"context-parallel engine supports {'/'.join(_CP_FAMILIES)} "
            f"decoders, not '{config.architecture}' ({family})")
    if family == "moe":
        # moe.forward ignores these knobs; rejecting keeps CP
        # trajectory-identical to the family forward.
        unsupported = [n for n, v in (
            ("attn_logit_softcap", config.attn_logit_softcap),
            ("attn_scale", config.attn_scale),
            ("post_norms", config.post_norms),
            ("residual_multiplier", config.residual_multiplier),
            ("sliding_window_pattern", config.sliding_window_pattern),
            ("rope_scaling", config.rope_scaling),
            # _embed/_head/norm-offset apply these, but moe.forward
            # ignores them — letting them through would make CP
            # trajectories silently diverge from the single-chip moe
            # engine on such (synthetic) configs
            ("final_logit_softcap", config.final_logit_softcap),
            ("logits_scaling", config.logits_scaling),
            ("scale_embeddings", config.scale_embeddings),
            ("embedding_multiplier", config.embedding_multiplier),
            ("norm_offset", config.norm_offset)) if v]
        if unsupported:
            raise NotImplementedError(
                "context-parallel moe does not support: "
                + ", ".join(unsupported))


def init_cp_cache(config: ModelConfig, batch_size: int, s_ctx: int,
                  t_tail: int, mesh: Mesh, axis: str = SP_AXIS,
                  dtype=None) -> CPCache:
    """Allocate + place a CPCache. s_ctx must divide the axis size.
    dtype=jnp.int8 adds the scale planes (compressed long-context
    cache)."""
    L, B = config.num_layers, batch_size
    Hkv, D = config.kv_heads, config.head_dim_
    dtype = dtype or config.dtype
    p = mesh.shape[axis]
    if s_ctx % p:
        raise ValueError(f"ctx width {s_ctx} not divisible by cp={p}")
    ctx_ns = NamedSharding(mesh, P(None, None, None, axis, None))
    ctx_sc_ns = NamedSharding(mesh, P(None, None, None, axis))
    rep = lambda a: jax.device_put(a, NamedSharding(
        mesh, P(*([None] * a.ndim))))
    z = jnp.zeros
    scales = {}
    if dtype == jnp.int8:
        scales = dict(
            k_ctx_scale=jax.device_put(
                z((L, B, Hkv, s_ctx), jnp.float32), ctx_sc_ns),
            v_ctx_scale=jax.device_put(
                z((L, B, Hkv, s_ctx), jnp.float32), ctx_sc_ns),
            k_tail_scale=rep(z((L, B, Hkv, t_tail), jnp.float32)),
            v_tail_scale=rep(z((L, B, Hkv, t_tail), jnp.float32)))
    return CPCache(
        k_ctx=jax.device_put(z((L, B, Hkv, s_ctx, D), dtype), ctx_ns),
        v_ctx=jax.device_put(z((L, B, Hkv, s_ctx, D), dtype), ctx_ns),
        k_tail=rep(z((L, B, Hkv, t_tail, D), dtype)),
        v_tail=rep(z((L, B, Hkv, t_tail, D), dtype)),
        ctx_len=rep(z((B,), jnp.int32)),
        length=rep(z((B,), jnp.int32)), **scales)


def _embed(params, config, tokens, positions):
    x = ops.embed_lookup(params["embed"], tokens, config.dtype)
    if config.scale_embeddings:
        x = x * jnp.asarray(config.hidden_size ** 0.5, config.dtype)
    if config.embedding_multiplier:
        x = x * jnp.asarray(config.embedding_multiplier, config.dtype)
    return x


def _head(params, config, x):
    h = ops.rms_norm(x, params["final_norm"], config.rms_norm_eps,
                     1.0 if config.norm_offset else 0.0)
    logits = ops.qmatmul(h, params["lm_head"], preferred_dtype=jnp.float32)
    logits = ops.apply_softcap(logits.astype(jnp.float32),
                               config.final_logit_softcap)
    if config.logits_scaling:
        logits = logits / config.logits_scaling
    return logits


def _layer_windows(config: ModelConfig):
    """Per-layer sliding-window widths as a static [L] array (0 = no
    window), honoring the Gemma2/3 local/global alternation; None when
    the model has no windows at all."""
    w = config.sliding_window
    if not w:
        return None
    pattern = config.sliding_window_pattern
    L = config.num_layers
    if pattern and pattern > 1:
        vals = [0 if (i + 1) % pattern == 0 else w for i in range(L)]
    else:
        vals = [w] * L
    return jnp.asarray(vals, jnp.int32)


def _partials_block(q, k, v, kpos, kv_valid, causal_qpos, window,
                    softcap):
    """One [Sq, T] score block of flash partials (see _partials).
    kpos: [B, T] global key positions; kv_valid: [B] keys with global
    position >= kv_valid[b] are masked; causal_qpos: [B, Sq] global
    query positions (None = no causal mask beyond kv_valid); window:
    traced [B?]-scalar per-layer window width (0/None = none); softcap:
    static float or None. Mask/softcap order matches
    ops.attention_prefill_ref (softcap on scaled scores BEFORE masks)."""
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    s = jnp.einsum("bshd,bhtd->bhst", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))                  # [B,Hq,Sq,T]
    s = ops.apply_softcap(s, softcap)
    mask = kpos[:, None, None, :] < kv_valid[:, None, None, None]
    if causal_qpos is not None:
        mask = mask & (kpos[:, None, None, :]
                       <= causal_qpos[:, None, :, None])
        if window is not None:
            win = (kpos[:, None, None, :]
                   > causal_qpos[:, None, :, None] - window)
            mask = mask & (win | (window <= 0))
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1)                                # [B,Hq,Sq]
    p = jnp.exp(s - m[..., None])
    p = jnp.where(m[..., None] <= NEG_INF / 2, 0.0, p)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhst,bhtd->bshd", p, v.astype(jnp.float32))
    return m, l, acc


def _cp_tile() -> int:
    import os
    return int(os.environ.get("TURBOINFER_CP_TILE", "2048"))


def _partials(q, k, v, kpos, kv_valid, causal_qpos=None, window=None,
              softcap=None):
    """Flash-style unnormalized partials of q [B, Sq, Hq, D] against
    k/v [B, Hkv, T, D] (cache-major layout). kpos: [T] or [B, T] global
    key positions; kv_valid: [B] keys with global position >=
    kv_valid[b] are masked; causal_qpos: [B, Sq] global query positions
    for causal masking (None = no causal mask beyond kv_valid); window:
    traced scalar per-layer window (0 = none; needs causal_qpos);
    softcap: static logit softcap.
    Returns (m [B,Hq,Sq], l [B,Hq,Sq], acc [B,Sq,Hq,D]) in f32.

    The KV axis is processed in TURBOINFER_CP_TILE-sized tiles with an
    online combine when T exceeds the tile — scores never materialize
    beyond [B, Hq, Sq, tile], which bounds per-ring-step activation
    memory for the huge per-chip chunks CP exists for (a 64k-context
    ring step would otherwise build an [Sq, Sq] f32 block)."""
    from turboinfer_tpu.kernels.ops import _repeat_kv
    B, Sq, Hq, D = q.shape
    k = _repeat_kv(k, Hq)
    v = _repeat_kv(v, Hq)
    T = k.shape[2]
    if kpos.ndim == 1:
        kpos = jnp.broadcast_to(kpos[None, :], (B, T))
    tile = _cp_tile()
    if T <= tile:
        return _partials_block(q, k, v, kpos, kv_valid, causal_qpos,
                               window, softcap)
    nt = -(-T // tile)
    pad = nt * tile - T
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # padded keys carry an impossible position -> masked everywhere
        kpos = jnp.pad(kpos, ((0, 0), (0, pad)), constant_values=2 ** 30)

    m0 = jnp.full((B, Hq, Sq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hq, Sq), jnp.float32)
    a0 = jnp.zeros((B, Sq, Hq, D), jnp.float32)

    def body(i, carry):
        m, l, a = carry
        kt = jax.lax.dynamic_slice_in_dim(k, i * tile, tile, 2)
        vt = jax.lax.dynamic_slice_in_dim(v, i * tile, tile, 2)
        pt = jax.lax.dynamic_slice_in_dim(kpos, i * tile, tile, 1)
        mi, li, ai = _partials_block(q, kt, vt, pt, kv_valid,
                                     causal_qpos, window, softcap)
        mm = jnp.maximum(m, mi)
        e1 = jnp.exp(m - mm)
        e2 = jnp.exp(mi - mm)
        l2 = l * e1 + li * e2
        a2 = (a * e1.transpose(0, 2, 1)[..., None]
              + ai * e2.transpose(0, 2, 1)[..., None])
        return mm, l2, a2

    return jax.lax.fori_loop(0, nt, body, (m0, l0, a0))


def _qkv(config, h, layers, li, B, S):
    from turboinfer_tpu.models.llama import qkv_proj
    Hq, Hkv, D = config.num_heads, config.kv_heads, config.head_dim_
    return qkv_proj(h, layers, li, B, S, Hq, Hkv, D, config)


def _rope_l(config, family, x, positions, li):
    """Per-layer RoPE: Gemma3-style local layers use rope_local_theta
    (and no scaling); moe matches moe.forward (WITH scaling — round 5
    aligned moe.forward with the paged path's llama delegation)."""
    if family == "moe":
        return ops.apply_rope(x, positions, config.rope_theta,
                              config.rope_mode,
                              scaling=config.rope_scaling)
    pattern = config.sliding_window_pattern
    alternating = bool(pattern and pattern > 1 and config.sliding_window)
    if alternating and config.rope_local_theta is not None:
        D = config.head_dim_
        fg = ops.rope_freqs(D, config.rope_theta,
                            scaling=config.rope_scaling)
        fl = ops.rope_freqs(D, config.rope_local_theta)
        is_global = (li + 1) % pattern == 0
        freqs = jnp.where(is_global, fg, fl)
        return ops.apply_rope(x, positions, mode=config.rope_mode,
                              freqs=freqs)
    return ops.apply_rope(x, positions, config.rope_theta,
                          config.rope_mode, scaling=config.rope_scaling)


def _attn_epilogue(config, family, x, attn, layers, li):
    """wo projection + post-norm/residual-multiplier residual add."""
    from turboinfer_tpu.models.llama import _add_lora
    attn_out = _add_lora(
        ops.qmatmul(attn, layers["wo"], layer_index=li), attn,
        layers, "wo", li)
    if family == "llama" and config.post_norms:
        attn_out = ops.rms_norm(attn_out,
                                _w1(layers, "post_attn_norm", li),
                                config.rms_norm_eps,
                                1.0 if config.norm_offset else 0.0)
    if family == "llama" and config.residual_multiplier:
        attn_out = attn_out * jnp.asarray(config.residual_multiplier,
                                          attn_out.dtype)
    return x + attn_out


def _ffn(config, family, x, layers, li):
    off = 1.0 if config.norm_offset else 0.0
    h = ops.rms_norm(x, _w1(layers, "ffn_norm", li), config.rms_norm_eps,
                     off)
    if family == "moe":
        from turboinfer_tpu.models.moe import _moe_ffn
        return x + _moe_ffn(config, h, layers, layer_index=li)
    from turboinfer_tpu.models.llama import _add_lora, gate_up_proj
    gate, up = gate_up_proj(h, layers, li)
    g = ops.glu(gate, up, config.hidden_act).astype(x.dtype)
    ffn_out = _add_lora(
        ops.qmatmul(g, layers["w_down"], layer_index=li), g, layers,
        "w_down", li)
    if config.post_norms:
        ffn_out = ops.rms_norm(ffn_out, _w1(layers, "post_ffn_norm", li),
                               config.rms_norm_eps, off)
    if config.residual_multiplier:
        ffn_out = ffn_out * jnp.asarray(config.residual_multiplier,
                                        ffn_out.dtype)
    return x + ffn_out


def _w1(layers, name, li):
    w = layers[name]
    if w.ndim == 2:
        return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
    return w


def _fold_attn_scale(config, q):
    if config.attn_scale is not None:
        # Kernels/partials scale scores by D**-0.5; fold the override in.
        D = q.shape[-1]
        q = (q.astype(jnp.float32)
             * (config.attn_scale * float(D) ** 0.5)).astype(q.dtype)
    return q


def cp_prefill(params: Dict[str, Any], config: ModelConfig,
               tokens: jax.Array, cache: CPCache, *, mesh: Mesh,
               axis: str = SP_AXIS,
               seq_lens: Optional[jax.Array] = None,
               strategy: str = "ring"
               ) -> Tuple[jax.Array, CPCache]:
    """Sequence-parallel prefill of `tokens` [B, S] (S == cache ctx
    width, a multiple of the axis size; right-padded rows masked by
    seq_lens). strategy: "ring" (ppermute KV rotation) or "ulysses"
    (all_to_all head exchange; requires Hq % P == 0 and Hkv % P == 0).
    Returns (logits [B, S, V] sequence-sharded, cache')."""
    B, S = tokens.shape
    p_sz = mesh.shape[axis]
    if S != cache.k_ctx.shape[3]:
        raise ValueError(f"prefill width {S} != ctx cache width "
                         f"{cache.k_ctx.shape[3]}")
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    family = _family(config)
    Hq = config.num_heads
    if strategy == "ulysses" and (Hq % p_sz or config.kv_heads % p_sz):
        raise ValueError(
            f"ulysses needs Hq ({Hq}) and Hkv ({config.kv_heads}) "
            f"divisible by the '{axis}' axis size {p_sz}")
    if strategy not in ("ring", "ulysses"):
        raise ValueError(f"unknown cp strategy '{strategy}'")
    s_loc = S // p_sz
    L = config.num_layers
    Hkv, D = config.kv_heads, config.head_dim_
    scaled = cache.k_ctx_scale is not None
    windows = _layer_windows(config)
    softcap = config.attn_logit_softcap if family == "llama" else None

    ctx_spec = P(None, None, None, axis, None)
    ctx_sc_spec = P(None, None, None, axis)
    tok_spec = P(None, axis)

    def local(params_l, toks, k_ctx, v_ctx, sl, *scs):
        me = jax.lax.axis_index(axis)
        q_off = me * s_loc
        positions = q_off + jnp.arange(s_loc, dtype=jnp.int32)[None, :]
        layers = params_l["layers"]
        x = _embed(params_l, config, toks, positions)
        perm = [(i, (i + 1) % p_sz) for i in range(p_sz)]
        ks_ctx, vs_ctx = scs if scaled else (None, None)

        def body(carry, li):
            x, kc, vc, ks, vs = carry
            h = ops.rms_norm(x, _w1(layers, "attn_norm", li),
                             config.rms_norm_eps,
                             1.0 if config.norm_offset else 0.0)
            q, k, v = _qkv(config, h, layers, li, B, s_loc)
            q = _rope_l(config, family, q, positions, li)
            k = _rope_l(config, family, k, positions, li)
            q = _fold_attn_scale(config, q)
            kt = k.transpose(0, 2, 1, 3)           # [B, Hkv, s_loc, D]
            vt = v.transpose(0, 2, 1, 3)
            ktq, ksq = encode_kv_scaled(kt, kc.dtype)
            vtq, vsq = encode_kv_scaled(vt, vc.dtype)
            kc = jax.lax.dynamic_update_slice(
                kc, ktq[None], (li, 0, 0, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, vtq[None], (li, 0, 0, 0, 0))
            if scaled:
                ks = jax.lax.dynamic_update_slice(
                    ks, ksq[None], (li, 0, 0, 0))
                vs = jax.lax.dynamic_update_slice(
                    vs, vsq[None], (li, 0, 0, 0))
                # attention sees the quantize->dequantized values —
                # exactly what the decode path will read back
                kt = decode_kv(ktq, x.dtype, ksq)
                vt = decode_kv(vtq, x.dtype, vsq)
            w_l = (None if windows is None
                   else jax.lax.dynamic_index_in_dim(windows, li, 0,
                                                     keepdims=False))

            if strategy == "ulysses":
                attn = _ulysses_attn(config, q, kt, vt, positions, sl,
                                     w_l, softcap, axis, p_sz, s_loc)
            else:
                attn = _ring_attn(q, kt, vt, positions, sl, w_l,
                                  softcap, axis, p_sz, s_loc, me, perm)
            attn = attn.reshape(B, s_loc, -1).astype(x.dtype)
            x = _attn_epilogue(config, family, x, attn, layers, li)
            x = _ffn(config, family, x, layers, li)
            return (x, kc, vc, ks, vs), None

        (x, k_ctx, v_ctx, ks_ctx, vs_ctx), _ = jax.lax.scan(
            body, (x, k_ctx, v_ctx, ks_ctx, vs_ctx),
            jnp.arange(L, dtype=jnp.int32))
        logits = _head(params_l, config, x)
        if scaled:
            return logits, k_ctx, v_ctx, ks_ctx, vs_ctx
        return logits, k_ctx, v_ctx

    rep = lambda nd: P(*([None] * nd))
    pspec = jax.tree_util.tree_map(
        lambda w: rep(w.ndim) if hasattr(w, "ndim") else P(), params)
    in_specs = (pspec, tok_spec, ctx_spec, ctx_spec, P(None))
    out_specs = (P(None, axis, None), ctx_spec, ctx_spec)
    args = [params, tokens, cache.k_ctx, cache.v_ctx, seq_lens]
    if scaled:
        in_specs = in_specs + (ctx_sc_spec, ctx_sc_spec)
        out_specs = out_specs + (ctx_sc_spec, ctx_sc_spec)
        args += [cache.k_ctx_scale, cache.v_ctx_scale]
    fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    out = fn(*args)
    repl = dict(ctx_len=seq_lens, length=seq_lens)
    if scaled:
        logits, k_ctx, v_ctx, ks, vs = out
        return logits, cache._replace(k_ctx=k_ctx, v_ctx=v_ctx,
                                      k_ctx_scale=ks, v_ctx_scale=vs,
                                      **repl)
    logits, k_ctx, v_ctx = out
    return logits, cache._replace(k_ctx=k_ctx, v_ctx=v_ctx, **repl)


def _ring_attn(q, kt, vt, positions, sl, w_l, softcap, axis, p_sz,
               s_loc, me, perm):
    """Ring attention over the sequence shards: rotate RAW-Hkv K/V
    chunks via ppermute, accumulate online-softmax partials for the
    local queries. Returns the normalized [B, s_loc, Hq, D] output."""
    B, _, Hq, D = q.shape
    m0 = jnp.full((B, Hq, s_loc), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hq, s_loc), jnp.float32)
    a0 = jnp.zeros((B, s_loc, Hq, D), jnp.float32)

    def ring(step, carry):
        kr, vr, m, l, a = carry
        src = (me - step) % p_sz

        def compute(mla):
            m, l, a = mla
            kpos = src * s_loc + jnp.arange(s_loc)
            mi, li_, ai = _partials(q, kr, vr, kpos, sl,
                                    causal_qpos=positions, window=w_l,
                                    softcap=softcap)
            mm = jnp.maximum(m, mi)
            e1 = jnp.exp(m - mm)
            e2 = jnp.exp(mi - mm)
            l2 = l * e1 + li_ * e2
            a2 = (a * e1.transpose(0, 2, 1)[..., None]
                  + ai * e2.transpose(0, 2, 1)[..., None])
            return mm, l2, a2

        # Block-causal skip: an entirely-future chunk contributes
        # nothing.
        needed = src * s_loc <= me * s_loc + s_loc - 1
        m, l, a = jax.lax.cond(needed, compute, lambda t: t, (m, l, a))
        kr = jax.lax.ppermute(kr, axis, perm)
        vr = jax.lax.ppermute(vr, axis, perm)
        return (kr, vr, m, l, a)

    _, _, m, l, a = jax.lax.fori_loop(0, p_sz, ring, (kt, vt, m0, l0, a0))
    denom = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return a / denom


def _ulysses_attn(config, q, kt, vt, positions, sl, w_l, softcap, axis,
                  p_sz, s_loc):
    """Ulysses head-exchange attention (SURVEY §5): all_to_all swaps
    the sharded axis seq->heads, each device runs ordinary causal
    attention for its Hq/P heads over the FULL sequence, and swaps
    back. K/V exchange at their RAW Hkv width (grouped GQA: device d's
    q heads [d*hq_loc, ...) consume exactly kv heads [d*hkv_loc, ...)
    when Hkv % P == 0, so the local repeat is correct). Returns the
    normalized [B, s_loc, Hq, D] output, seq-sharded again."""
    B, _, Hq, D = q.shape
    Hkv = kt.shape[1]
    S = s_loc * p_sz
    # [B, s_loc, Hq, D] -> [B, S, hq_loc, D]
    qh = jax.lax.all_to_all(q, axis, split_axis=2, concat_axis=1,
                            tiled=True)
    # K/V are cache-major [B, Hkv, s_loc, D]: heads axis 1, seq axis 2.
    kh = jax.lax.all_to_all(kt, axis, split_axis=1, concat_axis=2,
                            tiled=True)                # [B, hkv_loc, S, D]
    vh = jax.lax.all_to_all(vt, axis, split_axis=1, concat_axis=2,
                            tiled=True)
    # Global query positions for the full sequence; per-device kv_valid
    # masking is identical on every device (sl is replicated).
    qpos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :],
                            (B, S))
    m, l, a = _partials(qh, kh, vh, jnp.arange(S), sl,
                        causal_qpos=qpos, window=w_l, softcap=softcap)
    denom = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    out = (a / denom).astype(q.dtype)                  # [B, S, hq_loc, D]
    # back to seq-sharded [B, s_loc, Hq, D]
    return jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2,
                              tiled=True).astype(jnp.float32)


def cp_decode(params: Dict[str, Any], config: ModelConfig,
              tokens: jax.Array, cache: CPCache, *, mesh: Mesh,
              axis: str = SP_AXIS) -> Tuple[jax.Array, CPCache]:
    """One decode step over the sequence-sharded cache. tokens: [B, 1].
    Compute replicates; each device contributes online-softmax partials
    for its ctx chunk (pmax/psum combine), the replicated tail is added
    locally. Returns (logits [B, 1, V], cache')."""
    B = tokens.shape[0]
    p_sz = mesh.shape[axis]
    S_ctx = cache.k_ctx.shape[3]
    T_tail = cache.k_tail.shape[3]
    s_loc = S_ctx // p_sz
    L = config.num_layers
    Hq = config.num_heads
    D = config.head_dim_
    family = _family(config)
    scaled = cache.k_ctx_scale is not None
    windows = _layer_windows(config)
    softcap = config.attn_logit_softcap if family == "llama" else None

    ctx_spec = P(None, None, None, axis, None)
    ctx_sc_spec = P(None, None, None, axis)

    def local(params_l, toks, k_ctx, v_ctx, k_tail, v_tail, ctx_len,
              length, *scs):
        me = jax.lax.axis_index(axis)
        positions = length[:, None]                      # [B, 1] global
        t_fill = length - ctx_len                        # [B] tail fill
        layers = params_l["layers"]
        x = _embed(params_l, config, toks, positions)
        if scaled:
            ks_ctx, vs_ctx, ks_tail, vs_tail = scs
        else:
            ks_tail = vs_tail = None

        def body(carry, li):
            x, ktl, vtl, kst, vst = carry
            h = ops.rms_norm(x, _w1(layers, "attn_norm", li),
                             config.rms_norm_eps,
                             1.0 if config.norm_offset else 0.0)
            q, k, v = _qkv(config, h, layers, li, B, 1)
            q = _rope_l(config, family, q, positions, li)
            k = _rope_l(config, family, k, positions, li)
            q = _fold_attn_scale(config, q)
            # Append to the replicated tail (same write on every
            # device, per-slot in-place DUS like llama._layer_forward).
            for b in range(B):
                idx = (li, b, 0, t_fill[b], 0)
                kq, ksq = encode_kv_scaled(
                    k[b].transpose(1, 0, 2), ktl.dtype)   # [Hkv, 1, D]
                vq, vsq = encode_kv_scaled(
                    v[b].transpose(1, 0, 2), vtl.dtype)
                ktl = jax.lax.dynamic_update_slice(
                    ktl, kq[None, None], idx)
                vtl = jax.lax.dynamic_update_slice(
                    vtl, vq[None, None], idx)
                if scaled:
                    sidx = (li, b, 0, t_fill[b])
                    kst = jax.lax.dynamic_update_slice(
                        kst, ksq[None, None], sidx)
                    vst = jax.lax.dynamic_update_slice(
                        vst, vsq[None, None], sidx)

            w_l = (None if windows is None
                   else jax.lax.dynamic_index_in_dim(windows, li, 0,
                                                     keepdims=False))
            # ctx partials (local chunk, read-only). NOTE: the
            # per-layer dynamic_index costs one extra read of the
            # layer's chunk (slice copy, then the einsum reads it) —
            # a factor-~2 on CP decode's ctx traffic, NOT the 4x+
            # slice+write-back trap CLAUDE.md bans (this slice is
            # never written back).
            kc = jax.lax.dynamic_index_in_dim(k_ctx, li, 0,
                                              keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(v_ctx, li, 0,
                                              keepdims=False)
            if scaled:
                kc = decode_kv(kc, x.dtype, jax.lax.dynamic_index_in_dim(
                    ks_ctx, li, 0, keepdims=False))
                vc = decode_kv(vc, x.dtype, jax.lax.dynamic_index_in_dim(
                    vs_ctx, li, 0, keepdims=False))
            kpos_c = me * s_loc + jnp.arange(s_loc)
            m_c, l_c, a_c = _partials(q, kc, vc, kpos_c, ctx_len,
                                      causal_qpos=positions, window=w_l,
                                      softcap=softcap)
            # tail partials (identical on every device). Tail keys use
            # GLOBAL positions (ctx_len[b] + local index) so the window
            # mask composes with the ctx positions.
            kt = jax.lax.dynamic_index_in_dim(ktl, li, 0, keepdims=False)
            vt = jax.lax.dynamic_index_in_dim(vtl, li, 0, keepdims=False)
            if scaled:
                kt = decode_kv(kt, x.dtype, jax.lax.dynamic_index_in_dim(
                    kst, li, 0, keepdims=False))
                vt = decode_kv(vt, x.dtype, jax.lax.dynamic_index_in_dim(
                    vst, li, 0, keepdims=False))
            kpos_t = ctx_len[:, None] + jnp.arange(T_tail)[None, :]
            m_t, l_t, a_t = _partials(q, kt, vt, kpos_t,
                                      length + 1,        # incl. this tok
                                      causal_qpos=positions, window=w_l,
                                      softcap=softcap)
            # Combine: global max over devices + the local tail.
            g = jnp.maximum(jax.lax.pmax(m_c, axis), m_t)
            e_c = jnp.exp(m_c - g)
            e_t = jnp.exp(m_t - g)
            l = jax.lax.psum(l_c * e_c, axis) + l_t * e_t
            acc = (jax.lax.psum(
                a_c * e_c.transpose(0, 2, 1)[..., None], axis)
                + a_t * e_t.transpose(0, 2, 1)[..., None])
            denom = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
            attn = (acc / denom).reshape(B, 1, Hq * D).astype(x.dtype)
            x = _attn_epilogue(config, family, x, attn, layers, li)
            x = _ffn(config, family, x, layers, li)
            return (x, ktl, vtl, kst, vst), None

        (x, k_tail, v_tail, kst, vst), _ = jax.lax.scan(
            body, (x, k_tail, v_tail, ks_tail, vs_tail),
            jnp.arange(L, dtype=jnp.int32))
        logits = _head(params_l, config, x)
        if scaled:
            return logits, k_tail, v_tail, kst, vst
        return logits, k_tail, v_tail

    rep = lambda nd: P(*([None] * nd))
    pspec = jax.tree_util.tree_map(
        lambda w: rep(w.ndim) if hasattr(w, "ndim") else P(), params)
    in_specs = (pspec, P(None, None), ctx_spec, ctx_spec, rep(5), rep(5),
                P(None), P(None))
    out_specs = (P(None, None, None), rep(5), rep(5))
    args = [params, tokens, cache.k_ctx, cache.v_ctx, cache.k_tail,
            cache.v_tail, cache.ctx_len, cache.length]
    if scaled:
        in_specs = in_specs + (ctx_sc_spec, ctx_sc_spec, rep(4), rep(4))
        out_specs = out_specs + (rep(4), rep(4))
        args += [cache.k_ctx_scale, cache.v_ctx_scale,
                 cache.k_tail_scale, cache.v_tail_scale]
    fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    out = fn(*args)
    if scaled:
        logits, k_tail, v_tail, kst, vst = out
        return logits, cache._replace(k_tail=k_tail, v_tail=v_tail,
                                      k_tail_scale=kst, v_tail_scale=vst,
                                      length=cache.length + 1)
    logits, k_tail, v_tail = out
    return logits, cache._replace(k_tail=k_tail, v_tail=v_tail,
                                  length=cache.length + 1)

