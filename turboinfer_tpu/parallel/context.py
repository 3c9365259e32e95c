"""Context parallelism as a SERVABLE engine path.

The reference hard-caps sequence length at 2048 and materializes full
[S, S] scores in prefill (reference: src/model/inference_engine.cpp
:347-359, SURVEY.md §5 "long-context: nothing"). parallel/long_context.py
provides the bare ring/Ulysses ops; this module is the piece SURVEY §5
actually calls for — a prefill+decode pipeline whose KV cache is
SEQUENCE-SHARDED over a mesh axis, so the attention working set of a
long context splits 1/P per chip and contexts larger than one chip's
HBM are servable through the ordinary InferenceEngine API
(`InferenceEngine(mesh=..., parallel="cp")`).

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
  - Decode: replicated single-token compute; attention combines each
    device's partials over its ctx chunk with the locally-computed tail
    partials via pmax/psum — one collective pair per layer, no K/V
    movement.

Numerics match llama.forward (same ops.* building blocks, f32
online-softmax) — greedy trajectories are identical on CPU goldens.
Exotic per-layer features (sliding windows, logit softcaps, post
norms) raise honestly; see `check_config`.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.kernels import ops

SP_AXIS = "sp"
NEG_INF = -1e30


class CPCache(NamedTuple):
    """Sequence-sharded prompt cache + replicated decode tail."""
    k_ctx: jax.Array      # [L, B, Hkv, S_ctx, D] sharded on axis 3
    v_ctx: jax.Array
    k_tail: jax.Array     # [L, B, Hkv, T_tail, D] replicated
    v_tail: jax.Array
    ctx_len: jax.Array    # [B] valid prompt tokens (<= S_ctx)
    length: jax.Array     # [B] total cached tokens (prompt + decoded)


def check_config(config: ModelConfig):
    """The CP layer body covers the core llama family; features it does
    not thread yet fail loudly instead of silently diverging."""
    unsupported = []
    if config.sliding_window:
        unsupported.append("sliding_window")
    if config.attn_logit_softcap:
        unsupported.append("attn_logit_softcap")
    if config.attn_scale is not None:
        unsupported.append("attn_scale")
    if config.post_norms:
        unsupported.append("post_norms")
    if config.residual_multiplier:
        unsupported.append("residual_multiplier")
    from turboinfer_tpu.models import registry
    family = registry.get_model(config.architecture).__name__.rsplit(
        ".", 1)[-1]
    if family != "llama":
        unsupported.append(f"architecture '{config.architecture}'")
    if unsupported:
        raise NotImplementedError(
            "context-parallel engine does not support: "
            + ", ".join(unsupported))


def init_cp_cache(config: ModelConfig, batch_size: int, s_ctx: int,
                  t_tail: int, mesh: Mesh, axis: str = SP_AXIS,
                  dtype=None) -> CPCache:
    """Allocate + place a CPCache. s_ctx must divide the axis size."""
    L, B = config.num_layers, batch_size
    Hkv, D = config.kv_heads, config.head_dim_
    dtype = dtype or config.dtype
    p = mesh.shape[axis]
    if s_ctx % p:
        raise ValueError(f"ctx width {s_ctx} not divisible by cp={p}")
    ctx_ns = NamedSharding(mesh, P(None, None, None, axis, None))
    rep = lambda a: jax.device_put(a, NamedSharding(
        mesh, P(*([None] * a.ndim))))
    z = jnp.zeros
    return CPCache(
        k_ctx=jax.device_put(z((L, B, Hkv, s_ctx, D), dtype), ctx_ns),
        v_ctx=jax.device_put(z((L, B, Hkv, s_ctx, D), dtype), ctx_ns),
        k_tail=rep(z((L, B, Hkv, t_tail, D), dtype)),
        v_tail=rep(z((L, B, Hkv, t_tail, D), dtype)),
        ctx_len=rep(z((B,), jnp.int32)),
        length=rep(z((B,), jnp.int32)))


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


def _partials_block(q, k, v, kpos, kv_valid, causal_qpos):
    """One [Sq, T] score block of flash partials (see _partials)."""
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    s = jnp.einsum("bshd,bhtd->bhst", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))                  # [B,Hq,Sq,T]
    mask = kpos[None, None, None, :] < kv_valid[:, None, None, None]
    if causal_qpos is not None:
        mask = mask & (kpos[None, None, None, :]
                       <= causal_qpos[:, None, :, None])
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


def _partials(q, k, v, kpos, kv_valid, causal_qpos=None):
    """Flash-style unnormalized partials of q [B, Sq, Hq, D] against
    k/v [B, Hkv, T, D] (cache-major layout). kpos: [T] global key
    positions; kv_valid: [B] keys with global position >= kv_valid[b]
    are masked; causal_qpos: [B, Sq] global query positions for causal
    masking (None = no causal mask beyond kv_valid).
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
    tile = _cp_tile()
    if T <= tile:
        return _partials_block(q, k, v, kpos, kv_valid, causal_qpos)
    nt = -(-T // tile)
    pad = nt * tile - T
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # padded keys carry an impossible position -> masked everywhere
        kpos = jnp.pad(kpos, (0, pad), constant_values=2 ** 30)

    m0 = jnp.full((B, Hq, Sq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hq, Sq), jnp.float32)
    a0 = jnp.zeros((B, Sq, Hq, D), jnp.float32)

    def body(i, carry):
        m, l, a = carry
        kt = jax.lax.dynamic_slice_in_dim(k, i * tile, tile, 2)
        vt = jax.lax.dynamic_slice_in_dim(v, i * tile, tile, 2)
        pt = jax.lax.dynamic_slice_in_dim(kpos, i * tile, tile, 0)
        mi, li, ai = _partials_block(q, kt, vt, pt, kv_valid,
                                     causal_qpos)
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


def _rope(config, x, positions):
    return ops.apply_rope(x, positions, config.rope_theta,
                          config.rope_mode, scaling=config.rope_scaling)


def _ffn(config, x, layers, li):
    from turboinfer_tpu.models.llama import _add_lora, gate_up_proj
    h = ops.rms_norm(x, _w1(layers, "ffn_norm", li), config.rms_norm_eps,
                     1.0 if config.norm_offset else 0.0)
    gate, up = gate_up_proj(h, layers, li)
    g = ops.glu(gate, up, config.hidden_act).astype(x.dtype)
    return x + _add_lora(
        ops.qmatmul(g, layers["w_down"], layer_index=li), g, layers,
        "w_down", li)


def _w1(layers, name, li):
    w = layers[name]
    if w.ndim == 2:
        return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
    return w


def cp_prefill(params: Dict[str, Any], config: ModelConfig,
               tokens: jax.Array, cache: CPCache, *, mesh: Mesh,
               axis: str = SP_AXIS,
               seq_lens: Optional[jax.Array] = None
               ) -> Tuple[jax.Array, CPCache]:
    """Sequence-parallel prefill of `tokens` [B, S] (S == cache ctx
    width, a multiple of the axis size; right-padded rows masked by
    seq_lens). Returns (logits [B, S, V] sequence-sharded, cache')."""
    B, S = tokens.shape
    p_sz = mesh.shape[axis]
    if S != cache.k_ctx.shape[3]:
        raise ValueError(f"prefill width {S} != ctx cache width "
                         f"{cache.k_ctx.shape[3]}")
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    s_loc = S // p_sz
    L = config.num_layers
    Hkv, D = config.kv_heads, config.head_dim_

    ctx_spec = P(None, None, None, axis, None)
    tok_spec = P(None, axis)

    def local(params_l, toks, k_ctx, v_ctx, sl):
        me = jax.lax.axis_index(axis)
        q_off = me * s_loc
        positions = q_off + jnp.arange(s_loc, dtype=jnp.int32)[None, :]
        layers = params_l["layers"]
        x = _embed(params_l, config, toks, positions)
        perm = [(i, (i + 1) % p_sz) for i in range(p_sz)]

        def body(carry, li):
            x, kc, vc = carry
            h = ops.rms_norm(x, _w1(layers, "attn_norm", li),
                             config.rms_norm_eps,
                             1.0 if config.norm_offset else 0.0)
            q, k, v = _qkv(config, h, layers, li, B, s_loc)
            q = _rope(config, q, positions)
            k = _rope(config, k, positions)
            kt = k.transpose(0, 2, 1, 3)           # [B, Hkv, s_loc, D]
            vt = v.transpose(0, 2, 1, 3)
            kc = jax.lax.dynamic_update_slice(
                kc, kt[None].astype(kc.dtype), (li, 0, 0, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, vt[None].astype(vc.dtype), (li, 0, 0, 0, 0))

            # Ring attention: rotate RAW-Hkv K/V chunks, accumulate
            # online-softmax partials for the local queries.
            m0 = jnp.full((B, config.num_heads, s_loc), NEG_INF,
                          jnp.float32)
            l0 = jnp.zeros((B, config.num_heads, s_loc), jnp.float32)
            a0 = jnp.zeros((B, s_loc, config.num_heads, D), jnp.float32)

            def ring(step, carry):
                kr, vr, m, l, a = carry
                src = (me - step) % p_sz

                def compute(mla):
                    m, l, a = mla
                    kpos = src * s_loc + jnp.arange(s_loc)
                    mi, li_, ai = _partials(
                        q, kr, vr, kpos, sl, causal_qpos=positions)
                    mm = jnp.maximum(m, mi)
                    e1 = jnp.exp(m - mm)
                    e2 = jnp.exp(mi - mm)
                    l2 = l * e1 + li_ * e2
                    a2 = (a * e1.transpose(0, 2, 1)[..., None]
                          + ai * e2.transpose(0, 2, 1)[..., None])
                    return mm, l2, a2

                # Block-causal skip: an entirely-future chunk
                # contributes nothing.
                needed = src * s_loc <= me * s_loc + s_loc - 1
                m, l, a = jax.lax.cond(needed, compute, lambda t: t,
                                       (m, l, a))
                kr = jax.lax.ppermute(kr, axis, perm)
                vr = jax.lax.ppermute(vr, axis, perm)
                return (kr, vr, m, l, a)

            _, _, m, l, a = jax.lax.fori_loop(
                0, p_sz, ring, (kt, vt, m0, l0, a0))
            denom = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
            attn = (a / denom).reshape(B, s_loc, -1).astype(x.dtype)
            from turboinfer_tpu.models.llama import _add_lora
            x = x + _add_lora(
                ops.qmatmul(attn, layers["wo"], layer_index=li), attn,
                layers, "wo", li)
            x = _ffn(config, x, layers, li)
            return (x, kc, vc), None

        (x, k_ctx, v_ctx), _ = jax.lax.scan(
            body, (x, k_ctx, v_ctx), jnp.arange(L, dtype=jnp.int32))
        logits = _head(params_l, config, x)
        return logits, k_ctx, v_ctx

    rep = lambda nd: P(*([None] * nd))
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda w: rep(w.ndim)
                                         if hasattr(w, "ndim") else P(),
                                         params),
                  tok_spec, ctx_spec, ctx_spec, P(None)),
        out_specs=(P(None, axis, None), ctx_spec, ctx_spec),
        check_vma=False)
    logits, k_ctx, v_ctx = fn(params, tokens, cache.k_ctx, cache.v_ctx,
                              seq_lens)
    return logits, cache._replace(k_ctx=k_ctx, v_ctx=v_ctx,
                                  ctx_len=seq_lens, length=seq_lens)


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

    ctx_spec = P(None, None, None, axis, None)

    def local(params_l, toks, k_ctx, v_ctx, k_tail, v_tail, ctx_len,
              length):
        me = jax.lax.axis_index(axis)
        positions = length[:, None]                      # [B, 1] global
        t_fill = length - ctx_len                        # [B] tail fill
        layers = params_l["layers"]
        x = _embed(params_l, config, toks, positions)

        def body(carry, li):
            x, ktl, vtl = carry
            h = ops.rms_norm(x, _w1(layers, "attn_norm", li),
                             config.rms_norm_eps,
                             1.0 if config.norm_offset else 0.0)
            q, k, v = _qkv(config, h, layers, li, B, 1)
            q = _rope(config, q, positions)
            k = _rope(config, k, positions)
            # Append to the replicated tail (same write on every
            # device, per-slot in-place DUS like llama._layer_forward).
            for b in range(B):
                idx = (li, b, 0, t_fill[b], 0)
                ktl = jax.lax.dynamic_update_slice(
                    ktl, k[b].transpose(1, 0, 2)[None, None].astype(
                        ktl.dtype), idx)
                vtl = jax.lax.dynamic_update_slice(
                    vtl, v[b].transpose(1, 0, 2)[None, None].astype(
                        vtl.dtype), idx)

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
            kpos_c = me * s_loc + jnp.arange(s_loc)
            m_c, l_c, a_c = _partials(q, kc, vc, kpos_c, ctx_len)
            # tail partials (identical on every device).
            kt = jax.lax.dynamic_index_in_dim(ktl, li, 0, keepdims=False)
            vt = jax.lax.dynamic_index_in_dim(vtl, li, 0, keepdims=False)
            kpos_t = jnp.arange(T_tail)
            m_t, l_t, a_t = _partials(q, kt, vt, kpos_t,
                                      t_fill + 1)       # incl. this tok
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
            from turboinfer_tpu.models.llama import _add_lora
            x = x + _add_lora(
                ops.qmatmul(attn, layers["wo"], layer_index=li), attn,
                layers, "wo", li)
            x = _ffn(config, x, layers, li)
            return (x, ktl, vtl), None

        (x, k_tail, v_tail), _ = jax.lax.scan(
            body, (x, k_tail, v_tail), jnp.arange(L, dtype=jnp.int32))
        logits = _head(params_l, config, x)
        return logits, k_tail, v_tail

    rep = lambda nd: P(*([None] * nd))
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda w: rep(w.ndim)
                                         if hasattr(w, "ndim") else P(),
                                         params),
                  P(None, None), ctx_spec, ctx_spec, rep(5), rep(5),
                  P(None), P(None)),
        out_specs=(P(None, None, None), rep(5), rep(5)),
        check_vma=False)
    logits, k_tail, v_tail = fn(params, tokens, cache.k_ctx, cache.v_ctx,
                                cache.k_tail, cache.v_tail,
                                cache.ctx_len, cache.length)
    return logits, cache._replace(k_tail=k_tail, v_tail=v_tail,
                                  length=cache.length + 1)
