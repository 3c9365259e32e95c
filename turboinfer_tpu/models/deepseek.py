"""DeepSeek V2/V3: Multi-head Latent Attention + DeepSeek-MoE.

No reference counterpart (the reference is a dense LLaMA-shaped stack,
SURVEY.md §2 row 5); model-family addition pinned against HuggingFace
DeepseekV2/DeepseekV3ForCausalLM (tests/test_hf_parity.py).

TPU-native design decisions:

- **Compressed KV cache (the MLA point).** The cache stores, per token,
  only the kv_lora_rank latent c_kv (post kv_a_layernorm) and the
  shared qk_rope_head_dim k_pe — NOT per-head K/V. For V3 shapes that
  is 512+64 floats/token vs 128 heads x (192+128): a ~70x cache
  reduction, which is what makes long-context MLA serving fit in HBM.
- **Absorbed attention.** Scores are computed directly against the
  latent: q_nope is absorbed through the k-half of kv_b
  (q_abs[b,s,n,r] = q_nope . W_kc[:, n, :]), scores =
  q_abs.c_kv + q_pe.k_pe, and the value path re-expands the
  probability-weighted latent through the v-half (W_vc). No per-head
  K/V is ever materialized, so decode streams the latent cache once.
- **MoE.** Router per config.scoring_func/topk_method: V2 softmax with
  greedy or group-limited-max top-k; V3 sigmoid scores with the
  e_score_correction_bias selection bias and top-2-sum group scores
  (HF DeepseekV3TopkRouter semantics, incl. masked-to-0.0 group fill).
  Expert compute reuses models/moe.expert_mix (gather fast path on
  decode: k of E expert FFNs streamed, 32x less HBM traffic at V3's
  8/256). Shared experts are gateless (added unconditionally). The
  first config.first_k_dense_replace layers use a dense SwiGLU FFN and
  live in a separate stacked group ("dense_layers") so both groups scan
  cleanly.

Both rope conventions (V2 complex-pair, V3 interleave-trick) reduce to
interleaved-pair rotation — RopeMode.INTERLEAVED here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from turboinfer_tpu.config import ModelConfig, RopeMode
from turboinfer_tpu.kernels import ops
from turboinfer_tpu.models.common import (KVCache, encode_kv_scaled,  # noqa: F401
                                          param_bytes, param_count)
from turboinfer_tpu.models import moe as moe_mod

# int8 latent cache (kv_cache_dtype="int8"): the compressed c_kv and the
# shared rope key are stored int8 with per-token absmax scales
# (KVCache.k_scale/v_scale [L, B, 1, T] f32 — the standard scale plane
# with Hkv=1). The chunked online-softmax applies scales on the
# [B, nH, S, C] score/prob tiles (scores factor as
# sc_t * (q . c_i8[t]); the value pass folds sc into the probability
# weights) — the cache is never decoded wholesale, matching the Pallas
# kernels' int8 design (see models/common.KVCache).
SUPPORTS_INT8_KV = True


def _dims(config: ModelConfig):
    nH = config.num_heads
    dn, dr = config.qk_nope_head_dim, config.qk_rope_head_dim
    dv, lr = config.v_head_dim, config.kv_lora_rank
    return nH, dn, dr, dv, lr


def _softmax_scale(config: ModelConfig) -> float:
    """qk_head_dim**-0.5, times the YaRN mscale^2 correction when the
    checkpoint ships rope_scaling with mscale_all_dim (HF
    DeepseekV2/V3Attention.__init__ — every released DeepSeek does)."""
    import math
    scale = (config.qk_nope_head_dim + config.qk_rope_head_dim) ** -0.5
    d = dict(config.rope_scaling)
    mad = float(d.get("mscale_all_dim", 0) or 0)
    factor = float(d.get("factor", 1.0))
    if mad and factor > 1:
        mscale = 0.1 * mad * math.log(factor) + 1.0
        scale = scale * mscale * mscale
    return scale


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, config: ModelConfig,
                dtype=None) -> Dict[str, Any]:
    if not config.kv_lora_rank:
        raise ValueError("deepseek model needs config.kv_lora_rank (MLA)")
    if config.num_experts <= 0:
        raise ValueError("deepseek model needs config.num_experts > 0")
    dtype = dtype or config.dtype
    H, V, L = config.hidden_size, config.vocab_size, config.num_layers
    nH, dn, dr, dv, lr = _dims(config)
    E = config.num_experts
    Fd = config.ffn_dim                        # dense-layer FFN width
    Fm = config.moe_intermediate_size or Fd    # per-expert width
    kd = config.first_k_dense_replace
    Lm = L - kd
    if Lm <= 0:
        raise ValueError("first_k_dense_replace must leave MoE layers")
    key = iter(jax.random.split(rng, 48))

    def w(shape, fan_in):
        return (jax.random.normal(next(key), shape, jnp.float32)
                * (1.0 / jnp.sqrt(fan_in))).astype(dtype)

    def attn_slots(n):
        slots = {
            "attn_norm": jnp.ones((n, H), dtype),
            "ffn_norm": jnp.ones((n, H), dtype),
            "wkv_a": w((n, H, lr + dr), H),
            "kv_a_norm": jnp.ones((n, lr), dtype),
            "wkv_b": w((n, lr, nH * (dn + dv)), lr),
            "wo": w((n, nH * dv, H), nH * dv),
        }
        if config.q_lora_rank:
            qr = config.q_lora_rank
            slots["wq_a"] = w((n, H, qr), H)
            slots["q_a_norm"] = jnp.ones((n, qr), dtype)
            slots["wq_b"] = w((n, qr, nH * (dn + dr)), qr)
        else:
            slots["wq"] = w((n, H, nH * (dn + dr)), H)
        return slots

    layers = attn_slots(Lm)
    layers.update({
        "router": w((Lm, H, E), H),
        "router_bias": jnp.zeros((Lm, E), jnp.float32),
        "we_gate": w((Lm, E, H, Fm), H),
        "we_up": w((Lm, E, H, Fm), H),
        "we_down": w((Lm, E, Fm, H), Fm),
    })
    if config.shared_expert_size:
        Fs = config.shared_expert_size
        layers.update({
            "ws_gate": w((Lm, H, Fs), H),
            "ws_up": w((Lm, H, Fs), H),
            "ws_down": w((Lm, Fs, H), Fs),
        })
    params: Dict[str, Any] = {
        "embed": w((V, H), H),
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
        "lm_head": w((H, V), H),
    }
    if kd:
        dense = attn_slots(kd)
        dense.update({
            "w_gate": w((kd, H, Fd), H),
            "w_up": w((kd, H, Fd), H),
            "w_down": w((kd, Fd, H), Fd),
        })
        params["dense_layers"] = dense
    if config.tie_embeddings:
        params["lm_head"] = params["embed"].T
    return params


# ---------------------------------------------------------------------------
# Compressed-latent KV cache: k slot holds c_kv [L, B, 1, T, lr], v slot
# holds the shared roped k_pe [L, B, 1, T, dr].
# ---------------------------------------------------------------------------

def init_cache(config: ModelConfig, batch_size: int,
               max_seq: Optional[int] = None, dtype=None,
               fused=None) -> KVCache:
    # `fused` accepted for engine-signature parity; MLA's latent cache
    # is already a 128-multiple lane layout, nothing to fuse.
    T = max_seq or config.max_seq_len
    L, B = config.num_layers, batch_size
    _, _, dr, _, lr = _dims(config)
    dtype = dtype or config.dtype
    if dtype == jnp.uint8:          # fp8 latents unsupported; keep model
        dtype = config.dtype        # (use kv_cache_dtype="int8" instead)
    ks = vs = None
    if dtype == jnp.int8:
        ks = jnp.zeros((L, B, 1, T), jnp.float32)
        vs = jnp.zeros((L, B, 1, T), jnp.float32)
    return KVCache(k=jnp.zeros((L, B, 1, T, lr), dtype),
                   v=jnp.zeros((L, B, 1, T, dr), dtype),
                   length=jnp.zeros((B,), jnp.int32),
                   k_scale=ks, v_scale=vs)


def reset_cache(cache: KVCache) -> KVCache:
    # Reset each scale plane from its own array: the latent and rope-key
    # planes currently share shape [L,B,1,T] but must not be assumed to.
    ks = (None if cache.k_scale is None
          else jnp.zeros_like(cache.k_scale))
    vs = (None if cache.v_scale is None
          else jnp.zeros_like(cache.v_scale))
    return KVCache(k=jnp.zeros_like(cache.k), v=jnp.zeros_like(cache.v),
                   length=jnp.zeros_like(cache.length),
                   k_scale=ks, v_scale=vs)


# ---------------------------------------------------------------------------
# Router (HF DeepseekV2MoEGate / DeepseekV3TopkRouter semantics)
# ---------------------------------------------------------------------------

def _route(config: ModelConfig, h: jax.Array, router: jax.Array,
           bias: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """-> (gates [B,S,k] f32, top_i [B,S,k] i32)."""
    E, k = config.num_experts, config.experts_per_token
    logits = jnp.einsum("bsh,he->bse", h.astype(jnp.float32),
                        router.astype(jnp.float32))
    if config.scoring_func == "sigmoid":                  # V3
        scores = jax.nn.sigmoid(logits)
        choice = scores + bias.astype(jnp.float32)        # selection only
    else:                                                 # V2 softmax
        scores = jax.nn.softmax(logits, axis=-1)
        choice = scores
    G = config.n_group
    if G > 1 and config.topk_method != "greedy":
        gsc = choice.reshape(choice.shape[:-1] + (G, E // G))
        if config.topk_method == "noaux_tc":              # V3: top-2 sum
            group_scores = jax.lax.top_k(gsc, 2)[0].sum(-1)
        else:                                             # V2: group max
            group_scores = gsc.max(-1)
        _, gidx = jax.lax.top_k(group_scores, config.topk_group)
        gmask = jax.nn.one_hot(gidx, G, dtype=jnp.bool_).any(-2)
        mask = jnp.repeat(gmask, E // G, axis=-1)
        # HF masks non-selected groups to 0.0 (not -inf) — replicate.
        choice = jnp.where(mask, choice, 0.0)
    _, top_i = jax.lax.top_k(choice, k)
    gates = jnp.take_along_axis(scores, top_i, axis=-1)   # bias-free
    if config.norm_topk_prob:
        gates = gates / (gates.sum(-1, keepdims=True) + 1e-20)
    return gates * config.routed_scaling_factor, top_i


# ---------------------------------------------------------------------------
# Layer forward
# ---------------------------------------------------------------------------

def _mla_attention(config: ModelConfig, h: jax.Array, lw, li,
                   positions, c_cache, pe_cache, start, kv_len,
                   c_scale=None, pe_scale=None):
    """Absorbed MLA. h: [B,S,H] (normed); c_cache [B,1,T,lr],
    pe_cache [B,1,T,dr] for THIS layer; c_scale/pe_scale [B,1,T] f32
    per-token scale planes when the cache is int8. Returns
    (attn_out [B,S,nH*dv], c_cache', pe_cache', c_scale', pe_scale')."""
    B, S, _ = h.shape
    nH, dn, dr, dv, lr = _dims(config)
    is_i8 = c_cache.dtype == jnp.int8

    def w1(name):
        w = lw[name]
        if li is not None:
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    # Queries.
    if config.q_lora_rank:
        qa = ops.qmatmul(h, lw["wq_a"], layer_index=li)
        qa = ops.rms_norm(qa, w1("q_a_norm"), config.rms_norm_eps)
        q = ops.qmatmul(qa, lw["wq_b"], layer_index=li)
    else:
        q = ops.qmatmul(h, lw["wq"], layer_index=li)
    q = q.reshape(B, S, nH, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = ops.apply_rope(q_pe, positions, config.rope_theta,
                          RopeMode.INTERLEAVED,
                          scaling=config.rope_scaling)

    # Latent + shared rope key.
    ckv = ops.qmatmul(h, lw["wkv_a"], layer_index=li)     # [B,S,lr+dr]
    c_lat = ops.rms_norm(ckv[..., :lr], w1("kv_a_norm"),
                         config.rms_norm_eps)
    k_pe = ops.apply_rope(ckv[..., lr:][:, :, None, :], positions,
                          config.rope_theta, RopeMode.INTERLEAVED,
                          scaling=config.rope_scaling)[:, :, 0]  # [B,S,dr]

    # Cache write at [start, start+S).
    def write_one(cache_b, new_b, start_b):
        return jax.lax.dynamic_update_slice(
            cache_b, new_b[None].astype(cache_b.dtype), (0, start_b, 0))

    if is_i8:
        c_q, c_s = encode_kv_scaled(c_lat, jnp.int8)      # [B,S,lr],[B,S]
        p_q, p_s = encode_kv_scaled(k_pe, jnp.int8)
        c_cache = jax.vmap(write_one)(c_cache, c_q, start)
        pe_cache = jax.vmap(write_one)(pe_cache, p_q, start)

        def write_sc(sc_b, new_b, start_b):
            return jax.lax.dynamic_update_slice(
                sc_b, new_b[None], (0, start_b))
        c_scale = jax.vmap(write_sc)(c_scale, c_s, start)
        pe_scale = jax.vmap(write_sc)(pe_scale, p_s, start)
    else:
        c_cache = jax.vmap(write_one)(c_cache, c_lat, start)
        pe_cache = jax.vmap(write_one)(pe_cache, k_pe, start)
    # Native-dtype operands with f32 accumulation: never materialize an
    # f32 copy of the latent cache (or of wkv_b) inside the layer scan.
    # int8 caches compute in the MODEL dtype (chunks are cast — a pure
    # i8 cast, no scale multiply — and the scales land on score tiles).
    cdt = h.dtype if is_i8 else c_cache.dtype
    c_all = c_cache[:, 0]                                 # [B,T,lr]
    pe_all = pe_cache[:, 0]                               # [B,T,dr]
    c_sc_all = c_scale[:, 0] if is_i8 else None           # [B,T]
    pe_sc_all = pe_scale[:, 0] if is_i8 else None

    # Absorb q_nope through the k-half of kv_b.
    wkv_b = w1("wkv_b").reshape(lr, nH, dn + dv)
    w_kc, w_vc = wkv_b[..., :dn], wkv_b[..., dn:]         # [lr,nH,*]
    q_abs = jnp.einsum("bsnd,rnd->bsnr", q_nope.astype(cdt),
                       w_kc.astype(cdt),
                       preferred_element_type=jnp.float32)

    # Streaming (online-softmax) attention over key chunks: scores for
    # one [B, nH, S, C] chunk at a time — never a [B, nH, S, T] tensor,
    # so prefill memory is bounded at any context length (V3's 128
    # heads at S=T=4k would otherwise materialize ~8.6 GB of scores).
    # Exact (flash-style running max/sum rescaling), same numerics as
    # the direct softmax.
    T = c_all.shape[1]
    scale = _softmax_scale(config)
    C = T
    for cand in (512, 256, 128, 64):
        if T % cand == 0:
            C = cand
            break
    qpos = positions[:, None, :, None]                    # [B,1,S,1]
    q_abs_n = q_abs.astype(cdt)
    q_pe_n = q_pe.astype(cdt)

    def chunk(carry, ci):
        m, l, acc = carry
        ck = jax.lax.dynamic_slice_in_dim(c_all, ci * C, C, 1).astype(cdt)
        pk = jax.lax.dynamic_slice_in_dim(pe_all, ci * C, C, 1).astype(cdt)
        s_c = jnp.einsum("bsnr,btr->bnst", q_abs_n, ck,
                         preferred_element_type=jnp.float32)
        s_p = jnp.einsum("bsnd,btd->bnst", q_pe_n, pk,
                         preferred_element_type=jnp.float32)
        if is_i8:
            # Scores factor per key token: sc_t * (q . c_i8[t]) — one
            # broadcast multiply per score tile, latent and rope-key
            # halves carrying their own scale planes.
            csc = jax.lax.dynamic_slice_in_dim(c_sc_all, ci * C, C, 1)
            psc = jax.lax.dynamic_slice_in_dim(pe_sc_all, ci * C, C, 1)
            s = (s_c * csc[:, None, None, :]
                 + s_p * psc[:, None, None, :]) * scale
        else:
            s = (s_c + s_p) * scale
        tpos = (ci * C + jnp.arange(C, dtype=jnp.int32)
                )[None, None, None, :]
        ok = (tpos <= qpos) & (tpos < kv_len[:, None, None, None])
        s = jnp.where(ok, s, -1e30)
        m2 = jnp.maximum(m, s.max(-1))                    # [B,nH,S]
        w = jnp.exp(s - m2[..., None])
        corr = jnp.exp(m - m2)
        l = l * corr + w.sum(-1)
        # Value pass: sum_t w_t * (sc_t * c_i8[t]) = sum_t (w_t*sc_t)
        # * c_i8[t] — fold the scale into the probability weights.
        wv = w * csc[:, None, None, :] if is_i8 else w
        acc = (acc * corr[..., None]
               + jnp.einsum("bnst,btr->bnsr", wv.astype(cdt), ck,
                            preferred_element_type=jnp.float32))
        return (m2, l, acc), None

    m0 = jnp.full((B, nH, S), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, nH, S), jnp.float32)
    a0 = jnp.zeros((B, nH, S, lr), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        chunk, (m0, l0, a0), jnp.arange(T // C, dtype=jnp.int32))
    lat_out = (acc / l[..., None]).transpose(0, 2, 1, 3)  # [B,S,nH,lr]

    attn = jnp.einsum("bsnr,rnd->bsnd", lat_out.astype(cdt),
                      w_vc.astype(cdt),
                      preferred_element_type=jnp.float32)
    return (attn.reshape(B, S, nH * dv).astype(h.dtype), c_cache,
            pe_cache, c_scale, pe_scale)


def _layer_forward(config, x, lw, positions, c_cache, pe_cache, start,
                   kv_len, layer_index=None, dense_ffn=False,
                   c_scale=None, pe_scale=None):
    li = layer_index
    B, S, _ = x.shape

    def w1(name):
        w = lw[name]
        if li is not None:
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    h = ops.rms_norm(x, w1("attn_norm"), config.rms_norm_eps)
    attn, c_cache, pe_cache, c_scale, pe_scale = _mla_attention(
        config, h, lw, li, positions, c_cache, pe_cache, start, kv_len,
        c_scale=c_scale, pe_scale=pe_scale)
    x = x + ops.qmatmul(attn, lw["wo"], layer_index=li)

    h = ops.rms_norm(x, w1("ffn_norm"), config.rms_norm_eps)
    if dense_ffn:
        g = ops.qmatmul(h, lw["w_gate"], layer_index=li)
        u = ops.qmatmul(h, lw["w_up"], layer_index=li)
        ffn = ops.qmatmul(ops.swiglu(g, u).astype(h.dtype), lw["w_down"],
                          layer_index=li)
        return x + ffn, c_cache, pe_cache, c_scale, pe_scale

    gates, top_i = _route(config, h, w1("router"), w1("router_bias"))
    out = moe_mod.expert_mix(config, h, lw, gates, top_i, layer_index=li)
    if "ws_gate" in lw:                # gateless shared experts
        s = ops.swiglu(ops.qmatmul(h, lw["ws_gate"], layer_index=li),
                       ops.qmatmul(h, lw["ws_up"], layer_index=li))
        s = ops.qmatmul(s.astype(h.dtype), lw["ws_down"], layer_index=li)
        out = out + s.astype(jnp.float32)
    return x + out.astype(x.dtype), c_cache, pe_cache, c_scale, pe_scale


# ---------------------------------------------------------------------------
# Model forward
# ---------------------------------------------------------------------------

def forward(params: Dict[str, Any], config: ModelConfig, tokens: jax.Array,
            cache: KVCache, *, positions: Optional[jax.Array] = None,
            seq_lens: Optional[jax.Array] = None,
            logit_idx: Optional[jax.Array] = None
            ) -> Tuple[jax.Array, KVCache]:
    """Same contract as llama.forward (cache is the compressed latent)."""
    B, S = tokens.shape
    start = cache.length
    if positions is None:
        positions = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    kv_len = start + seq_lens
    kd = config.first_k_dense_replace

    x = ops.embed_lookup(params["embed"], tokens, config.dtype)
    ck, pk = cache.k, cache.v
    csc, psc = cache.k_scale, cache.v_scale      # int8 scale stacks or None

    def scan_group(x, ck, pk, csc, psc, lw, offset, n, dense):
        def body(carry, i):
            x, ck, pk, csc, psc = carry

            def at(a):
                return (None if a is None else
                        jax.lax.dynamic_index_in_dim(a, offset + i, 0,
                                                     keepdims=False))

            def put(a, a1):
                return (None if a is None else
                        jax.lax.dynamic_update_index_in_dim(a, a1,
                                                            offset + i, 0))
            x, c1, p1, s1, t1 = _layer_forward(
                config, x, lw, positions, at(ck), at(pk), start, kv_len,
                layer_index=i, dense_ffn=dense, c_scale=at(csc),
                pe_scale=at(psc))
            return (x, put(ck, c1), put(pk, p1), put(csc, s1),
                    put(psc, t1)), None
        (x, ck, pk, csc, psc), _ = jax.lax.scan(
            body, (x, ck, pk, csc, psc), jnp.arange(n, dtype=jnp.int32))
        return x, ck, pk, csc, psc

    if kd:
        x, ck, pk, csc, psc = scan_group(x, ck, pk, csc, psc,
                                         params["dense_layers"], 0, kd,
                                         True)
    x, ck, pk, csc, psc = scan_group(x, ck, pk, csc, psc,
                                     params["layers"], kd,
                                     config.num_layers - kd, False)

    if logit_idx is not None:
        # last-token-only head (see llama.forward)
        x = jnp.take_along_axis(
            x, logit_idx[:, None, None].astype(jnp.int32), axis=1)
    x = ops.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = ops.qmatmul(x, params["lm_head"], preferred_dtype=jnp.float32)
    return logits.astype(jnp.float32), KVCache(k=ck, v=pk, length=kv_len,
                                               k_scale=csc, v_scale=psc)


def forward_paged_decode(params: Dict[str, Any], config: ModelConfig,
                         tokens: jax.Array, k_pages: jax.Array,
                         v_pages: jax.Array, block_table: jax.Array,
                         lengths: jax.Array, *,
                         k_scale_pages=None, v_scale_pages=None):
    """One decode step over PAGED latent pools (same contract as
    llama.forward_paged_decode). k_pages [L, P, 1, page, lr] holds the
    compressed latent, v_pages [L, P, 1, page, dr] the shared rope key
    (engine/paged_cache MLA branch). Attention streams the block table
    page by page with the online softmax; page reads are flat
    (layer, page) gathers off the stacked pools — only the B needed
    pages move, never a layer's whole pool. int8 pools carry per-token
    scale pages ([L, P, 1, page] f32) applied on the score/prob tiles;
    when passed, the return grows to (logits, kp, vp, ksp, vsp)."""
    B = tokens.shape[0]
    nH, dn, dr, dv, lr = _dims(config)
    L = config.num_layers
    kd = config.first_k_dense_replace
    page = k_pages.shape[3]
    P = k_pages.shape[1]
    max_pages = block_table.shape[1]
    positions = lengths[:, None]                          # [B, 1]
    kv_len = lengths + 1
    page_idx = lengths // page
    offset = lengths % page
    write_ids = jnp.clip(jnp.take_along_axis(
        block_table, page_idx[:, None], axis=1)[:, 0], 0, P - 1)
    is_i8 = k_scale_pages is not None
    if k_pages.dtype == jnp.int8 and not is_i8:
        # Mirror models/common.decode_kv's guard: raw int8 codes without
        # their scale planes would silently produce garbage logits.
        raise ValueError("int8 KV paged decode requires its scale pages "
                         "(k_scale_pages/v_scale_pages)")
    cdt = config.dtype if is_i8 else k_pages.dtype
    scale = _softmax_scale(config)

    x = ops.embed_lookup(params["embed"], tokens[:, None],
                     config.dtype)             # [B, 1, H]

    def layer_step(x, kp, vp, ksp, vsp, lw, li_cache, li_w, dense):
        def w1(name):
            return jax.lax.dynamic_index_in_dim(lw[name], li_w, 0,
                                                keepdims=False)
        h = ops.rms_norm(x, w1("attn_norm"), config.rms_norm_eps)

        if config.q_lora_rank:
            qa = ops.qmatmul(h, lw["wq_a"], layer_index=li_w)
            qa = ops.rms_norm(qa, w1("q_a_norm"), config.rms_norm_eps)
            q = ops.qmatmul(qa, lw["wq_b"], layer_index=li_w)
        else:
            q = ops.qmatmul(h, lw["wq"], layer_index=li_w)
        q = q.reshape(B, 1, nH, dn + dr)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        q_pe = ops.apply_rope(q_pe, positions, config.rope_theta,
                              RopeMode.INTERLEAVED,
                              scaling=config.rope_scaling)

        ckv = ops.qmatmul(h, lw["wkv_a"], layer_index=li_w)
        c_lat = ops.rms_norm(ckv[..., :lr], w1("kv_a_norm"),
                             config.rms_norm_eps)
        k_pe = ops.apply_rope(
            ckv[..., lr:][:, :, None, :], positions, config.rope_theta,
            RopeMode.INTERLEAVED,
            scaling=config.rope_scaling)[:, :, 0]         # [B, 1, dr]

        # Write the new token's latent into each slot's current page.
        if is_i8:
            c_lat, c_s = encode_kv_scaled(c_lat, jnp.int8)  # [B,1,lr],[B,1]
            k_pe, p_s = encode_kv_scaled(k_pe, jnp.int8)
        for b in range(B):
            idx = (li_cache, write_ids[b], 0, offset[b], 0)
            kp = jax.lax.dynamic_update_slice(
                kp, c_lat[b][None, None, :, None, :].astype(kp.dtype),
                idx)
            vp = jax.lax.dynamic_update_slice(
                vp, k_pe[b][None, None, :, None, :].astype(vp.dtype),
                idx)
            if is_i8:
                sidx = (li_cache, write_ids[b], 0, offset[b])
                ksp = jax.lax.dynamic_update_slice(
                    ksp, c_s[b][None, None, :, None], sidx)
                vsp = jax.lax.dynamic_update_slice(
                    vsp, p_s[b][None, None, :, None], sidx)

        wkv_b = w1("wkv_b").reshape(lr, nH, dn + dv)
        w_kc, w_vc = wkv_b[..., :dn], wkv_b[..., dn:]
        q_abs = jnp.einsum("bsnd,rnd->bsnr", q_nope.astype(cdt),
                           w_kc.astype(cdt),
                           preferred_element_type=jnp.float32
                           ).astype(cdt)                  # [B,1,nH,lr]
        q_pe_n = q_pe.astype(cdt)

        kp_flat = kp.reshape((L * P,) + kp.shape[2:])
        vp_flat = vp.reshape((L * P,) + vp.shape[2:])
        if is_i8:
            ksp_flat = ksp.reshape((L * P,) + ksp.shape[2:])
            vsp_flat = vsp.reshape((L * P,) + vsp.shape[2:])

        def page_chunk(carry, pi):
            m, l, acc = carry
            ids = jnp.clip(block_table[:, pi], 0, P - 1)  # [B]
            ck = jnp.take(kp_flat, li_cache * P + ids,
                          axis=0)[:, 0].astype(cdt)       # [B,page,lr]
            pk = jnp.take(vp_flat, li_cache * P + ids,
                          axis=0)[:, 0].astype(cdt)
            s_c = jnp.einsum("bsnr,btr->bnst", q_abs, ck,
                             preferred_element_type=jnp.float32)
            s_p = jnp.einsum("bsnd,btd->bnst", q_pe_n, pk,
                             preferred_element_type=jnp.float32)
            if is_i8:
                csc = jnp.take(ksp_flat, li_cache * P + ids,
                               axis=0)[:, 0]              # [B,page]
                psc = jnp.take(vsp_flat, li_cache * P + ids, axis=0)[:, 0]
                s = (s_c * csc[:, None, None, :]
                     + s_p * psc[:, None, None, :]) * scale
            else:
                s = (s_c + s_p) * scale                   # [B,nH,1,page]
            tpos = (pi * page + jnp.arange(page, dtype=jnp.int32)
                    )[None, None, None, :]
            ok = tpos < kv_len[:, None, None, None]
            s = jnp.where(ok, s, -1e30)
            m2 = jnp.maximum(m, s.max(-1))
            w = jnp.exp(s - m2[..., None])
            corr = jnp.exp(m - m2)
            l = l * corr + w.sum(-1)
            wv = w * csc[:, None, None, :] if is_i8 else w
            acc = (acc * corr[..., None]
                   + jnp.einsum("bnst,btr->bnsr", wv.astype(cdt), ck,
                                preferred_element_type=jnp.float32))
            return (m2, l, acc), None

        m0 = jnp.full((B, nH, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((B, nH, 1), jnp.float32)
        a0 = jnp.zeros((B, nH, 1, lr), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(
            page_chunk, (m0, l0, a0),
            jnp.arange(max_pages, dtype=jnp.int32))
        lat_out = (acc / l[..., None]).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bsnr,rnd->bsnd", lat_out.astype(cdt),
                          w_vc.astype(cdt),
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, 1, nH * dv).astype(x.dtype)
        x = x + ops.qmatmul(attn, lw["wo"], layer_index=li_w)

        h = ops.rms_norm(x, w1("ffn_norm"), config.rms_norm_eps)
        if dense:
            g = ops.qmatmul(h, lw["w_gate"], layer_index=li_w)
            u = ops.qmatmul(h, lw["w_up"], layer_index=li_w)
            ffn = ops.qmatmul(ops.swiglu(g, u).astype(h.dtype),
                              lw["w_down"], layer_index=li_w)
            return x + ffn, kp, vp, ksp, vsp
        gates, top_i = _route(config, h, w1("router"), w1("router_bias"))
        out = moe_mod.expert_mix(config, h, lw, gates, top_i,
                                 layer_index=li_w)
        if "ws_gate" in lw:
            s2 = ops.swiglu(
                ops.qmatmul(h, lw["ws_gate"], layer_index=li_w),
                ops.qmatmul(h, lw["ws_up"], layer_index=li_w))
            s2 = ops.qmatmul(s2.astype(h.dtype), lw["ws_down"],
                             layer_index=li_w)
            out = out + s2.astype(jnp.float32)
        return x + out.astype(x.dtype), kp, vp, ksp, vsp

    kp, vp = k_pages, v_pages
    ksp, vsp = k_scale_pages, v_scale_pages
    if kd:
        def dense_body(carry, i):
            x, kp, vp, ksp, vsp = carry
            x, kp, vp, ksp, vsp = layer_step(
                x, kp, vp, ksp, vsp, params["dense_layers"], i, i, True)
            return (x, kp, vp, ksp, vsp), None
        (x, kp, vp, ksp, vsp), _ = jax.lax.scan(
            dense_body, (x, kp, vp, ksp, vsp),
            jnp.arange(kd, dtype=jnp.int32))

    def moe_body(carry, i):
        x, kp, vp, ksp, vsp = carry
        x, kp, vp, ksp, vsp = layer_step(
            x, kp, vp, ksp, vsp, params["layers"], kd + i, i, False)
        return (x, kp, vp, ksp, vsp), None
    (x, kp, vp, ksp, vsp), _ = jax.lax.scan(
        moe_body, (x, kp, vp, ksp, vsp),
        jnp.arange(L - kd, dtype=jnp.int32))

    x = ops.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = ops.qmatmul(x, params["lm_head"], preferred_dtype=jnp.float32)
    if is_i8:
        return logits.astype(jnp.float32)[:, 0], kp, vp, ksp, vsp
    return logits.astype(jnp.float32)[:, 0], kp, vp


def forward_no_cache(params, config, tokens, seq_lens=None) -> jax.Array:
    B, S = tokens.shape
    cache = init_cache(config, B, max_seq=S)
    logits, _ = forward(params, config, tokens, cache, seq_lens=seq_lens)
    return logits
