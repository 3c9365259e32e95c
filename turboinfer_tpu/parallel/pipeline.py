"""Pipeline parallelism: decoder layers staged over a mesh axis.

No reference counterpart (SURVEY.md §2 row 15 — the reference has no
parallelism at all). TPU-native design: the params' stacked [L, ...]
layer axis and the KV cache's layer axis shard over a `pp` mesh axis,
so each device holds L/P layers and their cache. A shard_map stage
relay runs the local `lax.scan` on the device whose turn it is and
rotates activations to the next stage with `ppermute` (one ICI hop —
neighbor traffic only). The last stage computes the lm_head and the
logits are broadcast with a psum.

Memory scales 1/P in weights and cache — the way to serve a model
larger than one chip's HBM when tensor parallelism alone isn't enough.
Decode latency is the sum of stage latencies (classic inference PP);
`pipeline_forward_microbatch` staggers M batch slices GPipe-style so
all stages work concurrently — wall-clock (M+P-1)/(M*P) of the naive
relay when stage time scales with tokens (compute-bound prefill /
large-batch decode). Weight-streaming-bound B=1 decode gains nothing
from microbatching (every tick re-streams stage weights) — use the
plain relay there.

KNOWN COST (microbatch decode): process() slices the microbatch's
batch rows out of the stage cache and writes the slab back each tick,
so a decode step's ticks collectively read+write the whole stage
cache (traffic ∝ T) to store one token per sequence — the same
slice/write-back pattern the contiguous paths avoid (CLAUDE.md's
measured ~4x). Fixing it needs the family `_layer_forward`s to accept
a batch OFFSET for their in-place cache writes (so the full stage
cache can ride the scan carry); until then prefer the plain relay for
long-fill decode and microbatching for prefill/compute-bound shapes.

Family support: llama, moe, gpt2, neox, gptoss run through a small
per-family adapter (embedding prelude / head epilogue / layer-step
call); deepseek (MLA latent caches + leading dense layers) has its own
relay where the `first_k_dense_replace` dense layers run replicated on
every stage before the ring and only the MoE stack is staged (the
dense/MoE param stacks split at a point the stage count need not
divide).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.kernels import ops
from turboinfer_tpu.models.common import KVCache

PP_AXIS = "pp"

_PP_FAMILIES = ("llama", "moe", "gpt2", "neox", "gptoss", "deepseek")


def _pp_spec_tree(params, pp: str = PP_AXIS) -> Dict[str, Any]:
    """Leaf-wise PartitionSpec tree for a whole param pytree: stacked
    layer weights (incl. QTensor data/scales and MoE expert stacks)
    shard their leading L axis over `pp`; everything else — embeddings,
    norms, head, and deepseek's `dense_layers` (run replicated on every
    stage) — replicates."""
    rep = lambda w: P(*([None] * w.ndim))
    return {k: (jax.tree_util.tree_map(
                    lambda w: P(pp, *([None] * (w.ndim - 1))), v)
                if k == "layers" else jax.tree_util.tree_map(rep, v))
            for k, v in params.items()}


def pipeline_cache_spec(pp: str = PP_AXIS) -> P:
    """KV cache [L, B, Hkv, T, D] (or deepseek latent [L, B, T, r]):
    layer axis over `pp`."""
    return P(pp)


class DeepSeekPPCache(NamedTuple):
    """Pipeline cache for deepseek: the `first_k_dense_replace` dense
    layers' latent/rope caches replicate (every stage runs them) and
    the MoE layers' caches shard on the layer axis over `pp`."""
    k_dense: jax.Array          # [kd, B, T, lr] replicated
    v_dense: jax.Array          # [kd, B, T, dr] replicated
    k: jax.Array                # [L-kd, B, T, lr] sharded over pp
    v: jax.Array                # [L-kd, B, T, dr] sharded over pp
    length: jax.Array           # [B]


def _family(config: ModelConfig) -> Tuple[str, Any]:
    from turboinfer_tpu.models import registry
    mod = registry.get_model(config.architecture)
    family = mod.__name__.rsplit(".", 1)[-1]
    if family not in _PP_FAMILIES:
        raise NotImplementedError(
            f"pipeline_forward supports {'/'.join(_PP_FAMILIES)} decoders,"
            f" not '{config.architecture}' ({family})")
    return family, mod


class _Adapter(NamedTuple):
    """Per-family hooks for the stage relay. `step` runs ONE layer:
    (x, layers_local, positions, k, v, start, kv_len, local_i,
    global_i) -> (x, k, v); the cache args may be the stage's whole
    stacked slice (decode, stacked_decode=True families) or one layer's
    slice — the family modules distinguish by rank."""
    embed: Callable[..., jax.Array]
    head: Callable[..., jax.Array]
    step: Callable[..., Tuple]
    stacked_decode: bool


def _adapter(config: ModelConfig, family: str, mod) -> _Adapter:
    lf = mod._layer_forward
    eps = config.rms_norm_eps

    def embed(params, toks, positions):
        x = ops.embed_lookup(params["embed"], toks, config.dtype)
        if family == "llama" and config.scale_embeddings:
            # Gemma rounds sqrt(H) to the model dtype (llama.forward).
            # llama-family ONLY: moe.forward ignores this knob, and the
            # PP trajectory must match the family forward exactly.
            x = x * jnp.asarray(config.hidden_size ** 0.5, config.dtype)
        if family == "llama" and config.embedding_multiplier:
            x = x * jnp.asarray(config.embedding_multiplier, config.dtype)
        if family == "gpt2":
            pe = params["pos_embed"]
            x = x + jnp.take(pe, jnp.clip(positions, 0, pe.shape[0] - 1),
                             axis=0).astype(config.dtype)
        if family == "neox" and "embed_norm_w" in params:   # BLOOM
            x = ops.layer_norm(x, params["embed_norm_w"],
                               params["embed_norm_b"], eps)
        return x

    def head(params, x):
        if family in ("gpt2", "neox"):
            h = ops.layer_norm(x, params["final_norm_w"],
                               params["final_norm_b"], eps)
        else:
            h = ops.rms_norm(x, params["final_norm"], eps,
                             1.0 if config.norm_offset else 0.0)
        logits = ops.qmatmul(h, params["lm_head"],
                             preferred_dtype=jnp.float32
                             ).astype(jnp.float32)
        if family == "neox" and "lm_head_b" in params:       # Phi
            logits = logits + params["lm_head_b"]
        if family == "llama":
            # Gemma2's final softcap lives in the llama family; the
            # other family forwards never apply it — applying it for
            # them would diverge from the single-chip trajectory.
            logits = ops.apply_softcap(logits, config.final_logit_softcap)
        if family == "llama" and config.logits_scaling:      # Granite
            logits = logits / config.logits_scaling
        return logits

    def step(x, layers, positions, k, v, start, kv_len, i, gi):
        if family in ("llama", "moe"):
            return lf(config, x, layers, positions, k, v, start, kv_len,
                      contiguous=True, layer_index=i,
                      global_layer_index=gi)
        if family == "gpt2":
            return lf(config, x, layers, k, v, start, kv_len,
                      layer_index=i)
        if family == "neox":
            return lf(config, x, layers, positions, k, v, start, kv_len,
                      layer_index=i)
        if family == "gptoss":
            return lf(config, x, layers, positions, k, v, start, kv_len,
                      layer_index=i, global_layer_index=gi)
        # deepseek: PP runs exact latents (int8 scale planes are gated
        # out of the pipeline path) — drop the scale slots.
        x, k, v, _, _ = lf(config, x, layers, positions, k, v, start,
                           kv_len, layer_index=i, dense_ffn=False)
        return x, k, v

    # gptoss's head-major stacked decode requires the fused cache
    # layout; its PP path slices per layer instead. deepseek always
    # slices (the latent cache is small).
    return _Adapter(embed=embed, head=head, step=step,
                    stacked_decode=family in ("llama", "moe", "gpt2",
                                              "neox"))


def _tp_axis(mesh: Mesh, tp: str = "tp") -> Optional[str]:
    """The mesh's tensor-parallel axis when it is real (size > 1)."""
    return tp if mesh.shape.get(tp, 1) > 1 else None


def pp_tp_specs(params, config: ModelConfig, pp: str = PP_AXIS,
                tp: str = "tp"):
    """2-D PP x TP spec tree: stacked layer weights shard their leading
    L axis over `pp` AND their column/row axis over `tp` (family-
    appropriate: dense column/row TP, MoE expert axis, deepseek MLA
    heads). Non-layer weights (embed, norms, lm_head) take the family
    TP specs directly — the lm_head vocab-shards over tp, replicated
    over pp. This is how the flagship families actually deploy
    (SURVEY §5 comms: axes e.g. ("dcn","fsdp","tp"))."""
    from turboinfer_tpu.parallel import shardings as _sh
    family = _family(config)[0]
    tp_specs = {"moe": _sh.moe_param_specs,
                "deepseek": _sh.deepseek_param_specs}.get(
        family, _sh.param_specs)(tp)

    def leaf_rank(leaf):
        return leaf.data.ndim if hasattr(leaf, "data") else leaf.ndim

    out = {}
    for k, v in params.items():
        ts = tp_specs.get(k)
        if k == "layers" and isinstance(v, dict):
            sub = {}
            for n, leaf in v.items():
                s = ts.get(n) if isinstance(ts, dict) else None
                if isinstance(s, P) and len(s) >= 1:
                    sub[n] = P(pp, *s[1:])      # leading L axis -> pp
                else:
                    # optional slots (LoRA, biases, qk-norms): stacked
                    # over pp, tp-replicated
                    sub[n] = P(pp, *([None] * (leaf_rank(leaf) - 1)))
            out[k] = sub
        elif isinstance(ts, P):
            out[k] = ts
        else:
            out[k] = jax.tree_util.tree_map(lambda w: P(), v)
    return out


def shard_pp_params(params, mesh: Mesh, pp: str = PP_AXIS,
                    config: Optional[ModelConfig] = None):
    """Place a param pytree with the pipeline shardings (stacked layer
    weights' leading L axis over `pp`). When the mesh also carries a
    real `tp` axis and `config` is given, weights additionally shard
    over tp inside each stage (2-D PP x TP — see pp_tp_specs)."""
    tp = _tp_axis(mesh)
    if tp is not None and config is not None:
        from turboinfer_tpu.parallel import shardings as _sh
        return _sh.shard_params(params, mesh,
                                specs=pp_tp_specs(params, config, pp, tp))
    specs = _pp_spec_tree(params, pp)
    return jax.tree_util.tree_map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)),
        params, specs)


def shard_pp_cache(cache, mesh: Mesh, pp: str = PP_AXIS,
                   config: Optional[ModelConfig] = None):
    """Place a fresh head-major KVCache with the pipeline shardings.
    For deepseek pass `config`: the cache splits into a replicated
    dense part and a pp-sharded MoE part (DeepSeekPPCache)."""
    if getattr(cache, "k_scale", None) is not None:
        raise ValueError(
            "pipeline parallelism does not thread int8 KV scales yet; "
            "use kv_cache_dtype='bf16' with pp")
    if cache.k.dtype in (jnp.float8_e4m3fn, jnp.uint8):
        raise ValueError(
            "pipeline parallelism does not support compressed fp8 KV "
            "caches; use kv_cache_dtype='bf16' with pp")
    rep = lambda a: jax.device_put(a, NamedSharding(
        mesh, P(*([None] * a.ndim))))
    # 2-D PP x TP: kv-heads additionally shard over the real tp axis
    # (head-major [L, B, Hkv, T, D]) when it divides.
    tp = _tp_axis(mesh)
    if tp is not None and (config is None
                           or config.kv_heads % mesh.shape[tp]):
        tp = None
    ns = NamedSharding(mesh, P(pp, None, tp, None, None))
    if config is not None and _family(config)[0] == "deepseek":
        kd = config.first_k_dense_replace
        ds_ns = NamedSharding(mesh, pipeline_cache_spec(pp))
        return DeepSeekPPCache(
            k_dense=rep(cache.k[:kd]), v_dense=rep(cache.v[:kd]),
            k=jax.device_put(cache.k[kd:], ds_ns),
            v=jax.device_put(cache.v[kd:], ds_ns),
            length=rep(cache.length))
    return KVCache(
        k=jax.device_put(cache.k, ns),
        v=jax.device_put(cache.v, ns),
        length=rep(cache.length))


def shard_for_pipeline(params, cache, mesh: Mesh, pp: str = PP_AXIS,
                       config: Optional[ModelConfig] = None):
    """Place params + cache with the pipeline shardings.

    For deepseek pass `config`: the cache splits into a replicated
    dense part and a pp-sharded MoE part (DeepSeekPPCache)."""
    return (shard_pp_params(params, mesh, pp),
            shard_pp_cache(cache, mesh, pp, config=config))


def _check_stages(config: ModelConfig, n_layers: int, n_stage: int):
    if n_layers % n_stage:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{n_stage} pipeline stages")


def pipeline_forward(params, config: ModelConfig, tokens: jax.Array,
                     cache, *, mesh: Mesh, axis: str = PP_AXIS,
                     seq_lens: Optional[jax.Array] = None,
                     logit_idx: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, Any]:
    """Forward with decoder layers staged over `axis`.

    Same contract as <family>.forward; tokens/logits replicated across
    the pipeline, params/cache sharded on the layer axis. Head-major
    KV caches only (the fused-head layout stays on single-chip paths).
    seq_lens: [B] new valid tokens per sequence (right-padded batches,
    like <family>.forward); default S.
    logit_idx: [B] positions — compute the head for ONLY these (logits
    come back [B, 1, V]). Without it a 7B S=512 B=8 prefill
    materializes and psum-broadcasts ~0.5 GB of [B, S, V] f32 across
    the ring; with it the head is S× cheaper and the psum carries
    [B, 1, V] (mirrors <family>.forward's logit_idx).
    """
    family, mod = _family(config)
    if family == "deepseek":
        return _deepseek_pipeline_forward(params, config, tokens, cache,
                                          mesh=mesh, axis=axis, mod=mod,
                                          seq_lens=seq_lens,
                                          logit_idx=logit_idx)
    B, S = tokens.shape
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    n_stage = mesh.shape[axis]
    _check_stages(config, config.num_layers, n_stage)
    ad = _adapter(config, family, mod)
    V = params["lm_head"].shape[-1]

    lspec = _pp_spec_tree(params, axis)
    cspec = pipeline_cache_spec(axis)
    gather = logit_idx is not None

    def local(params_l, toks, k_loc, v_loc, length, sl, idx):
        me = jax.lax.axis_index(axis)
        start = length
        positions = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        kv_len = start + sl
        layers_local = params_l["layers"]

        x = ad.embed(params_l, toks, positions)

        def run_stage(args):
            x, kc, vc = args
            n_local = kc.shape[0]
            # Gemma2/3 local/global alternation and GPT-OSS's window
            # pattern key off the GLOBAL layer id; local weights/caches
            # index by the stage-local id.
            base = me * n_local

            if S == 1 and ad.stacked_decode:
                # Decode: the stacked local cache flows through WHOLE
                # (slicing layer i per step copies the full [B,Hkv,T,D]
                # slab each layer — see llama.forward / CLAUDE.md).
                def body(carry, i):
                    x, kf, vf = carry
                    x, kf, vf = ad.step(x, layers_local, positions, kf,
                                        vf, start, kv_len, i, base + i)
                    return (x, kf, vf), None
            else:
                def body(carry, i):
                    x, kf, vf = carry
                    k1 = jax.lax.dynamic_index_in_dim(kf, i, 0,
                                                      keepdims=False)
                    v1 = jax.lax.dynamic_index_in_dim(vf, i, 0,
                                                      keepdims=False)
                    x, k1, v1 = ad.step(x, layers_local, positions, k1,
                                        v1, start, kv_len, i, base + i)
                    kf = jax.lax.dynamic_update_index_in_dim(kf, k1, i, 0)
                    vf = jax.lax.dynamic_update_index_in_dim(vf, v1, i, 0)
                    return (x, kf, vf), None

            (x, kc, vc), _ = jax.lax.scan(
                body, (x, kc, vc), jnp.arange(n_local, dtype=jnp.int32))
            return x, kc, vc

        def skip_stage(args):
            return args

        def stage_step(s, carry):
            x, kc, vc = carry
            x, kc, vc = jax.lax.cond(me == s, run_stage, skip_stage,
                                     (x, kc, vc))
            perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
            x = jax.lax.ppermute(x, axis, perm)
            return (x, kc, vc)

        x, k_loc, v_loc = jax.lax.fori_loop(
            0, n_stage, stage_step, (x, k_loc, v_loc))
        # After n_stage rotations the fully-processed x landed back on
        # stage 0; ONLY stage 0 computes the head (every stage used to
        # run the full-vocab matmul and throw P-1 results away) and a
        # psum broadcasts.
        if gather:
            x = jnp.take_along_axis(
                x, idx[:, None, None].astype(jnp.int32), axis=1)
        logits = jax.lax.cond(
            me == 0, lambda v: ad.head(params_l, v),
            lambda v: jnp.zeros(v.shape[:2] + (V,), jnp.float32), x)
        logits = jax.lax.psum(logits, axis)
        return logits, k_loc, v_loc, kv_len

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(lspec, P(None, None), cspec, cspec, P(None), P(None),
                  P(None)),
        out_specs=(P(None, None, None), cspec, cspec, P(None)),
        check_vma=False, axis_names=frozenset({axis}))
    idx_arg = (jnp.zeros((B,), jnp.int32) if logit_idx is None
               else logit_idx.astype(jnp.int32))
    logits, k_new, v_new, kv_len = fn(params, tokens, cache.k, cache.v,
                                      cache.length, seq_lens, idx_arg)
    return logits, KVCache(k=k_new, v=v_new, length=kv_len)


def _deepseek_pipeline_forward(params, config: ModelConfig,
                               tokens: jax.Array,
                               cache: DeepSeekPPCache, *, mesh: Mesh,
                               axis: str, mod,
                               seq_lens: Optional[jax.Array] = None,
                               logit_idx: Optional[jax.Array] = None
                               ) -> Tuple[jax.Array, Any]:
    """deepseek stage relay: the `first_k_dense_replace` dense layers
    run REPLICATED on every stage before the ring (weights + their
    latent caches replicate; x is replicated at entry, so every stage
    computes identical dense outputs and cache updates), then the MoE
    stack [L-kd] stages over `axis` like the generic relay. MLA caches:
    k = compressed latent [*, B, T, lr], v = shared rope key
    [*, B, T, dr] (models/deepseek.py)."""
    B, S = tokens.shape
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    n_stage = mesh.shape[axis]
    kd = config.first_k_dense_replace
    _check_stages(config, config.num_layers - kd, n_stage)
    if not isinstance(cache, DeepSeekPPCache):
        raise TypeError("deepseek pipeline needs the DeepSeekPPCache from "
                        "shard_for_pipeline(..., config=config)")
    lf = mod._layer_forward
    ad = _adapter(config, "deepseek", mod)
    Vh = params["lm_head"].shape[-1]

    lspec = _pp_spec_tree(params, axis)
    cspec = pipeline_cache_spec(axis)
    rep_c = lambda a: P(*([None] * a.ndim))
    gather = logit_idx is not None

    def local(params_l, toks, kd_c, vd_c, k_loc, v_loc, length, sl, idx):
        me = jax.lax.axis_index(axis)
        start = length
        positions = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        kv_len = start + sl

        x = ad.embed(params_l, toks, positions)
        # Dense prelude — replicated compute on every stage.
        dl = params_l.get("dense_layers")
        for i in range(kd):
            c1 = kd_c[i]
            p1 = vd_c[i]
            x, c1, p1, _, _ = lf(config, x, dl, positions, c1, p1,
                                 start, kv_len, layer_index=i,
                                 dense_ffn=True)
            kd_c = kd_c.at[i].set(c1)
            vd_c = vd_c.at[i].set(p1)

        def run_stage(args):
            x, kc, vc = args
            n_local = kc.shape[0]

            def body(carry, i):
                x, kf, vf = carry
                k1 = jax.lax.dynamic_index_in_dim(kf, i, 0, keepdims=False)
                v1 = jax.lax.dynamic_index_in_dim(vf, i, 0, keepdims=False)
                x, k1, v1 = ad.step(x, params_l["layers"], positions, k1,
                                    v1, start, kv_len, i, None)
                kf = jax.lax.dynamic_update_index_in_dim(kf, k1, i, 0)
                vf = jax.lax.dynamic_update_index_in_dim(vf, v1, i, 0)
                return (x, kf, vf), None

            (x, kc, vc), _ = jax.lax.scan(
                body, (x, kc, vc), jnp.arange(n_local, dtype=jnp.int32))
            return x, kc, vc

        def stage_step(s, carry):
            x, kc, vc = carry
            x, kc, vc = jax.lax.cond(me == s, run_stage, lambda a: a,
                                     (x, kc, vc))
            perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
            x = jax.lax.ppermute(x, axis, perm)
            return (x, kc, vc)

        x, k_loc, v_loc = jax.lax.fori_loop(
            0, n_stage, stage_step, (x, k_loc, v_loc))
        if gather:
            x = jnp.take_along_axis(
                x, idx[:, None, None].astype(jnp.int32), axis=1)
        logits = jax.lax.cond(
            me == 0, lambda v: ad.head(params_l, v),
            lambda v: jnp.zeros(v.shape[:2] + (Vh,), jnp.float32), x)
        logits = jax.lax.psum(logits, axis)
        return logits, kd_c, vd_c, k_loc, v_loc, kv_len

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(lspec, P(None, None), rep_c(cache.k_dense),
                  rep_c(cache.v_dense), cspec, cspec, P(None), P(None),
                  P(None)),
        out_specs=(P(None, None, None), rep_c(cache.k_dense),
                   rep_c(cache.v_dense), cspec, cspec, P(None)),
        check_vma=False, axis_names=frozenset({axis}))
    idx_arg = (jnp.zeros((B,), jnp.int32) if logit_idx is None
               else logit_idx.astype(jnp.int32))
    logits, kd_new, vd_new, k_new, v_new, kv_len = fn(
        params, tokens, cache.k_dense, cache.v_dense, cache.k, cache.v,
        cache.length, seq_lens, idx_arg)
    return logits, DeepSeekPPCache(k_dense=kd_new, v_dense=vd_new,
                                   k=k_new, v=v_new, length=kv_len)


def _deepseek_pipeline_forward_microbatch(
        params, config: ModelConfig, tokens: jax.Array,
        cache: DeepSeekPPCache, *, mesh: Mesh, axis: str,
        mod, microbatches: Optional[int],
        seq_lens: Optional[jax.Array] = None) -> Tuple[jax.Array, Any]:
    """GPipe-style microbatched relay for deepseek. The dense prelude
    (first_k_dense_replace layers; weights + latent caches replicated)
    runs on EVERY stage at each microbatch's inject tick — identical
    replicated compute, so the replicated dense caches stay in sync —
    and only stage 0 keeps the resulting activation for the ring. The
    MoE stack then staggers over `axis` exactly like the generic
    microbatch relay (one rotating activation slot per stage)."""
    B, S = tokens.shape
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    n_stage = mesh.shape[axis]
    kd = config.first_k_dense_replace
    _check_stages(config, config.num_layers - kd, n_stage)
    if not isinstance(cache, DeepSeekPPCache):
        raise TypeError("deepseek pipeline needs the DeepSeekPPCache from "
                        "shard_for_pipeline(..., config=config)")
    M = microbatches or n_stage
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mbB = B // M
    lf = mod._layer_forward
    ad = _adapter(config, "deepseek", mod)
    H = config.hidden_size
    V = params["lm_head"].shape[-1]

    lspec = _pp_spec_tree(params, axis)
    cspec = pipeline_cache_spec(axis)
    rep_c = lambda a: P(*([None] * a.ndim))

    def local(params_l, toks, kd_c, vd_c, k_loc, v_loc, length, sl):
        me = jax.lax.axis_index(axis)
        n_local = k_loc.shape[0]
        layers_local = params_l["layers"]
        dl = params_l.get("dense_layers")
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

        def collect(t, a, out):
            m_done = t - n_stage

            def do(out):
                return jax.lax.dynamic_update_slice(
                    out, ad.head(params_l, a)[None],
                    (jnp.maximum(m_done, 0), 0, 0, 0))
            return jax.lax.cond((me == 0) & (m_done >= 0), do,
                                lambda o: o, out)

        def inject(t, a, kd_c, vd_c):
            """Embed microbatch t + dense prelude — on ALL stages (the
            dense caches replicate; every stage must apply the same
            updates). Stage 0 keeps the activation."""
            def do(args):
                a, kd_c, vd_c = args
                o = jnp.clip(t, 0, M - 1) * mbB
                tks = jax.lax.dynamic_slice_in_dim(toks, o, mbB, 0)
                st = jax.lax.dynamic_slice_in_dim(length, o, mbB, 0)
                pos = st[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
                x = ad.embed(params_l, tks, pos)
                kvl = st + jax.lax.dynamic_slice_in_dim(sl, o, mbB, 0)
                kdm = jax.lax.dynamic_slice_in_dim(kd_c, o, mbB, 1)
                vdm = jax.lax.dynamic_slice_in_dim(vd_c, o, mbB, 1)
                for i in range(kd):
                    x, c1, p1, _, _ = lf(config, x, dl, pos, kdm[i],
                                         vdm[i], st, kvl, layer_index=i,
                                         dense_ffn=True)
                    kdm = jax.lax.dynamic_update_index_in_dim(
                        kdm, c1, i, 0)
                    vdm = jax.lax.dynamic_update_index_in_dim(
                        vdm, p1, i, 0)
                kd_c = jax.lax.dynamic_update_slice_in_dim(kd_c, kdm, o, 1)
                vd_c = jax.lax.dynamic_update_slice_in_dim(vd_c, vdm, o, 1)
                a = jnp.where(me == 0, x, a)
                return a, kd_c, vd_c
            return jax.lax.cond(t < M, do, lambda z: z, (a, kd_c, vd_c))

        def process(t, a, kc, vc):
            m = t - me

            def run(args):
                a, kc, vc = args
                o = jnp.clip(m, 0, M - 1) * mbB
                st = jax.lax.dynamic_slice_in_dim(length, o, mbB, 0)
                positions = (st[:, None]
                             + jnp.arange(S, dtype=jnp.int32)[None, :])
                kvl = st + jax.lax.dynamic_slice_in_dim(sl, o, mbB, 0)
                kcs = jax.lax.dynamic_slice_in_dim(kc, o, mbB, 1)
                vcs = jax.lax.dynamic_slice_in_dim(vc, o, mbB, 1)

                def body(carry, i):
                    x, kf, vf = carry
                    k1 = jax.lax.dynamic_index_in_dim(kf, i, 0,
                                                      keepdims=False)
                    v1 = jax.lax.dynamic_index_in_dim(vf, i, 0,
                                                      keepdims=False)
                    x, k1, v1 = ad.step(x, layers_local, positions, k1,
                                        v1, st, kvl, i, None)
                    kf = jax.lax.dynamic_update_index_in_dim(kf, k1, i, 0)
                    vf = jax.lax.dynamic_update_index_in_dim(vf, v1, i, 0)
                    return (x, kf, vf), None

                (x, kcs, vcs), _ = jax.lax.scan(
                    body, (a, kcs, vcs),
                    jnp.arange(n_local, dtype=jnp.int32))
                kc = jax.lax.dynamic_update_slice_in_dim(kc, kcs, o, 1)
                vc = jax.lax.dynamic_update_slice_in_dim(vc, vcs, o, 1)
                return x, kc, vc

            return jax.lax.cond((m >= 0) & (m < M), run,
                                lambda args: args, (a, kc, vc))

        def tick(t, carry):
            a, kd_c, vd_c, kc, vc, out = carry
            out = collect(t, a, out)
            a, kd_c, vd_c = inject(t, a, kd_c, vd_c)
            a, kc, vc = process(t, a, kc, vc)
            a = jax.lax.ppermute(a, axis, perm)
            return a, kd_c, vd_c, kc, vc, out

        a = jnp.zeros((mbB, S, H), config.dtype)
        out = jnp.zeros((M, mbB, S, V), jnp.float32)
        a, kd_c, vd_c, k_loc, v_loc, out = jax.lax.fori_loop(
            0, M + n_stage - 1, tick,
            (a, kd_c, vd_c, k_loc, v_loc, out))
        out = collect(M + n_stage - 1, a, out)

        logits = out.reshape(B, S, V)
        logits = jnp.where(me == 0, logits, 0.0)
        logits = jax.lax.psum(logits, axis)
        return logits, kd_c, vd_c, k_loc, v_loc, length + sl

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(lspec, P(None, None), rep_c(cache.k_dense),
                  rep_c(cache.v_dense), cspec, cspec, P(None), P(None)),
        out_specs=(P(None, None, None), rep_c(cache.k_dense),
                   rep_c(cache.v_dense), cspec, cspec, P(None)),
        check_vma=False, axis_names=frozenset({axis}))
    logits, kd_new, vd_new, k_new, v_new, kv_len = fn(
        params, tokens, cache.k_dense, cache.v_dense, cache.k, cache.v,
        cache.length, seq_lens)
    return logits, DeepSeekPPCache(k_dense=kd_new, v_dense=vd_new,
                                   k=k_new, v=v_new, length=kv_len)


def pipeline_forward_microbatch(params, config: ModelConfig,
                                tokens: jax.Array, cache: KVCache, *,
                                mesh: Mesh, axis: str = PP_AXIS,
                                microbatches: Optional[int] = None,
                                seq_lens: Optional[jax.Array] = None
                                ) -> Tuple[jax.Array, KVCache]:
    """GPipe-style staggered pipeline forward.

    The batch splits into M microbatches; at tick t stage s processes
    microbatch t-s, so after a (P-1)-tick ramp all P stages run
    concurrently on different microbatches (total M+P-1 ticks instead
    of the plain relay's effectively-serial P stage passes over the
    full batch). Same contract and numerics as pipeline_forward; B must
    divide by `microbatches` (default: the stage count). Covers every
    PP family (llama/moe/gpt2/neox/gptoss/deepseek).

    One activation slot per stage rotates along the ring each tick
    (ppermute, neighbor ICI traffic only); stage 0 injects embeddings
    into the ring and collects finished activations into the logits
    buffer, which a psum broadcasts at the end.

    deepseek routes to its own variant (dense-prelude layers run
    replicated at inject ticks; the MoE stack rides the ring).
    """
    family, mod = _family(config)
    if family == "deepseek":
        return _deepseek_pipeline_forward_microbatch(
            params, config, tokens, cache, mesh=mesh, axis=axis, mod=mod,
            microbatches=microbatches, seq_lens=seq_lens)
    B, S = tokens.shape
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    n_stage = mesh.shape[axis]
    M = microbatches or n_stage
    _check_stages(config, config.num_layers, n_stage)
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mbB = B // M
    ad = _adapter(config, family, mod)

    H = config.hidden_size
    V = params["lm_head"].shape[-1]      # QTensor exposes logical shape
    lspec = _pp_spec_tree(params, axis)
    cspec = pipeline_cache_spec(axis)

    def local(params_l, toks, k_loc, v_loc, length, sl):
        me = jax.lax.axis_index(axis)
        n_local = k_loc.shape[0]
        base = me * n_local
        layers_local = params_l["layers"]
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

        def collect(t, a, out):
            """Stage 0: bank the finished microbatch t-n_stage."""
            m_done = t - n_stage

            def do(out):
                return jax.lax.dynamic_update_slice(
                    out, ad.head(params_l, a)[None],
                    (jnp.maximum(m_done, 0), 0, 0, 0))
            return jax.lax.cond((me == 0) & (m_done >= 0), do,
                                lambda o: o, out)

        def inject(t, a):
            """Stage 0: embed microbatch t into the ring slot."""
            def do(_):
                o = jnp.clip(t, 0, M - 1) * mbB
                tks = jax.lax.dynamic_slice_in_dim(toks, o, mbB, 0)
                st = jax.lax.dynamic_slice_in_dim(length, o, mbB, 0)
                pos = st[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
                return ad.embed(params_l, tks, pos)
            return jax.lax.cond((me == 0) & (t < M), do, lambda a_: a_, a)

        def process(t, a, kc, vc):
            m = t - me

            def run(args):
                a, kc, vc = args
                o = jnp.clip(m, 0, M - 1) * mbB
                st = jax.lax.dynamic_slice_in_dim(length, o, mbB, 0)
                positions = (st[:, None]
                             + jnp.arange(S, dtype=jnp.int32)[None, :])
                kvl = st + jax.lax.dynamic_slice_in_dim(sl, o, mbB, 0)
                kcs = jax.lax.dynamic_slice_in_dim(kc, o, mbB, 1)
                vcs = jax.lax.dynamic_slice_in_dim(vc, o, mbB, 1)

                if S == 1 and ad.stacked_decode:
                    def body(carry, i):
                        x, kf, vf = carry
                        x, kf, vf = ad.step(x, layers_local, positions,
                                            kf, vf, st, kvl, i, base + i)
                        return (x, kf, vf), None
                else:
                    def body(carry, i):
                        x, kf, vf = carry
                        k1 = jax.lax.dynamic_index_in_dim(
                            kf, i, 0, keepdims=False)
                        v1 = jax.lax.dynamic_index_in_dim(
                            vf, i, 0, keepdims=False)
                        x, k1, v1 = ad.step(x, layers_local, positions,
                                            k1, v1, st, kvl, i, base + i)
                        kf = jax.lax.dynamic_update_index_in_dim(
                            kf, k1, i, 0)
                        vf = jax.lax.dynamic_update_index_in_dim(
                            vf, v1, i, 0)
                        return (x, kf, vf), None

                (x, kcs, vcs), _ = jax.lax.scan(
                    body, (a, kcs, vcs),
                    jnp.arange(n_local, dtype=jnp.int32))
                kc = jax.lax.dynamic_update_slice_in_dim(kc, kcs, o, 1)
                vc = jax.lax.dynamic_update_slice_in_dim(vc, vcs, o, 1)
                return x, kc, vc

            return jax.lax.cond((m >= 0) & (m < M), run,
                                lambda args: args, (a, kc, vc))

        def tick(t, carry):
            a, kc, vc, out = carry
            out = collect(t, a, out)          # uses the rotated-in slot
            a = inject(t, a)
            a, kc, vc = process(t, a, kc, vc)
            a = jax.lax.ppermute(a, axis, perm)
            return a, kc, vc, out

        a = jnp.zeros((mbB, S, H), config.dtype)
        out = jnp.zeros((M, mbB, S, V), jnp.float32)
        a, k_loc, v_loc, out = jax.lax.fori_loop(
            0, M + n_stage - 1, tick, (a, k_loc, v_loc, out))
        # The last microbatch lands on stage 0 after the final rotation.
        out = collect(M + n_stage - 1, a, out)

        logits = out.reshape(B, S, V)
        logits = jnp.where(me == 0, logits, 0.0)
        logits = jax.lax.psum(logits, axis)
        return logits, k_loc, v_loc, length + sl

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(lspec, P(None, None), cspec, cspec, P(None), P(None)),
        out_specs=(P(None, None, None), cspec, cspec, P(None)),
        check_vma=False, axis_names=frozenset({axis}))
    logits, k_new, v_new, kv_len = fn(params, tokens, cache.k, cache.v,
                                      cache.length, seq_lens)
    return logits, KVCache(k=k_new, v=v_new, length=kv_len)
