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
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.kernels import ops
from turboinfer_tpu.models import llama
from turboinfer_tpu.models.common import KVCache

PP_AXIS = "pp"


def pipeline_param_specs(pp: str = PP_AXIS,
                         layers: Optional[Dict[str, Any]] = None
                         ) -> Dict[str, Any]:
    """Layer-stacked weights shard on the leading L axis over `pp`;
    embeddings/norms/head replicated (the last stage uses them).

    With `layers` (the params' stacked layer dict) the layer specs are
    derived per leaf — every slot, including optional ones (biases,
    qk-norms, post-norms, MoE experts) and QTensor data/scales, shards
    its leading L axis over `pp`."""
    if layers is not None:
        lspecs = jax.tree_util.tree_map(
            lambda w: P(pp, *([None] * (w.ndim - 1))), layers)
    else:
        lspecs = {s: P(pp, None, None) for s in
                  ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")}
        lspecs.update(attn_norm=P(pp, None), ffn_norm=P(pp, None))
    return {
        "embed": P(None, None),
        "layers": lspecs,
        "final_norm": P(None),
        "lm_head": P(None, None),
    }


def _pp_spec_tree(params, pp: str = PP_AXIS) -> Dict[str, Any]:
    """Leaf-wise PartitionSpec tree for a whole param pytree: stacked
    layer weights (incl. QTensor data/scales and MoE expert stacks)
    shard their leading L axis over `pp`; everything else replicates."""
    rep = lambda w: P(*([None] * w.ndim))
    return {k: (jax.tree_util.tree_map(
                    lambda w: P(pp, *([None] * (w.ndim - 1))), v)
                if k == "layers" else jax.tree_util.tree_map(rep, v))
            for k, v in params.items()}


def pipeline_cache_spec(pp: str = PP_AXIS) -> P:
    """KV cache [L, B, Hkv, T, D]: layer axis over `pp`."""
    return P(pp, None, None, None, None)


def shard_for_pipeline(params, cache: KVCache, mesh: Mesh,
                       pp: str = PP_AXIS):
    """Place params + cache with the pipeline shardings."""
    specs = _pp_spec_tree(params, pp)
    params = jax.tree_util.tree_map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)),
        params, specs)
    ns = NamedSharding(mesh, pipeline_cache_spec(pp))
    cache = KVCache(
        k=jax.device_put(cache.k, ns),
        v=jax.device_put(cache.v, ns),
        length=jax.device_put(cache.length, NamedSharding(mesh, P(None))))
    return params, cache


def pipeline_forward(params, config: ModelConfig, tokens: jax.Array,
                     cache: KVCache, *, mesh: Mesh, axis: str = PP_AXIS
                     ) -> Tuple[jax.Array, KVCache]:
    """llama-family forward with layers staged over `axis`.

    Same contract as llama.forward; tokens/logits replicated across the
    pipeline, params/cache sharded on the layer axis.
    """
    B, S = tokens.shape
    n_stage = mesh.shape[axis]
    if config.num_layers % n_stage:
        raise ValueError(f"{config.num_layers} layers not divisible by "
                         f"{n_stage} pipeline stages")
    from turboinfer_tpu.models import registry
    mod = registry.get_model(config.architecture)
    family = mod.__name__.rsplit(".", 1)[-1]
    if family not in ("llama", "moe"):
        raise NotImplementedError(
            f"pipeline_forward supports llama/moe-family decoders, not "
            f"'{config.architecture}' ({family})")
    layer_fwd = mod._layer_forward

    lspec = _pp_spec_tree(params, axis)
    cspec = pipeline_cache_spec(axis)
    rep2 = P(None, None)

    def local(embed, layers_local, final_norm, lm_head, toks,
              k_loc, v_loc, length):
        me = jax.lax.axis_index(axis)
        start = length
        positions = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        kv_len = start + S

        x = jnp.take(embed, toks, axis=0).astype(config.dtype)
        if config.scale_embeddings:          # Gemma family
            x = x * jnp.asarray(config.hidden_size ** 0.5, x.dtype)

        def run_stage(args):
            x, kc, vc = args
            n_local = kc.shape[0]
            # Gemma2/3 local/global alternation keys off the GLOBAL
            # layer id; local weights/caches index by the stage-local id.
            base = me * n_local

            if S == 1:
                # Decode: the stacked local cache flows through WHOLE
                # (slicing layer i per step copies the full [B,Hkv,T,D]
                # slab each layer — see llama.forward / CLAUDE.md).
                def body(carry, i):
                    x, kf, vf = carry
                    x, kf, vf = layer_fwd(
                        config, x, layers_local, positions, kf, vf,
                        start, kv_len, contiguous=True, layer_index=i,
                        global_layer_index=base + i)
                    return (x, kf, vf), None
            else:
                def body(carry, i):
                    x, kf, vf = carry
                    k1 = jax.lax.dynamic_index_in_dim(kf, i, 0,
                                                      keepdims=False)
                    v1 = jax.lax.dynamic_index_in_dim(vf, i, 0,
                                                      keepdims=False)
                    x, k1, v1 = layer_fwd(
                        config, x, layers_local, positions, k1, v1, start,
                        kv_len, contiguous=True, layer_index=i,
                        global_layer_index=base + i)
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
        # stage 0; stage 0 computes the head and a psum broadcasts.
        x = ops.rms_norm(x, final_norm, config.rms_norm_eps,
                         1.0 if config.norm_offset else 0.0)
        logits = ops.qmatmul(x, lm_head,
                             preferred_dtype=jnp.float32).astype(jnp.float32)
        logits = ops.apply_softcap(logits, config.final_logit_softcap)
        logits = jnp.where(me == 0, logits, 0.0)
        logits = jax.lax.psum(logits, axis)
        return logits, k_loc, v_loc, kv_len

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(lspec["embed"], lspec["layers"], lspec["final_norm"],
                  lspec["lm_head"], rep2, cspec, cspec, P(None)),
        out_specs=(P(None, None, None), cspec, cspec, P(None)),
        check_vma=False)
    logits, k_new, v_new, kv_len = fn(
        params["embed"], params["layers"], params["final_norm"],
        params["lm_head"], tokens, cache.k, cache.v, cache.length)
    return logits, KVCache(k=k_new, v=v_new, length=kv_len)

def pipeline_forward_microbatch(params, config: ModelConfig,
                                tokens: jax.Array, cache: KVCache, *,
                                mesh: Mesh, axis: str = PP_AXIS,
                                microbatches: Optional[int] = None
                                ) -> Tuple[jax.Array, KVCache]:
    """GPipe-style staggered pipeline forward.

    The batch splits into M microbatches; at tick t stage s processes
    microbatch t-s, so after a (P-1)-tick ramp all P stages run
    concurrently on different microbatches (total M+P-1 ticks instead
    of the plain relay's effectively-serial P stage passes over the
    full batch). Same contract and numerics as pipeline_forward; B must
    divide by `microbatches` (default: the stage count).

    One activation slot per stage rotates along the ring each tick
    (ppermute, neighbor ICI traffic only); stage 0 injects embeddings
    into the ring and collects finished activations into the logits
    buffer, which a psum broadcasts at the end.
    """
    B, S = tokens.shape
    n_stage = mesh.shape[axis]
    M = microbatches or n_stage
    if config.num_layers % n_stage:
        raise ValueError(f"{config.num_layers} layers not divisible by "
                         f"{n_stage} pipeline stages")
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mbB = B // M
    from turboinfer_tpu.models import registry
    mod = registry.get_model(config.architecture)
    family = mod.__name__.rsplit(".", 1)[-1]
    if family not in ("llama", "moe"):
        raise NotImplementedError(
            f"pipeline supports llama/moe-family decoders, not "
            f"'{config.architecture}'")
    layer_fwd = mod._layer_forward

    H = config.hidden_size
    V = params["lm_head"].shape[-1] if hasattr(params["lm_head"], "shape") \
        else params["lm_head"].shape[-1]
    lspec = _pp_spec_tree(params, axis)
    cspec = pipeline_cache_spec(axis)
    off = 1.0 if config.norm_offset else 0.0

    def local(embed, layers_local, final_norm, lm_head, toks,
              k_loc, v_loc, length):
        me = jax.lax.axis_index(axis)
        n_local = k_loc.shape[0]
        base = me * n_local
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

        def head(a):
            x = ops.rms_norm(a, final_norm, config.rms_norm_eps, off)
            lg = ops.qmatmul(x, lm_head, preferred_dtype=jnp.float32
                             ).astype(jnp.float32)
            return ops.apply_softcap(lg, config.final_logit_softcap)

        def collect(t, a, out):
            """Stage 0: bank the finished microbatch t-n_stage."""
            m_done = t - n_stage

            def do(out):
                return jax.lax.dynamic_update_slice(
                    out, head(a)[None], (jnp.maximum(m_done, 0), 0, 0, 0))
            return jax.lax.cond((me == 0) & (m_done >= 0), do,
                                lambda o: o, out)

        def inject(t, a):
            """Stage 0: embed microbatch t into the ring slot."""
            def do(_):
                o = jnp.clip(t, 0, M - 1) * mbB
                tks = jax.lax.dynamic_slice_in_dim(toks, o, mbB, 0)
                x = jnp.take(embed, tks, axis=0).astype(config.dtype)
                if config.scale_embeddings:
                    x = x * jnp.asarray(config.hidden_size ** 0.5, x.dtype)
                return x
            return jax.lax.cond((me == 0) & (t < M), do, lambda a_: a_, a)

        def process(t, a, kc, vc):
            m = t - me

            def run(args):
                a, kc, vc = args
                o = jnp.clip(m, 0, M - 1) * mbB
                st = jax.lax.dynamic_slice_in_dim(length, o, mbB, 0)
                positions = (st[:, None]
                             + jnp.arange(S, dtype=jnp.int32)[None, :])
                kvl = st + S
                kcs = jax.lax.dynamic_slice_in_dim(kc, o, mbB, 1)
                vcs = jax.lax.dynamic_slice_in_dim(vc, o, mbB, 1)

                if S == 1:
                    def body(carry, i):
                        x, kf, vf = carry
                        x, kf, vf = layer_fwd(
                            config, x, layers_local, positions, kf, vf,
                            st, kvl, contiguous=True, layer_index=i,
                            global_layer_index=base + i)
                        return (x, kf, vf), None
                else:
                    def body(carry, i):
                        x, kf, vf = carry
                        k1 = jax.lax.dynamic_index_in_dim(
                            kf, i, 0, keepdims=False)
                        v1 = jax.lax.dynamic_index_in_dim(
                            vf, i, 0, keepdims=False)
                        x, k1, v1 = layer_fwd(
                            config, x, layers_local, positions, k1, v1,
                            st, kvl, contiguous=True, layer_index=i,
                            global_layer_index=base + i)
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
        return logits, k_loc, v_loc, length + S

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(lspec["embed"], lspec["layers"], lspec["final_norm"],
                  lspec["lm_head"], P(None, None), cspec, cspec, P(None)),
        out_specs=(P(None, None, None), cspec, cspec, P(None)),
        check_vma=False)
    logits, k_new, v_new, kv_len = fn(
        params["embed"], params["layers"], params["final_norm"],
        params["lm_head"], tokens, cache.k, cache.v, cache.length)
    return logits, KVCache(k=k_new, v=v_new, length=kv_len)
