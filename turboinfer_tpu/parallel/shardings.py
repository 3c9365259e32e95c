"""PartitionSpecs for params, activations and the KV cache.

The reference has no parallelism (SURVEY.md row 15); this is the
TPU-native design from SURVEY.md §7.6:
  - qkv / up / gate projections column-sharded over `tp` (outputs land
    head-sharded / ffn-sharded, no collective),
  - o / down projections row-sharded over `tp` (XLA inserts the psum),
  - lm_head column-sharded (logits vocab-sharded; sampling reductions
    trigger the gather),
  - KV cache sharded over kv-heads on `tp` and batch on `data`,
  - embeddings + norms replicated (cheap, avoids gather on the token
    gather path).

Weights here are [in, out] (see models/llama.py), so "column-sharded"
means PartitionSpec(None, "tp") on the last axis, with the leading
stacked-layer axis unsharded.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from turboinfer_tpu.core.qtensor import QTensor
from turboinfer_tpu.parallel.mesh import DATA_AXIS, TP_AXIS


def param_specs(tp: str = TP_AXIS) -> Dict[str, Any]:
    """PartitionSpec pytree matching models/llama.init_params structure.
    Layer weights carry a leading stacked-L axis (unsharded)."""
    return {
        "embed": P(None, None),
        "layers": {
            "attn_norm": P(None, None),
            "ffn_norm": P(None, None),
            "wq": P(None, None, tp),
            "wk": P(None, None, tp),
            "wv": P(None, None, tp),
            "wo": P(None, tp, None),
            "w_gate": P(None, None, tp),
            "w_up": P(None, None, tp),
            "w_down": P(None, tp, None),
        },
        "final_norm": P(None),
        "lm_head": P(None, tp),
    }


def moe_param_specs(tp: str = TP_AXIS) -> Dict[str, Any]:
    """Specs for models/moe.py: EXPERT-parallel — the leading E axis of
    expert weights shards over `tp`, so the expert einsums partition by
    expert and XLA psums the router-weighted combine. Attention shards
    like the dense model."""
    return {
        "embed": P(None, None),
        "layers": {
            "attn_norm": P(None, None),
            "ffn_norm": P(None, None),
            "wq": P(None, None, tp),
            "wk": P(None, None, tp),
            "wv": P(None, None, tp),
            "wo": P(None, tp, None),
            "router": P(None, None, None),
            "we_gate": P(None, tp, None, None),
            "we_up": P(None, tp, None, None),
            "we_down": P(None, tp, None, None),
            # Qwen2-MoE shared expert: dense SwiGLU, classic TP
            # (column-shard gate/up, row-shard down -> psum).
            "ws_gate": P(None, None, tp),
            "ws_up": P(None, None, tp),
            "ws_down": P(None, tp, None),
            "shared_gate": P(None, None, None),
        },
        "final_norm": P(None),
        "lm_head": P(None, tp),
    }


def cache_spec(tp: str = TP_AXIS, data: str = DATA_AXIS) -> P:
    """KV cache [L, B, Hkv, T, D]: batch over data, heads over tp."""
    return P(None, data, tp, None, None)


def token_spec(data: str = DATA_AXIS) -> P:
    return P(data, None)


def paged_cache_spec(tp: str = TP_AXIS) -> P:
    """Paged KV pool [L, P, Hkv, page, D]: heads over tp. The page pool
    is SHARED across sequences, so the page axis stays replicated (every
    chip holds its head-slice of every page) and block tables/lengths
    are replicated host state."""
    return P(None, None, tp, None, None)


def shard_paged_cache(cache, mesh: Mesh):
    """Place a PagedKVCache on the mesh (heads over tp, tables
    replicated). Pools whose head axis cannot divide tp (deepseek's
    MLA latent pools, Hkv == 1) replicate instead; int8 scale pages
    [L, P, Hkv, page] follow the pool spec minus the D axis."""
    Hkv = cache.k_pages.shape[2]
    tp = TP_AXIS if Hkv % max(mesh.shape.get(TP_AXIS, 1), 1) == 0 \
        else None
    ns = NamedSharding(mesh, paged_cache_spec(tp=tp))
    rep = NamedSharding(mesh, P())
    ksp = vsp = None
    if cache.k_scale_pages is not None:
        sc_ns = NamedSharding(mesh, P(*paged_cache_spec(tp=tp)[:4]))
        ksp = jax.device_put(cache.k_scale_pages, sc_ns)
        vsp = jax.device_put(cache.v_scale_pages, sc_ns)
    return cache._replace(
        k_pages=jax.device_put(cache.k_pages, ns),
        v_pages=jax.device_put(cache.v_pages, ns),
        block_table=jax.device_put(cache.block_table, rep),
        lengths=jax.device_put(cache.lengths, rep),
        k_scale_pages=ksp, v_scale_pages=vsp)


def fit_spec(spec: P, ndim: int) -> P:
    """Adapt a spec to an array of higher rank (e.g. pre-tiled 4-D
    scales [L, nk, gk, N]): keep the first and last axis specs,
    replicate the inserted middle axes."""
    if len(spec) == ndim or len(spec) == 0:
        return spec
    return P(*(list(spec[:-1]) + [None] * (ndim - len(spec))
               + [spec[-1]]))


def shard_params(params: Dict[str, Any], mesh: Mesh,
                 specs: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Place a param pytree on the mesh with NamedShardings. QTensor
    leaves get their spec applied to data/scales/zero_points with the
    group axis following K."""
    specs = specs or param_specs()
    fit = fit_spec

    def place(leaf, spec):
        if leaf is None:
            return None
        if isinstance(leaf, QTensor):
            # data: same rank as logical weight ([(L,) K(/2), N]);
            # scales/zp: [(L,) G(*), N] — same spec (K position holds G).
            data = jax.device_put(leaf.data,
                                  NamedSharding(mesh, fit(spec,
                                                          leaf.data.ndim)))
            scales = jax.device_put(
                leaf.scales, NamedSharding(mesh, fit(spec,
                                                     leaf.scales.ndim)))
            zp = (None if leaf.zero_points is None
                  else jax.device_put(
                      leaf.zero_points,
                      NamedSharding(mesh, fit(spec,
                                              leaf.zero_points.ndim))))
            spf = (None if leaf.scales_pf is None
                   else jax.device_put(
                       leaf.scales_pf,
                       NamedSharding(mesh, fit(spec,
                                               leaf.scales_pf.ndim))))
            return QTensor(data=data, scales=scales, zero_points=zp,
                           bits=leaf.bits, group_size=leaf.group_size,
                           shape=leaf.shape, scales_pf=spf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def walk(p, s):
        """Align specs to the params structure; slots the spec dict
        doesn't mention (optional: biases, qk-norms, shared expert,
        LoRA) replicate."""
        if isinstance(p, dict):
            return {k: walk(v, s.get(k) if isinstance(s, dict) else None)
                    for k, v in p.items()}
        return place(p, s if isinstance(s, P) else P())

    return walk(params, specs)


def shard_cache(cache, mesh: Mesh):
    """Place a KVCache on the mesh. Batches that don't divide the data
    axis (e.g. a single-sequence beam-search cache) replicate over data
    and shard heads over tp only."""
    from turboinfer_tpu.models.llama import KVCache
    B = cache.k.shape[1]
    data = DATA_AXIS if B % max(mesh.shape.get(DATA_AXIS, 1), 1) == 0 \
        else None
    # Head axis shards over tp only when it divides: deepseek's MLA
    # latent cache has Hkv == 1 (the latent is shared by every head,
    # deepseek_cache_spec) — replicate it instead of failing.
    Hkv = cache.k.shape[2]
    tp = TP_AXIS if Hkv % max(mesh.shape.get(TP_AXIS, 1), 1) == 0 \
        else None
    ns = NamedSharding(mesh, cache_spec(tp=tp, data=data))
    len_ns = NamedSharding(mesh, P(data))
    ks = vs = None
    if cache.k_scale is not None:
        # int8 scales [L, B, Hkv, T]: cache_spec minus the D axis.
        sc_ns = NamedSharding(mesh, P(*cache_spec(tp=tp, data=data)[:4]))
        ks = jax.device_put(cache.k_scale, sc_ns)
        vs = jax.device_put(cache.v_scale, sc_ns)
    return KVCache(k=jax.device_put(cache.k, ns),
                   v=jax.device_put(cache.v, ns),
                   length=jax.device_put(cache.length, len_ns),
                   k_scale=ks, v_scale=vs)


def replicate_for_host(tree, mesh: Mesh):
    """All-gather jitted outputs onto every process so the host can read
    them (np.asarray of an array spanning non-addressable devices raises
    under multi-controller SPMD). A jitted identity with replicated
    out_shardings — XLA inserts the all-gathers. No-op for
    single-process meshes, where everything is already addressable."""
    if mesh is None or jax.process_count() <= 1:
        return tree
    rep = NamedSharding(mesh, P())
    out_sh = jax.tree_util.tree_map(lambda _: rep, tree)
    return jax.jit(lambda t: t, out_shardings=out_sh)(tree)


def deepseek_param_specs(tp: str = TP_AXIS) -> Dict[str, Any]:
    """Specs for models/deepseek.py (MLA + MoE).

    MLA tensor parallelism shards the HEAD dimension: wq/wq_b and
    wkv_b column-shard (their outputs split by head), wo row-shards
    (psum combine). The latent projections (wkv_a, kv_a_norm) and the
    compressed cache replicate — the latent is shared by every head and
    tiny (kv_lora_rank + rope dims per token), so each chip attends its
    head slice against the full latent with no collective. Experts
    shard over `tp` (EP) exactly like moe_param_specs; shared experts
    use classic column/row TP."""
    attn = {
        "attn_norm": P(None, None),
        "ffn_norm": P(None, None),
        "kv_a_norm": P(None, None),
        "wkv_a": P(None, None, None),
        "wkv_b": P(None, None, tp),
        "wo": P(None, tp, None),
    }
    qslots = {"wq": P(None, None, tp),
              "wq_a": P(None, None, None),
              "q_a_norm": P(None, None),
              "wq_b": P(None, None, tp)}
    layers = dict(attn, **qslots)
    layers.update({
        "router": P(None, None, None),
        "router_bias": P(None, None),
        "we_gate": P(None, tp, None, None),
        "we_up": P(None, tp, None, None),
        "we_down": P(None, tp, None, None),
        "ws_gate": P(None, None, tp),
        "ws_up": P(None, None, tp),
        "ws_down": P(None, tp, None),
    })
    dense = dict(attn, **qslots)
    dense.update({
        "w_gate": P(None, None, tp),
        "w_up": P(None, None, tp),
        "w_down": P(None, tp, None),
    })
    return {
        "embed": P(None, None),
        "layers": layers,
        "dense_layers": dense,
        "final_norm": P(None),
        "lm_head": P(None, tp),
    }


def deepseek_cache_spec(data: str = DATA_AXIS) -> P:
    """Compressed latent cache [L, B, 1, T, lr]: batch over data, the
    latent replicated over tp (head-independent)."""
    return P(None, data, None, None, None)
