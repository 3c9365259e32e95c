"""DeepSeek V2/V3 model tests: MLA compressed cache, routing semantics,
engine integration. HF numeric parity lives in test_hf_parity.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import turboinfer_tpu as ti
from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.models import deepseek, registry


@pytest.fixture(scope="module")
def ds_cfg():
    return ModelConfig(vocab_size=400, hidden_size=64, num_layers=3,
                       num_heads=4, intermediate_size=96,
                       moe_intermediate_size=32, num_experts=8,
                       experts_per_token=3, shared_expert_size=32,
                       scoring_func="sigmoid", topk_method="noaux_tc",
                       n_group=4, topk_group=2,
                       routed_scaling_factor=2.5, norm_topk_prob=True,
                       first_k_dense_replace=1, kv_lora_rank=32,
                       q_lora_rank=48, qk_nope_head_dim=16,
                       qk_rope_head_dim=8, v_head_dim=16,
                       max_seq_len=64, architecture="deepseek_v3",
                       name="tiny-deepseek", dtype=jnp.float32)


@pytest.fixture(scope="module")
def ds_params(ds_cfg):
    return deepseek.init_params(jax.random.PRNGKey(0), ds_cfg)


def test_registry():
    assert registry.get_model("deepseek_v2") is deepseek
    assert registry.get_model("deepseek_v3") is deepseek


def test_compressed_cache_shapes(ds_cfg):
    """The MLA cache stores the latent + shared rope key, NOT per-head
    K/V: [L,B,1,T,kv_lora_rank] and [L,B,1,T,qk_rope_head_dim]."""
    cache = deepseek.init_cache(ds_cfg, 2, max_seq=16)
    assert cache.k.shape == (3, 2, 1, 16, 32)
    assert cache.v.shape == (3, 2, 1, 16, 8)
    # vs naive per-head cache: heads*(qk_head + v_head) floats/token
    naive = ds_cfg.num_heads * ((16 + 8) + 16)
    assert 32 + 8 < naive


def test_incremental_matches_full(ds_params, ds_cfg):
    tokens = jnp.asarray([[7, 23, 301, 5, 99, 42]], jnp.int32)
    full = deepseek.forward_no_cache(ds_params, ds_cfg, tokens)
    cache = deepseek.init_cache(ds_cfg, 1, max_seq=32)
    lg, cache = deepseek.forward(ds_params, ds_cfg, tokens[:, :4], cache)
    np.testing.assert_allclose(np.asarray(lg[:, 3]), np.asarray(full[:, 3]),
                               rtol=1e-4, atol=1e-4)
    for s in range(4, 6):
        lg, cache = deepseek.forward(ds_params, ds_cfg,
                                     tokens[:, s:s + 1], cache)
        np.testing.assert_allclose(np.asarray(lg[:, 0]),
                                   np.asarray(full[:, s]),
                                   rtol=1e-4, atol=1e-4)


def test_routing_group_limit(ds_cfg, ds_params):
    """noaux_tc: all selected experts must come from the topk_group
    best groups (by top-2-sum of bias-corrected scores)."""
    h = jnp.asarray(np.random.RandomState(0).randn(2, 3, 64), jnp.float32)
    router = ds_params["layers"]["router"][0]
    bias = ds_params["layers"]["router_bias"][0]
    gates, top_i = deepseek._route(ds_cfg, h, router, bias)
    E, G = ds_cfg.num_experts, ds_cfg.n_group
    scores = jax.nn.sigmoid(h.astype(jnp.float32) @ router.astype(
        jnp.float32)) + bias
    gs = np.asarray(scores).reshape(2, 3, G, E // G)
    g2 = np.sort(gs, -1)[..., -2:].sum(-1)
    for b in range(2):
        for s in range(3):
            keep = set(np.argsort(-g2[b, s])[:ds_cfg.topk_group])
            for e in np.asarray(top_i)[b, s]:
                assert int(e) // (E // G) in keep
    # gates normalized then scaled
    np.testing.assert_allclose(np.asarray(gates).sum(-1),
                               ds_cfg.routed_scaling_factor, rtol=1e-5)


def test_engine_generates(ds_params, ds_cfg):
    eng = ti.InferenceEngine(ds_params, ds_cfg)
    res = eng.generate([1, 5, 9], 10, temperature=0.0)
    assert len(res.tokens) == 13
    assert res.tokens == eng.generate([1, 5, 9], 10, temperature=0.0).tokens


def test_continuous_scheduler_serves(ds_params, ds_cfg):
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    icfg = ti.InferenceConfig(max_seq_len=64)
    eng = ti.InferenceEngine(ds_params, ds_cfg, icfg)
    want = eng.generate([1, 5, 9, 20], 6, temperature=0.0).tokens
    sched = ContinuousBatchingScheduler(ds_params, ds_cfg, icfg,
                                        batch_slots=2)
    rid = sched.submit([1, 5, 9, 20], max_new_tokens=6, temperature=0.0)
    while sched.pending:
        sched.step()
    assert [1, 5, 9, 20] + sched.get_request(rid).out_tokens == list(want)


@pytest.mark.slow
def test_deepseek_quantization(ds_params, ds_cfg):
    """MLA + MoE quantization: attention/lora/shared stacks and the
    4-D expert stacks quantize (router and wkv_b stay fp — einsum'd /
    per-head-reshaped); dense_layers group quantizes too; the engine
    still decodes and logits stay argmax-close."""
    from turboinfer_tpu.config import QuantizationConfig, QuantType
    from turboinfer_tpu.core.qtensor import QTensor
    from turboinfer_tpu.quant.quantizer import quantize_params
    q = quantize_params(ds_params, QuantizationConfig(
        type=QuantType.INT8, group_size=16))
    lw = q["layers"]
    assert isinstance(lw["wkv_a"], QTensor)
    assert isinstance(lw["wq_b"], QTensor)
    assert isinstance(lw["we_gate"], QTensor)
    assert isinstance(lw["ws_down"], QTensor)
    assert not isinstance(lw["wkv_b"], QTensor)
    assert not isinstance(lw["router"], QTensor)
    dl = q["dense_layers"]
    assert isinstance(dl["w_gate"], QTensor)
    assert not isinstance(dl["wkv_b"], QTensor)

    tokens = jnp.asarray([[1, 5, 42, 7]], jnp.int32)
    want = deepseek.forward_no_cache(ds_params, ds_cfg, tokens)
    got = deepseek.forward_no_cache(q, ds_cfg, tokens)
    assert np.mean(np.argmax(np.asarray(got), -1)
                   == np.argmax(np.asarray(want), -1)) >= 0.75
    eng = ti.InferenceEngine(q, ds_cfg)
    assert len(eng.generate([1, 5], 6, temperature=0.0).tokens) == 8


def test_streaming_attention_multi_chunk(ds_params, ds_cfg):
    """Attention streams the latent cache in chunks; a cache sized for
    multiple chunks (T=128 -> 2x64) must give the same logits as a
    single-chunk cache (T=32)."""
    tokens = jnp.asarray([[7, 23, 301, 5, 99, 42]], jnp.int32)
    c1 = deepseek.init_cache(ds_cfg, 1, max_seq=32)
    c2 = deepseek.init_cache(ds_cfg, 1, max_seq=128)
    l1, c1 = deepseek.forward(ds_params, ds_cfg, tokens, c1)
    l2, c2 = deepseek.forward(ds_params, ds_cfg, tokens, c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)
    nxt = jnp.argmax(l1[:, -1:], -1).astype(jnp.int32)
    d1, _ = deepseek.forward(ds_params, ds_cfg, nxt, c1)
    d2, _ = deepseek.forward(ds_params, ds_cfg, nxt, c2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)


def test_deepseek_tp_sharding(ds_cfg, ds_params):
    """MLA head-sharded TP + expert-parallel specs on the virtual mesh
    must match the unsharded forward."""
    from turboinfer_tpu.parallel import mesh as pmesh, shardings
    n = min(len(jax.devices()), 2)
    if n < 2:
        pytest.skip("needs >= 2 devices")
    mesh = pmesh.make_mesh((1, n), devices=jax.devices()[:n])
    sharded = shardings.shard_params(
        ds_params, mesh, specs=shardings.deepseek_param_specs())
    tokens = jnp.asarray([[1, 5, 42, 7]], jnp.int32)
    want = deepseek.forward_no_cache(ds_params, ds_cfg, tokens)
    with mesh:
        got = jax.jit(
            lambda p, t: deepseek.forward_no_cache(p, ds_cfg, t))(
            sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_deepseek_paged_decode_matches_contiguous(ds_cfg, ds_params):
    """Paged latent pools (block-table streaming) must reproduce the
    contiguous compressed-cache logits trajectory."""
    from turboinfer_tpu.engine import paged_cache as pc
    B, page, n_pages = 2, 8, 12
    cfg, params = ds_cfg, ds_params
    prompt_len = 5
    cache = deepseek.init_cache(cfg, B, max_seq=32)
    rng = np.random.RandomState(7)
    prompt = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, prompt_len)),
                         jnp.int32)
    logits_c, cache = deepseek.forward(params, cfg, prompt, cache)
    tok_c = jnp.argmax(logits_c[:, -1], -1).astype(jnp.int32)

    pcache = pc.init_paged_cache(cfg, B, num_pages=n_pages,
                                 page_size=page, max_seq=32)
    assert pcache.k_pages.shape[-1] == cfg.kv_lora_rank
    assert pcache.v_pages.shape[-1] == cfg.qk_rope_head_dim
    alloc = pc.PageAllocator(n_pages)
    for b in range(B):
        pcache = pc.assign_pages(pcache, b, alloc.alloc(4))
    for t in range(prompt_len):
        pcache = pc.append_token(pcache, cache.k[:, :, :, t],
                                 cache.v[:, :, :, t])
    tok_p = tok_c
    for _step in range(5):
        logits_p, kp, vp = deepseek.forward_paged_decode(
            params, cfg, tok_p, pcache.k_pages, pcache.v_pages,
            pcache.block_table, pcache.lengths)
        pcache = pcache._replace(k_pages=kp, v_pages=vp,
                                 lengths=pcache.lengths + 1)
        logits_c, cache = deepseek.forward(params, cfg, tok_c[:, None],
                                           cache)
        np.testing.assert_allclose(np.asarray(logits_p),
                                   np.asarray(logits_c[:, 0]),
                                   rtol=2e-4, atol=2e-4)
        tok_p = jnp.argmax(logits_p, -1).astype(jnp.int32)
        tok_c = jnp.argmax(logits_c[:, -1], -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok_p),
                                      np.asarray(tok_c))


@pytest.mark.slow
def test_deepseek_paged_scheduler_serves(ds_cfg, ds_params):
    """DeepSeek under the paged continuous scheduler (incl. prefix
    caching machinery): greedy outputs equal the plain engine's."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    icfg = ti.InferenceConfig(max_seq_len=64)
    eng = ti.InferenceEngine(ds_params, ds_cfg, icfg)
    want = eng.generate([1, 5, 9, 20], 8, temperature=0.0).tokens
    sched = PagedContinuousScheduler(ds_params, ds_cfg, icfg,
                                     batch_slots=2, page_size=8)
    rid = sched.submit([1, 5, 9, 20], max_new_tokens=8, temperature=0.0)
    while sched.pending:
        sched.step()
    req = sched.get_request(rid)
    assert req.finished
    assert [1, 5, 9, 20] + req.out_tokens == list(want)


@pytest.mark.slow
def test_synthetic_quantized_deepseek_fixture():
    """The packed perf-fixture factory produces a runnable quantized
    DeepSeek (engine decodes; expert stacks are 4-D QTensors)."""
    from turboinfer_tpu.config import deepseek_v2_lite_config
    from turboinfer_tpu.core.qtensor import QTensor
    from turboinfer_tpu.loader.synthetic import (
        create_synthetic_quantized_model)
    cfg = deepseek_v2_lite_config(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=96, moe_intermediate_size=32,
        shared_expert_size=32, num_experts=8, experts_per_token=2,
        kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
        v_head_dim=16, max_seq_len=64, dtype=jnp.bfloat16)
    data = create_synthetic_quantized_model(cfg, bits=4, group_size=16)
    lw = data.params["layers"]
    assert isinstance(lw["we_gate"], QTensor)
    assert lw["we_gate"].data.ndim == 4
    assert isinstance(data.params["dense_layers"]["w_gate"], QTensor)
    eng = ti.InferenceEngine(data.params, cfg,
                             ti.InferenceConfig(eos_token_id=-1))
    assert len(eng.generate([1, 5], 4, temperature=0.0).tokens) == 6


@pytest.mark.slow
def test_int8_latent_cache_close_to_f32(ds_params, ds_cfg):
    """int8 MLA latent cache: prefill+decode over int8-stored c_kv/k_pe
    (per-token absmax scales in KVCache.k_scale/v_scale [L,B,1,T]) must
    track the f32-cache logits within the quantization noise. Random
    tiny models sit on argmax near-ties, so compare logits."""
    toks = jnp.asarray([[7, 23, 301, 5, 99]], jnp.int32)
    ref, c_f = deepseek.forward(ds_params, ds_cfg, toks,
                                deepseek.init_cache(ds_cfg, 1, max_seq=64))
    c8 = deepseek.init_cache(ds_cfg, 1, max_seq=64, dtype=jnp.int8)
    assert c8.k.dtype == jnp.int8 and c8.v.dtype == jnp.int8
    assert c8.k_scale.shape == (3, 1, 1, 64)
    got, c8 = deepseek.forward(ds_params, ds_cfg, toks, c8)
    r, g = np.asarray(ref[0, -1]), np.asarray(got[0, -1])
    assert np.abs(g - r).max() < 0.25 * max(1.0, np.abs(r).max())
    # decode steps over the int8 cache stay close too
    t = jnp.argmax(ref[0, -1])[None, None].astype(jnp.int32)
    for _ in range(2):
        ref2, c_f = deepseek.forward(ds_params, ds_cfg, t, c_f)
        got2, c8 = deepseek.forward(ds_params, ds_cfg, t, c8)
        d = np.abs(np.asarray(got2[0, 0]) - np.asarray(ref2[0, 0]))
        assert d.max() < 0.25 * max(1.0, np.abs(np.asarray(ref2)).max())
        t = jnp.argmax(ref2[0, 0])[None, None].astype(jnp.int32)


def test_int8_latent_cache_engine_and_scheduler(ds_params, ds_cfg):
    """kv_cache_dtype='int8' runs end-to-end on DeepSeek: engine
    generate is deterministic, and the continuous-batching scheduler
    (which gates on SUPPORTS_INT8_KV) reproduces the engine trajectory."""
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    icfg = ti.InferenceConfig(max_seq_len=64, kv_cache_dtype="int8")
    eng = ti.InferenceEngine(ds_params, ds_cfg, icfg)
    want = eng.generate([1, 5, 9, 20], 6, temperature=0.0).tokens
    assert len(want) == 10
    assert want == eng.generate([1, 5, 9, 20], 6, temperature=0.0).tokens
    sched = ContinuousBatchingScheduler(ds_params, ds_cfg, icfg,
                                        batch_slots=2)
    rid = sched.submit([1, 5, 9, 20], max_new_tokens=6, temperature=0.0)
    while sched.pending:
        sched.step()
    assert [1, 5, 9, 20] + sched.get_request(rid).out_tokens == list(want)


def test_int8_latent_paged_scheduler_serves(ds_cfg, ds_params):
    """DeepSeek + kv_cache_dtype='int8' under the PAGED scheduler: scale
    pages ride the pool (written by the generic prefill scatter and the
    MLA paged decode), and greedy outputs equal the contiguous int8
    engine's."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    icfg = ti.InferenceConfig(max_seq_len=64, kv_cache_dtype="int8")
    eng = ti.InferenceEngine(ds_params, ds_cfg, icfg)
    want = eng.generate([1, 5, 9, 20], 8, temperature=0.0).tokens
    sched = PagedContinuousScheduler(ds_params, ds_cfg, icfg,
                                     batch_slots=2, page_size=8)
    assert sched.cache.k_pages.dtype == jnp.int8
    assert sched.cache.k_scale_pages is not None
    rid = sched.submit([1, 5, 9, 20], max_new_tokens=8, temperature=0.0)
    while sched.pending:
        sched.step()
    req = sched.get_request(rid)
    assert req.finished
    assert [1, 5, 9, 20] + req.out_tokens == list(want)


@pytest.mark.slow
def test_int8_latent_prefix_cache_consistent(ds_cfg, ds_params):
    """int8 MLA page pool + automatic prefix caching: a repeat of the
    same prompt is served from prefix-cached latent pages (their scale
    pages shared with them) and reproduces the identical greedy
    trajectory."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    icfg = ti.InferenceConfig(max_seq_len=64, temperature=0.0, seed=0,
                              kv_cache_dtype="int8")
    s = PagedContinuousScheduler(ds_params, ds_cfg, icfg,
                                 batch_slots=2, page_size=8)
    prompt = list(range(1, 20))              # spans 2+ full pages
    r1 = s.submit(prompt, 6)
    t1 = s.run()[r1].tokens
    hits_before = s.pool.hits
    r2 = s.submit(prompt, 6)
    t2 = s.run()[r2].tokens
    assert s.pool.hits > hits_before         # latent prefix pages reused
    assert t1 == t2


@pytest.mark.slow
def test_mesh_engine_deepseek_matches_unsharded(ds_cfg, ds_params):
    """Mesh-parallel InferenceEngine serving DeepSeek: MLA-head-sharded
    weights (deepseek_param_specs) + the latent cache replicated over tp
    (Hkv=1 cannot shard — shard_cache falls back) must reproduce the
    unsharded greedy trajectory."""
    from turboinfer_tpu.parallel import mesh as pmesh, shardings
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = pmesh.make_mesh((1, 2), devices=jax.devices()[:2])
    icfg = ti.InferenceConfig(max_seq_len=64)
    want = ti.InferenceEngine(ds_params, ds_cfg, icfg).generate(
        [1, 5, 9, 20], 8, temperature=0.0).tokens
    eng = ti.InferenceEngine(
        ds_params, ds_cfg, icfg, mesh=mesh,
        param_specs=shardings.deepseek_param_specs())
    got = eng.generate([1, 5, 9, 20], 8, temperature=0.0).tokens
    assert got == want
    # int8 latent cache on the mesh: scale planes replicate with it
    icfg8 = ti.InferenceConfig(max_seq_len=64, kv_cache_dtype="int8")
    want8 = ti.InferenceEngine(ds_params, ds_cfg, icfg8).generate(
        [1, 5, 9, 20], 8, temperature=0.0).tokens
    eng8 = ti.InferenceEngine(
        ds_params, ds_cfg, icfg8, mesh=mesh,
        param_specs=shardings.deepseek_param_specs())
    assert eng8.generate([1, 5, 9, 20], 8, temperature=0.0).tokens == want8


@pytest.mark.slow
def test_mesh_scheduler_deepseek_matches_unsharded(ds_cfg, ds_params):
    """Continuous batching over a TP mesh for DeepSeek (MLA-head-sharded
    weights, latent cache replicated over tp): greedy output equals the
    unsharded engine's."""
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    from turboinfer_tpu.parallel import mesh as pmesh, shardings
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = pmesh.make_mesh((1, 2), devices=jax.devices()[:2])
    icfg = ti.InferenceConfig(max_seq_len=64)
    want = ti.InferenceEngine(ds_params, ds_cfg, icfg).generate(
        [1, 5, 9, 20], 6, temperature=0.0).tokens
    sched = ContinuousBatchingScheduler(
        ds_params, ds_cfg, icfg, batch_slots=2, mesh=mesh,
        param_specs=shardings.deepseek_param_specs())
    rid = sched.submit([1, 5, 9, 20], max_new_tokens=6, temperature=0.0)
    while sched.pending:
        sched.step()
    assert [1, 5, 9, 20] + sched.get_request(rid).out_tokens == list(want)
