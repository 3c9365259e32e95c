"""GPT-OSS model tests: sinks, clamped GLU, engine integration.
HF numeric parity lives in test_hf_parity.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import turboinfer_tpu as ti
from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.models import gptoss, registry


@pytest.fixture(scope="module")
def go_cfg():
    return ModelConfig(vocab_size=300, hidden_size=64, num_layers=4,
                       num_heads=4, num_kv_heads=2, head_dim=16,
                       intermediate_size=48, num_experts=4,
                       experts_per_token=2, attn_bias=True,
                       sliding_window=8, sliding_window_pattern=2,
                       max_seq_len=64, architecture="gpt_oss",
                       name="tiny-gptoss", dtype=jnp.float32)


@pytest.fixture(scope="module")
def go_params(go_cfg):
    return gptoss.init_params(jax.random.PRNGKey(0), go_cfg)


def test_registry():
    assert registry.get_model("gpt_oss") is gptoss


def test_glu_clamps():
    g = jnp.asarray([-100.0, 0.0, 100.0])
    u = jnp.asarray([-100.0, 0.0, 100.0])
    out = np.asarray(gptoss._glu(g, u))
    # gate clamped to 7, up to [-7, 7]
    assert out[2] == pytest.approx((7 + 1) * 7 / (1 + np.exp(-1.702 * 7)),
                                   rel=1e-5)
    assert out[0] == pytest.approx(0.0, abs=1e-5)   # sigmoid(-170)≈0


def test_sink_soaks_probability(go_cfg, go_params):
    """Raising a head's sink logit must shrink that head's attention
    output magnitude (probability mass leaks to the dropped sink)."""
    tokens = jnp.asarray([[1, 5, 9, 20]], jnp.int32)
    base = gptoss.forward_no_cache(go_params, go_cfg, tokens)
    boosted = {**go_params,
               "layers": {**go_params["layers"],
                          "sinks": go_params["layers"]["sinks"] + 50.0}}
    out = gptoss.forward_no_cache(boosted, go_cfg, tokens)
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_incremental_matches_full(go_params, go_cfg):
    tokens = jnp.asarray([[7, 23, 200, 5, 99, 42, 3, 150, 31, 77, 12,
                           251]], jnp.int32)   # > window: exercises both
    full = gptoss.forward_no_cache(go_params, go_cfg, tokens)
    cache = gptoss.init_cache(go_cfg, 1, max_seq=32)
    lg, cache = gptoss.forward(go_params, go_cfg, tokens[:, :10], cache)
    np.testing.assert_allclose(np.asarray(lg[:, 9]), np.asarray(full[:, 9]),
                               rtol=1e-4, atol=1e-4)
    for s in range(10, 12):
        lg, cache = gptoss.forward(go_params, go_cfg,
                                   tokens[:, s:s + 1], cache)
        np.testing.assert_allclose(np.asarray(lg[:, 0]),
                                   np.asarray(full[:, s]),
                                   rtol=1e-4, atol=1e-4)


def test_engine_and_scheduler(go_params, go_cfg):
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    icfg = ti.InferenceConfig(max_seq_len=64)
    eng = ti.InferenceEngine(go_params, go_cfg, icfg)
    want = eng.generate([1, 5, 9, 20], 6, temperature=0.0).tokens
    assert want == eng.generate([1, 5, 9, 20], 6, temperature=0.0).tokens
    sched = ContinuousBatchingScheduler(go_params, go_cfg, icfg,
                                        batch_slots=2)
    rid = sched.submit([1, 5, 9, 20], max_new_tokens=6, temperature=0.0)
    while sched.pending:
        sched.step()
    assert [1, 5, 9, 20] + sched.get_request(rid).out_tokens == list(want)


def test_gptoss_quantization(go_params, go_cfg):
    """Attention projections quantize; the biased clamped-GLU experts
    stay fp (einsum path); engine decodes."""
    from turboinfer_tpu.config import QuantizationConfig, QuantType
    from turboinfer_tpu.core.qtensor import QTensor
    from turboinfer_tpu.quant.quantizer import quantize_params
    q = quantize_params(go_params, QuantizationConfig(
        type=QuantType.INT8, group_size=16))
    assert isinstance(q["layers"]["wq"], QTensor)
    assert not isinstance(q["layers"]["we_gate"], QTensor)
    assert not isinstance(q["layers"]["router"], QTensor)
    eng = ti.InferenceEngine(q, go_cfg)
    assert len(eng.generate([1, 5], 6, temperature=0.0).tokens) == 8


def test_gptoss_gather_matches_dense(go_cfg, go_params):
    """The decode weight-gather regime (B*S*k < E) must agree with the
    dense masked einsum, biases included: same token alone vs inside a
    longer row."""
    lw = {k: v[0] for k, v in go_params["layers"].items()}
    h = jnp.asarray(np.random.RandomState(5).randn(1, 4, 64), jnp.float32)
    dense = gptoss._moe_ffn(go_cfg, h, lw, None)       # 4*2 >= 4
    single = gptoss._moe_ffn(go_cfg, h[:, :1], lw, None)  # 1*2 < 4
    np.testing.assert_allclose(np.asarray(single[:, 0]),
                               np.asarray(dense[:, 0]),
                               rtol=1e-5, atol=1e-5)


def test_gptoss_gather_stacked_layer_index(go_cfg, go_params):
    """Stacked weights + traced layer_index (the decode scan) equal the
    per-layer-slice call for every layer."""
    layers = go_params["layers"]
    h = jnp.asarray(np.random.RandomState(6).randn(1, 1, 64), jnp.float32)
    for i in range(go_cfg.num_layers):
        lw_i = {k: v[i] for k, v in layers.items()}
        want = gptoss._moe_ffn(go_cfg, h, lw_i, None)
        got = jax.jit(lambda li: gptoss._moe_ffn(
            go_cfg, h, layers, li))(jnp.int32(i))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_streaming_multi_chunk_matches_single(go_cfg, go_params):
    """A cache spanning multiple streaming chunks (T=128 -> 2x64) gives
    the same logits as a single-chunk cache — the sink initialization
    and running-softmax rescaling must be chunk-count invariant."""
    tokens = jnp.asarray([[7, 23, 200, 5, 99, 42, 3, 150]], jnp.int32)
    c1 = gptoss.init_cache(go_cfg, 1, max_seq=64)
    c2 = gptoss.init_cache(go_cfg, 1, max_seq=128)
    l1, c1 = gptoss.forward(go_params, go_cfg, tokens, c1)
    l2, c2 = gptoss.forward(go_params, go_cfg, tokens, c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)
    nxt = jnp.argmax(l1[:, -1:], -1).astype(jnp.int32)
    d1, _ = gptoss.forward(go_params, go_cfg, nxt, c1)
    d2, _ = gptoss.forward(go_params, go_cfg, nxt, c2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_gptoss_paged_decode_matches_contiguous(go_cfg, go_params):
    """Paged block-table decode with sinks + alternating windows must
    reproduce the contiguous-cache logits trajectory."""
    from turboinfer_tpu.engine import paged_cache as pc
    B, page, n_pages = 2, 8, 12
    cfg, params = go_cfg, go_params
    prompt_len = 5
    cache = gptoss.init_cache(cfg, B, max_seq=32)
    rng = np.random.RandomState(9)
    prompt = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, prompt_len)),
                         jnp.int32)
    logits_c, cache = gptoss.forward(params, cfg, prompt, cache)
    tok_c = jnp.argmax(logits_c[:, -1], -1).astype(jnp.int32)

    pcache = pc.init_paged_cache(cfg, B, num_pages=n_pages,
                                 page_size=page, max_seq=32)
    alloc = pc.PageAllocator(n_pages)
    for b in range(B):
        pcache = pc.assign_pages(pcache, b, alloc.alloc(4))
    for t in range(prompt_len):
        pcache = pc.append_token(pcache, cache.k[:, :, :, t],
                                 cache.v[:, :, :, t])
    tok_p = tok_c
    for _step in range(6):      # crosses the sliding window (8)
        logits_p, kp, vp = gptoss.forward_paged_decode(
            params, cfg, tok_p, pcache.k_pages, pcache.v_pages,
            pcache.block_table, pcache.lengths)
        pcache = pcache._replace(k_pages=kp, v_pages=vp,
                                 lengths=pcache.lengths + 1)
        logits_c, cache = gptoss.forward(params, cfg, tok_c[:, None],
                                         cache)
        np.testing.assert_allclose(np.asarray(logits_p),
                                   np.asarray(logits_c[:, 0]),
                                   rtol=2e-4, atol=2e-4)
        tok_p = jnp.argmax(logits_p, -1).astype(jnp.int32)
        tok_c = jnp.argmax(logits_c[:, -1], -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok_p),
                                      np.asarray(tok_c))


def test_gptoss_paged_scheduler_serves(go_cfg, go_params):
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    icfg = ti.InferenceConfig(max_seq_len=64)
    eng = ti.InferenceEngine(go_params, go_cfg, icfg)
    want = eng.generate([1, 5, 9, 20], 8, temperature=0.0).tokens
    sched = PagedContinuousScheduler(go_params, go_cfg, icfg,
                                     batch_slots=2, page_size=8)
    rid = sched.submit([1, 5, 9, 20], max_new_tokens=8, temperature=0.0)
    while sched.pending:
        sched.step()
    req = sched.get_request(rid)
    assert req.finished
    assert [1, 5, 9, 20] + req.out_tokens == list(want)
