"""GPT-2 architecture tests: forward semantics, cache parity, engine
integration, GGUF load path.

The reference claims gpt2 support via metadata mapping only
(model_loader.cpp:752-771); these tests pin a real second architecture.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import turboinfer_tpu as ti
from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.models import gpt2, registry


@pytest.fixture(scope="module")
def g2_cfg():
    return ModelConfig(vocab_size=500, hidden_size=64, num_layers=2,
                       num_heads=4, num_kv_heads=4, intermediate_size=256,
                       max_seq_len=64, architecture="gpt2", name="tiny-gpt2",
                       dtype=jnp.float32)


@pytest.fixture(scope="module")
def g2_params(g2_cfg):
    return gpt2.init_params(jax.random.PRNGKey(0), g2_cfg)


def test_registry():
    assert registry.get_model("gpt2") is gpt2
    assert registry.get_model("GPT2") is gpt2
    with pytest.raises(ValueError, match="unknown architecture"):
        registry.get_model("not-a-model")


def test_incremental_matches_full(g2_params, g2_cfg):
    """Prefill+decode through the cache must equal a full no-cache
    forward (the core KV-cache correctness property)."""
    tokens = jnp.asarray([[1, 5, 42, 7, 99, 3]], jnp.int32)
    full = gpt2.forward_no_cache(g2_params, g2_cfg, tokens)

    cache = gpt2.init_cache(g2_cfg, 1, max_seq=32)
    logits_p, cache = gpt2.forward(g2_params, g2_cfg, tokens[:, :3], cache)
    outs = [logits_p[:, -1]]
    for i in range(3, 6):
        lg, cache = gpt2.forward(g2_params, g2_cfg, tokens[:, i:i + 1],
                                 cache)
        outs.append(lg[:, 0])
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(full[:, 2]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs[-1]), np.asarray(full[:, 5]),
                               rtol=1e-4, atol=1e-4)


def test_positions_matter(g2_params, g2_cfg):
    """Learned positional embeddings: same token at different positions
    must produce different logits."""
    t = jnp.asarray([[7, 7, 7]], jnp.int32)
    logits = gpt2.forward_no_cache(g2_params, g2_cfg, t)
    assert not np.allclose(np.asarray(logits[0, 0]),
                           np.asarray(logits[0, 1]), atol=1e-5)


def test_engine_generates_gpt2(g2_params, g2_cfg):
    eng = ti.InferenceEngine(g2_params, g2_cfg)
    res = eng.generate([1, 5, 9], 12, temperature=0.0)
    assert len(res.tokens) > 3
    res2 = eng.generate([1, 5, 9], 12, temperature=0.0)
    assert res.tokens == res2.tokens     # deterministic greedy


def test_gpt2_gguf_roundtrip(tmp_path, g2_params, g2_cfg):
    """Export HF-style gpt2 tensors to GGUF, reload, logits must match."""
    from turboinfer_tpu.loader import gguf, loader
    p = g2_params

    def np32(x):
        return np.asarray(x, np.float32)

    t = {
        "token_embd.weight": np32(p["embed"]),
        "position_embd.weight": np32(p["pos_embed"]),
        "output_norm.weight": np32(p["final_norm_w"]),
        "output_norm.bias": np32(p["final_norm_b"]),
        "output.weight": np32(p["lm_head"]).T,
    }
    slot2name = dict(ln1_w="blk.{i}.attn_norm.weight",
                     ln1_b="blk.{i}.attn_norm.bias",
                     w_qkv="blk.{i}.attn_qkv.weight",
                     b_qkv="blk.{i}.attn_qkv.bias",
                     wo="blk.{i}.attn_output.weight",
                     bo="blk.{i}.attn_output.bias",
                     ln2_w="blk.{i}.ffn_norm.weight",
                     ln2_b="blk.{i}.ffn_norm.bias",
                     w_fc="blk.{i}.ffn_up.weight",
                     b_fc="blk.{i}.ffn_up.bias",
                     w_proj="blk.{i}.ffn_down.weight",
                     b_proj="blk.{i}.ffn_down.bias")
    weights_2d = {"w_qkv", "wo", "w_fc", "w_proj"}
    for i in range(g2_cfg.num_layers):
        for slot, tmpl in slot2name.items():
            arr = np32(p["layers"][slot][i])
            if slot in weights_2d:
                arr = arr.T              # GGUF stores [out, in]
            t[tmpl.format(i=i)] = arr

    md = {
        "general.architecture": "gpt2",
        "general.name": "tiny-gpt2",
        "gpt2.embedding_length": g2_cfg.hidden_size,
        "gpt2.block_count": g2_cfg.num_layers,
        "gpt2.attention.head_count": g2_cfg.num_heads,
        "gpt2.feed_forward_length": g2_cfg.intermediate_size,
        "gpt2.context_length": g2_cfg.max_seq_len,
    }
    path = str(tmp_path / "tiny-gpt2.gguf")
    gguf.write_gguf(path, md, t)

    data = loader.load_model_data(path, dtype=jnp.float32)
    assert data.config.architecture == "gpt2"
    tokens = jnp.asarray([[1, 5, 42, 7]], jnp.int32)
    want = gpt2.forward_no_cache(g2_params, g2_cfg, tokens)
    got = gpt2.forward_no_cache(data.params,
                                data.config.replace(dtype=jnp.float32),
                                tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_gpt2_quantization(g2_params, g2_cfg):
    """Architecture-aware quantizer handles gpt2 slots."""
    from turboinfer_tpu.config import QuantizationConfig, QuantType
    from turboinfer_tpu.core.qtensor import QTensor
    from turboinfer_tpu.quant.quantizer import (quantize_params,
                                                validate_quantization_accuracy)
    q = quantize_params(g2_params, QuantizationConfig(
        type=QuantType.INT8, group_size=32))
    assert isinstance(q["layers"]["w_qkv"], QTensor)
    assert isinstance(q["layers"]["w_fc"], QTensor)
    eng = ti.InferenceEngine(q, g2_cfg)
    assert len(eng.generate([1, 5], 6, temperature=0.0).tokens) == 8
    rep = validate_quantization_accuracy(g2_params, q, g2_cfg)
    assert rep.mean_abs_logprob_delta < 1.0
