"""Golden tests vs HuggingFace transformers (torch CPU).

Each test builds a TINY randomly-initialized HF model, converts its
state_dict through loader/mapping.assemble_params + config_from_hf_dict
(the same code path a real safetensors checkpoint takes), and asserts
our forward matches HF logits in float32.

The reference has nothing like this — its tests assert only "non-empty
output" (SURVEY.md §4); these pin exact numerics per architecture:
llama (+ llama3 rope scaling), qwen2 (attention biases), qwen3
(q/k RMSNorm), gemma (embed scaling, (1+w) norms, GeGLU), gemma2
(sandwich norms, logit softcaps, alternating sliding window, attn-scale
override), gemma3 (local/global RoPE bases), phi3 (fused qkv/gate_up).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from turboinfer_tpu.loader import mapping
from turboinfer_tpu.models import llama, registry

ATOL = 2e-3   # f32 both sides; accumulation-order differences only
RTOL = 2e-3


def _hf_logits(model, tokens):
    model.eval()
    with torch.no_grad():
        out = model(torch.tensor(tokens, dtype=torch.long))
    return out.logits.float().numpy()


def _ours_from_hf(model, hf_cfg, tokens):
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    config = mapping.config_from_hf_dict(hf_cfg.to_dict(),
                                         dtype=jnp.float32)
    params = mapping.assemble_for(config)(lambda n: sd[n], list(sd),
                                          config, dtype=jnp.float32)
    mod = registry.get_model(config.architecture)
    logits = mod.forward_no_cache(params, config,
                                  jnp.asarray(tokens, jnp.int32))
    return np.asarray(logits), config, params


def _check(model, hf_cfg, *, B=2, S=24, seed=0):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(B, S))
    want = _hf_logits(model, tokens)
    got, config, params = _ours_from_hf(model, hf_cfg, tokens)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)
    return config, params, tokens, want


def _decode_check(config, params, tokens, want, mod=llama):
    """Prefill all-but-last + single-token decode steps must match the
    full-sequence logits at each decoded position."""
    B, S = tokens.shape
    split = S - 4
    cache = mod.init_cache(config, B, max_seq=S, dtype=jnp.float32)
    logits, cache = mod.forward(params, config,
                                jnp.asarray(tokens[:, :split], jnp.int32),
                                cache)
    np.testing.assert_allclose(np.asarray(logits), want[:, :split],
                               atol=ATOL, rtol=RTOL)
    for s in range(split, S):
        logits, cache = mod.forward(
            params, config, jnp.asarray(tokens[:, s:s + 1], jnp.int32),
            cache)
        np.testing.assert_allclose(np.asarray(logits[:, 0]), want[:, s],
                                   atol=ATOL, rtol=RTOL)


def test_llama_parity():
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager")
    model = transformers.LlamaForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "llama" and not config.attn_bias
    _decode_check(config, params, tokens, want)


def test_llama3_rope_scaling_parity():
    torch.manual_seed(1)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rope_theta=50000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32},
        attn_implementation="eager")
    model = transformers.LlamaForCausalLM(cfg)
    config, *_ = _check(model, cfg, S=48)
    assert dict(config.rope_scaling)["rope_type"] == "llama3"


def test_qwen2_bias_parity():
    torch.manual_seed(2)
    cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, use_sliding_window=False,
        attn_implementation="eager")
    model = transformers.Qwen2ForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.attn_bias and config.sliding_window is None
    assert "b_q" in params["layers"]
    _decode_check(config, params, tokens, want)
    # Fused-projection path (what engines run) must stay identical.
    from turboinfer_tpu.models.common import fuse_projections
    fused = fuse_projections(params)
    assert "b_qkv" in fused["layers"]
    got = np.asarray(llama.forward_no_cache(
        fused, config, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_qwen3_qk_norm_parity():
    torch.manual_seed(3)
    cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=64,
        attn_implementation="eager")
    model = transformers.Qwen3ForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.qk_norm and config.head_dim == 32
    _decode_check(config, params, tokens, want)


def test_gemma_parity():
    torch.manual_seed(4)
    cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=32, max_position_embeddings=64,
        attn_implementation="eager")
    model = transformers.GemmaForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.scale_embeddings and config.norm_offset
    assert config.hidden_act == "gelu" and config.tie_embeddings
    _decode_check(config, params, tokens, want)


def test_gemma2_parity():
    torch.manual_seed(5)
    cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=64,
        query_pre_attn_scalar=64,       # != head_dim: exercises attn_scale
        sliding_window=8,               # alternating local/global layers
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        attn_implementation="eager")
    model = transformers.Gemma2ForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg, S=24)
    assert config.post_norms and config.sliding_window_pattern == 2
    assert config.attn_logit_softcap == 50.0
    assert config.attn_scale == pytest.approx(64 ** -0.5)
    _decode_check(config, params, tokens, want)


def test_gemma3_parity():
    torch.manual_seed(6)
    cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128,
        sliding_window=8, sliding_window_pattern=3,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        query_pre_attn_scalar=32,
        attn_implementation="eager")
    model = transformers.Gemma3ForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg, S=24)
    assert config.qk_norm and config.rope_local_theta == 10000.0
    assert config.sliding_window_pattern == 3
    _decode_check(config, params, tokens, want)


def test_phi3_fused_weights_parity():
    torch.manual_seed(7)
    cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=None, pad_token_id=0,
        attn_implementation="eager")
    model = transformers.Phi3ForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "phi3"
    _decode_check(config, params, tokens, want)


def test_gpt_neox_parity():
    """GPT-NeoX/Pythia: parallel residual + partial rotary (0.25) +
    LayerNorm/bias block — a structurally distinct third family."""
    torch.manual_seed(7)
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, rotary_pct=0.25,
        use_parallel_residual=True, attn_implementation="eager")
    model = transformers.GPTNeoXForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "gpt_neox"
    assert config.parallel_residual and config.rotary_pct == 0.25

    # prefill + per-token decode through the KV cache
    from turboinfer_tpu.models import neox
    B, S = tokens.shape
    cache = neox.init_cache(config, B, max_seq=S, dtype=jnp.float32)
    logits, cache = neox.forward(
        params, config, jnp.asarray(tokens[:, :S - 3], jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(logits), want[:, :S - 3],
                               atol=ATOL, rtol=RTOL)
    for s in range(S - 3, S):
        logits, cache = neox.forward(
            params, config, jnp.asarray(tokens[:, s:s + 1], jnp.int32),
            cache)
        np.testing.assert_allclose(np.asarray(logits[:, 0]), want[:, s],
                                   atol=ATOL, rtol=RTOL)


def test_gpt_neox_sequential_residual_parity():
    torch.manual_seed(8)
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, rotary_pct=1.0,
        use_parallel_residual=False, attn_implementation="eager")
    model = transformers.GPTNeoXForCausalLM(cfg)
    config, _, _, _ = _check(model, cfg)
    assert not config.parallel_residual


def test_phi_parity():
    """Phi-1.5/2: NeoX-parallel block with a SHARED layernorm,
    partial rotary, biased projections and a biased lm_head."""
    torch.manual_seed(9)
    cfg = transformers.PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, partial_rotary_factor=0.5,
        attn_implementation="eager")
    model = transformers.PhiForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "phi"
    assert config.parallel_residual and config.rotary_pct == 0.5
    assert "lm_head_b" in params
    from turboinfer_tpu.models import neox
    B, S = tokens.shape
    cache = neox.init_cache(config, B, max_seq=S, dtype=jnp.float32)
    logits, cache = neox.forward(
        params, config, jnp.asarray(tokens[:, :S - 3], jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(logits), want[:, :S - 3],
                               atol=ATOL, rtol=RTOL)
    for s in range(S - 3, S):
        logits, cache = neox.forward(
            params, config, jnp.asarray(tokens[:, s:s + 1], jnp.int32),
            cache)
        np.testing.assert_allclose(np.asarray(logits[:, 0]), want[:, s],
                                   atol=ATOL, rtol=RTOL)


def _neox_decode_check(config, params, tokens, want):
    from turboinfer_tpu.models import neox
    B, S = tokens.shape
    cache = neox.init_cache(config, B, max_seq=S, dtype=jnp.float32)
    logits, cache = neox.forward(
        params, config, jnp.asarray(tokens[:, :S - 3], jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(logits), want[:, :S - 3],
                               atol=ATOL, rtol=RTOL)
    for s in range(S - 3, S):
        logits, cache = neox.forward(
            params, config, jnp.asarray(tokens[:, s:s + 1], jnp.int32),
            cache)
        np.testing.assert_allclose(np.asarray(logits[:, 0]), want[:, s],
                                   atol=ATOL, rtol=RTOL)


def test_falcon_new_arch_gqa_parity():
    """Falcon-40B/180B style: new_decoder_architecture — GQA with
    per-kv-head grouped fused qkv, parallel ln_attn/ln_mlp block."""
    torch.manual_seed(10)
    cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=8, num_kv_heads=2,
        new_decoder_architecture=True, bias=False, alibi=False,
        parallel_attn=True, attn_implementation="eager")
    model = transformers.FalconForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "falcon"
    assert config.kv_heads == 2 and config.parallel_residual
    _neox_decode_check(config, params, tokens, want)


def test_falcon_7b_multi_query_parity():
    """Falcon-7B style: legacy multi_query (1 kv head), single shared
    input_layernorm feeding both attention and MLP (parallel)."""
    torch.manual_seed(11)
    cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=False,
        multi_query=True, parallel_attn=True, bias=False, alibi=False,
        attn_implementation="eager")
    model = transformers.FalconForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.kv_heads == 1
    _neox_decode_check(config, params, tokens, want)


def test_falcon_rw_alibi_parity():
    """Falcon-RW style: sequential residual, MHA head-interleaved fused
    qkv, biased projections, ALiBi instead of RoPE.

    Golden vs HF's sdpa path: transformers' falcon EAGER path adds the
    ALiBi bias twice (once baked into the causal mask by
    _update_causal_mask, once again in the attention forward) — the
    sdpa path applies it once, which is the convention the RW models
    were trained with and what this framework implements."""
    torch.manual_seed(12)
    cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=False,
        multi_query=False, parallel_attn=False, bias=True, alibi=True,
        attn_implementation="sdpa")
    model = transformers.FalconForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.alibi and config.rotary_pct == 0.0
    assert not config.parallel_residual
    _neox_decode_check(config, params, tokens, want)


def test_bloom_alibi_parity():
    """BLOOM: sequential pre-LN block, embedding LayerNorm, ALiBi added
    UNscaled to scaled scores (beta=1.0 baddbmm — unlike Falcon's
    jointly-scaled convention), head-interleaved fused qkv, GELU."""
    torch.manual_seed(13)
    cfg = transformers.BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
        attn_implementation="eager")
    model = transformers.BloomForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "bloom" and config.alibi
    assert "embed_norm_w" in params
    _neox_decode_check(config, params, tokens, want)


def test_mixtral_moe_parity():
    """Mixtral: top-2 routed SwiGLU experts, gates renormalized over
    the selected k (config.norm_topk_prob=True)."""
    torch.manual_seed(14)
    cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, attn_implementation="eager")
    model = transformers.MixtralForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "mixtral" and config.num_experts == 4
    assert config.norm_topk_prob and config.shared_expert_size is None
    assert params["layers"]["we_gate"].shape == (2, 4, 64, 96)
    from turboinfer_tpu.models import moe
    _decode_check(config, params, tokens, want, mod=moe)


def test_qwen2_moe_parity():
    """Qwen2-MoE: raw-softmax top-k gates (norm_topk_prob=False),
    shared expert with sigmoid gate, q/k/v biases, separate
    moe_intermediate_size."""
    torch.manual_seed(15)
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=64, use_sliding_window=False,
        attn_implementation="eager")
    model = transformers.Qwen2MoeForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "qwen2_moe" and config.attn_bias
    assert not config.norm_topk_prob
    assert config.shared_expert_size == 80
    assert params["layers"]["we_gate"].shape == (2, 4, 64, 48)
    assert params["layers"]["ws_gate"].shape == (2, 64, 80)
    assert params["layers"]["shared_gate"].shape == (2, 64, 1)
    from turboinfer_tpu.models import moe
    _decode_check(config, params, tokens, want, mod=moe)


def test_qwen3_moe_parity():
    """Qwen3-MoE: per-head q/k RMSNorm + renormalized top-k gates, no
    shared expert."""
    torch.manual_seed(16)
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=64, attn_implementation="eager")
    model = transformers.Qwen3MoeForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "qwen3_moe" and config.qk_norm
    assert config.norm_topk_prob and not config.attn_bias
    from turboinfer_tpu.models import moe
    _decode_check(config, params, tokens, want, mod=moe)


def _deepseek_decode_check(config, params, tokens, want):
    from turboinfer_tpu.models import deepseek
    _decode_check(config, params, tokens, want, mod=deepseek)


@pytest.mark.slow
def test_deepseek_v2_parity():
    """DeepSeek-V2: MLA with q-LoRA, softmax routing with group-limited
    greedy top-k, gateless shared experts, first dense layer."""
    torch.manual_seed(17)
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=2,
        n_group=4, topk_group=2, topk_method="group_limited_greedy",
        routed_scaling_factor=1.5, norm_topk_prob=False,
        first_k_dense_replace=1, aux_loss_alpha=0.0, seq_aux=False,
        max_position_embeddings=64, attn_implementation="eager")
    model = transformers.DeepseekV2ForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "deepseek_v2"
    assert config.q_lora_rank == 48 and config.kv_lora_rank == 32
    assert config.first_k_dense_replace == 1
    assert config.shared_expert_size == 64          # 2 * moe_inter
    assert "dense_layers" in params
    assert params["layers"]["we_gate"].shape == (2, 8, 64, 32)
    _deepseek_decode_check(config, params, tokens, want)


def test_deepseek_v2_lite_parity():
    """V2-Lite shape: no q-LoRA (full q_proj), plain greedy top-k."""
    torch.manual_seed(18)
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        topk_method="greedy", routed_scaling_factor=1.0,
        norm_topk_prob=False, first_k_dense_replace=1,
        aux_loss_alpha=0.0, seq_aux=False,
        max_position_embeddings=64, attn_implementation="eager")
    model = transformers.DeepseekV2ForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.q_lora_rank is None
    assert "wq" in params["layers"] and "wq_a" not in params["layers"]
    _deepseek_decode_check(config, params, tokens, want)


@pytest.mark.slow
def test_deepseek_v3_parity():
    """DeepSeek-V3: sigmoid scores + e_score_correction_bias selection,
    top-2-sum group limiting (noaux_tc), normalized gates * scaling."""
    torch.manual_seed(19)
    cfg = transformers.DeepseekV3Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=3, n_shared_experts=1,
        n_group=4, topk_group=2, routed_scaling_factor=2.5,
        norm_topk_prob=True, first_k_dense_replace=1,
        max_position_embeddings=64, attn_implementation="eager")
    model = transformers.DeepseekV3ForCausalLM(cfg)
    # give the selection bias a real effect
    with torch.no_grad():
        for lyr in model.model.layers[1:]:
            lyr.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    config, params, tokens, want = _check(model, cfg)
    assert config.scoring_func == "sigmoid"
    assert config.topk_method == "noaux_tc"
    assert config.routed_scaling_factor == 2.5
    assert params["layers"]["router_bias"].shape == (2, 8)
    assert float(np.abs(np.asarray(
        params["layers"]["router_bias"])).max()) > 0
    _deepseek_decode_check(config, params, tokens, want)


def test_gpt_oss_parity():
    """GPT-OSS: attention sinks in the softmax, alternating
    sliding/full layers, biased router with softmax over selected
    logits, biased experts with the clamped GLU, q/k/v/o biases."""
    torch.manual_seed(20)
    cfg = transformers.GptOssConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, sliding_window=8,
        num_local_experts=4, num_experts_per_tok=2,
        rope_theta=10000.0, rope_scaling=None,
        max_position_embeddings=64, attn_implementation="eager")
    model = transformers.GptOssForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "gpt_oss"
    assert config.attn_bias and config.sliding_window == 8
    assert config.sliding_window_pattern == 2
    assert params["layers"]["sinks"].shape == (4, 4)
    assert params["layers"]["we_gate"].shape == (4, 4, 64, 48)
    from turboinfer_tpu.models import gptoss
    _decode_check(config, params, tokens, want, mod=gptoss)


def test_gpt_oss_yarn_parity():
    """YaRN rope scaling (NTK-by-parts freqs + attention-factor on
    cos/sin) must match HF at positions beyond the original window."""
    torch.manual_seed(21)
    cfg = transformers.GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, sliding_window=8,
        num_local_experts=2, num_experts_per_tok=1,
        rope_theta=10000.0,
        rope_scaling={"rope_type": "yarn", "factor": 8.0,
                      "beta_fast": 32.0, "beta_slow": 1.0,
                      "truncate": False,
                      "original_max_position_embeddings": 16},
        max_position_embeddings=128, attn_implementation="eager")
    model = transformers.GptOssForCausalLM(cfg)
    config, *_ = _check(model, cfg, S=40)
    d = dict(config.rope_scaling)
    assert d["rope_type"] == "yarn" and d["factor"] == 8.0


def test_olmoe_parity():
    """OLMoE: WHOLE-projection q/k RMSNorm (pre-reshape, all heads
    jointly — unlike Qwen3's per-head norm), raw-softmax top-k gates."""
    torch.manual_seed(22)
    cfg = transformers.OlmoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=False, clip_qkv=None,
        max_position_embeddings=64, attn_implementation="eager")
    model = transformers.OlmoeForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "olmoe" and config.qk_norm
    assert not config.norm_topk_prob
    assert params["layers"]["q_norm"].shape == (2, 64)   # whole width
    assert params["layers"]["k_norm"].shape == (2, 32)   # Hkv*D
    from turboinfer_tpu.models import moe
    _decode_check(config, params, tokens, want, mod=moe)


def test_granite_parity():
    """Granite 3.x: embedding/residual multipliers, attention_multiplier
    as the raw score scale, logits divided by logits_scaling."""
    torch.manual_seed(23)
    cfg = transformers.GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=64,
        embedding_multiplier=12.0, residual_multiplier=0.22,
        attention_multiplier=0.0078125, logits_scaling=8.0,
        attn_implementation="eager")
    model = transformers.GraniteForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg)
    assert config.architecture == "granite"
    assert config.embedding_multiplier == 12.0
    assert config.attn_scale == 0.0078125
    assert config.logits_scaling == 8.0
    _decode_check(config, params, tokens, want)


@pytest.mark.slow
def test_deepseek_v3_yarn_parity():
    """Released DeepSeek checkpoints ship YaRN rope_scaling: NTK-by-
    parts freqs + attention-factor on cos/sin + mscale^2 on the softmax
    scale. Positions beyond original_max_position_embeddings exercise
    the interpolated bands."""
    torch.manual_seed(24)
    cfg = transformers.DeepseekV3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, routed_scaling_factor=2.5,
        norm_topk_prob=True, first_k_dense_replace=1,
        rope_theta=10000.0,
        rope_scaling={"rope_type": "yarn", "factor": 8.0,
                      "beta_fast": 32.0, "beta_slow": 1.0,
                      "mscale": 1.0, "mscale_all_dim": 1.0,
                      "original_max_position_embeddings": 16},
        max_position_embeddings=128, attn_implementation="eager")
    model = transformers.DeepseekV3ForCausalLM(cfg)
    config, params, tokens, want = _check(model, cfg, S=40)
    d = dict(config.rope_scaling)
    assert d["rope_type"] == "yarn" and d["mscale_all_dim"] == 1.0
    from turboinfer_tpu.models import deepseek
    assert deepseek._softmax_scale(config) != (16 + 8) ** -0.5
    _deepseek_decode_check(config, params, tokens, want)
