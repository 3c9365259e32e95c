"""Configuration dataclasses for turboinfer-tpu.

TPU-native equivalents of the reference's three config surfaces:
  - ModelConfig     <- ModelMetadata      (reference: include/turboinfer/model/model_loader.hpp:35-46)
  - InferenceConfig <- InferenceConfig    (reference: include/turboinfer/model/inference_engine.hpp:25-35)
  - QuantizationConfig <- QuantizationConfig (reference: include/turboinfer/optimize/quantization.hpp:35-41)

Unlike the reference, these are frozen dataclasses usable as static jit
arguments, and ModelConfig carries everything XLA needs for static shapes
(head_dim, kv heads for GQA, max_seq).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp


class QuantType(str, enum.Enum):
    """Quantization data types (reference: quantization.hpp:24-30)."""

    NONE = "none"          # keep fp weights
    FLOAT16 = "float16"    # half-precision weights (bf16 on TPU)
    INT8 = "int8"          # 8-bit group-wise weight-only
    INT4 = "int4"          # 4-bit group-wise weight-only, packed 2/byte


class RopeMode(str, enum.Enum):
    """RoPE pairing convention.

    INTERLEAVED rotates (2i, 2i+1) pairs — the GGUF/llama.cpp and reference
    convention (reference: src/core/tensor_engine.cpp:1510-1624).
    HALF rotates (i, i + d/2) pairs — the HuggingFace convention.
    """

    INTERLEAVED = "interleaved"
    HALF = "half"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture description of a decoder-only transformer.

    Superset of the reference's ModelMetadata (model_loader.hpp:35-46):
    adds GQA (num_kv_heads), explicit head_dim, norm eps and dtype control.
    """

    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: Optional[int] = None   # None -> MHA (== num_heads)
    intermediate_size: Optional[int] = None  # None -> SwiGLU default 8/3*H rounded
    head_dim: Optional[int] = None       # None -> hidden_size // num_heads
    rope_theta: float = 10000.0
    rope_mode: RopeMode = RopeMode.HALF
    rms_norm_eps: float = 1e-5
    max_seq_len: int = 2048
    tie_embeddings: bool = False
    # Sliding-window attention (Mistral/Mixtral): each token attends to
    # the previous `sliding_window` positions only. None = full causal.
    sliding_window: Optional[int] = None
    # Per-layer window pattern (Gemma2/3): layer i is GLOBAL (full
    # causal) iff (i + 1) % pattern == 0, windowed otherwise. None/1 =
    # sliding_window (if any) applies to every layer. Gemma2 uses 2,
    # Gemma3 uses 6.
    sliding_window_pattern: Optional[int] = None
    # Mixture-of-experts (0 = dense FFN). experts_per_token = router top-k.
    num_experts: int = 0
    experts_per_token: int = 2
    # Expert FFN width (Qwen-MoE's moe_intermediate_size); None = ffn_dim.
    moe_intermediate_size: Optional[int] = None
    # True (Mixtral): top-k gate weights renormalized to sum 1. False
    # (Qwen2-MoE default): raw full-softmax probabilities of the top-k.
    norm_topk_prob: bool = True
    # Qwen2-MoE shared expert: a dense SwiGLU FFN of this width runs on
    # every token, scaled by sigmoid(shared_expert_gate(x)). None = off.
    # DeepSeek shared experts use the same slot sizes but no gate (the
    # gateless variant is selected by the deepseek architecture).
    shared_expert_size: Optional[int] = None
    # DeepSeek MoE routing. scoring_func: "softmax" (V2) or "sigmoid"
    # (V3, with the e_score_correction_bias selection bias and top-2-sum
    # group scores). topk_method: "greedy" | "group_limited_greedy" (V2
    # group max) | "noaux_tc" (V3). n_group/topk_group: expert-group
    # limiting; routed_scaling_factor multiplies the final gates.
    scoring_func: str = "softmax"
    topk_method: str = "greedy"
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    # First k layers use the DENSE FFN (DeepSeek first_k_dense_replace).
    first_k_dense_replace: int = 0
    # Multi-head Latent Attention (DeepSeek V2/V3). None kv_lora_rank =
    # standard attention. q_lora_rank None = full q projection (V2-Lite).
    kv_lora_rank: Optional[int] = None
    q_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # Granite scaling knobs (None = off): embeddings * m, each residual
    # branch * m, final logits / m. attention_multiplier maps onto
    # attn_scale.
    embedding_multiplier: Optional[float] = None
    residual_multiplier: Optional[float] = None
    logits_scaling: Optional[float] = None
    # q/k/v projection biases (Qwen2 / Qwen2.5).
    attn_bias: bool = False
    # Per-head RMSNorm on q and k before RoPE (Qwen3, Gemma3).
    qk_norm: bool = False
    # Multiply token embeddings by sqrt(hidden_size) (Gemma family).
    scale_embeddings: bool = False
    # RMSNorm weights stored as (w - 1), applied as (1 + w) (Gemma family).
    norm_offset: bool = False
    # Gated-FFN activation: "silu" (LLaMA SwiGLU) or "gelu" (Gemma GeGLU).
    hidden_act: str = "silu"
    # Sandwich norms (Gemma2/3): post_attention and post_feedforward
    # RMSNorms applied to each sublayer's output before the residual add;
    # the ffn_norm slot then holds pre_feedforward_layernorm.
    post_norms: bool = False
    # Attention score scale override; None = head_dim**-0.5. Gemma2 uses
    # query_pre_attn_scalar**-0.5 (e.g. (hidden/heads)**-0.5 for 27B).
    attn_scale: Optional[float] = None
    # Logit soft-capping, cap*tanh(x/cap) (Gemma2): on attention scores
    # and on the final lm_head logits respectively. None = off.
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    # RoPE base for WINDOWED (local) layers when sliding_window_pattern
    # is set (Gemma3: local 10k, global = rope_theta = 1M). None = same.
    rope_local_theta: Optional[float] = None
    # HF-style rope_scaling as a hashable (key, value) tuple, e.g.
    # (("rope_type", "llama3"), ("factor", 8.0), ...). () = unscaled.
    rope_scaling: Tuple[Tuple[str, Any], ...] = ()
    # Partial rotary embedding: RoPE covers the first rotary_pct·D dims
    # of each head (GPT-NeoX/Pythia ship 0.25); 1.0 = full-head RoPE.
    rotary_pct: float = 1.0
    # Parallel residual (GPT-NeoX): x + attn(ln1(x)) + mlp(ln2(x)).
    parallel_residual: bool = False
    # ALiBi position encoding (Falcon-RW / BLOOM): per-head linear score
    # bias slope*key_pos instead of RoPE (rotary_pct should be 0).
    alibi: bool = False
    name: str = "llama"
    architecture: str = "llama"
    # dtype for activations / fp weights. bfloat16 is the TPU-native default.
    dtype: Any = jnp.bfloat16
    extra: Tuple[Tuple[str, str], ...] = ()  # GGUF metadata passthrough (hashable)

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads if self.num_kv_heads is not None else self.num_heads

    @property
    def head_dim_(self) -> int:
        return self.head_dim if self.head_dim is not None else self.hidden_size // self.num_heads

    @property
    def ffn_dim(self) -> int:
        if self.intermediate_size is not None:
            return self.intermediate_size
        # LLaMA SwiGLU sizing: 2/3 * 4H rounded up to a multiple of 256.
        d = int(2 * 4 * self.hidden_size / 3)
        return ((d + 255) // 256) * 256

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim_

    @property
    def kv_dim(self) -> int:
        return self.kv_heads * self.head_dim_

    def extra_params(self) -> Dict[str, str]:
        return dict(self.extra)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Generation-time settings (reference: inference_engine.hpp:25-35).

    Unlike the reference, eos_token_id is honored (the reference hardcodes
    EOS==2 at inference_engine.cpp:760 — SURVEY.md quirk #9).
    """

    max_seq_len: int = 2048
    max_batch_size: int = 32
    temperature: float = 1.0
    top_p: float = 0.9
    top_k: int = 50
    # Beyond the reference's knobs: min-p nucleus floor, HF-convention
    # repetition penalty, OpenAI-convention presence/frequency penalties
    # (defaults are no-ops and compile to nothing).
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    length_penalty: float = 1.0
    eos_token_id: int = 2
    pad_token_id: int = 0
    use_cache: bool = True
    seed: int = 0
    # Decode loop style: "scan" fuses the whole decode loop into one XLA
    # program (fastest, fixed token budget); "host" steps one jitted call per
    # token (supports early exit on EOS from the host side).
    decode_loop: str = "scan"
    # Bucket prompt lengths to powers of two to bound recompilation.
    prefill_bucket: bool = True
    # Chunked prefill: process prompts in fixed chunks of this many
    # tokens (0 = single-shot). Bounds compile shapes and activation
    # memory for long prompts.
    prefill_chunk: int = 0
    # KV-cache storage dtype: "model" stores at the model's activation
    # dtype; "int8" (the recommended compressed mode) stores symmetric
    # per-(token, head) scaled int8 — half the HBM bytes of bf16, and
    # FASTER than bf16 at batched long fills (scales apply on the
    # kernels' small score/prob tiles); "fp8" stores float8_e4m3 (same
    # memory halving, no scale bookkeeping, ~0-10% decode overhead
    # from the in-kernel e4m3 bit decode); "bf16" forces bfloat16 for
    # fp32 models. Honored by the engine, both schedulers, and
    # speculative decoding.
    kv_cache_dtype: str = "model"
    # Accurate TTFT on the scan decode path costs a device sync between
    # the prefill and decode dispatches (~30-45 ms on a tunnel-attached
    # chip, a real RTT anywhere). Default False: prefill_time_ms then
    # reports host ENQUEUE time (a lower bound). The CLI and anything
    # that displays TTFT should set True; serving TTFT comes from the
    # scheduler's own per-request clock either way.
    measure_ttft: bool = False


@dataclasses.dataclass(frozen=True)
class QuantizationConfig:
    """Weight-only quantization settings (reference: quantization.hpp:35-41).

    The reference advertises per-channel but implements per-tensor
    (quantization.cpp:343-367 — SURVEY.md quirk #6). Here group-wise is the
    default and actually implemented; group_size=0 means per-channel
    (one group spanning the whole contraction axis).
    """

    type: QuantType = QuantType.INT8
    symmetric: bool = True
    group_size: int = 64          # elements per scale group along contraction dim
    skip_embeddings: bool = False # quantize embed/lm_head too when False
    # "absmax": scale = group absmax / qmax (the reference's convention);
    # "mse": per-group grid search over shrink factors for the scale
    # minimizing round-trip squared error (clips outliers when that buys
    # finer resolution for the bulk — strictly <= absmax error).
    scale_method: str = "absmax"
    calibration_samples: int = 128
    calibration_max_len: int = 512

    @property
    def bits(self) -> int:
        return {QuantType.INT8: 8, QuantType.INT4: 4,
                QuantType.FLOAT16: 16, QuantType.NONE: 32}[self.type]


# Small named configurations used by tests/benchmarks, mirroring the
# reference's synthetic fixtures (tests/test_kv_cache_incremental.cpp:18-118).
def tiny_config(**kw) -> ModelConfig:
    base = dict(vocab_size=1000, hidden_size=128, num_layers=2, num_heads=4,
                num_kv_heads=4, intermediate_size=512, max_seq_len=256,
                rope_theta=10000.0, name="tiny-llama")
    base.update(kw)
    return ModelConfig(**base)


def llama7b_config(**kw) -> ModelConfig:
    base = dict(vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
                num_kv_heads=32, intermediate_size=11008, max_seq_len=2048,
                rope_theta=10000.0, name="llama-7b")
    base.update(kw)
    return ModelConfig(**base)


def mixtral_config(**kw) -> ModelConfig:
    """Mixtral-8x7B shape (full model: 32 layers, 8 experts). Perf
    fixtures on a single 16 GB chip pass num_layers=16 (int4 expert
    weights alone are ~22 GB at L=32)."""
    base = dict(vocab_size=32000, hidden_size=4096, num_layers=32,
                num_heads=32, num_kv_heads=8, intermediate_size=14336,
                num_experts=8, experts_per_token=2, max_seq_len=4096,
                rope_theta=1000000.0, architecture="mixtral",
                name="mixtral-8x7b")
    base.update(kw)
    return ModelConfig(**base)


def deepseek_v2_lite_config(**kw) -> ModelConfig:
    """DeepSeek-V2-Lite shape (15.7B total / 2.4B active, MLA + MoE:
    27 layers, 64 experts top-6 + 2 shared, no q-LoRA)."""
    base = dict(vocab_size=102400, hidden_size=2048, num_layers=27,
                num_heads=16, intermediate_size=10944,
                moe_intermediate_size=1408, shared_expert_size=2816,
                num_experts=64, experts_per_token=6,
                norm_topk_prob=False, scoring_func="softmax",
                topk_method="greedy", routed_scaling_factor=1.0,
                first_k_dense_replace=1, kv_lora_rank=512,
                q_lora_rank=None, qk_nope_head_dim=128,
                qk_rope_head_dim=64, v_head_dim=128, max_seq_len=4096,
                rope_theta=10000.0, architecture="deepseek_v2",
                name="deepseek-v2-lite")
    base.update(kw)
    return ModelConfig(**base)
