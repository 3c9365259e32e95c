"""Explicit synthetic-model factory.

Reference counterpart: create_pytorch_realistic_model /
create_pytorch_mock_model (reference: src/model/model_loader.cpp
:1160-1416) and the benchmark fixture create_test_model
(benchmarks/benchmark_inference.cpp:145-225). Unlike the reference —
which silently fabricates weights when handed a .pt/.onnx file — this
factory is the ONLY way to get synthetic weights, and it says so.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.loader.loader import ModelData
from turboinfer_tpu.models import llama
from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer


def create_synthetic_model(vocab_size: int = 1000, hidden_size: int = 128,
                           num_layers: int = 2, num_heads: int = 4,
                           intermediate_size: Optional[int] = None,
                           max_seq_len: int = 2048, seed: int = 0,
                           dtype=jnp.bfloat16,
                           name: str = "synthetic") -> ModelData:
    """Build an in-memory random-weight LLaMA-class model.

    Default sizes mirror the reference's canonical test fixture
    (tests/test_kv_cache_incremental.cpp:18-118: vocab 1000, hidden 128,
    2 layers, 4 heads).
    """
    config = ModelConfig(
        vocab_size=vocab_size, hidden_size=hidden_size,
        num_layers=num_layers, num_heads=num_heads, num_kv_heads=num_heads,
        intermediate_size=intermediate_size or 4 * hidden_size,
        max_seq_len=max_seq_len, dtype=dtype, name=name,
        architecture="llama")
    params = llama.init_params(jax.random.PRNGKey(seed), config)
    return ModelData(params=params, config=config,
                     tokenizer=BuiltinTokenizer(vocab_size=vocab_size),
                     source_format="synthetic")


def create_synthetic_quantized_model(config: ModelConfig, bits: int = 4,
                                     group_size: int = 64,
                                     seed: int = 0) -> ModelData:
    """Random-weight QUANTIZED LLaMA-class model built directly in the
    packed format — no fp materialization, so 7B-class perf fixtures fit
    in memory (an fp32 7B init would need 28 GB). Values are random;
    use for performance measurement, not accuracy.
    """
    import jax.numpy as jnp

    from turboinfer_tpu.core.qtensor import QTensor

    c = config
    L, H, V, F = c.num_layers, c.hidden_size, c.vocab_size, c.ffn_dim
    QD, KVD, G = c.q_dim, c.kv_dim, group_size
    key = jax.random.PRNGKey(seed)

    def rq(K, N, lead=None):
        lead = (L,) if lead is None else lead
        if bits == 4:
            data = jax.random.randint(key, lead + (K // 2, N), 0, 255,
                                      dtype=jnp.uint8)
        else:
            data = jax.random.randint(key, lead + (K, N), -127, 127,
                                      dtype=jnp.int8)
        scales = jnp.full(lead + (K // G, N), 0.01, jnp.bfloat16)
        return QTensor(data=data, scales=scales, zero_points=None,
                       bits=bits, group_size=G, shape=(K, N))

    if c.kv_lora_rank:
        return _synthetic_quantized_deepseek(c, rq, key)

    params = {
        "embed": (jax.random.normal(key, (V, H), jnp.float32)
                  * 0.02).astype(jnp.bfloat16),
        "layers": {
            "attn_norm": jnp.ones((L, H), jnp.bfloat16),
            "ffn_norm": jnp.ones((L, H), jnp.bfloat16),
            "wq": rq(H, QD), "wk": rq(H, KVD), "wv": rq(H, KVD),
            "wo": rq(QD, H),
        },
        "final_norm": jnp.ones((H,), jnp.bfloat16),
        "lm_head": rq(H, V, lead=()),
    }
    E = c.num_experts
    if E:
        # MoE: router fp + 4-D stacked expert QTensors ([L, E, ...],
        # the layout quant/quantizer._quantize_experts produces).
        Fe = c.moe_intermediate_size or F
        params["layers"]["router"] = (
            0.02 * jax.random.normal(key, (L, H, E), jnp.float32)
        ).astype(jnp.bfloat16)
        params["layers"]["we_gate"] = rq(H, Fe, lead=(L, E))
        params["layers"]["we_up"] = rq(H, Fe, lead=(L, E))
        params["layers"]["we_down"] = rq(Fe, H, lead=(L, E))
        if c.shared_expert_size:
            Fs = c.shared_expert_size
            params["layers"]["ws_gate"] = rq(H, Fs)
            params["layers"]["ws_up"] = rq(H, Fs)
            params["layers"]["ws_down"] = rq(Fs, H)
            params["layers"]["shared_gate"] = jnp.full(
                (L, H, 1), 0.01, jnp.bfloat16)
    else:
        params["layers"]["w_gate"] = rq(H, F)
        params["layers"]["w_up"] = rq(H, F)
        params["layers"]["w_down"] = rq(F, H)
    return ModelData(params=params, config=config,
                     tokenizer=BuiltinTokenizer(vocab_size=c.vocab_size),
                     source_format="synthetic-quantized")


def _synthetic_quantized_deepseek(c: ModelConfig, rq, key) -> ModelData:
    """DeepSeek (MLA + MoE) perf fixture in packed form. Quantized:
    wq/wq_a/wq_b, wkv_a, wo, experts (4-D stacks), shared experts,
    and the dense-group matmuls; fp (bf16): router(+bias), wkv_b
    (per-head reshaped by the absorbed math), norms, embeddings."""
    import jax.numpy as jnp
    H, V, L = c.hidden_size, c.vocab_size, c.num_layers
    nH = c.num_heads
    dn, dr, dv, lr = (c.qk_nope_head_dim, c.qk_rope_head_dim,
                      c.v_head_dim, c.kv_lora_rank)
    E, kd = c.num_experts, c.first_k_dense_replace
    Lm = L - kd
    Fm = c.moe_intermediate_size or c.ffn_dim
    Fd = c.ffn_dim

    def bf(shape, s=0.02):
        return (s * jax.random.normal(key, shape, jnp.float32)
                ).astype(jnp.bfloat16)

    def attn(n):
        g = {
            "attn_norm": jnp.ones((n, H), jnp.bfloat16),
            "ffn_norm": jnp.ones((n, H), jnp.bfloat16),
            "wkv_a": rq(H, lr + dr, lead=(n,)),
            "kv_a_norm": jnp.ones((n, lr), jnp.bfloat16),
            "wkv_b": bf((n, lr, nH * (dn + dv))),
            "wo": rq(nH * dv, H, lead=(n,)),
        }
        if c.q_lora_rank:
            g["wq_a"] = rq(H, c.q_lora_rank, lead=(n,))
            g["q_a_norm"] = jnp.ones((n, c.q_lora_rank), jnp.bfloat16)
            g["wq_b"] = rq(c.q_lora_rank, nH * (dn + dr), lead=(n,))
        else:
            g["wq"] = rq(H, nH * (dn + dr), lead=(n,))
        return g

    layers = attn(Lm)
    layers.update({
        "router": bf((Lm, H, E)),
        "router_bias": jnp.zeros((Lm, E), jnp.float32),
        "we_gate": rq(H, Fm, lead=(Lm, E)),
        "we_up": rq(H, Fm, lead=(Lm, E)),
        "we_down": rq(Fm, H, lead=(Lm, E)),
    })
    if c.shared_expert_size:
        Fs = c.shared_expert_size
        layers["ws_gate"] = rq(H, Fs, lead=(Lm,))
        layers["ws_up"] = rq(H, Fs, lead=(Lm,))
        layers["ws_down"] = rq(Fs, H, lead=(Lm,))
    params = {
        "embed": bf((V, H)),
        "layers": layers,
        "final_norm": jnp.ones((H,), jnp.bfloat16),
        "lm_head": rq(H, V, lead=()),
    }
    if kd:
        dense = attn(kd)
        dense["w_gate"] = rq(H, Fd, lead=(kd,))
        dense["w_up"] = rq(H, Fd, lead=(kd,))
        dense["w_down"] = rq(Fd, H, lead=(kd,))
        params["dense_layers"] = dense
    return ModelData(params=params, config=c,
                     tokenizer=BuiltinTokenizer(vocab_size=V),
                     source_format="synthetic-quantized")
