"""Architecture registry: config.architecture -> model module.

Reference counterpart: the llama.*/gpt2.* metadata dispatch in the GGUF
loader (src/model/model_loader.cpp:752-771) — but the reference runs
every model through one LLaMA-shaped layer; here each architecture has
a real forward.

Model modules implement: init_params, init_cache, reset_cache, forward,
forward_no_cache, param_count, param_bytes.
"""

from __future__ import annotations

from typing import Any

from turboinfer_tpu.models import deepseek, gpt2, gptoss, llama, moe, neox
from turboinfer_tpu.utils.errors import ConfigError

_REGISTRY = {
    "llama": llama,
    "mistral": llama,      # same block structure (GQA handled by config)
    "qwen2": llama,        # + q/k/v biases (config.attn_bias)
    "qwen3": llama,        # + per-head q/k RMSNorm (config.qk_norm)
    "phi3": llama,         # llama block with fused qkv/gate_up weights
    "gemma": llama,        # + embed scale, (1+w) norms, GeGLU
    "gemma2": llama,       # + sandwich norms, softcaps, alternating window
    "gemma3": llama,       # + qk-norm, local/global RoPE bases
    "granite": llama,      # + embedding/residual/attention/logits scalers
    "gpt2": gpt2,
    "gpt_neox": neox,
    "phi": neox,
    "falcon": neox,        # parallel block + GQA/MQA fused qkv (+ ALiBi RW)
    "bloom": neox,         # sequential block + ALiBi + embedding LayerNorm
    "mixtral": moe,
    "qwen2_moe": moe,      # + shared expert, raw-softmax top-k gates
    "qwen3_moe": moe,      # + per-head q/k RMSNorm
    "olmoe": moe,          # + whole-projection q/k RMSNorm, raw gates
    "moe": moe,
    "deepseek_v2": deepseek,   # MLA + softmax/group-limited routing
    "deepseek_v3": deepseek,   # MLA + sigmoid/bias-corrected routing
    "gpt_oss": gptoss,         # attention sinks + biased clamped-GLU MoE
}


def get_model(architecture: str) -> Any:
    arch = architecture.lower()
    mod = _REGISTRY.get(arch)
    if mod is None:
        known = ", ".join(sorted(_REGISTRY))
        raise ConfigError(
            f"unknown architecture '{architecture}' (known: {known})")
    return mod


def register(architecture: str, module: Any) -> None:
    _REGISTRY[architecture.lower()] = module
