"""Top-level model loading: format detect → ModelData → InferenceEngine.

Reference counterpart: ModelLoader facade (reference:
src/model/model_loader.cpp — detect_format :576-586, load :552).
Differences per SURVEY.md quirk #10: PyTorch/ONNX files raise a clear
error instead of fabricating random weights
(model_loader.cpp:1160-1568); use synthetic.create_synthetic_model()
explicitly when a mock model is wanted.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import InferenceConfig, ModelConfig
from turboinfer_tpu.loader import gguf as gguf_mod
from turboinfer_tpu.loader import mapping
from turboinfer_tpu.loader import safetensors as st_mod
from turboinfer_tpu.loader import tinq as tinq_mod
from turboinfer_tpu.tokenizer import bpe as tok_mod
from turboinfer_tpu.utils import logging as tlog
from turboinfer_tpu.utils.errors import ModelFormatError


@dataclasses.dataclass
class ModelData:
    """Loaded model: params pytree + config + optional tokenizer.

    Reference counterpart: ModelData (model_loader.hpp:49-120) —
    name→Tensor map + metadata; here the tensors are already assembled
    into the runtime's stacked pytree.
    """
    params: Dict[str, Any]
    config: ModelConfig
    tokenizer: Optional[tok_mod.Tokenizer] = None
    source_format: str = "memory"

    def summary(self) -> str:
        """Reference: ModelData::get_model_summary (model_loader.cpp:221)."""
        from turboinfer_tpu.models import llama
        n = llama.param_count(self.params)
        b = llama.param_bytes(self.params)
        c = self.config
        return (f"{c.name} ({c.architecture}) — vocab {c.vocab_size}, "
                f"hidden {c.hidden_size}, layers {c.num_layers}, heads "
                f"{c.num_heads}/{c.kv_heads}kv, ffn {c.ffn_dim} | "
                f"{n / 1e6:.1f}M params, {b / 1e6:.1f} MB "
                f"[{self.source_format}]")


def detect_format(path: str) -> str:
    """Extension-based detection (reference: model_loader.cpp:576-586)."""
    ext = os.path.splitext(path)[1].lower()
    return {".gguf": "gguf", ".safetensors": "safetensors",
            ".tinq": "tinq", ".pt": "pytorch", ".pth": "pytorch",
            ".bin": "pytorch", ".onnx": "onnx"}.get(ext, "unknown")


def load_model_data(path: str, dtype=None) -> ModelData:
    if not os.path.exists(path):
        raise FileNotFoundError(f"model file not found: {path}")
    fmt = detect_format(path)
    if fmt == "gguf":
        return load_gguf(path, dtype=dtype)
    if fmt == "safetensors":
        return load_safetensors(path, dtype=dtype)
    if fmt == "tinq":
        return load_tinq(path)
    if fmt in ("pytorch", "onnx"):
        raise ModelFormatError(
            f"{fmt} files are not supported: export the model to "
            f"safetensors or GGUF first. (The reference fabricates random "
            f"weights for these formats — reference "
            f"model_loader.cpp:1160-1568; this build errors honestly "
            f"instead, see SURVEY.md quirk #10.)")
    raise ModelFormatError(f"unrecognized model format for '{path}'")


def load_gguf(path: str, dtype=None) -> ModelData:
    """GGUF v3 → ModelData with real tokenizer from metadata arrays."""
    with gguf_mod.read_gguf(path) as gf:
        config = mapping.config_from_gguf_metadata(
            gf.metadata, dtype=dtype or jnp.bfloat16)
        tokenizer = tok_mod.from_gguf_metadata(gf.metadata)
        if config.vocab_size <= 0:
            emb = mapping.resolve_name(list(gf.tensors), "embed")
            if emb:
                config = config.replace(
                    vocab_size=gf.tensors[emb].shape[0])
        assemble = (mapping.assemble_params_gpt2
                    if config.architecture == "gpt2"
                    else mapping.assemble_params)
        params = assemble(
            lambda name: gf.tensor(name), list(gf.tensors), config,
            dtype=dtype or config.dtype)
        tlog.log_info("loaded GGUF %s: %d tensors, arch=%s", path,
                      len(gf.tensors), config.architecture)
        return ModelData(params=params, config=config, tokenizer=tokenizer,
                         source_format="gguf")


def load_safetensors(path: str, dtype=None,
                     config: Optional[ModelConfig] = None) -> ModelData:
    """SafeTensors → ModelData. Config priority: explicit `config` arg >
    HF config.json sidecar in the same directory > shape inference."""
    with st_mod.read_safetensors(path) as sf:
        names = list(sf.keys())
        if config is None:
            sidecar = os.path.join(os.path.dirname(path) or ".",
                                   "config.json")
            if os.path.exists(sidecar):
                import json
                with open(sidecar) as f:
                    config = mapping.config_from_hf_dict(json.load(f),
                                                         dtype=dtype)
                tlog.log_info("using HF config.json sidecar (%s)",
                              config.architecture)
            else:
                config = _infer_config_from_shapes(sf, names, dtype)
        params = mapping.assemble_params(
            lambda name: np.asarray(sf.tensor(name)), names, config,
            dtype=dtype or config.dtype)
        tokenizer = None
        try:
            from turboinfer_tpu.tokenizer import hf as hf_tok
            tokenizer = hf_tok.from_hf_dir(os.path.dirname(path) or ".")
            if tokenizer is not None:
                tlog.log_info("loaded tokenizer.json sidecar (%s, vocab %d)",
                              tokenizer.kind, tokenizer.vocab_size)
        except Exception as e:               # corrupt/unsupported sidecar
            tlog.log_warning("tokenizer.json sidecar ignored: %s", e)
        tlog.log_info("loaded SafeTensors %s: %d tensors", path, len(names))
        return ModelData(params=params, config=config, tokenizer=tokenizer,
                         source_format="safetensors")


def _infer_config_from_shapes(sf, names, dtype=None) -> ModelConfig:
    emb_name = mapping.resolve_name(names, "embed")
    if emb_name is None:
        raise ValueError("cannot infer config: no embedding tensor found")
    V, H = sf.entries[emb_name]["shape"]
    L = 0
    while mapping.resolve_name(names, "attn_norm", L) is not None:
        L += 1
    if L == 0:
        raise ValueError("cannot infer config: no decoder layers found")
    wk = mapping.resolve_name(names, "wk", 0)
    wq = mapping.resolve_name(names, "wq", 0)
    kv_dim = sf.entries[wk]["shape"][0]
    q_dim = sf.entries[wq]["shape"][0]
    wup = mapping.resolve_name(names, "w_up", 0)
    F = sf.entries[wup]["shape"][0]
    # Assume head_dim from a standard 128/64 split.
    head_dim = 128 if q_dim % 128 == 0 and q_dim >= 1024 else \
        (q_dim // max(q_dim // 64, 1))
    heads = q_dim // head_dim
    kv_heads = kv_dim // head_dim
    return ModelConfig(
        vocab_size=V, hidden_size=H, num_layers=L, num_heads=heads,
        num_kv_heads=kv_heads, intermediate_size=F, head_dim=head_dim,
        dtype=dtype or jnp.bfloat16, name=os.path.basename("model"),
        architecture="llama")


def load_tinq(path: str) -> ModelData:
    params, config, qconfig, meta = tinq_mod.load(path)
    tlog.log_info("loaded TINQ %s (quant=%s)", path,
                  qconfig.type.value if qconfig else "none")
    return ModelData(params=params, config=config, source_format="tinq")


def load_engine(path: str, config: Optional[InferenceConfig] = None):
    """Load a file into a ready InferenceEngine (library facade entry)."""
    from turboinfer_tpu.engine.engine import InferenceEngine
    data = load_model_data(path)
    tokenizer = data.tokenizer or tok_mod.BuiltinTokenizer(
        vocab_size=data.config.vocab_size)
    if config is None:
        config = InferenceConfig(
            max_seq_len=data.config.max_seq_len,
            eos_token_id=getattr(tokenizer, "eos_id", 2))
    return InferenceEngine(data.params, data.config, config,
                           tokenizer=tokenizer)
