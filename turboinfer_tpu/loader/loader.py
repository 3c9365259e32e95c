"""Top-level model loading: format detect → ModelData → InferenceEngine.

Reference counterpart: ModelLoader facade (reference:
src/model/model_loader.cpp — detect_format :576-586, load :552).
Differences per SURVEY.md quirk #10: PyTorch checkpoints load their
REAL weights (the reference fabricates random ones,
model_loader.cpp:1160-1568) and ONNX raises a clear error; use
synthetic.create_synthetic_model() explicitly when a mock model is
wanted. Beyond the reference: HF checkpoint DIRECTORIES and sharded
model.safetensors.index.json / pytorch_model.bin.index.json multi-file
checkpoints load directly.
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
    if path.endswith(".safetensors.index.json"):
        return "safetensors"
    ext = os.path.splitext(path)[1].lower()
    return {".gguf": "gguf", ".safetensors": "safetensors",
            ".tinq": "tinq", ".pt": "pytorch", ".pth": "pytorch",
            ".bin": "pytorch", ".onnx": "onnx"}.get(ext, "unknown")


def load_model_data(path: str, dtype=None) -> ModelData:
    if not os.path.exists(path):
        raise FileNotFoundError(f"model file not found: {path}")
    if os.path.isdir(path):
        return load_checkpoint_dir(path, dtype=dtype)
    fmt = detect_format(path)
    if fmt == "gguf":
        return load_gguf(path, dtype=dtype)
    if fmt == "safetensors":
        if path.endswith(".index.json"):
            return load_safetensors_sharded(path, dtype=dtype)
        return load_safetensors(path, dtype=dtype)
    if fmt == "tinq":
        return load_tinq(path)
    if fmt == "pytorch":
        return load_pytorch(path, dtype=dtype)
    if fmt == "onnx":
        raise ModelFormatError(
            "ONNX files are not supported: export the model to "
            "safetensors or GGUF first. (The reference fabricates random "
            "weights for this format — reference "
            "model_loader.cpp:1160-1568; this build errors honestly "
            "instead, see SURVEY.md quirk #10.)")
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
        get = gf.tensor
        if config.norm_offset:
            # llama.cpp's Gemma converter BAKES the (1+w) offset into
            # every *norm.weight at conversion (convert_hf_to_gguf.py
            # GemmaModel: data += 1); our runtime applies the offset
            # itself (config.norm_offset), so un-bake it here or every
            # norm would multiply by (2 + w_hf).
            def get(name, _base=gf.tensor):
                t = _base(name)
                return t - 1.0 if name.endswith("norm.weight") else t
        assemble = mapping.assemble_for(config)
        params = assemble(
            get, list(gf.tensors), config,
            dtype=dtype or config.dtype)
        tlog.log_info("loaded GGUF %s: %d tensors, arch=%s", path,
                      len(gf.tensors), config.architecture)
        return ModelData(params=params, config=config, tokenizer=tokenizer,
                         source_format="gguf")


def _finish_hf_load(get, names, shapes, dirname: str, config, dtype,
                    source_format: str) -> ModelData:
    """Shared tail of every HF-style checkpoint load (single/sharded
    safetensors, pytorch): resolve config (explicit arg > config.json
    sidecar > shape inference), assemble the stacked pytree, and attach
    the tokenizer.json sidecar tokenizer when present."""
    if config is None:
        sidecar = os.path.join(dirname, "config.json")
        if os.path.exists(sidecar):
            import json
            with open(sidecar) as f:
                config = mapping.config_from_hf_dict(json.load(f),
                                                     dtype=dtype)
            tlog.log_info("using HF config.json sidecar (%s)",
                          config.architecture)
        else:
            config = _infer_config_from_shapes(shapes, names, dtype)
    params = mapping.assemble_for(config)(get, names, config,
                                          dtype=dtype or config.dtype)
    tokenizer = None
    try:
        from turboinfer_tpu.tokenizer import hf as hf_tok
        tokenizer = hf_tok.from_hf_dir(dirname)
        if tokenizer is not None:
            tlog.log_info("loaded tokenizer.json sidecar (%s, vocab %d)",
                          tokenizer.kind, tokenizer.vocab_size)
    except Exception as e:               # corrupt/unsupported sidecar
        tlog.log_warning("tokenizer.json sidecar ignored: %s", e)
    return ModelData(params=params, config=config, tokenizer=tokenizer,
                     source_format=source_format)


def load_safetensors(path: str, dtype=None,
                     config: Optional[ModelConfig] = None) -> ModelData:
    """SafeTensors → ModelData. Config priority: explicit `config` arg >
    HF config.json sidecar in the same directory > shape inference."""
    with st_mod.read_safetensors(path) as sf:
        names = list(sf.keys())
        data = _finish_hf_load(
            lambda name: np.asarray(sf.tensor(name)), names,
            {n: e["shape"] for n, e in sf.entries.items()},
            os.path.dirname(path) or ".", config, dtype, "safetensors")
        tlog.log_info("loaded SafeTensors %s: %d tensors", path, len(names))
        return data


def load_safetensors_sharded(index_path: str, dtype=None,
                             config: Optional[ModelConfig] = None
                             ) -> ModelData:
    """Multi-file HF checkpoint via model.safetensors.index.json
    (weight_map: tensor name → shard file). The reference's loader has
    no sharded-checkpoint support at all (model_loader.cpp:552 takes a
    single path) — real >2B-param HF exports ship this way."""
    import contextlib
    import json
    with open(index_path) as f:
        weight_map: Dict[str, str] = json.load(f)["weight_map"]
    dirname = os.path.dirname(index_path) or "."
    with contextlib.ExitStack() as stack:
        files: Dict[str, Any] = {}

        def shard(name: str):
            fname = weight_map[name]
            if fname not in files:
                files[fname] = stack.enter_context(
                    st_mod.read_safetensors(os.path.join(dirname, fname)))
            return files[fname]

        names = list(weight_map)
        shapes = {n: shard(n).entries[n]["shape"] for n in names}
        data = _finish_hf_load(
            lambda name: np.asarray(shard(name).tensor(name)), names,
            shapes, dirname, config, dtype, "safetensors")
        tlog.log_info("loaded sharded SafeTensors %s: %d tensors in %d "
                      "shards", index_path, len(names),
                      len(set(weight_map.values())))
        return data


def load_pytorch(path: str, dtype=None,
                 config: Optional[ModelConfig] = None) -> ModelData:
    """PyTorch .bin/.pt/.pth state_dict → ModelData (real weights).

    The reference FABRICATES random weights for these formats
    (model_loader.cpp:1160-1568, SURVEY.md quirk #10); here they load
    for real through the same name mapping as safetensors. Accepts a
    raw state_dict or common {"state_dict"|"model": ...} wrappers, and
    pytorch_model.bin.index.json sharded checkpoints via the directory
    entry point.
    """
    try:
        import torch
    except ImportError as e:
        raise ModelFormatError(
            "loading PyTorch checkpoints requires torch; export to "
            "safetensors or GGUF instead") from e
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        raise ModelFormatError(
            f"cannot read PyTorch checkpoint {path}: {e}") from e
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    sd = {k: v for k, v in sd.items() if hasattr(v, "shape")}
    if not sd:
        raise ModelFormatError(f"no tensors found in {path}")

    def get(name: str) -> np.ndarray:
        t = sd[name]
        if t.dtype == torch.bfloat16:     # numpy has no bf16
            t = t.float()
        return t.detach().numpy()

    names = list(sd)
    data = _finish_hf_load(get, names,
                           {n: list(t.shape) for n, t in sd.items()},
                           os.path.dirname(path) or ".", config, dtype,
                           "pytorch")
    tlog.log_info("loaded PyTorch %s: %d tensors", path, len(names))
    return data


def load_checkpoint_dir(path: str, dtype=None) -> ModelData:
    """HF checkpoint DIRECTORY: sharded index > single safetensors >
    pytorch (sharded or single). This is how `transformers` publishes
    models, so `load_engine("/path/to/checkout")` just works."""
    import json

    def p(name):
        return os.path.join(path, name)

    if os.path.exists(p("model.safetensors.index.json")):
        return load_safetensors_sharded(p("model.safetensors.index.json"),
                                        dtype=dtype)
    st_files = sorted(f for f in os.listdir(path)
                      if f.endswith(".safetensors"))
    if len(st_files) == 1:
        return load_safetensors(p(st_files[0]), dtype=dtype)
    if len(st_files) > 1:
        raise ModelFormatError(
            f"{path} has {len(st_files)} .safetensors files but no "
            "model.safetensors.index.json to map them")
    if os.path.exists(p("pytorch_model.bin.index.json")):
        with open(p("pytorch_model.bin.index.json")) as f:
            weight_map = json.load(f)["weight_map"]
        # merge shard dicts through one combined getter
        import torch
        shards: Dict[str, Dict[str, Any]] = {}

        def get(name: str) -> np.ndarray:
            fname = weight_map[name]
            if fname not in shards:
                shards[fname] = torch.load(p(fname), map_location="cpu",
                                           weights_only=True)
            t = shards[fname][name]
            if t.dtype == torch.bfloat16:
                t = t.float()
            return t.detach().numpy()

        names = list(weight_map)

        def shape_of(name):
            fname = weight_map[name]
            if fname not in shards:
                shards[fname] = torch.load(p(fname), map_location="cpu",
                                           weights_only=True)
            return list(shards[fname][name].shape)

        shapes = {n: shape_of(n) for n in names}
        data = _finish_hf_load(get, names, shapes, path, None, dtype,
                               "pytorch")
        tlog.log_info("loaded sharded PyTorch %s: %d tensors", path,
                      len(names))
        return data
    for f in sorted(os.listdir(path)):
        if detect_format(p(f)) == "pytorch":
            return load_pytorch(p(f), dtype=dtype)
        if f.endswith(".gguf"):
            return load_gguf(p(f), dtype=dtype)
        if f.endswith(".tinq"):
            return load_tinq(p(f))
    raise ModelFormatError(f"no loadable checkpoint found in {path}")


def _infer_config_from_shapes(shapes: Dict[str, Any], names,
                              dtype=None) -> ModelConfig:
    """Infer a llama-shaped config from tensor shapes alone
    (`shapes`: tensor name → shape list)."""
    emb_name = mapping.resolve_name(names, "embed")
    if emb_name is None:
        raise ValueError("cannot infer config: no embedding tensor found")
    V, H = shapes[emb_name]
    L = 0
    while mapping.resolve_name(names, "attn_norm", L) is not None:
        L += 1
    if L == 0:
        raise ValueError("cannot infer config: no decoder layers found")
    wk = mapping.resolve_name(names, "wk", 0)
    wq = mapping.resolve_name(names, "wq", 0)
    wup = mapping.resolve_name(names, "w_up", 0)
    if wk is None or wq is None or wup is None:
        # fused qkv/gate_up layouts (Phi-3 style) carry no separate
        # q/k/up tensors to size from — fail like the checks above do
        # instead of shapes[None] raising a bare TypeError
        raise ValueError(
            "cannot infer config from tensor shapes (fused qkv/gate_up "
            "layout?) — provide a config.json sidecar")
    kv_dim = shapes[wk][0]
    q_dim = shapes[wq][0]
    F = shapes[wup][0]
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


def load_engine(path: str, config: Optional[InferenceConfig] = None,
                lora: Optional[str] = None, **engine_kw):
    """Load a file into a ready InferenceEngine (library facade entry).
    engine_kw passes through to InferenceEngine (mesh=, parallel=,
    param_specs=, ...). lora: optional PEFT adapter directory/file —
    attached via the runtime low-rank path (works on quantized
    bases)."""
    from turboinfer_tpu.engine.engine import InferenceEngine
    data = load_model_data(path)
    if lora is not None:
        from turboinfer_tpu.loader import lora as lora_mod
        data.params.update(lora_mod.apply_lora(
            data.params, lora_mod.load_lora(lora, data.config)))
    tokenizer = data.tokenizer or tok_mod.BuiltinTokenizer(
        vocab_size=data.config.vocab_size)
    if config is None:
        config = InferenceConfig(
            max_seq_len=data.config.max_seq_len,
            eos_token_id=getattr(tokenizer, "eos_id", 2))
    return InferenceEngine(data.params, data.config, config,
                           tokenizer=tokenizer, **engine_kw)
