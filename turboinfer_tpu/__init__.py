"""turboinfer_tpu — TPU-native quantized LLM inference framework.

Library facade (reference counterpart: include/turboinfer/turboinfer.hpp
+ src/turboinfer.cpp): initialize/shutdown/version/build_info, engine
cache, and the tokenize/detokenize/generate_text conveniences.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence

from turboinfer_tpu.version import __version__, version_string
from turboinfer_tpu.config import (InferenceConfig, ModelConfig,
                                   QuantizationConfig, QuantType, RopeMode,
                                   tiny_config, llama7b_config)
from turboinfer_tpu.core.qtensor import QTensor, quantize, dequantize
from turboinfer_tpu.engine.engine import (GenerationResult, InferenceEngine,
                                          StreamChunk, quick_generate)
from turboinfer_tpu.utils import logging as tlog

_initialized = False
_engine_cache: Dict[str, InferenceEngine] = {}
_cache_lock = threading.Lock()


def build_info() -> str:
    """Runtime build/flags string (reference: build_info,
    src/turboinfer.cpp:26-50)."""
    import jax
    dev = jax.devices()
    return (f"turboinfer_tpu {__version__} | jax {jax.__version__} | "
            f"backend {jax.default_backend()} | devices {len(dev)} "
            f"({dev[0].platform if dev else 'none'})")


def initialize(enable_logging: bool = True) -> bool:
    """Library init (reference: initialize, src/turboinfer.cpp:52-91).
    Unlike the reference (comment-only hardware probe), this actually
    touches the accelerator runtime."""
    global _initialized
    if enable_logging:
        tlog.set_level("INFO")
        tlog.log_info("turboinfer_tpu %s initializing: %s", __version__,
                      build_info())
    else:
        tlog.set_level("ERROR")
    _initialized = True
    return True


def shutdown() -> None:
    """Reference: shutdown (src/turboinfer.cpp:93-114) — clears the
    engine/tokenizer cache."""
    global _initialized
    with _cache_lock:
        _engine_cache.clear()
    _initialized = False


def is_initialized() -> bool:
    return _initialized


def load_model(model_path: str,
               config: Optional[InferenceConfig] = None,
               **engine_kw) -> InferenceEngine:
    """Load a model file into a ready engine (reference: load_model,
    turboinfer.hpp:105). Supports .gguf / .safetensors / .tinq.
    engine_kw passes through to InferenceEngine (mesh=, parallel=...).
    """
    from turboinfer_tpu.loader import loader
    return loader.load_engine(model_path, config, **engine_kw)


def _cached_engine(model_path: str) -> InferenceEngine:
    """Global engine cache backing tokenize/detokenize — the reference's
    advertised '1.61x faster cached tokenization' (turboinfer.cpp:22-23,
    125-142)."""
    with _cache_lock:
        eng = _engine_cache.get(model_path)
        if eng is None:
            eng = load_model(model_path)
            _engine_cache[model_path] = eng
        return eng


def tokenize(text: str, model_path: str) -> List[int]:
    """Reference: tokenize convenience (turboinfer.hpp:116-120)."""
    return _cached_engine(model_path).encode(text)


def detokenize(tokens: Sequence[int], model_path: str) -> str:
    """Reference: detokenize convenience (turboinfer.hpp:121-125)."""
    return _cached_engine(model_path).decode(tokens)


def generate_text(model_path: str, prompt: str, max_tokens: int = 50,
                  **sampling_kw) -> str:
    """One-shot text generation (reference: generate_text,
    turboinfer.hpp:136-141)."""
    eng = _cached_engine(model_path)
    toks = eng.encode(prompt)
    res = eng.generate(toks, max_tokens, **sampling_kw)
    return eng.decode(res.tokens)


__all__ = [
    "__version__", "version_string", "build_info", "initialize", "shutdown",
    "is_initialized", "load_model", "tokenize", "detokenize", "generate_text",
    "ModelConfig", "InferenceConfig", "QuantizationConfig", "QuantType",
    "RopeMode", "tiny_config", "llama7b_config", "QTensor", "quantize",
    "dequantize", "InferenceEngine", "GenerationResult", "StreamChunk",
    "quick_generate",
]
