"""Error taxonomy.

Reference counterpart: bare std::runtime_error everywhere (reference:
tensor_engine.cpp:493, model_loader.cpp:559 — SURVEY.md §5 "surface a
clean error taxonomy"). Typed exceptions let callers distinguish
user-input problems (bad file, bad tokens) from configuration problems
(shape/arch mismatches) from environment problems (no TPU, OOM) without
string matching.

All inherit TurboInferError (itself a ValueError/RuntimeError hybrid via
the subclasses), so `except TurboInferError` catches everything while
existing `except ValueError` call sites keep working.
"""

from __future__ import annotations


class TurboInferError(Exception):
    """Base class for all turboinfer_tpu errors."""


class ModelFormatError(TurboInferError, ValueError):
    """Unreadable/unsupported model file (bad magic, version, dtype,
    truncated data, unsupported quant type)."""


class ConfigError(TurboInferError, ValueError):
    """Inconsistent model/inference configuration (indivisible heads,
    unknown architecture, bad mesh shape)."""


class TokenError(TurboInferError, ValueError):
    """Invalid token input (empty prompt, out-of-vocab id, prompt longer
    than max_seq_len)."""


class QuantizationError(TurboInferError, ValueError):
    """Invalid quantization request (odd K for int4, group size not
    dividing K, unsupported type)."""


class SchedulerFullError(TurboInferError, RuntimeError):
    """Admission control: the request queue is at max_queue depth
    (serving layer surfaces this as HTTP 429)."""
