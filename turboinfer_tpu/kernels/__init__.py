from turboinfer_tpu.kernels.ops import (
    rms_norm,
    apply_rope,
    rope_freqs,
    qmatmul,
    swiglu,
    attention_prefill_ref,
    attention_decode_ref,
)

__all__ = [
    "rms_norm",
    "apply_rope",
    "rope_freqs",
    "qmatmul",
    "swiglu",
    "attention_prefill_ref",
    "attention_decode_ref",
]
