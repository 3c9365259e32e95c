from turboinfer_tpu.core.qtensor import (
    QTensor,
    quantize,
    dequantize,
    pack_int4,
    unpack_int4,
)

__all__ = ["QTensor", "quantize", "dequantize", "pack_int4", "unpack_int4"]
