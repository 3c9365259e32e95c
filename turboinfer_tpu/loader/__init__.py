"""Model loading: GGUF v3, SafeTensors, TINQ quantized checkpoints.

Reference counterpart: L3 ModelLoader (reference:
include/turboinfer/model/model_loader.hpp + src/model/model_loader.cpp).
"""

from turboinfer_tpu.loader.loader import (ModelData, detect_format,
                                          load_engine, load_gguf,
                                          load_model_data,
                                          load_safetensors, load_tinq)
from turboinfer_tpu.loader.synthetic import create_synthetic_model

__all__ = ["ModelData", "detect_format", "load_engine", "load_gguf",
           "load_model_data", "load_safetensors", "load_tinq",
           "create_synthetic_model"]
