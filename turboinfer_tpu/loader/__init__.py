"""Model loading: GGUF v3, SafeTensors (single + sharded), PyTorch,
TINQ quantized checkpoints, and HF checkpoint directories.

Reference counterpart: L3 ModelLoader (reference:
include/turboinfer/model/model_loader.hpp + src/model/model_loader.cpp).
"""

from turboinfer_tpu.loader.loader import (ModelData, detect_format,
                                          load_checkpoint_dir,
                                          load_engine, load_gguf,
                                          load_model_data, load_pytorch,
                                          load_safetensors,
                                          load_safetensors_sharded,
                                          load_tinq)
from turboinfer_tpu.loader.ckpt import load_checkpoint, save_checkpoint
from turboinfer_tpu.loader.lora import (apply_lora, load_lora, merge_lora,
                                        strip_lora)
from turboinfer_tpu.loader.synthetic import create_synthetic_model

__all__ = ["ModelData", "detect_format", "load_checkpoint_dir",
           "load_engine", "load_gguf", "load_model_data", "load_pytorch",
           "load_safetensors", "load_safetensors_sharded", "load_tinq",
           "create_synthetic_model", "save_checkpoint", "load_checkpoint",
           "load_lora", "apply_lora", "merge_lora", "strip_lora"]
