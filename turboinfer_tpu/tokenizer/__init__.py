"""Tokenizers: SPM-BPE (llama), byte-level BPE (gpt2), builtin toy.

Reference counterpart: the toy tokenizer inside InferenceEngine
(reference: src/model/inference_engine.cpp:1224-1391).
"""

from turboinfer_tpu.tokenizer.bpe import (BPETokenizer, BuiltinTokenizer,
                                          SPMTokenizer, Tokenizer,
                                          from_gguf_metadata)

__all__ = ["BPETokenizer", "BuiltinTokenizer", "SPMTokenizer", "Tokenizer",
           "from_gguf_metadata"]
