"""Minimal API walkthrough (reference: examples/readme_example.cpp)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import turboinfer_tpu as ti
from turboinfer_tpu.loader.synthetic import create_synthetic_model

ti.initialize()

# Build (or load) a model and engine.
data = create_synthetic_model()
engine = ti.InferenceEngine(data.params, data.config,
                            tokenizer=data.tokenizer)

# Tokenize → generate → detokenize.
tokens = engine.encode("The quick brown fox")
result = engine.generate(tokens, max_new_tokens=20, temperature=0.8)
print("generated:", engine.decode(result.tokens))
print(f"{result.tokens_per_second:.1f} tok/s")

ti.shutdown()
