"""Quantize a model to a TINQ checkpoint and load it back.

Reference counterpart: examples/pytorch_loader_demo.cpp (loader demo) +
the quantize_model_file pipeline (quantization.cpp:651-658). The
reference demo fabricates weights from .pt files; this one exercises the
honest path: synthetic model → GGUF export → INT4 TINQ → engine.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import turboinfer_tpu as ti
from turboinfer_tpu.config import QuantizationConfig, QuantType
from turboinfer_tpu.loader import tinq
from turboinfer_tpu.loader.synthetic import create_synthetic_model
from turboinfer_tpu.models import llama
from turboinfer_tpu.quant.quantizer import (quantize_params,
                                            validate_quantization_accuracy)

ti.initialize()

data = create_synthetic_model(vocab_size=1000, hidden_size=256,
                              num_layers=4, num_heads=4)
print("fp model:", data.summary())

qcfg = QuantizationConfig(type=QuantType.INT4, group_size=64)
qparams = quantize_params(data.params, qcfg)
fp_mb = llama.param_bytes(data.params) / 1e6
q_mb = llama.param_bytes(qparams) / 1e6
print(f"quantized int4 g={qcfg.group_size}: {fp_mb:.1f} MB -> {q_mb:.1f} MB "
      f"({fp_mb / q_mb:.2f}x)")

report = validate_quantization_accuracy(data.params, qparams, data.config)
print(f"accuracy: mean |dlogprob| = {report.mean_abs_logprob_delta:.4f}, "
      f"perplexity ratio = {report.perplexity_ratio:.4f}")

with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "model-int4.tinq")
    tinq.save(path, qparams, data.config, qcfg)
    print(f"saved {path} ({os.path.getsize(path) / 1e6:.1f} MB)")

    eng = ti.load_model(path)
    res = eng.generate([1, 5, 9, 42], max_new_tokens=20, temperature=0.0)
    print(f"loaded + generated {len(res.tokens) - 4} tokens "
          f"at {res.tokens_per_second:.1f} tok/s")

ti.shutdown()
