"""Headline benchmark — prints ONE JSON line for the driver.

Workload: end-to-end decode tokens/sec on the reference's canonical
synthetic small model (BASELINE config 1: the basic_inference workload —
reference examples/basic_inference.cpp, fixture
tests/test_kv_cache_incremental.cpp:18-118). Baseline to beat: the
reference's published 156-163 tok/s end-to-end (README.md:58).

Env knobs:
  BENCH_CONFIG   tiny | tiny-int8 | tiny-int4   (default tiny-int4)
  BENCH_TOKENS   decode length (default 256)
  BENCH_BATCH    batch size (default 1)
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

REFERENCE_TOKS_PER_S = 160.0   # midpoint of README.md:58's 156-163 tok/s


def main():
    from turboinfer_tpu.config import (InferenceConfig, QuantizationConfig,
                                       QuantType, tiny_config)
    from turboinfer_tpu.engine.engine import InferenceEngine
    from turboinfer_tpu.models import llama

    which = os.environ.get("BENCH_CONFIG", "tiny-int4")
    n_tokens = int(os.environ.get("BENCH_TOKENS", "256"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))

    cfg = tiny_config(dtype=jnp.bfloat16)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    if which.endswith("-int8") or which.endswith("-int4"):
        from turboinfer_tpu.quant.quantizer import quantize_params
        qtype = QuantType.INT8 if which.endswith("int8") else QuantType.INT4
        params = quantize_params(params, QuantizationConfig(
            type=qtype, group_size=64))

    eng = InferenceEngine(params, cfg, InferenceConfig(
        max_seq_len=cfg.max_seq_len, temperature=0.8, top_k=50, top_p=0.9,
        seed=0))
    prompts = [[1, 17, 42, 256, 731, 5, 9, 88]] * batch

    # warmup (compile the exact prefill + decode programs)
    eng.generate_batch(prompts, max_new_tokens=n_tokens)
    eng.reset_state()

    t0 = time.perf_counter()
    results = eng.generate_batch(prompts, max_new_tokens=n_tokens)
    dt = time.perf_counter() - t0
    new_tokens = sum(len(r.tokens) - len(p)
                     for r, p in zip(results, prompts))
    tps = new_tokens / dt

    print(json.dumps({
        "metric": f"decode_tokens_per_sec[{which},b{batch}]",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / REFERENCE_TOKS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
