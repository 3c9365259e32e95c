"""Comprehensive inference benchmark — the six reference suites.

Reference counterpart: benchmarks/benchmark_inference.cpp (834 LoC) —
suites at :521-616 (quantization), :618-684 (beam), :686-752 (KV cache),
synthetic model factory :145-225, RSS memory readings :227-271, summary
report :773-834.

Run: python benchmarks/benchmark_inference.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import turboinfer_tpu as ti
from turboinfer_tpu.config import QuantizationConfig, QuantType
from turboinfer_tpu.loader.synthetic import create_synthetic_model
from turboinfer_tpu.models import llama
from turboinfer_tpu.quant.quantizer import quantize_params


def _rss_mb() -> float:
    """Process RSS (reference: get_memory_usage,
    benchmark_inference.cpp:227-271 — /proc/self/status on Linux)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def make_engine(vocab=1000, hidden=256, layers=4, heads=4, qtype=None,
                seed=0, **icfg):
    """Synthetic benchmark model (reference: create_test_model,
    benchmark_inference.cpp:145-225 — vocab 1K, hidden 256, 4 layers)."""
    data = create_synthetic_model(vocab_size=vocab, hidden_size=hidden,
                                  num_layers=layers, num_heads=heads,
                                  max_seq_len=512, seed=seed)
    params = data.params
    if qtype is not None:
        params = quantize_params(params, QuantizationConfig(
            type=qtype, group_size=64))
    cfg = ti.InferenceConfig(max_seq_len=512, seed=0, **icfg)
    return ti.InferenceEngine(params, data.config, cfg,
                              tokenizer=data.tokenizer)


def bench_generate(eng, prompt, n_tokens, runs=3, **kw):
    eng.generate(prompt, 8, **kw)                      # warmup/compile
    best = 0.0
    for _ in range(runs):
        t0 = time.perf_counter()
        res = eng.generate(prompt, n_tokens, **kw)
        dt = time.perf_counter() - t0
        new = len(res.tokens) - len(prompt)
        best = max(best, new / dt)
    return best


def suite_basic(quick):
    """Basic inference speed (reference suite 1)."""
    eng = make_engine()
    tps = bench_generate(eng, [1, 5, 9, 13], 64 if quick else 256)
    return {"tokens_per_sec": round(tps, 1)}


def suite_memory(quick):
    """Memory usage (reference suite 2)."""
    before = _rss_mb()
    eng = make_engine()
    res = eng.generate([1, 2, 3], 64)
    after = _rss_mb()
    model_mb = eng.memory_usage() / 1e6
    n = len(res.tokens)
    return {"model_mb": round(model_mb, 1),
            "rss_delta_mb": round(after - before, 1),
            "tokens_per_mb": round(n / max(model_mb, 1e-9), 3)}


def suite_sampling(quick):
    """Sampling strategy grid (reference suite 3: greedy / balanced /
    creative / random)."""
    eng = make_engine()
    n = 64 if quick else 128
    grid = {
        "greedy": dict(temperature=0.0),
        "balanced": dict(temperature=0.8, top_k=50, top_p=0.9),
        "creative": dict(temperature=1.2, top_k=100, top_p=0.95),
        "random": dict(temperature=2.0, top_k=0, top_p=1.0),
    }
    out = {}
    for name, kw in grid.items():
        out[name] = round(bench_generate(eng, [1, 5, 9], n, **kw), 1)
    return out


def suite_quantization(quick):
    """FP vs INT8 vs INT4 decode + measured compression (reference
    suite 4, :521-616 — but compression here is real, packed int4)."""
    n = 64 if quick else 128
    out = {}
    fp_bytes = None
    for name, qt in [("bf16", None), ("int8", QuantType.INT8),
                     ("int4", QuantType.INT4)]:
        eng = make_engine(qtype=qt)
        nbytes = llama.param_bytes(eng.params)
        if fp_bytes is None:
            fp_bytes = nbytes
        out[name] = {
            "tokens_per_sec": round(bench_generate(eng, [1, 5, 9], n), 1),
            "weight_mb": round(nbytes / 1e6, 2),
            "compression": round(fp_bytes / nbytes, 2),
        }
    return out


def suite_beam(quick):
    """Beam search sizes 1/2/4/8 (reference suite 5, :618-684).
    Warm (compile) each beam width before timing — the fused beam scan
    compiles per (beam_size, n) and a cold compile over the tunnel
    would otherwise dominate the measurement."""
    eng = make_engine()
    n = 32 if quick else 64
    out = {}
    for beams in (1, 2, 4, 8):
        eng.generate_beam_search([1, 5, 9], n, beam_size=beams)  # warm
        t0 = time.perf_counter()
        res = eng.generate_beam_search([1, 5, 9], n, beam_size=beams)
        dt = time.perf_counter() - t0
        new = len(res.tokens) - 3
        out[f"beam_{beams}"] = round(new / dt, 1)
    return out


def suite_kv_cache(quick):
    """Cached incremental decode vs cacheless recompute (reference
    suite 6, :686-752). The reference measured 1.06x because its cache
    still copied the prefix per token; in-place HBM cache does better.

    The cacheless side runs the engine's honest use_cache=False path
    (fixed padded shapes — a naive growing-prefix loop recompiles every
    token and measures the compiler, not the model)."""
    import dataclasses
    eng = make_engine()
    n = 32 if quick else 64
    tps_cache = bench_generate(eng, [1, 5, 9], n, temperature=0.0)

    from turboinfer_tpu.engine.engine import InferenceEngine
    eng_nc = InferenceEngine(
        eng.params, eng.model_config,
        dataclasses.replace(eng.config, use_cache=False))
    tps_nocache = bench_generate(eng_nc, [1, 5, 9], n, temperature=0.0)
    return {"with_cache": round(tps_cache, 1),
            "without_cache": round(tps_nocache, 1),
            "speedup": round(tps_cache / max(tps_nocache, 1e-9), 2)}


SUITES = [("basic_inference", suite_basic), ("memory", suite_memory),
          ("sampling", suite_sampling), ("quantization", suite_quantization),
          ("beam_search", suite_beam), ("kv_cache", suite_kv_cache)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--only", default="",
                    help="comma-separated suite names to run")
    args = ap.parse_args()

    only = {s for s in args.only.split(",") if s}
    results = {}
    for name, fn in SUITES:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        results[name] = fn(args.quick)
        if not args.json:
            print(f"[{name}] ({time.perf_counter() - t0:.1f}s) "
                  f"{json.dumps(results[name])}", flush=True)
    if args.json:
        print(json.dumps(results))
    elif not only:
        print("\n=== summary ===")
        print(f"basic: {results['basic_inference']['tokens_per_sec']} tok/s | "
              f"kv-cache speedup: {results['kv_cache']['speedup']}x | "
              f"int4 compression: "
              f"{results['quantization']['int4']['compression']}x")


if __name__ == "__main__":
    main()
