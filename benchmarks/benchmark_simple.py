"""Quick microbenchmarks: GEMM FLOPS, quantization throughput, beam tok/s.

Reference counterpart: benchmarks/benchmark_simple.cpp (matmul MFLOPS for
64x128..512x1024 at :38-100, quantization Melem/s, beam-search tok/s).
The reference reports 5.7-8.6 GFLOPS on AVX2 (README.md:63); the MXU
numbers here are the TPU answer to that table.

Run: python benchmarks/benchmark_simple.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import QuantizationConfig, QuantType
from turboinfer_tpu.core.qtensor import quantize


def bench_matmul():
    print("== matmul (bf16, MXU) ==")
    shapes = [(64, 128, 64), (128, 256, 128), (256, 512, 256),
              (512, 1024, 512), (2048, 2048, 2048), (4096, 4096, 4096)]
    f = jax.jit(lambda a, b: a @ b)
    for (m, k, n) in shapes:
        a = jnp.ones((m, k), jnp.bfloat16)
        b = jnp.ones((k, n), jnp.bfloat16)
        f(a, b).block_until_ready()
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(a, b)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        gflops = 2 * m * k * n / dt / 1e9
        print(f"  {m}x{k}x{n}: {gflops:8.1f} GFLOPS ({dt * 1e6:.0f} us)")


def bench_quantization():
    print("== quantization throughput ==")
    w = jnp.asarray(np.random.randn(4096, 4096).astype(np.float32))
    for qt in (QuantType.INT8, QuantType.INT4):
        q = jax.jit(lambda w: quantize(w, qt, group_size=64).data)
        q(w).block_until_ready()
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            r = q(w)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        melems = w.size / dt / 1e6
        print(f"  {qt.value}: {melems:8.1f} Melem/s")


def bench_beam():
    print("== beam search ==")
    import turboinfer_tpu as ti
    from turboinfer_tpu.loader.synthetic import create_synthetic_model
    data = create_synthetic_model(hidden_size=128, num_layers=2)
    eng = ti.InferenceEngine(data.params, data.config)
    eng.generate_beam_search([1, 5, 9], 16, beam_size=4)  # compile
    t0 = time.perf_counter()
    res = eng.generate_beam_search([1, 5, 9], 64, beam_size=4)
    dt = time.perf_counter() - t0
    print(f"  beam=4: {(len(res.tokens) - 3) / dt:.1f} tok/s")


if __name__ == "__main__":
    bench_matmul()
    bench_quantization()
    bench_beam()
