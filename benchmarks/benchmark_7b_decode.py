"""7B-class decode benchmark — the BASELINE north-star measurement.

Measures ms/step and tokens/sec/chip for INT4/INT8 LLaMA-7B-shape
decode with the fused Pallas kernel stack, against the XLA
dequantize-then-matmul path (TURBOINFER_FORCE_REF=1).

Run: python benchmarks/benchmark_7b_decode.py [--bits 4] [--batch 1]
     [--steps 32] [--max-seq 1024]
Takes ~10-20 min cold (axon tunnel compile); results in
docs/BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=[4, 8])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--max-seq", type=int, default=1024)
    args = ap.parse_args()

    from turboinfer_tpu.config import llama7b_config
    from turboinfer_tpu.kernels import dispatch
    from turboinfer_tpu.loader.synthetic import \
        create_synthetic_quantized_model
    from turboinfer_tpu.models import llama, common

    cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=args.max_seq)
    data = create_synthetic_quantized_model(cfg, bits=args.bits,
                                            group_size=64)
    params = dispatch.prepare_params(data.params)
    del data
    cache = llama.init_cache(cfg, args.batch, max_seq=args.max_seq)
    wbytes = common.param_bytes(params)

    @functools.partial(jax.jit, static_argnames=("n",),
                       donate_argnames=("cache",))
    def steps(params, tok, cache, n):
        def body(carry, _):
            tok, cache = carry
            logits, cache = llama.forward(params, cfg, tok[:, None], cache)
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (nxt, cache), None
        (tok, cache), _ = jax.lax.scan(body, (tok, cache), None, length=n)
        return tok, cache

    tok = jnp.ones((args.batch,), jnp.int32)
    t0 = time.perf_counter()
    tok2, cache = steps(params, tok, cache, n=args.steps)
    _ = int(np.asarray(tok2).sum())
    print(f"compile+first run: {time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    tok2, cache = steps(params, tok, cache, n=args.steps)
    _ = int(np.asarray(tok2).sum())
    dt = (time.perf_counter() - t0) / args.steps
    mode = "REF" if os.environ.get("TURBOINFER_FORCE_REF") == "1" \
        else "PALLAS"
    print(f"{mode} int{args.bits} B={args.batch} T={args.max_seq}: "
          f"{dt * 1e3:.2f} ms/step, {args.batch / dt:.1f} tok/s/chip, "
          f"weight-stream {wbytes / dt / 1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
