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
    ap.add_argument("--group-size", type=int, default=64)
    ap.add_argument("--paged", action="store_true",
                    help="decode over the paged KV cache (block-table "
                         "Pallas kernel) instead of the contiguous cache")
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--kv", default="model",
                    choices=["model", "bf16", "fp8", "int8"],
                    help="KV cache storage dtype (resolve_kv_dtype)")
    ap.add_argument("--fill", type=int, default=0,
                    help="starting cache fill (decode cost is "
                         "fill-proportional)")
    args = ap.parse_args()

    from turboinfer_tpu.config import llama7b_config
    from turboinfer_tpu.kernels import dispatch
    from turboinfer_tpu.loader.synthetic import \
        create_synthetic_quantized_model
    from turboinfer_tpu.models import llama, common

    cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=args.max_seq)
    data = create_synthetic_quantized_model(cfg, bits=args.bits,
                                            group_size=args.group_size)
    params = dispatch.prepare_params(data.params)
    del data
    wbytes = common.param_bytes(params)
    kv_dtype = common.resolve_kv_dtype(args.kv, cfg.dtype)

    if args.paged:
        from turboinfer_tpu.engine import paged_cache as pc
        page = args.page_size
        per_seq = args.max_seq // page
        pcache = pc.init_paged_cache(cfg, args.batch,
                                     num_pages=args.batch * per_seq,
                                     page_size=page, max_seq=args.max_seq,
                                     dtype=kv_dtype)
        # Each sequence owns a contiguous run of pages (worst case for
        # locality is irrelevant: the kernel DMAs per block-table entry).
        table = jnp.arange(args.batch * per_seq, dtype=jnp.int32)
        table = table.reshape(args.batch, per_seq)
        pcache = pcache._replace(block_table=table)
        scaled = pcache.k_scale_pages is not None

        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnames=("kp", "vp", "ksp", "vsp"))
        def steps(params, tok, kp, vp, ksp, vsp, lengths, n):
            def body(carry, _):
                tok, kp, vp, ksp, vsp, lengths = carry
                kw = (dict(k_scale_pages=ksp, v_scale_pages=vsp)
                      if scaled else {})
                out = llama.forward_paged_decode(
                    params, cfg, tok, kp, vp, table, lengths, **kw)
                logits, kp, vp = out[:3]
                if scaled:
                    ksp, vsp = out[3:]
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (nxt, kp, vp, ksp, vsp, lengths + 1), None
            carry, _ = jax.lax.scan(body, (tok, kp, vp, ksp, vsp, lengths),
                                    None, length=n)
            return carry

        tok = jnp.ones((args.batch,), jnp.int32)
        lengths = jnp.full((args.batch,), args.fill, jnp.int32)
        t0 = time.perf_counter()
        out = steps(params, tok, pcache.k_pages, pcache.v_pages,
                    pcache.k_scale_pages, pcache.v_scale_pages, lengths,
                    n=args.steps)
        _ = int(np.asarray(out[0]).sum())
        print(f"compile+first run: {time.perf_counter() - t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        out = steps(params, out[0], out[1], out[2], out[3], out[4], out[5],
                    n=args.steps)
        _ = int(np.asarray(out[0]).sum())
    else:
        cache = llama.init_cache(cfg, args.batch, max_seq=args.max_seq,
                                 dtype=kv_dtype)
        if args.fill:
            cache = cache._replace(
                length=jnp.full((args.batch,), args.fill, jnp.int32))

        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnames=("cache",))
        def steps(params, tok, cache, n):
            def body(carry, _):
                tok, cache = carry
                logits, cache = llama.forward(params, cfg, tok[:, None],
                                              cache)
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                return (nxt, cache), None
            (tok, cache), _ = jax.lax.scan(body, (tok, cache), None,
                                           length=n)
            return tok, cache

        tok = jnp.ones((args.batch,), jnp.int32)
        t0 = time.perf_counter()
        tok2, cache = steps(params, tok, cache, n=args.steps)
        _ = int(np.asarray(tok2).sum())
        print(f"compile+first run: {time.perf_counter() - t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        tok2, cache = steps(params, tok2, cache, n=args.steps)
        _ = int(np.asarray(tok2).sum())

    dt_raw = (time.perf_counter() - t0) / args.steps

    # The tunnel-attached chip pays a fixed ~28 ms dispatch+sync
    # latency per jitted call (measured: a 100-kernel and a 1000-kernel
    # chain cost the SAME wall total). Measure it with a trivial call
    # and report the per-step device rate with and without it — the
    # "device" number is what an on-prem chip (µs dispatch) would see.
    @jax.jit
    def _noop(x):
        return x + 1
    _ = int(np.asarray(_noop(tok if not args.paged else out[0])).sum())
    rtts = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = int(np.asarray(_noop(tok if not args.paged else out[0])).sum())
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    dt = max(dt_raw - rtt / args.steps, 1e-9)

    mode = "REF" if os.environ.get("TURBOINFER_FORCE_REF") == "1" \
        else "PALLAS"
    mode += "+paged" if args.paged else ""
    print(f"{mode} int{args.bits} B={args.batch} T={args.max_seq}: "
          f"{dt * 1e3:.2f} ms/step device ({dt_raw * 1e3:.2f} incl. "
          f"{rtt * 1e3:.0f} ms dispatch RTT / {args.steps} steps), "
          f"{args.batch / dt:.1f} tok/s/chip, "
          f"weight-stream {wbytes / dt / 1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
