"""Serving benchmark: continuous batching under a Poisson request stream.

No reference counterpart (the reference has no scheduler at all —
generate_batch is a sequential loop, SURVEY.md quirk #7). Measures what
a deployment cares about: sustained throughput (tok/s), time-to-first-
token (queueing + prefill), and end-to-end request latency at a given
offered load, for the slot scheduler (optionally with burst decoding)
and the paged scheduler.

Usage:
  python benchmarks/benchmark_serving.py                  # tiny, CPU/TPU
  python benchmarks/benchmark_serving.py --model 7b --bits 4 \
      --requests 64 --rate 4 --slots 8 --burst 16         # real TPU

Arrivals are seeded pseudo-Poisson so runs are comparable; prompt and
output lengths are drawn from a seeded distribution.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build(args):
    import jax
    import jax.numpy as jnp
    from turboinfer_tpu.config import InferenceConfig, tiny_config, \
        llama7b_config
    if args.model == "tiny":
        cfg = tiny_config(dtype=jnp.bfloat16, max_seq_len=256)
        from turboinfer_tpu.models import llama
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        if args.bits in (4, 8):
            from turboinfer_tpu.config import QuantizationConfig, QuantType
            from turboinfer_tpu.quant.quantizer import quantize_params
            params = quantize_params(params, QuantizationConfig(
                type=QuantType.INT4 if args.bits == 4 else QuantType.INT8,
                group_size=64))
    else:
        cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=args.max_seq)
        from turboinfer_tpu.loader.synthetic import \
            create_synthetic_quantized_model
        params = create_synthetic_quantized_model(
            cfg, bits=args.bits, group_size=64).params
    icfg = InferenceConfig(max_seq_len=cfg.max_seq_len, temperature=0.8,
                           top_k=50, top_p=0.9, seed=0,
                           kv_cache_dtype=args.kv)
    return params, cfg, icfg


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(len(xs) * p))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["tiny", "7b"], default="tiny")
    ap.add_argument("--bits", type=int, default=4, choices=[0, 4, 8])
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--rate", type=float, default=8.0,
                    help="offered requests/second (Poisson)")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--burst", type=int, default=1,
                    help="decode steps per host round trip")
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--page-size", type=int, default=256)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--out-len", type=int, default=48)
    ap.add_argument("--kv", default="model",
                    choices=["model", "bf16", "fp8", "int8"],
                    help="KV cache storage dtype")
    ap.add_argument("--spec-layers", type=int, default=0,
                    help="speculative decoding with a synthetic draft "
                         "model of this many layers (0 = off)")
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--greedy", action="store_true",
                    help="temperature 0 (speculative acceptance is "
                         "highest for greedy)")
    args = ap.parse_args()

    params, cfg, icfg = build(args)
    if args.greedy:
        import dataclasses
        icfg = dataclasses.replace(icfg, temperature=0.0)
    from turboinfer_tpu.engine.scheduler import (
        ContinuousBatchingScheduler, PagedContinuousScheduler)
    if args.spec_layers > 0 and args.paged:
        sys.exit("--spec-layers is not supported with --paged")
    spec_kw = {}
    if args.spec_layers > 0:
        # draft = the TARGET truncated to its first N layers (early-exit
        # style, shares embed/head). On synthetic weights this gives a
        # nonzero, shape-realistic acceptance rate — an independent
        # random draft would accept ~nothing and measure only overhead.
        import dataclasses

        import jax
        dl = args.spec_layers
        dcfg = dataclasses.replace(cfg, num_layers=dl, name="draft")
        dparams = dict(params)
        dparams["layers"] = jax.tree_util.tree_map(
            lambda w: w[:dl], params["layers"])
        spec_kw = dict(draft_params=dparams, draft_config=dcfg,
                       spec_k=args.spec_k)

    def make():
        if args.paged:
            return PagedContinuousScheduler(params, cfg, icfg,
                                            batch_slots=args.slots,
                                            page_size=args.page_size,
                                            decode_burst=args.burst)
        return ContinuousBatchingScheduler(params, cfg, icfg,
                                           batch_slots=args.slots,
                                           decode_burst=args.burst,
                                           **spec_kw)

    sched = make()
    rng = np.random.default_rng(0)
    arrivals = np.cumsum(rng.exponential(1.0 / args.rate, args.requests))
    plens = rng.integers(max(4, args.prompt_len // 2),
                         args.prompt_len + 1, args.requests)
    olens = rng.integers(max(4, args.out_len // 2),
                         args.out_len + 1, args.requests)
    prompts = [list(int(t) for t in rng.integers(1, cfg.vocab_size, int(n)))
               for n in plens]

    # Warm the compile caches so the measured run reflects steady-state
    # serving: prefill programs compile per (admission-group width m,
    # bucketed prompt length) — admissions batch same-bucket requests
    # into power-of-2 groups — plus the decode/burst program. Warming
    # only m=1 lets the m=2/4/8 compiles (multi-second through the
    # tunnel) land inside the measured window and read as a 3-8x
    # throughput loss.
    def _bucket(n):
        b = 16
        while b < n:
            b *= 2
        return b
    for L in sorted({_bucket(len(p)) for p in prompts}):
        m = 1
        while m <= args.slots:
            for _ in range(m):
                sched.submit(prompts[0][:4] * (L // 4), 4)
            sched.run()
            m *= 2

    t0 = time.perf_counter()
    submitted = 0
    ttft = {}          # rid -> first-token time - arrival
    done_at = {}       # rid -> completion time
    arrive = {}        # rid -> arrival time
    gen = {}           # rid -> tokens generated
    while submitted < args.requests or sched.pending:
        now = time.perf_counter() - t0
        while submitted < args.requests and arrivals[submitted] <= now:
            rid = sched.submit(prompts[submitted], int(olens[submitted]))
            arrive[rid] = arrivals[submitted]
            submitted += 1
        if sched.pending:
            sched.step()
            now = time.perf_counter() - t0
            for req in list(sched._active.values()):
                if req.rid not in ttft and req.out_tokens:
                    ttft[req.rid] = now - arrive[req.rid]
            for rid, req in sched._done.items():
                if rid in arrive and rid not in done_at:
                    ttft.setdefault(rid, now - arrive[rid])
                    done_at[rid] = now
                    gen[rid] = len(req.out_tokens)
        else:
            time.sleep(min(0.005,
                           max(0.0, float(arrivals[submitted]) - now)))
    total = time.perf_counter() - t0

    gen_tokens = sum(gen.values())
    lats = [done_at[r] - arrive[r] for r in done_at]
    ttfts = [ttft[r] for r in done_at]
    mode = "paged" if args.paged else (
        f"spec_k={args.spec_k}(draft={args.spec_layers}L)"
        if args.spec_layers else f"burst={args.burst}")
    print(f"{args.model}-int{args.bits} slots={args.slots} {mode} "
          f"rate={args.rate}/s requests={len(done_at)}/{args.requests}")
    print(f"wall {total:.2f}s  generated {gen_tokens} tok  "
          f"throughput {gen_tokens / total:.1f} tok/s")
    if getattr(sched, "spec_proposed", 0):
        print(f"spec acceptance {sched.spec_accepted}/"
              f"{sched.spec_proposed} = "
              f"{sched.spec_accepted / sched.spec_proposed:.2f}")
    print(f"TTFT s   p50 {pct(ttfts, 0.5):.3f}  p99 {pct(ttfts, 0.99):.3f}")
    print(f"latency s p50 {pct(lats, 0.5):.3f}  p99 {pct(lats, 0.99):.3f}")


if __name__ == "__main__":
    main()
