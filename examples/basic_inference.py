"""CLI: load a model file and generate text with perf stats.

Reference counterpart: examples/basic_inference.cpp (:12-119) — the
canonical end-to-end workload: load → metadata print → generate with
logprobs → performance stats.

Usage:
  python examples/basic_inference.py <model.{gguf,safetensors,tinq}> \\
      [prompt] [--max-tokens N] [--temperature T] [--greedy]
  python examples/basic_inference.py --synthetic [prompt]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import turboinfer_tpu as ti


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", help="model file path")
    ap.add_argument("prompt", nargs="?", default="Hello, world")
    ap.add_argument("--synthetic", action="store_true",
                    help="use an in-memory synthetic model (no file)")
    ap.add_argument("--max-tokens", type=int, default=50)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=50)
    ap.add_argument("--top-p", type=float, default=0.9)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--logprobs", action="store_true")
    args = ap.parse_args()

    ti.initialize()
    print(ti.build_info())

    if args.synthetic or not args.model:
        from turboinfer_tpu.loader.synthetic import create_synthetic_model
        data = create_synthetic_model(vocab_size=1000, hidden_size=256,
                                      num_layers=4, num_heads=4)
        eng = ti.InferenceEngine(data.params, data.config,
                                 tokenizer=data.tokenizer)
        print(f"model: {data.summary()}")
    else:
        eng = ti.load_model(args.model)
        from turboinfer_tpu.models import llama
        c = eng.model_config
        print(f"model: {c.name} ({c.architecture}) vocab={c.vocab_size} "
              f"hidden={c.hidden_size} layers={c.num_layers} "
              f"heads={c.num_heads}/{c.kv_heads}kv | "
              f"{llama.param_count(eng.params) / 1e6:.1f}M params")

    tokens = eng.encode(args.prompt)
    print(f"prompt: {args.prompt!r} -> {len(tokens)} tokens")

    temperature = 0.0 if args.greedy else args.temperature
    res = eng.generate(tokens, args.max_tokens, temperature=temperature,
                       top_k=args.top_k, top_p=args.top_p,
                       return_logprobs=args.logprobs)
    text = eng.decode(res.tokens)
    print(f"output: {text!r}")
    print(f"stats: {len(res.tokens) - len(tokens)} new tokens in "
          f"{res.total_time_ms:.0f} ms = {res.tokens_per_second:.1f} tok/s "
          f"(TTFT {res.prefill_time_ms:.0f} ms, stop={res.stop_reason})")
    if args.logprobs and res.logprobs:
        print(f"logprobs[:5]: {[round(x, 3) for x in res.logprobs[:5]]}")
    print()
    print(eng.performance_stats())
    ti.shutdown()


if __name__ == "__main__":
    main()
