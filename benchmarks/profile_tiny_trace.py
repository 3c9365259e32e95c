"""Tiny-model decode XProf trace — profiles the HEADLINE bench config
(bench.py tiny-int4 b1) at the device level: engine decode scan over N
tokens, per-op self-times via framework_op_stats.
Usage (from repo root): python benchmarks/profile_tiny_trace.py [BITS] [N] [B]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from turboinfer_tpu.config import (InferenceConfig, QuantizationConfig,
                                   QuantType, tiny_config)
from turboinfer_tpu.engine.engine import InferenceEngine
from turboinfer_tpu.models import llama

BITS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1

cfg = tiny_config(dtype=jnp.bfloat16)
if N + 16 > cfg.max_seq_len:
    cfg = tiny_config(dtype=jnp.bfloat16,
                      max_seq_len=1 << (N + 16).bit_length())
params = llama.init_params(jax.random.PRNGKey(0), cfg)
if BITS in (4, 8):
    from turboinfer_tpu.quant.quantizer import quantize_params
    params = quantize_params(params, QuantizationConfig(
        type=QuantType.INT4 if BITS == 4 else QuantType.INT8,
        group_size=64))
eng = InferenceEngine(params, cfg, InferenceConfig(
    max_seq_len=cfg.max_seq_len, temperature=0.8, top_k=50, top_p=0.9,
    seed=0))
prompts = [[1, 17, 42, 256, 731, 5, 9, 88]] * B

eng.generate_batch(prompts, max_new_tokens=N)
eng.reset_state()
best = None
for _ in range(3):
    t0 = time.perf_counter()
    res = eng.generate_batch(prompts, max_new_tokens=N)
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
newt = sum(len(r.tokens) - len(p) for r, p in zip(res, prompts))
print(f"e2e: {newt/best:.1f} tok/s  ({best*1e3:.1f} ms for {newt} tokens)",
      flush=True)

import shutil
shutil.rmtree("/tmp/trace_tiny", ignore_errors=True)
jax.profiler.start_trace("/tmp/trace_tiny")
eng.reset_state()
eng.generate_batch(prompts, max_new_tokens=N)
jax.profiler.stop_trace()

import glob, json
from xprof.convert import raw_to_tool_data as rtd
d = glob.glob("/tmp/trace_tiny/**/*.xplane.pb", recursive=True)
out, _ = rtd.xspace_to_tool_data(d, "framework_op_stats", {})
s = out.decode() if isinstance(out, bytes) else str(out)
tbl = json.loads(s)[0]
cols = [c["id"] for c in tbl["cols"]]
rows = [dict(zip(cols, [c["v"] if c else None for c in r["c"]]))
        for r in tbl["rows"]]
rows = [r for r in rows if r.get("host_or_device") == "Device"]
rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
tot = sum(r.get("total_self_time") or 0 for r in rows)
print(f"device total self time: {tot/N:.1f} us/token over {N} tokens")
for r in rows[:20]:
    print(f"  {r['total_self_time']/N:>8.2f}us/tok {int(r['occurrences']):>6}"
          f"  {str(r['operation'])[-72:]}")
