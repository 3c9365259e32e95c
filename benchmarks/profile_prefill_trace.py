"""7B prefill XProf trace: one traced prefill pass, per-op device
self-times (framework_op_stats) — where do the non-MXU milliseconds go?
Usage (from repo root): python benchmarks/profile_prefill_trace.py [S] [B] [BITS] [GS]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from turboinfer_tpu.config import llama7b_config
from turboinfer_tpu.kernels import dispatch
from turboinfer_tpu.loader.synthetic import create_synthetic_quantized_model
from turboinfer_tpu.models import llama

S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
BITS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
GS = int(sys.argv[4]) if len(sys.argv) > 4 else 64
REPS = 4
kvd = os.environ.get("TURBOINFER_PROF_KV", "")
kv_dtype = {"fp8": jnp.uint8, "int8": jnp.int8}.get(kvd, None)
cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=max(1024, S))
data = create_synthetic_quantized_model(cfg, bits=BITS, group_size=GS)
params = dispatch.prepare_params(data.params); del data

LAST = os.environ.get("TURBOINFER_PROF_LASTONLY", "0") == "1"
FRESH = os.environ.get("TURBOINFER_PROF_FRESH", "0") == "1"

import functools


# donate the cache like the engine's _prefill_program does — without
# donation XLA inserts two ~0.8 ms whole-cache copies (K and V stacks)
# that the real engine program never pays.
@functools.partial(jax.jit, donate_argnums=(2,))
def prefill(params, tokens, cache):
    if LAST:   # engine-style last-position-only head (+ cold prefill)
        idx = jnp.full((tokens.shape[0],), tokens.shape[1] - 1, jnp.int32)
        logits, cache = llama.forward(params, cfg, tokens, cache,
                                      logit_idx=idx, fresh_prefill=FRESH)
        return logits[:, 0], cache
    logits, cache = llama.forward(params, cfg, tokens, cache)
    return logits[:, -1], cache

tokens = jnp.ones((B, S), jnp.int32)
def mkcache():
    return llama.init_cache(cfg, B, max_seq=max(1024, S), dtype=kv_dtype)
r, _ = prefill(params, tokens, mkcache()); np.asarray(r)
caches = [mkcache() for _ in range(REPS)]
print("warm", flush=True)
import shutil
shutil.rmtree("/tmp/trace_prefill", ignore_errors=True)
jax.profiler.start_trace("/tmp/trace_prefill")
for i in range(REPS):
    r, _ = prefill(params, tokens, caches[i])
np.asarray(r)
jax.profiler.stop_trace()

import glob, json
from xprof.convert import raw_to_tool_data as rtd
d = glob.glob("/tmp/trace_prefill/**/*.xplane.pb", recursive=True)
out, _ = rtd.xspace_to_tool_data(d, "framework_op_stats", {})
s = out.decode() if isinstance(out, bytes) else str(out)
tbl = json.loads(s)[0]
cols = [c["id"] for c in tbl["cols"]]
rows = [dict(zip(cols, [c["v"] if c else None for c in r["c"]])) for r in tbl["rows"]]
rows = [r for r in rows if r.get("host_or_device") == "Device"]
rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
tot = sum(r.get("total_self_time") or 0 for r in rows)
print(f"device total self time: {tot/REPS/1000:.2f} ms/prefill")
for r in rows[:18]:
    print(f"  {r['total_self_time']/REPS:>9.0f}us {int(r['occurrences']):>5}  "
          f"{str(r['operation'])[-70:]}")
