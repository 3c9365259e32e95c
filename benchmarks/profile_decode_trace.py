"""7B decode XProf trace: runs an 8-step scan, captures a trace, and
prints per-op device self-times (framework_op_stats).
Usage (from repo root): python benchmarks/profile_decode_trace.py [B] [FILL] [BITS] [GS]
"""
import os, functools, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from turboinfer_tpu.config import llama7b_config
from turboinfer_tpu.kernels import dispatch
from turboinfer_tpu.loader.synthetic import create_synthetic_quantized_model
from turboinfer_tpu.models import llama

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
FILL = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BITS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
GS = int(sys.argv[4]) if len(sys.argv) > 4 else 64
cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=1024)
data = create_synthetic_quantized_model(cfg, bits=BITS, group_size=GS)
params = dispatch.prepare_params(data.params); del data
kvd = os.environ.get("TURBOINFER_PROF_KV", "")
kv_dtype = {"fp8": jnp.uint8, "int8": jnp.int8}.get(kvd, None)
cache = llama.init_cache(cfg, B, max_seq=1024, dtype=kv_dtype)
cache = cache._replace(length=jnp.full((B,), FILL, jnp.int32))

@functools.partial(jax.jit, static_argnames=("n",), donate_argnames=("cache",))
def steps(params, tok, cache, n):
    def body(carry, _):
        tok, cache = carry
        logits, cache = llama.forward(params, cfg, tok[:, None], cache)
        nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        return (nxt, cache), None
    (tok, cache), _ = jax.lax.scan(body, (tok, cache), None, length=n)
    return tok, cache

tok = jnp.ones((B,), jnp.int32)
tok, cache = steps(params, tok, cache, n=8)
_ = int(np.asarray(tok).sum())
print("warm", flush=True)
import time
t0 = time.perf_counter()
tok, cache = steps(params, tok, cache, n=8)
_ = int(np.asarray(tok).sum())
ms = (time.perf_counter()-t0)/8*1e3
print(f"{ms:.2f} ms/step  {B/ms*1000:.1f} tok/s", flush=True)
import shutil
shutil.rmtree("/tmp/trace_b1", ignore_errors=True)
jax.profiler.start_trace("/tmp/trace_b1")
tok, cache = steps(params, tok, cache, n=8)
_ = int(np.asarray(tok).sum())
jax.profiler.stop_trace()

import glob, json
from xprof.convert import raw_to_tool_data as rtd
d = glob.glob("/tmp/trace_b1/**/*.xplane.pb", recursive=True)
out, _ = rtd.xspace_to_tool_data(d, "framework_op_stats", {})
s = out.decode() if isinstance(out, bytes) else str(out)
tbl = json.loads(s)[0]
cols = [c["id"] for c in tbl["cols"]]
rows = [dict(zip(cols, [c["v"] if c else None for c in r["c"]])) for r in tbl["rows"]]
rows = [r for r in rows if r.get("host_or_device") == "Device"]
rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
tot = sum(r.get("total_self_time") or 0 for r in rows)
print(f"device total self time: {tot/8/1000:.2f} ms/step")
for r in rows[:14]:
    print(f"  {r['total_self_time']/8:>9.0f}us/step {int(r['occurrences']):>5}  {str(r['operation'])[-70:]}")
