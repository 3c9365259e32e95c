"""Robust 7B decode timing: repeat an N-step scan several times inside
one process and report min/median ms/step (tunnel has multi-ms jitter).
N defaults to 64: an 8-step scan divides the ~30 ms tunnel round trip
across only 8 steps (+3.7 ms/step of pure RTT that XProf shows is NOT
device time). Set TURBOINFER_PROF_STEPS to override.
Usage (from repo root): python benchmarks/profile_decode_min.py [B] [FILL] [BITS] [GS] [REPS] [MAX_SEQ]
"""
import functools, os, sys, time
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
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 6
MAX_SEQ = int(sys.argv[6]) if len(sys.argv) > 6 else 1024
win = int(os.environ.get("TURBOINFER_PROF_WINDOW", "0")) or None
cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=MAX_SEQ,
                     sliding_window=win)
data = create_synthetic_quantized_model(cfg, bits=BITS, group_size=GS)
params = dispatch.prepare_params(data.params); del data
kvd = os.environ.get("TURBOINFER_PROF_KV", "")
kv_dtype = {"fp8": jnp.uint8, "int8": jnp.int8}.get(kvd, None)
cache = llama.init_cache(cfg, B, max_seq=MAX_SEQ, dtype=kv_dtype)
cache = cache._replace(length=jnp.full((B,), FILL, jnp.int32))

@functools.partial(jax.jit, static_argnames=("n",))
def steps(params, tok, cache, n):
    def body(carry, _):
        tok, cache = carry
        logits, cache = llama.forward(params, cfg, tok[:, None], cache)
        nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        return (nxt, cache), None
    (tok, cache), _ = jax.lax.scan(body, (tok, cache), None, length=n)
    return tok

N = int(os.environ.get("TURBOINFER_PROF_STEPS", "64"))
tok = jnp.ones((B,), jnp.int32)
_ = int(np.asarray(steps(params, tok, cache, n=N)).sum())
times = []
for _i in range(REPS):
    t0 = time.perf_counter()
    _ = int(np.asarray(steps(params, tok, cache, n=N)).sum())
    times.append((time.perf_counter() - t0) / N * 1e3)
times.sort()
med = times[len(times) // 2]
print(f"min {times[0]:.2f} med {med:.2f} ms/step  "
      f"({B/times[0]*1000:.1f} tok/s at min)  all={[f'{t:.2f}' for t in times]}",
      flush=True)
