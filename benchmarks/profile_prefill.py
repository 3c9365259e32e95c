"""7B prefill timing on the real chip (dispatch-RTT corrected).

Usage (from repo root):
    python benchmarks/profile_prefill.py [S] [B] [BITS] [GROUP_SIZE]
"""
import os, sys, time
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
cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=max(1024, S))
data = create_synthetic_quantized_model(cfg, bits=BITS, group_size=GS)
params = dispatch.prepare_params(data.params); del data

@jax.jit
def prefill(params, tokens, cache):
    logits, cache = llama.forward(params, cfg, tokens, cache)
    return logits[:, -1], cache

@jax.jit
def noop(x):
    return x + 1

kvd = os.environ.get("TURBOINFER_PROF_KV", "")
kv_dtype = {"fp8": jnp.uint8, "int8": jnp.int8}.get(kvd, None)
tokens = jnp.ones((B, S), jnp.int32)
cache = llama.init_cache(cfg, B, max_seq=max(1024, S), dtype=kv_dtype)
t0 = time.perf_counter()
r, _ = prefill(params, tokens, cache); np.asarray(r)
print(f"compile+first: {time.perf_counter()-t0:.0f}s", flush=True)
_ = np.asarray(noop(tokens))
rtts = [0.0] * 3
for i in range(3):
    t0 = time.perf_counter(); _ = np.asarray(noop(tokens))
    rtts[i] = time.perf_counter() - t0
rtt = min(rtts)
ts = []
for i in range(4):
    cache = llama.init_cache(cfg, B, max_seq=max(1024, S),
                             dtype=kv_dtype)
    t0 = time.perf_counter()
    r, c2 = prefill(params, tokens, cache); np.asarray(r)
    ts.append(time.perf_counter() - t0)
dev = min(ts) - rtt
flops = 2 * 6.74e9 * B * S
print(f"prefill B={B} S={S} int{BITS}: {dev*1e3:.1f} ms device "
      f"(rtt {rtt*1e3:.0f}ms), {flops/dev/1e12:.1f} TFLOP/s, "
      f"{B*S/dev:.0f} tok/s", flush=True)
