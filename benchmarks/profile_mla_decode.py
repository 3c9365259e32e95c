"""DeepSeek-V2-Lite-shaped quantized MLA decode timing (single chip).

Measures the absorbed-MLA decode path with the compressed latent cache:
per step each layer streams k=6 of 64 packed expert FFNs + the
attention projections, and attention reads only (kv_lora_rank +
qk_rope_head_dim) floats/token of cache. Repeated-min over 8-step
scans (tunnel RTT amortized) — same methodology as
profile_decode_min.py.

Usage (repo root, real TPU): python benchmarks/profile_mla_decode.py \
    [B] [FILL] [BITS] [GS] [REPS] [LAYERS]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np
import jax
if os.environ.get("TURBOINFER_PROF_CPU"):      # axon ignores JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from turboinfer_tpu.config import deepseek_v2_lite_config
from turboinfer_tpu.kernels import dispatch
from turboinfer_tpu.loader.synthetic import create_synthetic_quantized_model
from turboinfer_tpu.models import deepseek

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
FILL = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BITS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
GS = int(sys.argv[4]) if len(sys.argv) > 4 else 64
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 6
LAYERS = int(sys.argv[6]) if len(sys.argv) > 6 else 27
MAX_SEQ = 1024

cfg = deepseek_v2_lite_config(dtype=jnp.bfloat16, num_layers=LAYERS,
                              max_seq_len=MAX_SEQ)
data = create_synthetic_quantized_model(cfg, bits=BITS, group_size=GS)
params = dispatch.prepare_params(data.params)
del data
cache = deepseek.init_cache(cfg, B, max_seq=MAX_SEQ)
cache = cache._replace(length=jnp.full((B,), FILL, jnp.int32))


@functools.partial(jax.jit, static_argnames=("n",))
def steps(params, tok, cache, n):
    def body(carry, _):
        tok, cache = carry
        logits, cache = deepseek.forward(params, cfg, tok[:, None], cache)
        nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        return (nxt, cache), None
    (tok, cache), _ = jax.lax.scan(body, (tok, cache), None, length=n)
    return tok


tok = jnp.ones((B,), jnp.int32)
_ = int(np.asarray(steps(params, tok, cache, n=8)).sum())
times = []
for _i in range(REPS):
    t0 = time.perf_counter()
    _ = int(np.asarray(steps(params, tok, cache, n=8)).sum())
    times.append((time.perf_counter() - t0) / 8 * 1e3)
times.sort()
med = times[len(times) // 2]
k = cfg.experts_per_token
print(f"mla L={LAYERS} E={cfg.num_experts} top{k} int{BITS} B={B} "
      f"fill={FILL}: min {times[0]:.2f} med {med:.2f} ms/step "
      f"({B / times[0] * 1000:.1f} tok/s)", flush=True)
