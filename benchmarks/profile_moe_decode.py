"""Mixtral-shaped quantized MoE decode timing (single chip).

Measures the top-k expert fast path: per step each layer streams k=2
packed expert FFNs (+ attention weights) instead of all E=8, so a
16-layer / 8-expert / int4 Mixtral half-stack should decode at roughly
the traffic of a dense ~6B int4 model. Repeated-min over >=8-step scans
(tunnel RTT amortized), same methodology as profile_decode_min.py.

Usage (repo root, real TPU): python benchmarks/profile_moe_decode.py \
    [B] [FILL] [BITS] [GS] [REPS] [LAYERS] [EXPERTS]
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

from turboinfer_tpu.config import mixtral_config
from turboinfer_tpu.kernels import dispatch
from turboinfer_tpu.loader.synthetic import create_synthetic_quantized_model
from turboinfer_tpu.models import moe

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
FILL = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BITS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
GS = int(sys.argv[4]) if len(sys.argv) > 4 else 64
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 6
LAYERS = int(sys.argv[6]) if len(sys.argv) > 6 else 16
EXPERTS = int(sys.argv[7]) if len(sys.argv) > 7 else 8
MAX_SEQ = 1024

cfg = mixtral_config(dtype=jnp.bfloat16, num_layers=LAYERS,
                     num_experts=EXPERTS, max_seq_len=MAX_SEQ)
data = create_synthetic_quantized_model(cfg, bits=BITS, group_size=GS)
params = dispatch.prepare_params(data.params)
del data
cache = moe.init_cache(cfg, B, max_seq=MAX_SEQ)
cache = cache._replace(length=jnp.full((B,), FILL, jnp.int32))

k = cfg.experts_per_token
gb_step = (cfg.num_layers
           * (k * 3 * cfg.hidden_size * 14336
              + cfg.q_dim * cfg.hidden_size * 2
              + cfg.kv_dim * cfg.hidden_size * 2) * BITS / 8) / 1e9


@functools.partial(jax.jit, static_argnames=("n",))
def steps(params, tok, cache, n):
    def body(carry, _):
        tok, cache = carry
        logits, cache = moe.forward(params, cfg, tok[:, None], cache)
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
print(f"moe L={LAYERS} E={EXPERTS} top{k} int{BITS} B={B} fill={FILL}: "
      f"min {times[0]:.2f} med {med:.2f} ms/step "
      f"({B / times[0] * 1000:.1f} tok/s, "
      f"{gb_step / (times[0] / 1e3):.0f} GB/s expert+attn stream at min)",
      flush=True)
