"""7B-class decode-step benchmark: pallas qmm vs jnp-ref dequant path."""
import os, sys, time
FORCE = sys.argv[1] if len(sys.argv) > 1 else "0"
os.environ["TURBOINFER_FORCE_REF"] = FORCE
import numpy as np
import jax, jax.numpy as jnp
from turboinfer_tpu.config import llama7b_config, QuantType
from turboinfer_tpu.core.qtensor import QTensor
from turboinfer_tpu.models import llama

BITS = int(os.environ.get("BITS", "4"))
B = int(os.environ.get("BATCH", "1"))
T = 1024

cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=T)
L, H, V, F = cfg.num_layers, cfg.hidden_size, cfg.vocab_size, cfg.ffn_dim
QD, KVD, G = cfg.q_dim, cfg.kv_dim, 64
key = jax.random.PRNGKey(0)

def rq(shape_kn, stacked=True):
    K, N = shape_kn
    lead = (L,) if stacked else ()
    if BITS == 4:
        data = jax.random.randint(key, lead + (K // 2, N), 0, 255, jnp.int32).astype(jnp.uint8)
    else:
        data = jax.random.randint(key, lead + (K, N), -127, 127, jnp.int32).astype(jnp.int8)
    scales = jnp.full(lead + (K // G, N), 0.01, jnp.bfloat16)
    return QTensor(data=data, scales=scales, zero_points=None, bits=BITS,
                   group_size=G, shape=(K, N))

params = {
    "embed": jnp.zeros((V, H), jnp.bfloat16),
    "layers": {
        "attn_norm": jnp.ones((L, H), jnp.bfloat16),
        "ffn_norm": jnp.ones((L, H), jnp.bfloat16),
        "wq": rq((H, QD)), "wk": rq((H, KVD)), "wv": rq((H, KVD)),
        "wo": rq((QD, H)),
        "w_gate": rq((H, F)), "w_up": rq((H, F)), "w_down": rq((F, H)),
    },
    "final_norm": jnp.ones((H,), jnp.bfloat16),
    "lm_head": rq((H, V), stacked=False),
}
cache = llama.init_cache(cfg, B, max_seq=T)

import functools
@functools.partial(jax.jit, static_argnames=('n',))
def steps(params, tok, cache, n):
    def body(carry, _):
        tok, cache = carry
        logits, cache = llama.forward(params, cfg, tok[:, None], cache)
        nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        return (nxt, cache), None
    (tok, cache), _ = jax.lax.scan(body, (tok, cache), None, length=n)
    return tok, cache

tok = jnp.ones((B,), jnp.int32)
N_STEPS = 32
out = steps(params, tok, cache, n=N_STEPS)
_ = int(np.asarray(out[0]).sum())
t0 = time.perf_counter()
out = steps(params, tok, cache, n=N_STEPS)
_ = int(np.asarray(out[0]).sum())
dt = (time.perf_counter() - t0) / N_STEPS
wbytes = sum(q.nbytes() for q in [params["layers"][k] for k in ["wq","wk","wv","wo","w_gate","w_up","w_down"]])
wbytes += params["lm_head"].nbytes() if isinstance(params["lm_head"], QTensor) else 0
mode = "REF" if FORCE == "1" else "PALLAS"
print(f"{mode} int{BITS} B={B}: {dt*1e3:.2f} ms/step, {B/dt:.1f} tok/s, weight-stream {wbytes/dt/1e9:.0f} GB/s")
