"""Trace one 7B decode step and dump per-op device times."""
import os, time, glob
import numpy as np
import jax, jax.numpy as jnp
from turboinfer_tpu.config import llama7b_config
from turboinfer_tpu.core.qtensor import QTensor
from turboinfer_tpu.models import llama
import functools

BITS = 4
B, T, G = 1, 1024, 64
cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=T)
L, H, V, F = cfg.num_layers, cfg.hidden_size, cfg.vocab_size, cfg.ffn_dim
QD, KVD = cfg.q_dim, cfg.kv_dim
key = jax.random.PRNGKey(0)

def rq(shape_kn, stacked=True):
    K, N = shape_kn
    lead = (L,) if stacked else ()
    data = jax.random.randint(key, lead + (K // 2, N), 0, 255, jnp.int32).astype(jnp.uint8)
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

@functools.partial(jax.jit, static_argnames=("n",))
def steps(params, tok, cache, n):
    def body(carry, _):
        tok, cache = carry
        logits, cache = llama.forward(params, cfg, tok[:, None], cache)
        nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        return (nxt, cache), None
    (tok, cache), _ = jax.lax.scan(body, (tok, cache), None, length=n)
    return tok, cache

tok = jnp.ones((B,), jnp.int32)
out = steps(params, tok, cache, n=4)
_ = int(np.asarray(out[0]).sum())

logdir = "/tmp/jaxtrace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
out = steps(params, tok, cache, n=4)
_ = int(np.asarray(out[0]).sum())
jax.profiler.stop_trace()
print("trace files:", glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
