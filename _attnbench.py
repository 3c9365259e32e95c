import time, numpy as np
import jax, jax.numpy as jnp
from turboinfer_tpu.kernels.pallas import decode_attention
from turboinfer_tpu.kernels import ops

B, Hq, Hkv, D, T = 1, 32, 32, 128, 2048
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, Hq, D).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.randn(B, Hkv, T, D).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.randn(B, Hkv, T, D).astype(np.float32)).astype(jnp.bfloat16)
kv_len = jnp.asarray([T], jnp.int32)

ITERS = 50
@jax.jit
def loop_pallas(q, k, v, kv_len):
    def body(i, qa):
        o = decode_attention.decode_pallas(qa, k, v, kv_len)
        return qa + o * 1e-9
    return jax.lax.fori_loop(0, ITERS, body, q)

@jax.jit
def loop_ref(q, k, v, kv_len):
    def body(i, qa):
        o = ops.attention_decode_ref(qa, k, v, kv_len)
        return qa + o * 1e-9
    return jax.lax.fori_loop(0, ITERS, body, q)

bytes_per = 2 * B * Hkv * T * D * 2
for name, f in [("pallas", loop_pallas), ("ref", loop_ref)]:
    out = f(q, k, v, kv_len); _ = np.asarray(out).sum()
    t0 = time.perf_counter()
    out = f(q, k, v, kv_len); _ = np.asarray(out).sum()
    dt = (time.perf_counter() - t0) / ITERS
    print(f"decode-attn {name}: {dt*1e6:.0f} us, {bytes_per/dt/1e9:.0f} GB/s", flush=True)
