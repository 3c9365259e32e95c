import time
import numpy as np
import jax, jax.numpy as jnp

N = 256 * 1024 * 1024 // 2   # 128M bf16 = 256MB
x = jnp.ones((N,), jnp.bfloat16)
ITERS = 20

@jax.jit
def loop(x):
    def body(i, x):
        return x * jnp.bfloat16(1.0000001)
    return jax.lax.fori_loop(0, ITERS, body, x)

out = loop(x); out.block_until_ready()
t0 = time.perf_counter()
out = loop(x); out.block_until_ready()
dt = (time.perf_counter() - t0) / ITERS
traffic = 2 * N * 2  # read + write
print(f"xla elementwise: {dt*1e3:.2f} ms/iter, {traffic/dt/1e9:.0f} GB/s")

# reduction (read-only)
@jax.jit
def loop2(x):
    def body(i, acc):
        return acc + jnp.sum((x + acc * 1e-30).astype(jnp.float32))
    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
out = loop2(x); _ = float(out)
t0 = time.perf_counter()
out = loop2(x); _ = float(out)
dt = (time.perf_counter() - t0) / ITERS
print(f"xla reduce: {dt*1e3:.2f} ms/iter, {N*2/dt/1e9:.0f} GB/s read")
