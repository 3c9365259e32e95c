import time
import numpy as np
import jax, jax.numpy as jnp

N = 128 * 1024 * 1024 // 2   # 128MB bf16
x = jnp.ones((N,), jnp.bfloat16)
y = jnp.ones((N,), jnp.bfloat16)
ITERS = 20

@jax.jit
def fib(x, y):
    def body(i, xy):
        x, y = xy
        return (y, (x + y) * jnp.bfloat16(0.6))
    return jax.lax.fori_loop(0, ITERS, body, (x, y))

out = fib(x, y); out[1].block_until_ready()
t0 = time.perf_counter()
out = fib(x, y); out[1].block_until_ready()
dt = (time.perf_counter() - t0) / ITERS
traffic = 3 * N * 2
print(f"xla fib elementwise: {dt*1e3:.2f} ms/iter, {traffic/dt/1e9:.0f} GB/s")
