"""Unrolled (no-scan) variant: weights consumed directly, no slice copies."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(x_ref, q_ref, o_ref, acc_ref, *, nk, out_dtype):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    x = x_ref[:].astype(jnp.bfloat16)
    w = q_ref[:].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)

def qmm_min(x2, data, *, K, N):
    M = x2.shape[0]
    TN = N
    TK = 512
    while K % TK: TK //= 2
    while (TK // 2) * TN > 3_145_728: TK //= 2
    nk = K // TK
    kfun = functools.partial(kern, nk=nk, out_dtype=x2.dtype)
    x_half = x2[:, : K // 2]
    return pl.pallas_call(
        kfun, grid=(1, 1, nk),
        in_specs=[pl.BlockSpec((M, TK // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TK // 2, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, TN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x_half, data)

rng = np.random.RandomState(0)
L = 32
shapes = [(4096, 4096), (4096, 11008), (11008, 4096), (4096, 11008)]
weights = []   # flat per-layer list, NOT stacked
key = jax.random.PRNGKey(0)
for l in range(L):
    per = []
    for (K, N) in shapes:
        d = jax.random.randint(key, (K // 2, N), 0, 255, jnp.int32).astype(jnp.uint8)
        per.append(d)
    weights.append(per)

@jax.jit
def step(x, weights):
    for per in weights:
        outs = []
        for (d, (K, N)) in zip(per, shapes):
            xin = x if x.shape[1] >= K else jnp.pad(x, ((0, 0), (0, K - x.shape[1])))
            y = qmm_min(xin[:, :K], d, K=K, N=N)
            outs.append(y[:, :4096])
        x = x + sum(outs) * 1e-9
    return x

x = jnp.ones((8, 4096), jnp.bfloat16)
out = step(x, weights)
_ = np.asarray(out).sum()
t0 = time.perf_counter()
out = step(x, weights)
_ = np.asarray(out).sum()
dt = time.perf_counter() - t0
total_bytes = sum(L * (K * N // 2) for (K, N) in shapes)
print(f"unrolled minimal: {dt*1e3:.1f} ms, stream {total_bytes/dt/1e9:.0f} GB/s")
