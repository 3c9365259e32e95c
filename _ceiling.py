"""Measure qmm streaming ceiling: minimal-VPU kernel through 7B decode."""
import functools, time, os
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE = os.environ.get("MODE", "minimal")

def kern(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk, group_size, out_dtype):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    x = x_ref[:].astype(jnp.bfloat16)          # [TM, TK//2]
    qp = q_ref[:]                               # [TK//2, TN] u8
    if MODE == "minimal":
        w = qp.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif MODE == "nodequant":
        # even cheaper: bitcast pairs of bytes to bf16 (zero convert cost)
        w = pltpu.bitcast(qp.reshape(qp.shape[0] // 2, 2, qp.shape[1])[:, 0], jnp.uint8)
        acc_ref[:] += jnp.dot(x[:, :qp.shape[0] // 2].astype(jnp.bfloat16),
                              qp[: qp.shape[0] // 2].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)

def qmm_min(x2, data, scales, *, K, N, G_SZ=64):
    M = x2.shape[0]
    TN = N
    TK = 512
    while K % TK: TK //= 2
    while (TK // 2) * TN > 3_145_728: TK //= 2
    nk = K // TK
    kfun = functools.partial(kern, nk=nk, group_size=G_SZ, out_dtype=x2.dtype)
    gk = TK // G_SZ
    scales3 = scales.reshape(nk, gk, N)
    x_half = x2[:, : K // 2]
    return pl.pallas_call(
        kfun, grid=(1, 1, nk),
        in_specs=[pl.BlockSpec((M, TK // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TK // 2, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, gk, TN), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, TN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x_half, data, scales3)

# 7B-ish stack of 32x4 matmuls streaming 3.9GB
rng = np.random.RandomState(0)
L = 32
shapes = [(4096, 4096), (4096, 11008), (11008, 4096), (4096, 11008)]
weights = []
for (K, N) in shapes:
    data = jax.random.randint(jax.random.PRNGKey(0), (L, K // 2, N), 0, 255, jnp.int32).astype(jnp.uint8)
    scales = jnp.full((L, K // 64, N), 0.01, jnp.bfloat16)
    weights.append((data, scales, K, N))

@jax.jit
def step(x, weights):
    def layer(x, lw):
        for (d, s, K, N) in zip(*[iter([])], []):
            pass
        return x
    def body(x, per_layer):
        outs = []
        for idx, (K, N) in enumerate(shapes):
            d, s = per_layer[2 * idx], per_layer[2 * idx + 1]
            y = qmm_min(jnp.pad(x, ((0, 0), (0, K - x.shape[1]))) if x.shape[1] < K else x[:, :K], d, s, K=K, N=N)
            outs.append(y[:, :4096] if N >= 4096 else jnp.pad(y, ((0,0),(0,4096-N))))
        x = x + sum(outs) * 1e-9
        return x
    flat = []
    for (d, s, K, N) in weights:
        flat.extend([d, s])
    def scan_body(x, layer_slices):
        return body(x, layer_slices), None
    x, _ = jax.lax.scan(scan_body, x, tuple(flat))
    return x

x = jnp.ones((8, 4096), jnp.bfloat16)
out = step(x, weights)
_ = np.asarray(out).sum()
t0 = time.perf_counter()
out = step(x, weights)
_ = np.asarray(out).sum()
dt = time.perf_counter() - t0
total_bytes = sum(L * (K * N // 2 + (K // 64) * N * 2) for (K, N) in shapes)
print(f"MODE={MODE}: {dt*1e3:.1f} ms, stream {total_bytes/dt/1e9:.0f} GB/s")
