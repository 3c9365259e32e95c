"""Tile-config experiments for the qmm kernel on real TPU."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel_int4(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, nk, group_size, out_dtype):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    x_lo = xlo_ref[:].astype(jnp.bfloat16)
    x_hi = xhi_ref[:].astype(jnp.bfloat16)
    qp = q_ref[:]
    s = s_ref[0].astype(jnp.float32)
    TK2, TN = qp.shape
    G = 2 * TK2 // group_size
    g2 = group_size // 2
    qi = qp.astype(jnp.int32)
    lo = ((qi & 0x0F) - 8).astype(jnp.float32).reshape(G, g2, TN)
    hi = ((qi >> 4) - 8).astype(jnp.float32).reshape(G, g2, TN)
    w_lo = (lo * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)
    w_hi = (hi * s[:, None, :]).reshape(TK2, TN).astype(jnp.bfloat16)
    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))
    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)

def qmm4(x2, data, scales, *, K, N, G_SZ, TM, TN, TK):
    M = x2.shape[0]
    nk = K // TK
    kern = functools.partial(kernel_int4, nk=nk, group_size=G_SZ, out_dtype=x2.dtype)
    gk = TK // G_SZ
    scales3 = scales.reshape(nk, gk, N)
    g2 = G_SZ // 2
    xg = x2.reshape(M, K // G_SZ, G_SZ)
    x_lo = xg[:, :, :g2].reshape(M, K // 2)
    x_hi = xg[:, :, g2:].reshape(M, K // 2)
    half_spec = pl.BlockSpec((TM, TK // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(M // TM, N // TN, nk),
        in_specs=[half_spec, half_spec,
                  pl.BlockSpec((TK // 2, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, gk, TN), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x_lo, x_hi, data, scales3)

G_SZ = 64
rng = np.random.RandomState(0)
for (K, N) in [(4096, 11008), (11008, 4096), (4096, 4096)]:
    data = jnp.asarray(rng.randint(0, 255, (K // 2, N)).astype(np.uint8))
    scales = jnp.full((K // G_SZ, N), 0.01, jnp.bfloat16)
    x = jnp.asarray(rng.randn(8, K).astype(np.float32)).astype(jnp.bfloat16)
    cfgs = []
    for TK in (256, 512, 1024, 2048):
        if K % TK or TK % G_SZ: continue
        for TN in (256, 512, N):
            if N % TN: continue
            if (TK // 2) * TN > 2_500_000: continue   # VMEM block cap
            cfgs.append((TK, TN))
    for (TK, TN) in cfgs:
        try:
            f = jax.jit(functools.partial(qmm4, K=K, N=N, G_SZ=G_SZ, TM=8, TN=TN, TK=TK))
            # chain loop to avoid dispatch overhead
            @jax.jit
            def loop(x, d, s):
                def body(i, xa):
                    y = f(xa, d, s)
                    return xa + y[:, :xa.shape[1]].astype(xa.dtype) * 1e-9 if y.shape[1] >= xa.shape[1] else xa + jnp.pad(y, ((0,0),(0,xa.shape[1]-y.shape[1]))).astype(xa.dtype) * 1e-9
                return jax.lax.fori_loop(0, 30, body, x)
            loop(x, data, scales).block_until_ready()
            t0 = time.perf_counter()
            loop(x, data, scales).block_until_ready()
            dt = (time.perf_counter() - t0) / 30
            wb = K * N // 2 + (K // G_SZ) * N * 2
            print(f"K={K} N={N} TK={TK} TN={TN}: {dt*1e6:7.0f} us  {wb/dt/1e9:6.0f} GB/s", flush=True)
        except Exception as e:
            print(f"K={K} N={N} TK={TK} TN={TN}: FAIL {str(e)[:80]}", flush=True)
