"""Prototype: nibble->bf16 via exponent-bias bit trick, vs cast chain."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel_bias(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, nk, group_size, out_dtype):
    k = pl.program_id(2)
    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    x_lo = xlo_ref[:].astype(jnp.bfloat16)
    x_hi = xhi_ref[:].astype(jnp.bfloat16)
    qp = q_ref[:]
    s = s_ref[0].astype(jnp.bfloat16)
    TK2, TN = qp.shape
    G = 2 * TK2 // group_size
    g2 = group_size // 2
    q16 = qp.astype(jnp.uint16)
    lo16 = (q16 & 0x000F) | 0x4300
    hi16 = ((q16 >> 4) & 0x000F) | 0x4300
    lo = pltpu.bitcast(lo16, jnp.bfloat16) - jnp.bfloat16(136.0)
    hi = pltpu.bitcast(hi16, jnp.bfloat16) - jnp.bfloat16(136.0)
    w_lo = (lo.reshape(G, g2, TN) * s[:, None, :]).reshape(TK2, TN)
    w_hi = (hi.reshape(G, g2, TN) * s[:, None, :]).reshape(TK2, TN)
    acc_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))
    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)

def qmm4(x2, data, scales, *, K, N, G_SZ, TM, TN, TK):
    M = x2.shape[0]
    nk = K // TK
    kern = functools.partial(kernel_bias, nk=nk, group_size=G_SZ, out_dtype=x2.dtype)
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

# correctness vs reference dequant on TPU
from turboinfer_tpu.core.qtensor import quantize
from turboinfer_tpu.config import QuantType
from turboinfer_tpu.kernels import ops
rng = np.random.RandomState(0)
K, N = 4096, 4096
w = jnp.asarray(rng.randn(K, N).astype(np.float32))
qt = quantize(w, QuantType.INT4, group_size=64)
x = jnp.asarray(rng.randn(8, K).astype(np.float32)).astype(jnp.bfloat16)
got = qmm4(x, qt.data, qt.scales, K=K, N=N, G_SZ=64, TM=8, TN=N, TK=512)
want = ops.qmatmul_ref(x, qt)
rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))) /
            (float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-9))
print("bias-trick relerr:", rel)
assert rel < 2e-2
print("OK")
