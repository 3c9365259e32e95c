"""Pure streaming ceiling: kernel reads blocks, writes nothing useful."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _kernel(k_ref, v_ref, o_ref, acc_ref, *, nt):
    t = pl.program_id(1)
    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += k_ref[0, 0, :8].astype(jnp.float32) + v_ref[0, 0, :8].astype(jnp.float32)
    @pl.when(t == nt - 1)
    def _():
        o_ref[0, 0] = acc_ref[:].astype(o_ref.dtype)

def stream(k_cache, v_cache, TT):
    B, Hkv, T, D = k_cache.shape
    nt = T // TT
    kern = functools.partial(_kernel, nt=nt)
    return pl.pallas_call(kern,
        grid=(B * Hkv, nt),
        in_specs=[pl.BlockSpec((1, 1, TT, D), lambda h, t: (0, h, t, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, TT, D), lambda h, t: (0, h, t, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, D), lambda h, t: (0, h, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Hkv, 8, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((8, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(k_cache, v_cache)

B, Hkv, D, T = 1, 32, 128, 2048
rng = np.random.RandomState(0)
k = jnp.asarray(rng.randn(B, Hkv, T, D).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.randn(B, Hkv, T, D).astype(np.float32)).astype(jnp.bfloat16)
ITERS = 50
bytes_per = 2 * B * Hkv * T * D * 2
for TT in (512, 1024, 2048):
    f = functools.partial(stream, TT=TT)
    @jax.jit
    def loop(k, v):
        def body(i, acc):
            o = f(k + acc * 1e-9, v)   # dependency chains through k
            return acc + o[0, 0, 0, 0].astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, jnp.bfloat16(0.0))
    out = loop(k, v); _ = float(out)
    t0 = time.perf_counter()
    out = loop(k, v); _ = float(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"DMA-only TT={TT}: {dt*1e6:.0f} us, {bytes_per/dt/1e9:.0f} GB/s", flush=True)
