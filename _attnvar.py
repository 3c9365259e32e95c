"""Decode attention variants: which dot orientation streams fastest."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

def make_kernel(variant):
    def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                *, nt, tt, scale):
        b = pl.program_id(0)
        t = pl.program_id(2)
        @pl.when(t == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)
        kv_len = len_ref[b]
        @pl.when(t * tt < kv_len)
        def _():
            q = q_ref[0, 0].astype(jnp.float32) * scale
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            if variant == "qkT":
                s = jax.lax.dot_general(q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            else:  # kqT: transpose the small q operand instead
                s_t = jax.lax.dot_general(k.astype(jnp.float32), q, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)  # [TT, Ghp]
                s = s_t.T
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + t * tt
            s = jnp.where(col < kv_len, s, NEG_INF)
            m_prev = m_ref[:, 0:1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        @pl.when(t == nt - 1)
        def _():
            denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
            o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)
    return _kernel

def decode(q4, k_cache, v_cache, kv_len, variant, TT):
    B, Hkv, Ghp, D = q4.shape
    T = k_cache.shape[2]
    nt = T // TT
    kern = functools.partial(make_kernel(variant), nt=nt, tt=TT, scale=1.0 / D ** 0.5)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, Hkv, nt),
        in_specs=[pl.BlockSpec((1, 1, Ghp, D), lambda b, h, t, lr: (b, h, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, TT, D), lambda b, h, t, lr: (b, h, t, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, TT, D), lambda b, h, t, lr: (b, h, t, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, Ghp, D), lambda b, h, t, lr: (b, h, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Ghp, 128), jnp.float32),
                        pltpu.VMEM((Ghp, 128), jnp.float32),
                        pltpu.VMEM((Ghp, D), jnp.float32)])
    return pl.pallas_call(kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Ghp, D), q4.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(kv_len.astype(jnp.int32), q4, k_cache, v_cache)

B, Hkv, D, T = 1, 32, 128, 2048
rng = np.random.RandomState(0)
q4 = jnp.asarray(rng.randn(B, Hkv, 8, D).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.randn(B, Hkv, T, D).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.randn(B, Hkv, T, D).astype(np.float32)).astype(jnp.bfloat16)
kv_len = jnp.asarray([T], jnp.int32)
ITERS = 50
bytes_per = 2 * B * Hkv * T * D * 2

for variant in ("qkT", "kqT"):
    for TT in (512, 1024, 2048):
        if T % TT: continue
        f = functools.partial(decode, variant=variant, TT=TT)
        @jax.jit
        def loop(q4, k, v, kv_len):
            def body(i, qa):
                o = f(qa, k, v, kv_len)
                return qa + o * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, q4)
        try:
            out = loop(q4, k, v, kv_len); _ = np.asarray(out).sum()
            t0 = time.perf_counter()
            out = loop(q4, k, v, kv_len); _ = np.asarray(out).sum()
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{variant} TT={TT}: {dt*1e6:.0f} us, {bytes_per/dt/1e9:.0f} GB/s", flush=True)
        except Exception as e:
            print(f"{variant} TT={TT}: FAIL {str(e)[:100]}", flush=True)
