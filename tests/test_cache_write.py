"""Golden tests for the fresh-prefill Pallas cache writer (interpret
mode — the TPU path shares the same block maps and aliasing)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from turboinfer_tpu.kernels.pallas.cache_write import cache_write_fresh


@pytest.mark.parametrize("L,B,Hkv,T,D,S", [
    (3, 2, 4, 1024, 128, 512),
    (2, 1, 8, 512, 128, 512),
    (2, 3, 2, 2048, 256, 1024),
])
def test_writer_matches_dus(L, B, Hkv, T, D, S):
    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.normal(size=(L, B, Hkv, T, D)), jnp.float32)
    new = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    for li in (0, L - 1):
        out = cache_write_fresh(cache, new, li, interpret=True)
        ref = cache.at[li, :, :, :S].set(new)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_writer_rejects_unfit_shapes():
    cache = jnp.zeros((2, 1, 4, 512, 128), jnp.float32)
    # S > T silently clamped before the guard existed — must be None
    assert cache_write_fresh(cache, jnp.zeros((1, 4, 1024, 128)),
                             0, interpret=True) is None
    # dtype mismatch
    assert cache_write_fresh(cache, jnp.zeros((1, 4, 512, 128),
                                              jnp.bfloat16),
                             0, interpret=True) is None
    # lane-misaligned D
    c2 = jnp.zeros((2, 1, 4, 512, 64), jnp.float32)
    assert cache_write_fresh(c2, jnp.zeros((1, 4, 512, 64)),
                             0, interpret=True) is None


def test_writer_under_scan_traced_layer_index():
    """The layer id is traced inside the engine's layer scan — the
    scalar-prefetched index map must follow it."""
    L, B, Hkv, T, D, S = 4, 1, 2, 512, 128, 256
    cache = jnp.zeros((L, B, Hkv, T, D), jnp.float32)
    new = jnp.ones((B, Hkv, S, D), jnp.float32)

    @jax.jit
    def run(cache):
        def body(c, li):
            c = cache_write_fresh(c, new * (li + 1).astype(jnp.float32),
                                  li, interpret=True)
            return c, None
        c, _ = jax.lax.scan(body, cache, jnp.arange(L, dtype=jnp.int32))
        return c

    out = np.asarray(run(cache))
    for li in range(L):
        np.testing.assert_array_equal(out[li, :, :, :S], li + 1.0)
        np.testing.assert_array_equal(out[li, :, :, S:], 0.0)
