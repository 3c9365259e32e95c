"""Ring attention + Ulysses tests on the 8-virtual-device CPU mesh.

SURVEY.md §4: multi-device tests the reference never had, via
--xla_force_host_platform_device_count (no pod required).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from turboinfer_tpu.kernels import ops
from turboinfer_tpu.parallel import context as long_context, mesh as pmesh


@pytest.fixture(scope="module")
def ring_mesh():
    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs >= 2 devices")
    return pmesh.make_mesh((n, 1), devices=jax.devices()[:n])


def _ref(q, k, v, causal=True):
    # time-major -> head-major for the reference implementation
    return ops.attention_prefill_ref(q, k.transpose(0, 2, 1, 3),
                                     v.transpose(0, 2, 1, 3), causal=causal)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_reference(ring_mesh, causal):
    rng = np.random.RandomState(0)
    B, S, H, D = 2, 64, 4, 16
    q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    got = long_context.ring_attention(q, k, v, mesh=ring_mesh,
                                      axis="data", causal=causal)
    want = _ref(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ring_gqa(ring_mesh):
    rng = np.random.RandomState(1)
    B, S, Hq, Hkv, D = 1, 32, 8, 2, 16
    q = jnp.asarray(rng.randn(B, S, Hq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, Hkv, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, Hkv, D).astype(np.float32))
    got = long_context.ring_attention(q, k, v, mesh=ring_mesh, axis="data")
    krep = jnp.repeat(k, Hq // Hkv, axis=2)
    vrep = jnp.repeat(v, Hq // Hkv, axis=2)
    want = _ref(q, krep, vrep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("causal", [True, False])
def test_ulysses_matches_reference(ring_mesh, causal):
    rng = np.random.RandomState(2)
    n = ring_mesh.shape["data"]
    B, S, H, D = 2, 8 * n, n * 2, 16     # Hq divisible by axis size
    q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    got = long_context.ulysses_attention(q, k, v, mesh=ring_mesh,
                                         axis="data", causal=causal)
    want = _ref(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ring_rejects_indivisible(ring_mesh):
    q = jnp.zeros((1, 9, 4, 16))
    with pytest.raises(ValueError, match="not divisible"):
        long_context.ring_attention(q, q, q, mesh=ring_mesh, axis="data")
