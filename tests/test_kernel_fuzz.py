"""Randomized-shape fuzz: Pallas kernels (interpret mode) vs the jnp
golden forms across a seeded grid of irregular shapes — the shape
combinations real checkpoints produce (DeepSeek's 10944/1408 widths,
GQA ratios, ragged fills) are exactly where tile selection and
eligibility gating can go wrong silently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from turboinfer_tpu.config import QuantType
from turboinfer_tpu.core.qtensor import QTensor, quantize
from turboinfer_tpu.kernels import ops
from turboinfer_tpu.kernels.pallas import decode_attention, qmm


def _qmm_case(rng, m, k, n, bits, gs, sym):
    w = jnp.asarray(rng.randn(k, n) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(m, k) * 0.5, jnp.float32)
    qt = quantize(w, QuantType.INT4 if bits == 4 else QuantType.INT8,
                  group_size=gs, symmetric=sym)
    got = qmm.qmatmul_pallas(x, qt, interpret=True)
    want = ops.qmatmul_ref(x, qt)
    if got is None:
        return "skipped"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    return "ran"


@pytest.mark.parametrize("seed", range(4))
def test_qmm_fuzz_shapes(seed):
    """Irregular (M, K, N, bits, group) combinations; eligibility may
    route some to None (caller falls back) but whatever runs must match
    the golden. At least one case per seed must take the kernel."""
    rng = np.random.RandomState(100 + seed)
    ks = [256, 384, 512, 1408, 704]
    ns = [256, 384, 512, 1000, 1408]
    ran = 0
    for _ in range(6):
        m = int(rng.choice([1, 3, 8, 17]))
        k = int(rng.choice(ks))
        n = int(rng.choice(ns))
        bits = int(rng.choice([4, 8]))
        gs = int(rng.choice([32, 64, 128]))
        if k % gs:
            continue
        if _qmm_case(rng, m, k, n, bits, gs,
                     sym=bool(rng.randint(2))) == "ran":
            ran += 1
    # one known-eligible anchor so every seed exercises the kernel even
    # when the random draws all route to the fallback
    assert _qmm_case(rng, 8, 512, 512, 4, 64, sym=True) == "ran"


@pytest.mark.parametrize("seed", range(3))
def test_fused_decode_fuzz_shapes(seed):
    """Fused-head decode kernel across random (B, Hq, Hkv, D, T) and
    ragged per-sequence fills."""
    rng = np.random.RandomState(7 + seed)
    for _ in range(4):
        hkv = int(rng.choice([1, 2, 4, 8]))
        gh = int(rng.choice([1, 2, 3, 7]))
        hq = hkv * gh
        d = int(rng.choice([32, 64, 96, 128]))
        if (hkv * d) % 128:
            continue
        b = int(rng.choice([1, 2, 5]))
        t = int(rng.choice([8, 40, 128, 264]))
        q = jnp.asarray(rng.randn(b, hq, d), jnp.float32)
        k2 = jnp.asarray(rng.randn(2, b, t, hkv * d), jnp.float32)
        v2 = jnp.asarray(rng.randn(2, b, t, hkv * d), jnp.float32)
        kv_len = jnp.asarray(rng.randint(1, t + 1, size=b), jnp.int32)
        w = int(rng.choice([0, 16]))
        window = w or None
        got = decode_attention.decode_fused_pallas(
            q, k2, v2, kv_len, layer_index=1, window=window,
            interpret=True)
        assert got is not None, (hq, hkv, d, t)
        want = ops.attention_decode_fused_ref(q, k2[1], v2[1], kv_len,
                                              window=window)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=str((b, hq, hkv, d, t, window)))


@pytest.mark.parametrize("seed", range(2))
def test_head_major_decode_fuzz_shapes(seed):
    """Head-major decode kernel (D=128 only in interpret parity too,
    matching the on-chip gate) across GQA ratios and ragged fills —
    bf16-path and int8-scaled-path both fuzzed per draw."""
    from turboinfer_tpu.models.common import decode_kv, encode_kv_scaled
    rng = np.random.RandomState(31 + seed)
    for _ in range(3):
        hkv = int(rng.choice([1, 2, 4]))
        hq = hkv * int(rng.choice([1, 2, 4]))
        d = 128
        b = int(rng.choice([1, 3]))
        t = int(rng.choice([16, 64, 200]))
        q = jnp.asarray(rng.randn(b, hq, d), jnp.float32)
        kc = jnp.asarray(rng.randn(2, b, hkv, t, d), jnp.float32)
        vc = jnp.asarray(rng.randn(2, b, hkv, t, d), jnp.float32)
        kv_len = jnp.asarray(rng.randint(1, t + 1, size=b), jnp.int32)
        got = decode_attention.decode_pallas(q, kc, vc, kv_len,
                                             layer_index=0, interpret=True)
        assert got is not None
        want = ops.attention_decode_ref(q, kc[0], vc[0], kv_len)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        k8, ks = encode_kv_scaled(kc, jnp.int8)
        v8, vs = encode_kv_scaled(vc, jnp.int8)
        got8 = decode_attention.decode_pallas(
            q, k8, v8, kv_len, layer_index=1, k_scale=ks, v_scale=vs,
            interpret=True)
        assert got8 is not None
        want8 = ops.attention_decode_ref(
            q, decode_kv(k8[1], jnp.float32, ks[1]),
            decode_kv(v8[1], jnp.float32, vs[1]), kv_len)
        np.testing.assert_allclose(np.asarray(got8), np.asarray(want8),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=str((b, hq, hkv, t)))
