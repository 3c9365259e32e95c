"""Unit tests for core compute ops vs numpy golden models.

Reference counterparts: tests/test_tensor_engine.cpp, test_math_ops.cpp,
test_advanced_math.cpp, test_fast_attention.cpp — upgraded from loose
no-throw checks to numerical assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turboinfer_tpu.config import QuantType, RopeMode
from turboinfer_tpu.core.qtensor import quantize
from turboinfer_tpu.kernels import ops


def test_rms_norm_matches_numpy():
    x = np.random.randn(2, 5, 64).astype(np.float32)
    w = np.random.randn(64).astype(np.float32)
    got = np.asarray(ops.rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-5))
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_numpy():
    x = np.random.randn(3, 32).astype(np.float32)
    w = np.random.randn(32).astype(np.float32)
    b = np.random.randn(32).astype(np.float32)
    got = np.asarray(ops.layer_norm(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), 1e-5))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mu) / np.sqrt(var + 1e-5) * w + b
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_activations():
    x = np.linspace(-4, 4, 64, dtype=np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(ops.relu(xj)), np.maximum(x, 0))
    sig = 1 / (1 + np.exp(-x))
    np.testing.assert_allclose(np.asarray(ops.silu(xj)), x * sig, rtol=1e-5)
    g = np.random.randn(16).astype(np.float32)
    u = np.random.randn(16).astype(np.float32)
    got = np.asarray(ops.swiglu(jnp.asarray(g), jnp.asarray(u)))
    ref = g / (1 + np.exp(-g)) * u
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.parametrize("mode", [RopeMode.INTERLEAVED, RopeMode.HALF])
def test_rope_properties(mode):
    """RoPE must preserve norms and be relative: <R(q,m), R(k,n)> depends
    only on m-n (reference implementation: tensor_engine.cpp:1510-1624)."""
    D = 32
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 1, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, D))

    def rot(x, pos):
        p = jnp.full((1, 1), pos, jnp.int32)
        return ops.apply_rope(x, p, 10000.0, mode)

    # norm preservation
    np.testing.assert_allclose(float(jnp.linalg.norm(rot(q, 7))),
                               float(jnp.linalg.norm(q)), rtol=1e-5)
    # relative property
    d1 = float(jnp.vdot(rot(q, 10), rot(k, 3)))
    d2 = float(jnp.vdot(rot(q, 27), rot(k, 20)))
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)
    # position 0 is identity for both conventions
    np.testing.assert_allclose(np.asarray(rot(q, 0)), np.asarray(q),
                               rtol=1e-6, atol=1e-6)


def test_rope_interleaved_matches_manual():
    """Golden check of the interleaved pair rotation at one position."""
    D = 4
    x = jnp.asarray(np.arange(D, dtype=np.float32)[None, None, None])
    pos = jnp.full((1, 1), 2, jnp.int32)
    got = np.asarray(ops.apply_rope(x, pos, 10000.0,
                                    RopeMode.INTERLEAVED))[0, 0, 0]
    theta = 10000.0
    ref = np.zeros(D, np.float32)
    for i in range(D // 2):
        f = theta ** (-2.0 * i / D)
        a = 2 * f
        c, s = np.cos(a), np.sin(a)
        x0, x1 = float(x[0, 0, 0, 2 * i]), float(x[0, 0, 0, 2 * i + 1])
        ref[2 * i] = x0 * c - x1 * s
        ref[2 * i + 1] = x0 * s + x1 * c
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("qtype", [QuantType.INT8, QuantType.INT4])
def test_qmatmul_close_to_fp(qtype):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (4, 8, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (128, 64), jnp.float32) * 0.1
    qt = quantize(w, qtype, group_size=32)
    y_fp = np.asarray(x @ w)
    y_q = np.asarray(ops.qmatmul(x, qt))
    rel = np.linalg.norm(y_q - y_fp) / np.linalg.norm(y_fp)
    # int4 symmetric absmax/7 on gaussian weights gives ~10% rel error —
    # the reference's own accuracy expectation is ~5% "conservative"
    # (quantization.cpp:597-607) measured on logprobs, not raw GEMM.
    assert rel < (0.01 if qtype == QuantType.INT8 else 0.12), rel


def test_qmatmul_fp_passthrough():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16))
    w = jax.random.normal(jax.random.PRNGKey(5), (16, 8))
    np.testing.assert_allclose(np.asarray(ops.qmatmul(x, w)),
                               np.asarray(x @ w), rtol=1e-5, atol=1e-5)


def test_softmax_temperature():
    x = jnp.asarray(np.random.randn(4, 16).astype(np.float32))
    p = np.asarray(ops.softmax(x, temperature=2.0))
    ref = jax.nn.softmax(x / 2.0, axis=-1)
    np.testing.assert_allclose(p, np.asarray(ref), rtol=1e-5)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)


def _np_attention(q, k, v, causal=True):
    """numpy golden scaled-dot-product attention. q:[B,S,H,D] k,v:[B,T,H,D]."""
    B, S, H, D = q.shape
    T = k.shape[1]
    out = np.zeros_like(q)
    for b in range(B):
        for h in range(H):
            sc = q[b, :, h] @ k[b, :, h].T / np.sqrt(D)
            if causal:
                mask = np.tril(np.ones((S, T)), k=T - S)
                sc = np.where(mask > 0, sc, -1e30)
            e = np.exp(sc - sc.max(-1, keepdims=True))
            p = e / e.sum(-1, keepdims=True)
            out[b, :, h] = p @ v[b, :, h]
    return out


def test_attention_prefill_matches_numpy():
    B, S, H, D = 2, 8, 4, 16
    rng = np.random.RandomState(0)
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    got = np.asarray(ops.attention_prefill_ref(
        jnp.asarray(q), jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3)), causal=True))
    ref = _np_attention(q, k, v, causal=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_attention_decode_matches_prefill_last_row():
    """The decode kernel on a cache of length T must equal the last row of
    full attention over those T tokens (reference test pattern:
    tests/test_fast_attention.cpp:34-104 validates fast incremental vs
    standard attention)."""
    B, T, H, D = 2, 12, 4, 16
    Tmax = 32
    rng = np.random.RandomState(1)
    k = np.zeros((B, Tmax, H, D), np.float32)
    v = np.zeros((B, Tmax, H, D), np.float32)
    k[:, :T] = rng.randn(B, T, H, D)
    v[:, :T] = rng.randn(B, T, H, D)
    q = rng.randn(B, 1, H, D).astype(np.float32)

    full = _np_attention(q, k[:, :T], v[:, :T], causal=False)[:, 0]
    got = np.asarray(ops.attention_decode_ref(
        jnp.asarray(q[:, 0]), jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3)),
        jnp.full((B,), T, jnp.int32)))
    np.testing.assert_allclose(got, full, rtol=1e-4, atol=1e-5)


def test_attention_gqa_repeats_heads():
    B, S, Hq, Hkv, D = 1, 4, 8, 2, 16
    rng = np.random.RandomState(2)
    q = rng.randn(B, S, Hq, D).astype(np.float32)
    k = rng.randn(B, S, Hkv, D).astype(np.float32)
    v = rng.randn(B, S, Hkv, D).astype(np.float32)
    got = np.asarray(ops.attention_prefill_ref(
        jnp.asarray(q), jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3))))
    krep = np.repeat(k, Hq // Hkv, axis=2)
    vrep = np.repeat(v, Hq // Hkv, axis=2)
    ref = _np_attention(q, krep, vrep)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_attention_kv_len_masks_padding():
    B, S, H, D = 1, 4, 2, 8
    rng = np.random.RandomState(3)
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    # Poison the tail; kv_len=2 must make it invisible for queries 0..1.
    k2, v2 = k.copy(), v.copy()
    k2[:, 2:] = 1e3
    v2[:, 2:] = 1e3
    got = np.asarray(ops.attention_prefill_ref(
        jnp.asarray(q), jnp.asarray(k2.transpose(0, 2, 1, 3)),
        jnp.asarray(v2.transpose(0, 2, 1, 3)),
        kv_len=jnp.asarray([2], jnp.int32)))
    ref = _np_attention(q[:, :2], k[:, :2], v[:, :2])
    np.testing.assert_allclose(got[:, :2], ref, rtol=1e-4, atol=1e-5)
