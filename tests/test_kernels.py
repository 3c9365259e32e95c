"""Pallas kernel tests — interpret mode on CPU vs jnp golden models.

SURVEY.md §7.2: every kernel ships a pure-jnp reference and allclose
tests runnable without TPU hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from turboinfer_tpu.config import QuantType
from turboinfer_tpu.core.qtensor import quantize
from turboinfer_tpu.kernels import ops


RNG = np.random.RandomState(42)


def _rand(*shape):
    return jnp.asarray(RNG.randn(*shape).astype(np.float32))


class TestQmmKernel:
    @pytest.mark.parametrize("qtype,bits", [(QuantType.INT8, 8),
                                            (QuantType.INT4, 4)])
    @pytest.mark.parametrize("M,K,N", [(1, 256, 512), (4, 256, 512),
                                       (16, 512, 1024), (3, 512, 384),
                                       (9, 1024, 256)])
    def test_matches_reference(self, qtype, bits, M, K, N):
        from turboinfer_tpu.kernels.pallas import qmm
        w = _rand(K, N)
        x = _rand(M, K)
        qt = quantize(w, qtype, group_size=64)
        want = ops.qmatmul_ref(x, qt)
        got = qmm.qmatmul_pallas(x, qt, interpret=True)
        assert got is not None, "kernel should be eligible for this shape"
        rel = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        assert rel < 2e-2, f"rel err {rel}"

    def test_batched_leading_dims(self):
        from turboinfer_tpu.kernels.pallas import qmm
        w = _rand(256, 512)
        x = _rand(2, 3, 256)
        qt = quantize(w, QuantType.INT8, group_size=64)
        got = qmm.qmatmul_pallas(x, qt, interpret=True)
        want = ops.qmatmul_ref(x, qt)
        assert got.shape == (2, 3, 512)
        rel = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        assert rel < 2e-2

    @pytest.mark.parametrize("M,K,N", [(1, 512, 384), (4, 1024, 512),
                                       (16, 512, 256)])
    def test_factored_group256(self, M, K, N):
        """group_size >= 256 routes to the factored-scale int4 kernel
        (scale applied to per-group partial sums, not per weight)."""
        from turboinfer_tpu.kernels.pallas import qmm
        w = _rand(K, N)
        x = _rand(M, K)
        qt = quantize(w, QuantType.INT4, group_size=256)
        # decode-shaped M: the dispatch's own mode picker must say
        # "wide" (the predicate the kernel actually uses)
        assert qmm._fact_mode(qt.bits, qt.group_size, 8, 512) == "wide"
        want = ops.qmatmul_ref(x, qt)
        got = qmm.qmatmul_pallas(x, qt, interpret=True)
        assert got is not None
        rel = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        assert rel < 2e-2, f"rel err {rel}"

    def test_factored_group256_stacked(self):
        from turboinfer_tpu.kernels.pallas import qmm
        L, K, N = 3, 512, 384
        ws = [_rand(K, N) for _ in range(L)]
        qts = [quantize(w, QuantType.INT4, group_size=256) for w in ws]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
        x = _rand(4, K)
        for li in range(L):
            got = qmm.qmatmul_pallas_stacked(x, stacked, li, interpret=True)
            assert got is not None
            want = ops.qmatmul_ref(x, qts[li])
            rel = float(jnp.max(jnp.abs(got - want))
                        / (jnp.max(jnp.abs(want)) + 1e-9))
            assert rel < 2e-2, f"layer {li} rel err {rel}"

    @pytest.mark.parametrize("qtype", [QuantType.INT8, QuantType.INT4])
    @pytest.mark.parametrize("gs", [64, 128, 256])
    def test_asymmetric_matches_reference(self, qtype, gs):
        """Asymmetric weights stay on the Pallas kernel: zero-points fold
        into the dequant (baseline) or the factored row-sum correction."""
        from turboinfer_tpu.kernels.pallas import qmm
        w = _rand(512, 384) + 0.3          # offset so zp is non-trivial
        qt = quantize(w, qtype, group_size=gs, symmetric=False)
        assert qt.zero_points is not None
        for M in (1, 4, 16):
            x = _rand(M, 512)
            got = qmm.qmatmul_pallas(x, qt, interpret=True)
            assert got is not None
            want = ops.qmatmul_ref(x, qt)
            rel = float(jnp.max(jnp.abs(got - want))
                        / (jnp.max(jnp.abs(want)) + 1e-9))
            assert rel < 2e-2, f"M={M} rel err {rel}"

    @pytest.mark.parametrize("gs", [32, 64, 128])
    @pytest.mark.parametrize("symmetric", [True, False])
    def test_masked_factored_small_groups(self, gs, symmetric):
        """Decode-shaped M at g in {32,64,128} routes to the MASKED
        factored kernel (pre-masked activation sub-group copies)."""
        from turboinfer_tpu.kernels.pallas import qmm
        K, N = 1024, 384
        w = _rand(K, N) + (0.0 if symmetric else 0.2)
        qt = quantize(w, QuantType.INT4, group_size=gs,
                      symmetric=symmetric)
        tiles = qmm._pick_tiles(8, K, N, 4, gs)
        assert tiles is not None
        assert qmm._fact_mode(4, gs, 8, tiles[2]) == "masked"
        for M in (1, 8):
            x = _rand(M, K)
            got = qmm.qmatmul_pallas(x, qt, interpret=True)
            assert got is not None
            want = ops.qmatmul_ref(x, qt)
            rel = float(jnp.max(jnp.abs(got - want))
                        / (jnp.max(jnp.abs(want)) + 1e-9))
            assert rel < 2e-2, f"M={M} rel err {rel}"

    def test_masked_factored_stacked(self):
        from turboinfer_tpu.kernels.pallas import qmm
        L, K, N = 3, 512, 384
        ws = [_rand(K, N) for _ in range(L)]
        qts = [quantize(w, QuantType.INT4, group_size=64) for w in ws]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
        stacked = qmm.prepare_scales(stacked)
        x = _rand(8, K)
        for li in range(L):
            got = qmm.qmatmul_pallas_stacked(x, stacked, li, interpret=True)
            assert got is not None
            want = ops.qmatmul_ref(x, qts[li])
            rel = float(jnp.max(jnp.abs(got - want))
                        / (jnp.max(jnp.abs(want)) + 1e-9))
            assert rel < 2e-2, f"layer {li} rel err {rel}"

    def test_asymmetric_stacked_prepared(self):
        """Stacked asym weights through prepare_scales (pre-tiled scales
        AND zero-points) must match the per-layer reference."""
        from turboinfer_tpu.kernels.pallas import qmm
        L, K, N = 2, 512, 384
        ws = [_rand(K, N) + 0.25 for _ in range(L)]
        qts = [quantize(w, QuantType.INT4, group_size=64, symmetric=False)
               for w in ws]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
        stacked = qmm.prepare_scales(stacked)
        assert stacked.zero_points.ndim == 4
        x = _rand(4, K)
        for li in range(L):
            got = qmm.qmatmul_pallas_stacked(x, stacked, li, interpret=True)
            assert got is not None
            want = ops.qmatmul_ref(x, qts[li])
            rel = float(jnp.max(jnp.abs(got - want))
                        / (jnp.max(jnp.abs(want)) + 1e-9))
            assert rel < 2e-2, f"layer {li} rel err {rel}"

    def test_unaligned_n_full_width_block(self):
        """Non-128-multiple N runs via a full-width (TN == N) block."""
        from turboinfer_tpu.kernels.pallas import qmm
        w = _rand(256, 130)
        x = _rand(4, 256)
        qt = quantize(w, QuantType.INT8, group_size=64)
        got = qmm.qmatmul_pallas(x, qt, interpret=True)
        assert got is not None
        want = ops.qmatmul_ref(x, qt)
        rel = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        assert rel < 2e-2

    def test_huge_n_narrow_tiles(self):
        """N beyond the full-width cap falls back to 128k-wide tiles."""
        from turboinfer_tpu.kernels.pallas import qmm
        w = _rand(64, 17408)        # > 16384 -> narrow tiling path
        x = _rand(2, 64)
        qt = quantize(w, QuantType.INT8, group_size=64)
        got = qmm.qmatmul_pallas(x, qt, interpret=True)
        assert got is not None
        want = ops.qmatmul_ref(x, qt)
        rel = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        assert rel < 2e-2


class TestAttentionKernels:
    def test_decode_matches_reference(self):
        from turboinfer_tpu.kernels.pallas import decode_attention
        B, Hq, Hkv, D, T = 2, 8, 4, 64, 256
        q = _rand(B, Hq, D)
        k = _rand(B, Hkv, T, D)
        v = _rand(B, Hkv, T, D)
        kv_len = jnp.asarray([100, 256], jnp.int32)
        got = decode_attention.decode_pallas(q, k, v, kv_len, interpret=True)
        if got is None:
            pytest.skip("decode kernel not yet eligible")
        want = ops.attention_decode_ref(q, k, v, kv_len)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    def test_decode_stacked_layer_index(self):
        """Stacked [L, B, Hkv, T, D] cache + traced layer id must match
        slicing the layer out first (the no-copy decode path)."""
        from turboinfer_tpu.kernels.pallas import decode_attention
        L, B, Hq, Hkv, D, T = 3, 2, 8, 4, 64, 256
        q = _rand(B, Hq, D)
        k = _rand(L, B, Hkv, T, D)
        v = _rand(L, B, Hkv, T, D)
        kv_len = jnp.asarray([100, 256], jnp.int32)
        for li in (0, 2):
            got = decode_attention.decode_pallas(
                q, k, v, kv_len, layer_index=jnp.int32(li), interpret=True)
            if got is None:
                pytest.skip("decode kernel not eligible")
            want = ops.attention_decode_ref(q, k[li], v[li], kv_len)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-2, atol=2e-2)

    def test_prefill_matches_reference(self):
        from turboinfer_tpu.kernels.pallas import flash_attention
        B, S, Hq, Hkv, D, T = 2, 128, 4, 4, 64, 256
        q = _rand(B, S, Hq, D)
        k = _rand(B, Hkv, T, D)
        v = _rand(B, Hkv, T, D)
        positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        kv_len = jnp.asarray([S, S], jnp.int32)
        got = flash_attention.prefill_pallas(
            q, k, v, causal=True, positions=positions, kv_len=kv_len,
            q_start=positions[:, 0], interpret=True)
        if got is None:
            pytest.skip("prefill kernel not yet eligible")
        want = ops.attention_prefill_ref(q, k, v, causal=True,
                                         positions=positions, kv_len=kv_len)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_e4m3_software_decode_all_codes():
    """e4m3_to_bf16 (integer bit-math) must match the numpy fp8->f32
    conversion for every finite code, incl. subnormals and +-0."""
    import numpy as np
    import jax.numpy as jnp
    from turboinfer_tpu.kernels.pallas.decode_attention import e4m3_to_bf16
    codes = np.arange(256, dtype=np.uint8)
    ref = codes.view(jnp.float8_e4m3fn.dtype).astype(np.float32)
    got = np.asarray(e4m3_to_bf16(jnp.asarray(codes).reshape(8, 32),
                                  jnp.float32)).reshape(-1)
    finite = np.isfinite(ref)
    np.testing.assert_array_equal(got[finite], ref[finite])


def test_decode_kernel_sliding_window_interpret():
    """Pallas decode kernel with a sliding window vs the jnp reference
    (interpret mode; D=128 so the kernel path is representative)."""
    import numpy as np
    import jax, jax.numpy as jnp
    from turboinfer_tpu.kernels import ops
    from turboinfer_tpu.kernels.pallas import decode_attention
    B, Hq, Hkv, T, D, W = 2, 8, 8, 256, 128, 100
    q = jax.random.normal(jax.random.PRNGKey(0), (B, Hq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, T, D), jnp.float32)
    kv_len = jnp.asarray([250, 37])   # window active / inactive
    ref = ops.attention_decode_ref(q, k, v, kv_len, window=W)
    got = decode_attention.decode_pallas(q, k, v, kv_len, window=W,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prefill_kernel_sliding_window_interpret():
    import numpy as np
    import jax, jax.numpy as jnp
    from turboinfer_tpu.kernels import ops
    from turboinfer_tpu.kernels.pallas import flash_attention
    B, S, Hq, Hkv, T, D, W = 1, 64, 4, 4, 128, 128, 40
    q = jax.random.normal(jax.random.PRNGKey(3), (B, S, Hq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, Hkv, T, D), jnp.float32)
    # chunked-prefill style: queries start at position 60, cache holds 124
    q_start = jnp.asarray([60])
    kv_len = jnp.asarray([124])
    positions = q_start[:, None] + jnp.arange(S)[None, :]
    ref = ops.attention_prefill_ref(q, k, v, causal=True,
                                    positions=positions, kv_len=kv_len,
                                    window=W)
    got = flash_attention.prefill_pallas(q, k, v, causal=True,
                                         kv_len=kv_len, q_start=q_start,
                                         window=W, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prefill_kernel_stacked_layer_interpret():
    """Stacked-cache prefill: layer `li` read from the full [L, ...]
    stack via scalar prefetch must match the per-layer kernel and the
    jnp reference (chunked offsets + GQA + ragged kv_len)."""
    import numpy as np
    import jax, jax.numpy as jnp
    from turboinfer_tpu.kernels import ops
    from turboinfer_tpu.kernels.pallas import flash_attention
    L, B, S, Hq, Hkv, T, D = 3, 2, 64, 8, 4, 256, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, Hq, D), jnp.float32)
    ks = jax.random.normal(jax.random.PRNGKey(1), (L, B, Hkv, T, D),
                           jnp.float32)
    vs = jax.random.normal(jax.random.PRNGKey(2), (L, B, Hkv, T, D),
                           jnp.float32)
    q_start = jnp.asarray([30, 0])
    kv_len = jnp.asarray([94, 64])
    positions = q_start[:, None] + jnp.arange(S)[None, :]
    for li in (0, 2):
        ref = ops.attention_prefill_ref(q, ks[li], vs[li], causal=True,
                                        positions=positions, kv_len=kv_len)
        got = flash_attention.prefill_pallas(
            q, ks, vs, causal=True, kv_len=kv_len, q_start=q_start,
            layer_index=jnp.int32(li), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=f"li={li}")


def test_prefill_kernel_stacked_compressed_interpret():
    """Stacked prefill flash kernel over COMPRESSED caches (interpret):
    uint8 e4m3 bits decode in-kernel, int8 applies its scale planes on
    the score/prob tiles — both vs the dequant-then-ref golden."""
    import numpy as np
    import jax, jax.numpy as jnp
    from turboinfer_tpu.kernels import ops
    from turboinfer_tpu.kernels.pallas import flash_attention
    from turboinfer_tpu.models.common import decode_kv, encode_kv_scaled
    L, B, S, Hq, Hkv, T, D = 2, 2, 64, 4, 2, 128, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, Hq, D), jnp.float32)
    ks = jax.random.normal(jax.random.PRNGKey(1), (L, B, Hkv, T, D),
                           jnp.float32)
    vs = jax.random.normal(jax.random.PRNGKey(2), (L, B, Hkv, T, D),
                           jnp.float32)
    q_start = jnp.asarray([30, 0])
    kv_len = jnp.asarray([94, 64])
    positions = q_start[:, None] + jnp.arange(S)[None, :]
    # fp8: raw e4m3 bytes as uint8
    k8f = jax.lax.bitcast_convert_type(ks.astype(jnp.float8_e4m3fn),
                                       jnp.uint8)
    v8f = jax.lax.bitcast_convert_type(vs.astype(jnp.float8_e4m3fn),
                                       jnp.uint8)
    for li in (0, 1):
        ref = ops.attention_prefill_ref(
            q, decode_kv(k8f[li], jnp.float32),
            decode_kv(v8f[li], jnp.float32),
            causal=True, positions=positions, kv_len=kv_len)
        got = flash_attention.prefill_pallas(
            q, k8f, v8f, causal=True, kv_len=kv_len, q_start=q_start,
            layer_index=jnp.int32(li), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"fp8 li={li}")
    # int8 + scales
    k8, kss = encode_kv_scaled(ks, jnp.int8)
    v8, vss = encode_kv_scaled(vs, jnp.int8)
    for li in (0, 1):
        ref = ops.attention_prefill_ref(
            q, decode_kv(k8[li], jnp.float32, kss[li]),
            decode_kv(v8[li], jnp.float32, vss[li]),
            causal=True, positions=positions, kv_len=kv_len)
        got = flash_attention.prefill_pallas(
            q, k8, v8, causal=True, kv_len=kv_len, q_start=q_start,
            layer_index=jnp.int32(li), k_scale=kss, v_scale=vss,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"int8 li={li}")


def test_fused_decode_kernel_int8_scaled_interpret():
    """int8 + fused-head layout: the block-diagonal kernel applies
    per-(token, head) scales via the one-hot m1 dot — vs the
    dequant-then-ref golden, incl. GQA, ragged fills, and sinks."""
    import numpy as np
    import jax, jax.numpy as jnp
    from turboinfer_tpu.kernels import ops
    from turboinfer_tpu.kernels.pallas import decode_attention
    from turboinfer_tpu.models.common import (decode_kv_fused,
                                              encode_kv_scaled)
    L, B, Hkv, G, D, T = 2, 2, 4, 2, 32, 128
    Hq, HD = Hkv * G, Hkv * D
    q = jax.random.normal(jax.random.PRNGKey(0), (B, Hq, D), jnp.float32)
    # build per-(token, head) values then pack to the fused layout
    kh = jax.random.normal(jax.random.PRNGKey(1), (L, B, T, Hkv, D),
                           jnp.float32)
    vh = jax.random.normal(jax.random.PRNGKey(2), (L, B, T, Hkv, D),
                           jnp.float32)
    k8, ks = encode_kv_scaled(kh, jnp.int8)          # ks [L, B, T, Hkv]
    v8, vs = encode_kv_scaled(vh, jnp.int8)
    kf = k8.reshape(L, B, T, HD)
    vf = v8.reshape(L, B, T, HD)
    ksp = jnp.moveaxis(ks, -1, -2)                   # [L, B, Hkv, T]
    vsp = jnp.moveaxis(vs, -1, -2)
    kv_len = jnp.asarray([100, 64])
    for li in (0, 1):
        want = ops.attention_decode_fused_ref(
            q, decode_kv_fused(kf[li], jnp.float32, ksp[li]),
            decode_kv_fused(vf[li], jnp.float32, vsp[li]), kv_len)
        got = decode_attention.decode_fused_pallas(
            q, kf, vf, kv_len, layer_index=li, k_scale=ksp,
            v_scale=vsp, interpret=True)
        assert got is not None
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"li={li}")
    # composed with sinks (GPT-OSS) and a sliding window
    sinks = jnp.asarray(np.linspace(-1, 1, Hq), jnp.float32)
    want = ops.attention_decode_fused_ref(
        q, decode_kv_fused(kf[0], jnp.float32, ksp[0]),
        decode_kv_fused(vf[0], jnp.float32, vsp[0]), kv_len,
        window=48, sinks=sinks)
    got = decode_attention.decode_fused_pallas(
        q, kf, vf, kv_len, layer_index=0, k_scale=ksp, v_scale=vsp,
        window=48, sinks=sinks, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_int8_scaled_interpret():
    """int8 KV cache: the head-major decode kernel's score/prob-side
    scale application must match the jnp reference on the dequantized
    cache (stacked layout + scalar-prefetched layer index + ragged
    kv_len + GQA)."""
    import numpy as np
    import jax, jax.numpy as jnp
    from turboinfer_tpu.kernels import ops
    from turboinfer_tpu.kernels.pallas import decode_attention
    from turboinfer_tpu.models.common import decode_kv, encode_kv_scaled
    L, B, Hq, Hkv, T, D = 3, 2, 8, 4, 256, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, Hq, D), jnp.float32)
    kk = jax.random.normal(jax.random.PRNGKey(1), (L, B, Hkv, T, D),
                           jnp.float32)
    vv = jax.random.normal(jax.random.PRNGKey(2), (L, B, Hkv, T, D),
                           jnp.float32)
    kv_len = jnp.asarray([200, 64])
    k8, ks = encode_kv_scaled(kk, jnp.int8)
    v8, vs = encode_kv_scaled(vv, jnp.int8)
    for li in (0, 2):
        ref = ops.attention_decode_ref(
            q, decode_kv(k8[li], jnp.float32, ks[li]),
            decode_kv(v8[li], jnp.float32, vs[li]), kv_len)
        got = decode_attention.decode_pallas(
            q, k8, v8, kv_len, layer_index=li, k_scale=ks, v_scale=vs,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"li={li}")
        # and composed with a sliding window
        refw = ops.attention_decode_ref(
            q, decode_kv(k8[li], jnp.float32, ks[li]),
            decode_kv(v8[li], jnp.float32, vs[li]), kv_len, window=96)
        gotw = decode_attention.decode_pallas(
            q, k8, v8, kv_len, layer_index=li, k_scale=ks, v_scale=vs,
            window=96, interpret=True)
        np.testing.assert_allclose(np.asarray(gotw), np.asarray(refw),
                                   rtol=2e-5, atol=2e-5)


def test_decode_kernel_softcap_interpret():
    """Attention logit soft-capping (Gemma2) in the decode kernel vs the
    jnp reference."""
    import numpy as np
    import jax, jax.numpy as jnp
    from turboinfer_tpu.kernels import ops
    from turboinfer_tpu.kernels.pallas import decode_attention
    B, Hq, Hkv, T, D = 2, 8, 4, 256, 128
    q = 4 * jax.random.normal(jax.random.PRNGKey(0), (B, Hq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, T, D), jnp.float32)
    kv_len = jnp.asarray([200, 64])
    ref = ops.attention_decode_ref(q, k, v, kv_len, softcap=20.0)
    got = decode_attention.decode_pallas(q, k, v, kv_len, softcap=20.0,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and composed with a sliding window
    ref = ops.attention_decode_ref(q, k, v, kv_len, window=96, softcap=20.0)
    got = decode_attention.decode_pallas(q, k, v, kv_len, window=96,
                                         softcap=20.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prefill_kernel_softcap_interpret():
    import numpy as np
    import jax, jax.numpy as jnp
    from turboinfer_tpu.kernels import ops
    from turboinfer_tpu.kernels.pallas import flash_attention
    B, S, Hq, Hkv, T, D = 1, 64, 4, 2, 128, 128
    q = 4 * jax.random.normal(jax.random.PRNGKey(3), (B, S, Hq, D),
                              jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, Hkv, T, D), jnp.float32)
    kv_len = jnp.asarray([128])
    ref = ops.attention_prefill_ref(q, k, v, causal=True, kv_len=kv_len,
                                    softcap=30.0)
    got = flash_attention.prefill_pallas(q, k, v, causal=True,
                                         kv_len=kv_len, softcap=30.0,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


class TestQmmGrouped:
    @pytest.mark.parametrize("qtype,gs", [(QuantType.INT8, 64),
                                          (QuantType.INT4, 64),
                                          (QuantType.INT4, 256)])
    def test_grouped_matches_per_slot(self, qtype, gs):
        """One grouped launch over G data-dependent slots must equal G
        independent stacked-layer calls (MoE decode: the k routed
        experts), including per-group DIFFERENT activations."""
        from turboinfer_tpu.kernels.pallas import qmm
        L, K, N, G = 5, 512, 384, 3
        ws = [_rand(K, N) for _ in range(L)]
        qts = [quantize(w, qtype, group_size=gs) for w in ws]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
        slots = jnp.asarray([4, 0, 2], jnp.int32)
        xg = _rand(G, 1, K)
        got = qmm.qmatmul_pallas_grouped(xg, stacked, slots, interpret=True)
        assert got is not None
        for g, s in enumerate([4, 0, 2]):
            want = ops.qmatmul_ref(xg[g], qts[s])
            rel = float(jnp.max(jnp.abs(got[g] - want))
                        / (jnp.max(jnp.abs(want)) + 1e-9))
            assert rel < 2e-2, f"group {g} slot {s} rel err {rel}"

    def test_grouped_dispatch_fallback_matches(self):
        """dispatch.qmatmul_grouped (jnp fallback on CPU) == per-slot."""
        from turboinfer_tpu.kernels import dispatch
        L, K, N, G = 4, 256, 512, 2
        ws = [_rand(K, N) for _ in range(L)]
        qts = [quantize(w, QuantType.INT4, group_size=64) for w in ws]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
        slots = jnp.asarray([3, 1], jnp.int32)
        xg = _rand(G, 1, 1, K)
        got = dispatch.qmatmul_grouped(xg, stacked, slots)
        assert got.shape == (G, 1, 1, N)
        for g, s in enumerate([3, 1]):
            want = ops.qmatmul_ref(xg[g], qts[s])
            np.testing.assert_allclose(np.asarray(got[g]), np.asarray(want),
                                       rtol=2e-2, atol=2e-2)

    def test_grouped_fp_weights(self):
        w = jnp.stack([_rand(64, 32) for _ in range(3)])
        xg = _rand(2, 1, 64)
        slots = jnp.asarray([2, 0], jnp.int32)
        got = ops.qmatmul_grouped(xg, w, slots)
        for g, s in enumerate([2, 0]):
            np.testing.assert_allclose(
                np.asarray(got[g]), np.asarray(xg[g] @ w[s]),
                rtol=1e-4, atol=1e-4)


class TestFusedDecodeAttention:
    """Fused-head-layout decode kernel (cache [B, T, Hkv*D]) vs the jnp
    golden — interpret mode on CPU. The layout that keeps D % 128 != 0
    models (tiny fixtures, GPT-2, Qwen2-0.5B, Phi-3) on a Pallas kernel."""

    def _check(self, B, Hq, Hkv, D, T, window=None, softcap=None, L=3,
               seed=0):
        from turboinfer_tpu.kernels.pallas import decode_attention as da
        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(B, Hq, D), jnp.float32)
        k2 = jnp.asarray(rng.randn(L, B, T, Hkv * D), jnp.float32)
        v2 = jnp.asarray(rng.randn(L, B, T, Hkv * D), jnp.float32)
        kv_len = jnp.asarray(rng.randint(1, T + 1, size=B), jnp.int32)
        li = L - 1
        got = da.decode_fused_pallas(q, k2, v2, kv_len, layer_index=li,
                                     window=window, softcap=softcap,
                                     interpret=True)
        assert got is not None
        want = ops.attention_decode_fused_ref(q, k2[li], v2[li], kv_len,
                                              window=window, softcap=softcap)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_mha_d32(self):
        self._check(1, 4, 4, 32, 256)          # tiny fixture shape

    def test_gqa_d64(self):
        self._check(2, 14, 2, 64, 128)         # Qwen2-0.5B-like

    def test_window(self):
        self._check(2, 12, 12, 64, 512, window=100)   # GPT-2-like

    def test_softcap_d96(self):
        self._check(1, 8, 8, 96, 64, softcap=30.0)

    def test_unstacked_no_layer_index(self):
        from turboinfer_tpu.kernels.pallas import decode_attention as da
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(2, 4, 32), jnp.float32)
        k2 = jnp.asarray(rng.randn(2, 64, 128), jnp.float32)
        v2 = jnp.asarray(rng.randn(2, 64, 128), jnp.float32)
        kv_len = jnp.asarray([17, 64], jnp.int32)
        got = da.decode_fused_pallas(q, k2, v2, kv_len, interpret=True)
        want = ops.attention_decode_fused_ref(q, k2, v2, kv_len)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_ineligible_shapes_return_none(self):
        from turboinfer_tpu.kernels.pallas import decode_attention as da
        q = jnp.zeros((1, 4, 32), jnp.float32)
        # HD not 128-aligned
        assert da.decode_fused_pallas(
            q, jnp.zeros((1, 64, 96)), jnp.zeros((1, 64, 96)),
            jnp.ones((1,), jnp.int32), interpret=True) is None
        # T not sublane-aligned
        assert da.decode_fused_pallas(
            q, jnp.zeros((1, 12, 128)), jnp.zeros((1, 12, 128)),
            jnp.ones((1,), jnp.int32), interpret=True) is None


@pytest.mark.slow
def test_fused_cache_layout_matches_head_major():
    """llama.forward over a fused-head cache must match the head-major
    cache bit-for-bit on CPU (prefill + decode through both layouts)."""
    from turboinfer_tpu.config import tiny_config
    from turboinfer_tpu.models import common, llama
    cfg = tiny_config()
    assert common.fused_cache_eligible(cfg)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray([[1, 5, 7, 9, 11], [2, 4, 6, 0, 0]], jnp.int32)
    lens = jnp.asarray([5, 3], jnp.int32)
    c_hm = llama.init_cache(cfg, 2, max_seq=32)
    c_fu = llama.init_cache(cfg, 2, max_seq=32, fused=None)
    assert c_fu.fused_layout and not c_hm.fused_layout
    assert c_fu.max_seq == c_hm.max_seq == 32
    l1, c_hm = llama.forward(params, cfg, toks, c_hm, seq_lens=lens)
    l2, c_fu = llama.forward(params, cfg, toks, c_fu, seq_lens=lens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)
    for _ in range(4):
        nt = jnp.argmax(l1[:, -1], -1).astype(jnp.int32)[:, None]
        l1, c_hm = llama.forward(params, cfg, nt, c_hm)
        l2, c_fu = llama.forward(params, cfg, nt, c_fu)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_gpt2_fused_cache_matches_head_major():
    from turboinfer_tpu.config import ModelConfig
    from turboinfer_tpu.models import gpt2
    cfg = ModelConfig(architecture="gpt2", vocab_size=500, hidden_size=128,
                      num_layers=2, num_heads=2, max_seq_len=64,
                      dtype=jnp.float32)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray([[1, 5, 7, 9, 11], [2, 4, 6, 0, 0]], jnp.int32)
    lens = jnp.asarray([5, 3], jnp.int32)
    c1 = gpt2.init_cache(cfg, 2, max_seq=64)
    c2 = gpt2.init_cache(cfg, 2, max_seq=64, fused=None)
    assert c2.fused_layout and not c1.fused_layout
    l1, c1 = gpt2.forward(params, cfg, toks, c1, seq_lens=lens)
    l2, c2 = gpt2.forward(params, cfg, toks, c2, seq_lens=lens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)
    for _ in range(4):
        nt = jnp.argmax(l1[:, -1], -1).astype(jnp.int32)[:, None]
        l1, c1 = gpt2.forward(params, cfg, nt, c1)
        l2, c2 = gpt2.forward(params, cfg, nt, c2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_neox_fused_cache_matches_head_major():
    """Pythia-style partial rotary + parallel residual, and Falcon-style
    GQA, through both cache layouts; ALiBi configs must refuse to fuse."""
    from turboinfer_tpu.config import ModelConfig
    from turboinfer_tpu.models import neox
    for kw in ({"num_heads": 4, "hidden_size": 256, "rotary_pct": 0.25},
               {"num_heads": 8, "num_kv_heads": 2, "hidden_size": 512,
                "rotary_pct": 1.0}):
        cfg = ModelConfig(architecture="neox", vocab_size=500,
                          num_layers=2, max_seq_len=64,
                          parallel_residual=True, dtype=jnp.float32, **kw)
        params = neox.init_params(jax.random.PRNGKey(0), cfg)
        toks = jnp.asarray([[1, 5, 7, 9, 11], [2, 4, 6, 0, 0]], jnp.int32)
        lens = jnp.asarray([5, 3], jnp.int32)
        c1 = neox.init_cache(cfg, 2, max_seq=64)
        c2 = neox.init_cache(cfg, 2, max_seq=64, fused=None)
        assert c2.fused_layout
        l1, c1 = neox.forward(params, cfg, toks, c1, seq_lens=lens)
        l2, c2 = neox.forward(params, cfg, toks, c2, seq_lens=lens)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-5)
        for _ in range(3):
            nt = jnp.argmax(l1[:, -1], -1).astype(jnp.int32)[:, None]
            l1, c1 = neox.forward(params, cfg, nt, c1)
            l2, c2 = neox.forward(params, cfg, nt, c2)
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=1e-5, atol=1e-5)
    alibi_cfg = ModelConfig(architecture="bloom", vocab_size=500,
                            hidden_size=256, num_layers=2, num_heads=4,
                            max_seq_len=64, rotary_pct=0.0, alibi=True,
                            parallel_residual=False, dtype=jnp.float32)
    assert not neox.init_cache(alibi_cfg, 1, max_seq=64,
                               fused=None).fused_layout


def test_fused_decode_with_sinks_matches_concat_softmax():
    """Sink-aware fused kernel (interpret) vs the golden, and the golden
    vs brute-force softmax([scores, sink]) with the sink dropped."""
    from turboinfer_tpu.kernels.pallas import decode_attention as da
    rng = np.random.RandomState(0)
    B, Hq, Hkv, D, T, L = 2, 8, 8, 64, 128, 2
    q = jnp.asarray(rng.randn(B, Hq, D), jnp.float32)
    k2 = jnp.asarray(rng.randn(L, B, T, Hkv * D), jnp.float32)
    v2 = jnp.asarray(rng.randn(L, B, T, Hkv * D), jnp.float32)
    kv_len = jnp.asarray([37, 128], jnp.int32)
    sinks = jnp.asarray(rng.randn(Hq), jnp.float32)
    ref = ops.attention_decode_fused_ref(q, k2[1], v2[1], kv_len,
                                         sinks=sinks)
    for b in range(B):
        for j in range(Hq):
            kk = np.asarray(k2[1, b]).reshape(T, Hkv, D)[:, j]
            vv = np.asarray(v2[1, b]).reshape(T, Hkv, D)[:, j]
            n = int(kv_len[b])
            s = (np.asarray(q[b, j]) @ kk.T)[:n] / np.sqrt(D)
            full = np.concatenate([s, [float(sinks[j])]])
            p = np.exp(full - full.max())
            p /= p.sum()
            np.testing.assert_allclose(np.asarray(ref[b, j]),
                                       p[:n] @ vv[:n],
                                       rtol=1e-5, atol=1e-5)
    got = da.decode_fused_pallas(q, k2, v2, kv_len, layer_index=1,
                                 sinks=sinks, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_moe_fused_cache_matches_head_major():
    from turboinfer_tpu.config import ModelConfig
    from turboinfer_tpu.models import moe
    cfg = ModelConfig(vocab_size=500, hidden_size=256, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=128,
                      moe_intermediate_size=48, shared_expert_size=80,
                      norm_topk_prob=False, attn_bias=True, max_seq_len=64,
                      architecture="qwen2_moe", num_experts=4,
                      experts_per_token=2, dtype=jnp.float32)
    params = moe.init_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray([[1, 5, 7, 9, 11], [2, 4, 6, 0, 0]], jnp.int32)
    lens = jnp.asarray([5, 3], jnp.int32)
    c1 = moe.init_cache(cfg, 2, max_seq=64)
    c2 = moe.init_cache(cfg, 2, max_seq=64, fused=None)
    assert c2.fused_layout
    l1, c1 = moe.forward(params, cfg, toks, c1, seq_lens=lens)
    l2, c2 = moe.forward(params, cfg, toks, c2, seq_lens=lens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)
    for _ in range(3):
        nt = jnp.argmax(l1[:, -1], -1).astype(jnp.int32)[:, None]
        l1, c1 = moe.forward(params, cfg, nt, c1)
        l2, c2 = moe.forward(params, cfg, nt, c2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_gptoss_fused_cache_matches_head_major():
    """GPT-OSS contiguous decode through the fused layout (sink-aware
    kernel + alternating windows) vs the head-major streaming path."""
    from turboinfer_tpu.config import ModelConfig
    from turboinfer_tpu.models import gptoss
    cfg = ModelConfig(architecture="gpt_oss", vocab_size=500,
                      hidden_size=256, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=64, intermediate_size=128,
                      max_seq_len=64, num_experts=4, experts_per_token=2,
                      sliding_window=16, sliding_window_pattern=2,
                      attn_bias=True, dtype=jnp.float32)
    params = gptoss.init_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray([[1, 5, 7, 9, 11], [2, 4, 6, 0, 0]], jnp.int32)
    lens = jnp.asarray([5, 3], jnp.int32)
    c1 = gptoss.init_cache(cfg, 2, max_seq=64)
    c2 = gptoss.init_cache(cfg, 2, max_seq=64, fused=None)
    assert c2.fused_layout
    l1, c1 = gptoss.forward(params, cfg, toks, c1, seq_lens=lens)
    l2, c2 = gptoss.forward(params, cfg, toks, c2, seq_lens=lens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)
    for _ in range(6):
        nt = jnp.argmax(l1[:, -1], -1).astype(jnp.int32)[:, None]
        l1, c1 = gptoss.forward(params, cfg, nt, c1)
        l2, c2 = gptoss.forward(params, cfg, nt, c2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-4, atol=1e-4)


def test_qmm_a8_prefill_path(monkeypatch):
    """Opt-in W4A8 prefill path (TURBOINFER_QMM_A8=1): int8 per-row
    activations x raw int4 nibbles, factored scales. Must match the
    explicit int8-simulated matmul to quantization error."""
    monkeypatch.setenv("TURBOINFER_QMM_A8", "1")
    from turboinfer_tpu.core.qtensor import dequantize
    from turboinfer_tpu.kernels.pallas import qmm
    rng = np.random.RandomState(0)
    M, K, N, GS = 64, 1024, 512, 256
    w = jnp.asarray(rng.randn(K, N) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(M, K) * 0.5, jnp.bfloat16)
    qt = quantize(w, QuantType.INT4, group_size=GS, symmetric=True)
    got = qmm.qmatmul_pallas(x, qt, interpret=True)
    assert got is not None
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), -1), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx[:, None]), -127, 127)
    want = (xq @ dequantize(qt, jnp.float32)) * sx[:, None]
    rel = (float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
           / float(jnp.max(jnp.abs(want))))
    assert rel < 2e-2, rel
    # decode-sized M must NOT take the a8 path (activation quantization
    # noise is not worth it at bandwidth-bound M<=8)
    g1 = qmm.qmatmul_pallas(x[:1], qt, interpret=True)
    r1 = ops.qmatmul_ref(x[:1], qt)
    rel1 = (float(jnp.max(jnp.abs(g1 - r1)))
            / float(jnp.max(jnp.abs(r1))))
    assert rel1 < 1e-2


@pytest.mark.slow
def test_gpt2_fused_fp8_cache_close_to_bf16():
    """gpt2/neox fused-cache writes must go through encode_kv: with an
    fp8 ("uint8 bits-at-rest") cache a raw float->uint8 astype would
    produce garbage. fp8 outputs must stay close to the fp32-cache run."""
    from turboinfer_tpu.config import ModelConfig
    from turboinfer_tpu.models import gpt2
    cfg = ModelConfig(architecture="gpt2", vocab_size=500, hidden_size=128,
                      num_layers=2, num_heads=2, max_seq_len=64,
                      dtype=jnp.float32)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray([[1, 5, 7, 9, 11]], jnp.int32)
    c_f = gpt2.init_cache(cfg, 1, max_seq=64, fused=True)
    c_8 = gpt2.init_cache(cfg, 1, max_seq=64, fused=True, dtype=jnp.uint8)
    lf, c_f = gpt2.forward(params, cfg, toks, c_f)
    l8, c_8 = gpt2.forward(params, cfg, toks, c_8)
    # e4m3 has ~2 mantissa-bit rounding; logits track within a few %.
    ref = float(jnp.max(jnp.abs(lf)))
    assert float(jnp.max(jnp.abs(lf - l8))) < 0.1 * ref + 0.3
    for _ in range(3):
        nt = jnp.argmax(lf[:, -1], -1).astype(jnp.int32)[:, None]
        lf, c_f = gpt2.forward(params, cfg, nt, c_f)
        l8, c_8 = gpt2.forward(params, cfg, nt, c_8)
        assert float(jnp.max(jnp.abs(lf - l8))) < 0.1 * ref + 0.3
