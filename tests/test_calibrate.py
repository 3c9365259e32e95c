"""Activation-calibrated quantization (quant/calibrate.py).

Makes QuantizationConfig.calibration_samples / calibration_max_len real
(the reference declares them and never reads them,
quantization.hpp:35-41).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turboinfer_tpu.config import QuantType, QuantizationConfig
from turboinfer_tpu.core import qtensor
from turboinfer_tpu.quant import calibrate


def _out_mse(w, qt, moments, n=512, seed=3):
    """E||x@W - x@What||^2 with x drawn channel-scaled by moments."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, w.shape[0]).astype(np.float32) * \
        np.sqrt(moments)[None, :]
    wq = np.asarray(qtensor.dequantize(qt, jnp.float32))
    d = x @ np.asarray(w) - x @ wq
    return float(np.mean(np.square(d)))


def test_weighted_scale_search_reduces_output_mse():
    """A group with an outlier weight on a DEAD input channel: absmax
    burns resolution on it; activation-weighted search clips it and
    keeps the live channels faithful — lower output MSE."""
    rng = np.random.RandomState(0)
    K, N, g = 128, 64, 32
    w = rng.randn(K, N).astype(np.float32) * 0.05
    # outlier weights confined to channels the activations never drive
    dead = np.arange(0, K, g)          # first channel of each group
    w[dead, :] += rng.choice([-1.0, 1.0], size=(len(dead), N)) * 1.5
    moments = np.ones(K, np.float32)
    moments[dead] = 1e-4

    qa = qtensor.quantize(jnp.asarray(w), QuantType.INT4, group_size=g,
                          scale_dtype=jnp.float32)
    qc = qtensor.quantize(jnp.asarray(w), QuantType.INT4, group_size=g,
                          scale_dtype=jnp.float32,
                          weight_moments=jnp.asarray(moments))
    ea = _out_mse(w, qa, moments)
    ec = _out_mse(w, qc, moments)
    assert ec < ea * 0.5, (ec, ea)


def test_weight_moments_shape_mismatch_raises():
    w = jnp.ones((64, 16), jnp.float32)
    with pytest.raises(Exception, match="weight_moments"):
        qtensor.quantize(w, QuantType.INT4, group_size=32,
                         weight_moments=jnp.ones((32,), jnp.float32))


def test_collect_moments_shapes(tiny_params, tiny_cfg):
    toks = [[1, 5, 42, 7, 9, 3, 2, 8], [4, 6, 11, 13]]
    m = calibrate.collect_moments(tiny_params, tiny_cfg, toks)
    L, H, I = (tiny_cfg.num_layers, tiny_cfg.hidden_size,
               tiny_cfg.intermediate_size)
    for slot in ("wq", "wk", "wv", "wo", "w_gate", "w_up"):
        assert m[slot].shape == (L, H), slot
        assert np.all(np.isfinite(m[slot])) and np.all(m[slot] >= 0)
    assert m["w_down"].shape == (L, I)
    assert m["lm_head"].shape == (H,)
    # attention input != FFN input: moments must differ per slot
    assert not np.allclose(m["wq"][0], m["w_down"][0][:H] if I >= H
                           else m["w_down"][0])
    # wq/wk/wv share their input -> identical moments
    np.testing.assert_allclose(m["wq"], m["wk"])


def test_collect_moments_rejects_quantized_params(tiny_params, tiny_cfg):
    from turboinfer_tpu.quant.quantizer import quantize_params
    q = quantize_params(tiny_params, QuantizationConfig(
        type=QuantType.INT4, group_size=32))
    with pytest.raises(Exception, match="already"):
        calibrate.collect_moments(q, tiny_cfg, [[1, 2, 3]])


@pytest.mark.slow
def test_calibrated_quantize_params_end_to_end(tiny_params, tiny_cfg):
    """Full pipeline: calibrate -> quantize -> model still accurate,
    and no worse than uncalibrated on the calibration distribution."""
    from turboinfer_tpu.quant.quantizer import (
        quantize_params, validate_quantization_accuracy)
    cfg = QuantizationConfig(type=QuantType.INT4, group_size=32,
                             calibration_samples=8,
                             calibration_max_len=32)
    prompts = [[1, 5, 42, 7, 9, 3], [2, 8, 4, 6]]
    qa = quantize_params(tiny_params, cfg)
    qc = calibrate.calibrated_quantize_params(
        tiny_params, cfg, tiny_cfg, seed=1)
    from turboinfer_tpu.core.qtensor import QTensor
    assert isinstance(qc["layers"]["wq"], QTensor)
    ra = validate_quantization_accuracy(tiny_params, qa, tiny_cfg, prompts)
    rc = validate_quantization_accuracy(tiny_params, qc, tiny_cfg, prompts)
    assert np.isfinite(rc.perplexity_quant)
    # tiny random model: require parity-or-better within noise
    assert rc.mean_abs_logprob_delta <= ra.mean_abs_logprob_delta * 1.25


def test_calibrated_requires_symmetric(tiny_params, tiny_cfg):
    cfg = QuantizationConfig(type=QuantType.INT4, group_size=32,
                             symmetric=False, calibration_samples=1,
                             calibration_max_len=8)
    with pytest.raises(Exception, match="symmetric"):
        calibrate.calibrated_quantize_params(tiny_params, cfg, tiny_cfg)


def test_qmm_tap_restores_on_exit():
    from turboinfer_tpu.kernels import ops
    assert ops._QMM_TAP is None
    calls = []
    with ops.qmm_tap(lambda x, w, li: calls.append(1)):
        ops.qmatmul(jnp.ones((2, 8), jnp.float32),
                    jnp.ones((8, 4), jnp.float32))
    assert calls == [1]
    assert ops._QMM_TAP is None
