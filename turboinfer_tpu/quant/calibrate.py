"""Activation-calibrated quantization.

Consumes `QuantizationConfig.calibration_samples` /
`calibration_max_len` — fields the reference declares but never reads
(quantization.hpp:35-41, its calibration path is dead code). Here they
drive a real calibration pass, llama.cpp-imatrix / AWQ style:

1. Run the fp model over calibration sequences EAGERLY (a Python loop
   over layers calling the real `models.llama._layer_forward`, so the
   `ops.qmm_tap` hook sees concrete arrays, not tracers).
2. At every quantized matmul, accumulate per-input-channel second
   moments E[x_k^2] of the activations entering that weight.
3. Quantize with the per-group scale search weighted by those moments
   (core/qtensor._mse_scale(moments=...)): the minimized objective
   becomes the DIAGONAL approximation of the layer output error
   ||x @ W - x @ W_hat||^2 instead of the plain weight round-trip
   error, so channels the model drives hard are kept faithful and
   dead channels absorb the clipping.

Scope: the llama family (wq/wk/wv/wo/w_gate/w_up/w_down + lm_head) —
the flagship path. Other families fall back to uncalibrated
quantization per slot (missing slots in the moments dict are simply
quantized absmax/mse as before).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import ModelConfig, QuantizationConfig
from turboinfer_tpu.core.qtensor import QTensor
from turboinfer_tpu.kernels import ops
from turboinfer_tpu.utils.errors import QuantizationError

# Slots whose input activations are collected (the llama-family
# quantizable matmuls, quant/quantizer._ARCH_MATMULS["llama"]).
_LLAMA_SLOTS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


class _MomentAccumulator:
    """Per-slot running sum of squared activations + row count."""

    def __init__(self):
        self.sq: Dict[Any, np.ndarray] = {}
        self.rows: Dict[Any, int] = {}

    def add(self, key, x: jax.Array):
        xf = jnp.asarray(x, jnp.float32)
        flat = xf.reshape(-1, xf.shape[-1])
        s = np.array(jnp.sum(jnp.square(flat), axis=0))
        if key in self.sq:
            self.sq[key] += s
            self.rows[key] += flat.shape[0]
        else:
            self.sq[key] = s
            self.rows[key] = flat.shape[0]

    def mean(self, key) -> Optional[np.ndarray]:
        if key not in self.sq or self.rows[key] == 0:
            return None
        return self.sq[key] / float(self.rows[key])


def collect_moments(params: Dict[str, Any], config: ModelConfig,
                    sample_tokens: Sequence[Sequence[int]]
                    ) -> Dict[str, np.ndarray]:
    """Per-input-channel activation second moments for every llama
    matmul slot present in `params`.

    Returns {slot: [L, K] float32} for layer slots plus "lm_head": [K].
    Drives `_layer_forward` layer-by-layer in eager mode with the
    stacked weights and a concrete layer index — identical math to
    `llama.forward` (same RoPE/GQA/GLU code), but outside `lax.scan`
    so the qmm tap sees real arrays.
    """
    from turboinfer_tpu.models import llama

    layers = params.get("layers", {})
    missing = [s for s in ("wq", "wk", "wv") if s not in layers]
    if missing and "wqkv" not in layers:
        raise QuantizationError(
            "calibration supports the llama family (wq/wk/wv/... "
            f"slots); params lack {missing}")
    for s in _LLAMA_SLOTS:
        w = layers.get(s)
        if isinstance(w, QTensor):
            raise QuantizationError(
                f"calibration needs fp params; '{s}' is already "
                "quantized")

    # Tap routing: object identity of the STACKED weight -> slot name.
    wid_to_slot = {id(layers[s]): s for s in _LLAMA_SLOTS if s in layers}
    head = params.get("lm_head")
    if head is not None and not isinstance(head, QTensor):
        wid_to_slot[id(head)] = "lm_head"

    L = config.num_layers
    B = 1
    Hkv, D = config.kv_heads, config.head_dim_
    acc = _MomentAccumulator()

    def tap(x, w, layer_index):
        slot = wid_to_slot.get(id(w))
        if slot is None:
            return
        key = slot if slot == "lm_head" else (slot, int(layer_index))
        acc.add(key, x)

    with ops.qmm_tap(tap):
        for toks in sample_tokens:
            toks = list(toks)
            if not toks:
                continue
            S = len(toks)
            t = jnp.asarray([toks], jnp.int32)
            positions = jnp.arange(S, dtype=jnp.int32)[None, :]
            start = jnp.zeros((B,), jnp.int32)
            kv_len = jnp.full((B,), S, jnp.int32)

            x = ops.embed_lookup(params["embed"], t, config.dtype)
            if config.scale_embeddings:
                x = x * jnp.asarray(config.hidden_size ** 0.5,
                                    config.dtype)
            if config.embedding_multiplier:
                x = x * jnp.asarray(config.embedding_multiplier,
                                    config.dtype)

            for i in range(L):
                kc = jnp.zeros((B, Hkv, S, D), config.dtype)
                vc = jnp.zeros((B, Hkv, S, D), config.dtype)
                x, _, _ = llama._layer_forward(
                    config, x, layers, positions, kc, vc, start,
                    kv_len, contiguous=True, layer_index=i)

            x = ops.rms_norm(x, params["final_norm"],
                             config.rms_norm_eps,
                             1.0 if config.norm_offset else 0.0)
            if head is not None and not isinstance(head, QTensor):
                ops.qmatmul(x, head, preferred_dtype=jnp.float32)

    out: Dict[str, np.ndarray] = {}
    for slot in _LLAMA_SLOTS:
        if slot not in layers:
            continue
        per_layer: List[np.ndarray] = []
        ok = True
        for i in range(L):
            m = acc.mean((slot, i))
            if m is None:
                ok = False
                break
            per_layer.append(m)
        if ok:
            out[slot] = np.stack(per_layer)
    mh = acc.mean("lm_head")
    if mh is not None:
        out["lm_head"] = mh
    return out


def default_calibration_tokens(cfg: QuantizationConfig,
                               model_config: ModelConfig,
                               seed: int = 0) -> List[List[int]]:
    """Synthetic calibration set sized by the config fields. Real
    deployments should pass tokenized text instead; random tokens
    still exercise every channel with the model's own activation
    statistics (embeddings + residual stream are the model's)."""
    n = max(1, int(cfg.calibration_samples))
    slen = max(2, min(int(cfg.calibration_max_len),
                      model_config.max_seq_len))
    rng = np.random.RandomState(seed)
    return [rng.randint(1, model_config.vocab_size,
                        size=slen).tolist() for _ in range(n)]


def calibrated_quantize_params(
        params: Dict[str, Any], cfg: QuantizationConfig,
        model_config: ModelConfig,
        sample_tokens: Optional[Sequence[Sequence[int]]] = None,
        seed: int = 0) -> Dict[str, Any]:
    """`quantize_params` with activation-calibrated scales.

    sample_tokens: tokenized calibration sequences; defaults to
    `cfg.calibration_samples` random sequences of length
    `cfg.calibration_max_len` (pass real text for production use).
    """
    from turboinfer_tpu.quant.quantizer import quantize_params

    if not cfg.symmetric:
        raise QuantizationError(
            "calibrated quantization requires symmetric=True")
    layers = params.get("layers", {})
    if "wqkv" not in layers and any(s not in layers
                                    for s in ("wq", "wk", "wv")):
        # Non-llama family (gpt2/neox/deepseek fused slots): fall back
        # to uncalibrated quantization as the module docstring
        # promises, instead of aborting the whole pipeline.
        from turboinfer_tpu.utils import logging as tlog
        tlog.log_warning(
            "calibration supports the llama family only; %s falls "
            "back to uncalibrated quantization",
            model_config.architecture)
        return quantize_params(params, cfg)
    if sample_tokens is None:
        sample_tokens = default_calibration_tokens(
            cfg, model_config, seed)
    moments = collect_moments(params, model_config, sample_tokens)
    return quantize_params(params, cfg, moments=moments)
