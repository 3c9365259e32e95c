"""Model-level quantizer + accuracy validation.

Reference counterpart: optimize/Quantizer (src/optimize/quantization.cpp
— quantize_model :89-118, validate_quantization_accuracy :447-608,
quantize_model_file :651-658). Differences, per SURVEY.md quirks #5/#6:
group-wise scales (not per-tensor), packed int4 (real 2-per-byte
compression), and validation measured as true logprob/perplexity delta
instead of fallback constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import (ModelConfig, QuantizationConfig, QuantType)
from turboinfer_tpu.core.qtensor import (QEmbed, QTensor, dequantize,
                                         dequantize_embed, quantize,
                                         quantize_embed)

# Per-layer matmul weight slots that get quantized, per architecture.
# Stacked [L, K, N]. MoE expert weights are [L, E, K, N] and quantize
# to a 4-D stacked QTensor (handled separately in quantize_params; the
# qmm kernel reads them as a flat [L*E] stack via layer_index).
_ARCH_MATMULS = {
    "llama": ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"),
    "gpt2": ("w_qkv", "wo", "w_fc", "w_proj"),
    # DeepSeek MLA: wkv_b stays fp (the absorbed-attention math splits
    # and reshapes it per head, which a packed QTensor can't do); the
    # router stays fp (f32 einsum, and routing precision matters).
    "deepseek": ("wkv_a", "wo"),
    "moe": ("wq", "wk", "wv", "wo"),
}
_LAYER_MATMULS = _ARCH_MATMULS["llama"]
_MOE_EXPERT_SLOTS = ("we_gate", "we_up", "we_down")
# Shared-expert / q-LoRA stacks: plain [L, K, N], quantized when
# present (shared_gate's N=1 output stays fp — too small to matter).
_MOE_SHARED_SLOTS = ("ws_gate", "ws_up", "ws_down")
_DEEPSEEK_OPT_SLOTS = ("wq", "wq_a", "wq_b") + _MOE_SHARED_SLOTS


def _matmul_slots(params: Dict[str, Any]) -> tuple:
    """Pick the quantizable stacked-2D slots by inspecting the pytree."""
    layers = params.get("layers", {})
    for arch, slots in _ARCH_MATMULS.items():
        if all(s in layers for s in slots):
            if arch == "moe":
                slots += tuple(s for s in _MOE_SHARED_SLOTS
                               if s in layers)
            elif arch == "deepseek":
                slots += tuple(s for s in _DEEPSEEK_OPT_SLOTS
                               if s in layers)
            return slots
    return tuple(k for k, v in layers.items()
                 if hasattr(v, "ndim") and v.ndim == 3)


def _quantize_stacked(w: jax.Array, cfg: QuantizationConfig,
                      moments=None) -> QTensor:
    """Quantize a stacked [L, K, N] weight layer-by-layer and restack so
    lax.scan over layers sees per-layer QTensors. moments: optional
    [L, K] per-layer activation second moments (quant/calibrate.py) —
    switches the scale search to activation-weighted MSE."""
    L = w.shape[0]
    qts = [quantize(w[i], cfg.type, group_size=cfg.group_size,
                    symmetric=cfg.symmetric,
                    scale_method=cfg.scale_method,
                    weight_moments=None if moments is None
                    else moments[i]) for i in range(L)]
    data = jnp.stack([q.data for q in qts])
    scales = jnp.stack([q.scales for q in qts])
    zp = (None if qts[0].zero_points is None
          else jnp.stack([q.zero_points for q in qts]))
    return QTensor(data=data, scales=scales, zero_points=zp,
                   bits=qts[0].bits, group_size=qts[0].group_size,
                   shape=qts[0].shape)


def _quantize_experts(w: jax.Array, cfg: QuantizationConfig) -> QTensor:
    """Quantize a stacked MoE expert weight [L, E, K, N] into a 4-D
    stacked QTensor (data [L, E, K(/2), N], scales [L, E, G, N]).
    models/moe.py flattens the leading two axes into the qmm kernel's
    [L*E] stack and indexes slot layer*E + expert via scalar prefetch."""
    L, E = w.shape[:2]
    qts = [quantize(w[i, e], cfg.type, group_size=cfg.group_size,
                    symmetric=cfg.symmetric,
                    scale_method=cfg.scale_method)
           for i in range(L) for e in range(E)]

    def restack(xs):
        x = jnp.stack(xs)
        return x.reshape((L, E) + x.shape[1:])
    zp = (None if qts[0].zero_points is None
          else restack([q.zero_points for q in qts]))
    return QTensor(data=restack([q.data for q in qts]),
                   scales=restack([q.scales for q in qts]),
                   zero_points=zp, bits=qts[0].bits,
                   group_size=qts[0].group_size, shape=qts[0].shape)


def quantize_params(params: Dict[str, Any], cfg: QuantizationConfig,
                    moments: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Quantize every matmul weight (reference: quantize_model,
    quantization.cpp:89-118 — which quantizes every f32 tensor including
    embeddings). skip_embeddings=True (default) keeps embed + lm_head
    fp; False quantizes lm_head group-wise like any matmul and the
    embedding table per-row int8 (QEmbed — a gather can't fuse
    group-wise dequant, so only the gathered rows dequantize).

    moments: optional {slot: [L, K]} (+ "lm_head": [K]) activation
    second moments from quant/calibrate.collect_moments — slots present
    get activation-weighted scale search, others quantize as before."""
    if cfg.type in (QuantType.NONE,):
        return params
    if cfg.type == QuantType.FLOAT16:
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jax.Array) and x.dtype in (jnp.float32,)
            else x, params)

    out = {k: v for k, v in params.items() if k not in ("layers", "lm_head")}
    layers = dict(params["layers"])
    for name in _matmul_slots(params):
        layers[name] = _quantize_stacked(
            layers[name], cfg,
            moments=None if moments is None else moments.get(name))
    # GPT-OSS experts carry biases and a custom GLU computed by einsum
    # (models/gptoss._moe_ffn) — those stay fp; marker: be_gate slot.
    if "be_gate" not in layers:
        for name in _MOE_EXPERT_SLOTS:
            w = layers.get(name)
            if w is not None and not isinstance(w, QTensor) and w.ndim == 4:
                layers[name] = _quantize_experts(w, cfg)
    # DeepSeek first_k_dense_replace group: every [kd, K, N] matmul
    # stack quantizes (norms are rank-2, nothing einsum-only lives here).
    dense = params.get("dense_layers")
    if isinstance(dense, dict):
        dense = dict(dense)
        for name, w in list(dense.items()):
            if (not isinstance(w, QTensor) and hasattr(w, "ndim")
                    and w.ndim == 3 and name != "wkv_b"):
                dense[name] = _quantize_stacked(w, cfg)
        out["dense_layers"] = dense
    out["layers"] = layers
    head = params["lm_head"]
    if cfg.skip_embeddings or isinstance(head, QTensor) or head.ndim != 2:
        out["lm_head"] = head
    else:
        out["lm_head"] = quantize(
            head, cfg.type, group_size=cfg.group_size,
            symmetric=cfg.symmetric, scale_method=cfg.scale_method,
            weight_moments=None if moments is None
            else moments.get("lm_head"))
    emb = out.get("embed")
    if (not cfg.skip_embeddings and emb is not None
            and not isinstance(emb, QEmbed) and emb.ndim == 2):
        # The reference quantizes embeddings too (quantization.cpp:
        # 89-118). A gather can't fuse group-wise dequant, so the table
        # uses per-ROW int8 (QEmbed) and only the gathered rows
        # dequantize (ops.embed_lookup) — the table stays int8 in HBM.
        out["embed"] = quantize_embed(emb)
    return out


def dequantize_params(params: Dict[str, Any], dtype=jnp.float32
                      ) -> Dict[str, Any]:
    """Reconstruct fp params from a quantized tree (round-trip tests)."""
    def deq(leaf):
        if isinstance(leaf, QEmbed):
            return dequantize_embed(leaf, dtype)
        if isinstance(leaf, QTensor):
            if leaf.data.ndim == 4:   # stacked [L, E] MoE experts
                L, E = leaf.data.shape[:2]
                per = [dequantize(QTensor(
                    data=leaf.data[i, e], scales=leaf.scales[i, e],
                    zero_points=None if leaf.zero_points is None
                    else leaf.zero_points[i, e],
                    bits=leaf.bits, group_size=leaf.group_size,
                    shape=leaf.shape), dtype)
                    for i in range(L) for e in range(E)]
                return jnp.stack(per).reshape((L, E) + per[0].shape)
            if leaf.data.ndim == 3:   # stacked layers
                L = leaf.data.shape[0]
                per = [dequantize(QTensor(
                    data=leaf.data[i], scales=leaf.scales[i],
                    zero_points=None if leaf.zero_points is None
                    else leaf.zero_points[i],
                    bits=leaf.bits, group_size=leaf.group_size,
                    shape=leaf.shape), dtype) for i in range(L)]
                return jnp.stack(per)
            return dequantize(leaf, dtype)
        return leaf
    return jax.tree_util.tree_map(
        deq, params,
        is_leaf=lambda x: isinstance(x, (QTensor, QEmbed)))


@dataclasses.dataclass
class ValidationReport:
    """Honest version of the reference's accuracy validation
    (quantization.cpp:447-608 — which falls back to constants)."""
    mean_abs_logprob_delta: float
    max_abs_logprob_delta: float
    perplexity_fp: float
    perplexity_quant: float

    @property
    def perplexity_ratio(self) -> float:
        return self.perplexity_quant / max(self.perplexity_fp, 1e-9)


def validate_quantization_accuracy(
        params_fp: Dict[str, Any], params_q: Dict[str, Any],
        model_config: ModelConfig,
        sample_tokens: Optional[Sequence[Sequence[int]]] = None,
        seed: int = 0) -> ValidationReport:
    """Compare per-token logprobs of fp vs quantized model on sample
    sequences (reference inference-mode validation, quantization.cpp
    :500-608, minus the /10 normalization fudge)."""
    from turboinfer_tpu.models import registry
    model = registry.get_model(model_config.architecture)

    if sample_tokens is None:
        rng = np.random.RandomState(seed)
        sample_tokens = [rng.randint(
            1, model_config.vocab_size, size=32).tolist() for _ in range(4)]

    deltas, ce_fp, ce_q, count = [], 0.0, 0.0, 0
    for toks in sample_tokens:
        t = jnp.asarray([toks], jnp.int32)
        lf = jax.nn.log_softmax(
            model.forward_no_cache(params_fp, model_config, t), axis=-1)
        lq = jax.nn.log_softmax(
            model.forward_no_cache(params_q, model_config, t), axis=-1)
        tgt = t[0, 1:]
        lp_f = np.asarray(jnp.take_along_axis(
            lf[0, :-1], tgt[:, None], axis=-1)[:, 0])
        lp_q = np.asarray(jnp.take_along_axis(
            lq[0, :-1], tgt[:, None], axis=-1)[:, 0])
        deltas.append(np.abs(lp_f - lp_q))
        ce_fp += -lp_f.sum()
        ce_q += -lp_q.sum()
        count += len(lp_f)

    d = np.concatenate(deltas)
    return ValidationReport(
        mean_abs_logprob_delta=float(d.mean()),
        max_abs_logprob_delta=float(d.max()),
        perplexity_fp=float(np.exp(ce_fp / count)),
        perplexity_quant=float(np.exp(ce_q / count)))


def quantize_model_file(input_path: str, output_path: str,
                        cfg: QuantizationConfig, *,
                        calibrate: bool = False,
                        sample_tokens: Optional[
                            Sequence[Sequence[int]]] = None) -> None:
    """One-shot file pipeline (reference: quantize_model_file,
    quantization.cpp:651-658): load → quantize → persist.

    calibrate=True activates the activation-calibrated scale search
    (quant/calibrate.py) using `sample_tokens` or
    cfg.calibration_samples synthetic sequences."""
    from turboinfer_tpu.loader import loader, tinq
    model = loader.load_model_data(input_path)
    if calibrate:
        from turboinfer_tpu.quant.calibrate import \
            calibrated_quantize_params
        qparams = calibrated_quantize_params(
            model.params, cfg, model.config, sample_tokens=sample_tokens)
    else:
        qparams = quantize_params(model.params, cfg)
    tinq.save(output_path, qparams, model.config, cfg)
