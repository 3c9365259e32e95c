"""LoRA adapter loading (PEFT format) and application.

Beyond-reference subsystem: load a PEFT adapter directory
(adapter_config.json + adapter_model.safetensors) and attach it to a
param pytree — including QUANTIZED bases, where the low-rank update
adds to the fused-qmm output at runtime (models/llama._lora_delta), so
an int4 base serves a LoRA fine-tune with no dequantized merge.

Adapters live in the layers dict as stacked slots
`lora_<slot>_a` [L, in, r] / `lora_<slot>_b` [L, r, out] with the
alpha/r (or rsLoRA alpha/sqrt(r)) scaling folded into B. Layers the
adapter does not target get zero blocks (the matmul against zeros is
negligible at LoRA ranks).

merge_lora() alternatively folds the update into full-precision base
weights (W += A @ B), producing an adapter-free tree.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.core.qtensor import QTensor
from turboinfer_tpu.utils import logging as tlog
from turboinfer_tpu.utils.errors import ModelFormatError

# PEFT module name → runtime slot
_MODULE_SLOTS = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
}
_KEY_RE = re.compile(
    r"(?:base_model\.model\.)?model\.layers\.(\d+)\.(?:self_attn|mlp)\."
    r"(\w+)\.lora_(A|B)\.weight")


def load_lora(path: str, config: ModelConfig, dtype=None
              ) -> Dict[str, Any]:
    """PEFT adapter directory (or adapter_model.safetensors path) →
    dict of stacked lora slots ready for apply_lora."""
    from turboinfer_tpu.loader import safetensors as st_mod
    if os.path.isdir(path):
        cfg_path = os.path.join(path, "adapter_config.json")
        st_path = os.path.join(path, "adapter_model.safetensors")
    else:
        cfg_path = os.path.join(os.path.dirname(path) or ".",
                                "adapter_config.json")
        st_path = path
    acfg: Dict[str, Any] = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            acfg = json.load(f)
    r = int(acfg.get("r", 8))
    alpha = float(acfg.get("lora_alpha", r))
    scale = (alpha / (r ** 0.5)) if acfg.get("use_rslora") else (alpha / r)
    dtype = dtype or config.dtype
    L = config.num_layers

    # slot -> layer -> (A, B)
    per_slot: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    with st_mod.read_safetensors(st_path) as sf:
        for name in sf.keys():
            m = _KEY_RE.match(name)
            if not m:
                continue
            layer, module, which = int(m.group(1)), m.group(2), m.group(3)
            slot = _MODULE_SLOTS.get(module)
            if slot is None:
                continue
            per_slot.setdefault(slot, {}).setdefault(layer, {})[which] = \
                np.asarray(sf.tensor(name), np.float32)
    if not per_slot:
        raise ModelFormatError(
            f"no LoRA tensors recognized in {st_path} (expected PEFT "
            "…lora_A/lora_B.weight keys)")

    out: Dict[str, Any] = {}
    for slot, layers in per_slot.items():
        # validate BEFORE dereferencing shapes: an adapter whose first
        # layer holds only a lora_B used to crash with a raw KeyError
        for i, ab in layers.items():
            if "A" not in ab or "B" not in ab:
                raise ModelFormatError(
                    f"layer {i} {slot}: incomplete LoRA pair")
            if not 0 <= i < L:
                raise ModelFormatError(
                    f"adapter targets layer {i} ({slot}) but the base "
                    f"model has {L} layers — wrong base model?")
        any_layer = next(iter(layers.values()))
        rr = any_layer["A"].shape[0]
        d_in = any_layer["A"].shape[1]
        d_out = any_layer["B"].shape[0]
        a = np.zeros((L, d_in, rr), np.float32)
        b = np.zeros((L, rr, d_out), np.float32)
        for i, ab in layers.items():
            a[i] = ab["A"].T                      # [r, in] -> [in, r]
            b[i] = ab["B"].T * scale              # [out, r] -> [r, out]
        out[f"lora_{slot}_a"] = jnp.asarray(a, dtype)
        out[f"lora_{slot}_b"] = jnp.asarray(b, dtype)
    tlog.log_info("loaded LoRA %s: r=%d alpha=%g targets=%s", path, r,
                  alpha, sorted(per_slot))
    return out


def apply_lora(params: Dict[str, Any], lora: Dict[str, Any]
               ) -> Dict[str, Any]:
    """Attach adapter slots to a param pytree (runtime low-rank path;
    works with quantized bases)."""
    layers = dict(params["layers"])
    layers.update(lora)
    return {**params, "layers": layers}


def strip_lora(params: Dict[str, Any]) -> Dict[str, Any]:
    """Remove any attached adapter slots."""
    layers = {k: v for k, v in params["layers"].items()
              if not k.startswith("lora_")}
    return {**params, "layers": layers}


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any]
               ) -> Dict[str, Any]:
    """Fold the adapter into FULL-PRECISION base weights
    (W += A @ B per layer); quantized slots are rejected — use
    apply_lora for those."""
    layers = dict(params["layers"])
    for key in [k for k in lora if k.endswith("_a")]:
        slot = key[len("lora_"):-len("_a")]
        base = layers.get(slot)
        if base is None:
            raise ModelFormatError(f"adapter targets missing slot {slot}")
        if isinstance(base, QTensor):
            raise ModelFormatError(
                f"cannot merge LoRA into quantized '{slot}' — use "
                "apply_lora (runtime path) instead")
        a = lora[key].astype(jnp.float32)
        b = lora[f"lora_{slot}_b"].astype(jnp.float32)
        delta = jnp.einsum("lir,lro->lio", a, b)
        layers[slot] = (base.astype(jnp.float32) + delta).astype(base.dtype)
    return {**params, "layers": layers}
