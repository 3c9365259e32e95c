"""Core compute ops — pure-JAX reference implementations.

This module is the TPU-native replacement for the reference TensorEngine
(reference: src/core/tensor_engine.cpp — SIMD GEMM at :191-255, softmax
:925-1043, attention :1045-1147, fast incremental attention :1254-1388,
rms_norm :1452, apply_rope :1510-1624). Instead of hand-scheduled AVX2
loops, each op here is a pure function XLA fuses and tiles onto the
MXU/VPU; the hottest paths have Pallas kernel twins in
turboinfer_tpu/kernels/pallas/ selected via dispatch in this module.

Every op keeps a `*_ref` pure-jnp form usable in interpret/CPU tests as
the numerical golden model.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from turboinfer_tpu.config import RopeMode
from turboinfer_tpu.core.qtensor import QTensor, unpack_int4

# Calibration hook (quant/calibrate.py): while a tap is installed, every
# qmatmul reports (x, w, layer_index) before computing. Eager-mode tool
# only — inside jit the tap would see tracers.
_QMM_TAP = None


@contextlib.contextmanager
def qmm_tap(fn):
    global _QMM_TAP
    prev = _QMM_TAP
    _QMM_TAP = fn
    try:
        yield
    finally:
        _QMM_TAP = prev

# Large-negative constant for masking; avoids -inf NaN propagation in softmax
# when an entire row is masked (unlike the reference's raw -inf at
# inference_engine.cpp:434 which would NaN on fully-masked rows).
NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm over the last axis (reference: tensor_engine.cpp:1452-1508).

    Statistics in fp32 regardless of input dtype (the reference up-converts
    too via convert_dtype); output in x.dtype. `offset` is added to the
    weight before scaling — Gemma stores RMSNorm weights as (w - 1) and
    applies (1 + w), so Gemma-family configs pass offset=1.0.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if offset:
        w = w + offset
    return (y * w).astype(dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array] = None,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis (reference: tensor_engine.cpp:1390-1450)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


# ---------------------------------------------------------------------------
# Activations (reference: tensor_engine.cpp relu :828, gelu :872, silu :900)
# ---------------------------------------------------------------------------

def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """SwiGLU combine: silu(gate) * up (reference: inference_engine.cpp:376-401)."""
    return silu(gate) * up


_GLU_ACTS = {"silu": silu, "gelu": gelu, "relu": relu}


def glu(gate: jax.Array, up: jax.Array, act: str = "silu") -> jax.Array:
    """Gated FFN combine: act(gate) * up. act="silu" is LLaMA SwiGLU,
    "gelu" is Gemma GeGLU (tanh-approximate, matching HF
    gelu_pytorch_tanh)."""
    return _GLU_ACTS[act](gate) * up


def apply_softcap(s: jax.Array, cap: Optional[float]) -> jax.Array:
    """Logit soft-capping (Gemma2): cap * tanh(s / cap). Monotonic, so it
    composes with online-softmax max-tracking in the flash kernels."""
    if cap is None:
        return s
    return cap * jnp.tanh(s / cap)


def alibi_slopes(num_heads: int) -> jax.Array:
    """Per-head ALiBi slopes (Press et al.; the HF build_alibi_tensor
    convention used by Falcon-RW and BLOOM): geometric sequence
    2**(-8i/n) over the largest power-of-two head count, with odd
    intermediate slopes appended for non-power-of-two head counts.
    The score bias is slope * key_position — ALiBi's relative form
    slope*(j - i) differs from this per query row only by a constant,
    which softmax cancels."""
    import math
    closest = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** -(2.0 ** -(math.log2(closest) - 3))
    slopes = [base ** i for i in range(1, closest + 1)]
    if closest != num_heads:
        extra_base = 2.0 ** -(2.0 ** -(math.log2(2 * closest) - 3))
        slopes += [extra_base ** i
                   for i in range(1, 2 * (num_heads - closest) + 1, 2)]
    return jnp.asarray(slopes, jnp.float32)


# ---------------------------------------------------------------------------
# RoPE (reference: tensor_engine.cpp:1510-1624 — interleaved convention;
# the HALF convention is what HF-exported SafeTensors weights expect)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def rope_freqs(head_dim: int, theta: float = 10000.0,
               dtype=jnp.float32,
               scaling: Tuple[Tuple[str, float], ...] = ()) -> jax.Array:
    """Per-pair inverse frequencies: theta^(-2i/d), i in [0, d/2).

    `scaling` is a hashable (key, value) tuple encoding HF-style
    rope_scaling. Supported rope_type values: "linear" (divide all
    freqs by `factor`), "llama3" (Llama-3.1 frequency-banded
    scaling: low-frequency bands divided by `factor`, high-frequency
    bands untouched, smooth ramp between — keys factor,
    low_freq_factor, high_freq_factor, original_max_position_embeddings)
    and "yarn" (NTK-by-parts: per-dim blend of interpolated and
    original freqs over the beta_fast/beta_slow correction range, used
    by GPT-OSS and DeepSeek long-context; pair with
    rope_attention_factor for the cos/sin amplitude correction).
    """
    i = jnp.arange(0, head_dim // 2, dtype=jnp.float32)
    freqs = theta ** (-2.0 * i / head_dim)
    if scaling:
        d = dict(scaling)
        kind = str(d.get("rope_type", d.get("type", "linear")))
        factor = float(d.get("factor", 1.0))
        if kind == "linear":
            freqs = freqs / factor
        elif kind == "llama3":
            low = float(d.get("low_freq_factor", 1.0))
            high = float(d.get("high_freq_factor", 4.0))
            orig = float(d.get("original_max_position_embeddings", 8192))
            wavelen = 2.0 * jnp.pi / freqs
            # smooth ramp between the high-freq (untouched) and
            # low-freq (fully scaled) bands, as in Llama 3.1.
            smooth = (orig / wavelen - low) / (high - low)
            smooth = jnp.clip(smooth, 0.0, 1.0)
            scaled = (1 - smooth) * (freqs / factor) + smooth * freqs
            freqs = jnp.where(wavelen > orig / low, freqs / factor,
                              jnp.where(wavelen < orig / high, freqs,
                                        scaled))
        elif kind == "yarn":
            import math
            beta_fast = float(d.get("beta_fast") or 32.0)
            beta_slow = float(d.get("beta_slow") or 1.0)
            orig = float(d.get("original_max_position_embeddings", 4096))
            truncate = bool(d.get("truncate", True))
            dim = head_dim

            def corr_dim(rot):
                return (dim * math.log(orig / (rot * 2 * math.pi))
                        / (2 * math.log(theta)))
            low, high = corr_dim(beta_fast), corr_dim(beta_slow)
            if truncate:
                low, high = math.floor(low), math.ceil(high)
            low, high = max(low, 0.0), min(high, dim - 1.0)
            if low == high:
                high += 0.001
            ramp = jnp.clip(
                (jnp.arange(dim // 2, dtype=jnp.float32) - low)
                / (high - low), 0.0, 1.0)
            extrap_w = 1.0 - ramp
            freqs = (freqs / factor) * (1 - extrap_w) + freqs * extrap_w
        else:
            raise ValueError(f"unsupported rope_scaling type '{kind}' "
                             "(supported: linear, llama3, yarn)")
    return freqs.astype(dtype)


def rope_attention_factor(scaling: Tuple[Tuple[str, float], ...]) -> float:
    """YaRN cos/sin amplitude correction ("attention_factor" /
    inferred 0.1*mscale*ln(factor)+1). 1.0 for every other scaling."""
    if not scaling:
        return 1.0
    d = dict(scaling)
    if str(d.get("rope_type", d.get("type", ""))) != "yarn":
        return 1.0
    if d.get("attention_factor") is not None:
        return float(d["attention_factor"])
    import math
    factor = float(d.get("factor", 1.0))

    def get_mscale(scale, m=1.0):
        return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0
    mscale, mscale_all = d.get("mscale"), d.get("mscale_all_dim")
    if mscale and mscale_all:
        return float(get_mscale(factor, float(mscale))
                     / get_mscale(factor, float(mscale_all)))
    return float(get_mscale(factor))


def apply_rope(x: jax.Array, positions: jax.Array, theta: float = 10000.0,
               mode: RopeMode = RopeMode.HALF,
               freqs: Optional[jax.Array] = None,
               scaling: Tuple[Tuple[str, float], ...] = ()) -> jax.Array:
    """Rotary position embedding.

    x: [..., seq, num_heads, head_dim]; positions: [..., seq] int32.
    `freqs` overrides the theta-derived table — used for per-layer
    frequency selection (Gemma3 local/global RoPE bases).
    Unlike the reference's live path (a no-op stub,
    inference_engine.cpp:410-417 — SURVEY.md quirk #2), this is real and
    applied to q and k in the model.
    """
    head_dim = x.shape[-1]
    if freqs is None:
        freqs = rope_freqs(head_dim, theta, scaling=scaling)  # [d/2]
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [..., seq, d/2]
    cos = jnp.cos(angles)[..., None, :]                        # [..., seq, 1, d/2]
    sin = jnp.sin(angles)[..., None, :]
    mscale = rope_attention_factor(scaling)                    # yarn only
    if mscale != 1.0:
        cos, sin = cos * mscale, sin * mscale
    xf = x.astype(jnp.float32)
    if mode == RopeMode.INTERLEAVED:
        x_even = xf[..., 0::2]
        x_odd = xf[..., 1::2]
        r_even = x_even * cos - x_odd * sin
        r_odd = x_even * sin + x_odd * cos
        out = jnp.stack([r_even, r_odd], axis=-1).reshape(x.shape)
    else:  # HALF: rotate (i, i + d/2) pairs
        x1 = xf[..., : head_dim // 2]
        x2 = xf[..., head_dim // 2:]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.concatenate([r1, r2], axis=-1)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Quantized matmul (reference counterpart: matmul dispatch at
# tensor_engine.cpp:490-528 + the dequantize-then-matmul consumption path
# quantization.cpp / tensor_engine.cpp:497-505. Here dequant is fused.)
# ---------------------------------------------------------------------------

def _dequant_ref(qt: QTensor, dtype) -> jax.Array:
    """Inline group-wise dequant [K, N] — jnp form XLA fuses into the dot."""
    K, N = qt.shape
    if qt.bits == 4:
        q = unpack_int4(qt.data, qt.group_size)[:K]
    else:
        q = qt.data
    g = qt.group_size
    G = -(-K // g)
    pad = G * g - K
    qf = q.astype(jnp.float32)
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0)))
    qg = qf.reshape(G, g, N)
    scales = qt.scales
    if scales.ndim == 3:               # pre-tiled [nk, gk, N] (prepare_scales)
        scales = scales.reshape(G, N)
    if qt.zero_points is not None:
        zp = qt.zero_points
        if zp.ndim == 3:               # pre-tiled [nk, gk, N]
            zp = zp.reshape(G, N)
        qg = qg - zp.astype(jnp.float32)[:, None, :]
    w = (qg * scales.astype(jnp.float32)[:, None, :]).reshape(G * g, N)[:K]
    return w.astype(dtype)


def qmatmul_ref(x: jax.Array, qt: QTensor,
                preferred_dtype=jnp.float32) -> jax.Array:
    """x @ dequant(qt): pure-jnp golden model for the Pallas kernel."""
    w = _dequant_ref(qt, x.dtype)
    return jnp.matmul(x, w, preferred_element_type=preferred_dtype).astype(x.dtype)


def qmatmul(x: jax.Array, w, preferred_dtype=jnp.float32,
            layer_index=None) -> jax.Array:
    """Matmul against a weight that may be fp (jax.Array) or a QTensor.

    [..., K] @ [K, N] -> [..., N]. For QTensor weights, dispatches to the
    fused dequant-matmul Pallas kernel on TPU when shapes allow, else the
    jnp reference (XLA still fuses the dequant into the dot).

    `layer_index`: when the weight is STACKED [L, ...] (scan over
    layers), pass the traced layer id instead of slicing the stack —
    the Pallas kernel then reads layer `i` directly from the stacked
    HBM array via scalar prefetch, avoiding a per-layer weight copy.
    """
    if _QMM_TAP is not None:
        _QMM_TAP(x, w, layer_index)
    if isinstance(w, QTensor):
        from turboinfer_tpu.kernels import dispatch
        return dispatch.qmatmul(x, w, preferred_dtype, layer_index)
    if layer_index is not None and w.ndim == 3:
        w = jax.lax.dynamic_index_in_dim(w, layer_index, 0, keepdims=False)
    return jnp.matmul(x, w.astype(x.dtype),
                      preferred_element_type=preferred_dtype).astype(x.dtype)


def qmatmul_grouped(x: jax.Array, w, slots: jax.Array,
                    preferred_dtype=jnp.float32) -> jax.Array:
    """Grouped matmul against G data-dependent slots of a stacked weight.

    x: [G, ..., K] per-group activations; slots: [G] traced ids into
    the weight stack's leading axis. -> [G, ..., N]. QTensor weights run
    as ONE Pallas launch for all G slots on TPU (MoE decode's k routed
    experts); fp weights / other backends gather-and-batch."""
    if isinstance(w, QTensor):
        from turboinfer_tpu.kernels import dispatch
        return dispatch.qmatmul_grouped(x, w, slots, preferred_dtype)
    wg = jnp.take(w, slots, axis=0)                       # [G, K, N]
    return jnp.einsum("g...k,gkn->g...n", x, wg.astype(x.dtype),
                      preferred_element_type=preferred_dtype).astype(x.dtype)


# ---------------------------------------------------------------------------
# Softmax + sampling-adjacent math (reference: tensor_engine.cpp:925-1043)
# ---------------------------------------------------------------------------

def softmax(x: jax.Array, axis: int = -1, temperature: float = 1.0) -> jax.Array:
    """Numerically-stable softmax with optional temperature divide
    (reference applies temperature inside softmax, tensor_engine.cpp:944)."""
    xf = x.astype(jnp.float32)
    if temperature != 1.0:
        xf = xf / temperature
    return jax.nn.softmax(xf, axis=axis).astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention — prefill (full-sequence, causal) and decode (single query
# against KV cache). The reference materializes [seq, seq] scores
# (inference_engine.cpp:347-359); the ref forms here do too (fine at toy
# sizes and as golden models), while the Pallas flash kernel never does.
# ---------------------------------------------------------------------------

def _repeat_kv(k: jax.Array, num_q_heads: int) -> jax.Array:
    """GQA: expand [B, Hkv, T, D] -> [B, Hq, T, D] by head repetition."""
    b, hkv, t, d = k.shape
    if hkv == num_q_heads:
        return k
    rep = num_q_heads // hkv
    return jnp.repeat(k, rep, axis=1)


def attention_prefill_ref(q: jax.Array, k: jax.Array, v: jax.Array,
                          *, causal: bool = True,
                          positions: Optional[jax.Array] = None,
                          kv_len: Optional[jax.Array] = None,
                          window: Optional[int] = None,
                          softcap: Optional[float] = None,
                          alibi: Optional[jax.Array] = None) -> jax.Array:
    """Full scaled-dot-product attention.

    q: [B, S, Hq, D], k/v: [B, Hkv, T, D] (head-major cache layout)
    -> [B, S, Hq, D].
    `positions` ([B, S]) gives absolute positions of the queries for causal
    masking against cache slots 0..T-1; defaults to arange (fresh prefill).
    `kv_len` ([B]) optionally masks cache slots >= kv_len (padded cache).
    `alibi` ([Hq]) adds slope*key_position per head (see alibi_slopes).
    """
    B, S, Hq, D = q.shape
    T = k.shape[2]
    k = _repeat_kv(k, Hq)
    v = _repeat_kv(v, Hq)
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    qf = q.astype(jnp.float32) * scale
    # [B, Hq, S, T]
    scores = jnp.einsum("bshd,bhtd->bhst", qf, k.astype(jnp.float32))
    scores = apply_softcap(scores, softcap)
    if alibi is not None:
        scores = scores + (alibi[None, :, None, None]
                           * jnp.arange(T, dtype=jnp.float32))
    mask = None
    if window is not None and not causal:
        # the window mask below is causal-only; silently attending the
        # full context here would be wrong (the pallas path also defers
        # windowed non-causal to this reference)
        raise NotImplementedError(
            "sliding_window attention requires causal=True")
    if causal:
        if positions is None:
            qpos = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        else:
            qpos = positions
        kpos = jnp.arange(T)
        mask = qpos[:, None, :, None] >= kpos[None, None, None, :]
        if window is not None:
            # Sliding window: key positions within `window` of the query.
            mask = mask & (kpos[None, None, None, :]
                           > qpos[:, None, :, None] - window)
    if kv_len is not None:
        valid = kpos[None, None, None, :] < kv_len[:, None, None, None] \
            if causal else (jnp.arange(T)[None, None, None, :] <
                            kv_len[:, None, None, None])
        mask = valid if mask is None else (mask & valid)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bhtd->bshd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def attention_decode_ref(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                         kv_len: jax.Array,
                         window: Optional[int] = None,
                         softcap: Optional[float] = None,
                         alibi: Optional[jax.Array] = None) -> jax.Array:
    """Single-token attention against the KV cache — golden model for the
    Pallas decode kernel (reference counterpart:
    tensor_engine.cpp:1254-1388 attention_fast_incremental).

    q: [B, Hq, D]; k_cache/v_cache: [B, Hkv, Tmax, D]; kv_len: [B] number
    of valid slots (includes the current token, already written).
    `alibi` ([Hq]) adds slope*key_position per head (see alibi_slopes).
    """
    B, Hq, D = q.shape
    Tmax = k_cache.shape[2]
    k = _repeat_kv(k_cache, Hq)   # [B, Hq, Tmax, D]
    v = _repeat_kv(v_cache, Hq)
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("bhd,bhtd->bht", qf, k.astype(jnp.float32))
    scores = apply_softcap(scores, softcap)
    if alibi is not None:
        scores = scores + (alibi[None, :, None]
                           * jnp.arange(Tmax, dtype=jnp.float32))
    valid = jnp.arange(Tmax)[None, None, :] < kv_len[:, None, None]
    if window is not None:
        # Query position is kv_len-1; it sees positions > kv_len-1-window.
        valid = valid & (jnp.arange(Tmax)[None, None, :]
                         >= kv_len[:, None, None] - window)
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bht,bhtd->bhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def embed_lookup(embed, tokens: jax.Array, dtype) -> jax.Array:
    """Embedding gather for plain fp tables and per-row-int8 QEmbed
    tables (reference quirk #1 fixed: REAL gather; and the reference
    quantizes embeddings too — quantization.cpp:89-118 — which here
    dequantizes only the gathered rows, keeping the table int8 in HBM)."""
    from turboinfer_tpu.core.qtensor import QEmbed
    if isinstance(embed, QEmbed):
        rows = jnp.take(embed.data, tokens, axis=0).astype(jnp.float32)
        scales = jnp.take(embed.scales, tokens, axis=0)
        return (rows * scales).astype(dtype)
    return jnp.take(embed, tokens, axis=0).astype(dtype)


def attention_decode_fused_ref(q: jax.Array, k_cache: jax.Array,
                               v_cache: jax.Array, kv_len: jax.Array,
                               window: Optional[int] = None,
                               softcap: Optional[float] = None,
                               sinks: Optional[jax.Array] = None
                               ) -> jax.Array:
    """attention_decode_ref over the FUSED-head cache layout
    [B, T, Hkv*D] (heads packed into the lane dim — the layout that
    keeps D % 128 != 0 models on the Pallas decode kernel; see
    kernels/pallas/decode_attention.decode_fused_pallas).

    sinks: optional [Hq] per-head sink logits (GPT-OSS) — the softmax
    runs over [scores, sink] and the sink position contributes no
    value: probs = exp(s - m) / (exp(sink - m) + sum exp(s - m))."""
    B, Hq, D = q.shape
    T, HD = k_cache.shape[1], k_cache.shape[2]
    Hkv = HD // D
    k = k_cache.reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
    v = v_cache.reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
    if sinks is None:
        return attention_decode_ref(q, k, v, kv_len, window=window,
                                    softcap=softcap)
    k = _repeat_kv(k, Hq)
    v = _repeat_kv(v, Hq)
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    scores = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    scores = apply_softcap(scores, softcap)
    valid = jnp.arange(T)[None, None, :] < kv_len[:, None, None]
    if window is not None:
        valid = valid & (jnp.arange(T)[None, None, :]
                         >= kv_len[:, None, None] - window)
    scores = jnp.where(valid, scores, NEG_INF)
    s0 = sinks.astype(jnp.float32)[None, :, None]        # [1, Hq, 1]
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s0)
    p = jnp.exp(scores - m)
    denom = jnp.exp(s0 - m) + jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bht,bhtd->bhd", p / denom, v.astype(jnp.float32))
    return out.astype(q.dtype)


def attention_paged_decode_ref(q: jax.Array, k_pages: jax.Array,
                               v_pages: jax.Array, block_table: jax.Array,
                               kv_len: jax.Array,
                               window: Optional[int] = None,
                               softcap: Optional[float] = None) -> jax.Array:
    """Single-token attention over a PAGED cache (one layer) — golden
    model for kernels/pallas/paged_attention.py. Gathers the sequence's
    pages into a contiguous view, then attention_decode_ref.

    q: [B, Hq, D]; k_pages/v_pages: [P, Hkv, page, D];
    block_table: [B, max_pages] page ids (-1 = unassigned);
    kv_len: [B] valid tokens (includes the current token, already
    written into its page).
    """
    B, Hq, D = q.shape
    P, Hkv, page, _ = k_pages.shape
    n = block_table.shape[1]
    t = jnp.clip(block_table, 0, P - 1)                   # [B, n]
    k = k_pages[t].transpose(0, 2, 1, 3, 4).reshape(B, Hkv, n * page, D)
    v = v_pages[t].transpose(0, 2, 1, 3, 4).reshape(B, Hkv, n * page, D)
    return attention_decode_ref(q, k.astype(q.dtype), v.astype(q.dtype),
                                kv_len, window=window, softcap=softcap)


def attention_paged_verify_ref(q: jax.Array, k_pages: jax.Array,
                               v_pages: jax.Array, block_table: jax.Array,
                               kv_len: jax.Array,
                               window: Optional[int] = None,
                               softcap: Optional[float] = None
                               ) -> jax.Array:
    """Multi-query paged attention (speculative verify) — golden model
    for kernels/pallas/paged_attention.paged_verify_pallas.

    q: [B, G, Hq, D] — the G chunk tokens, already written into pages;
    kv_len: [B] INCLUDING the chunk (query g is at kv_len - G + g).
    Gathers pages into a contiguous view, then attention_prefill_ref
    with per-query positions (causal among the chunk)."""
    B, G, Hq, D = q.shape
    P, Hkv, page, _ = k_pages.shape
    n = block_table.shape[1]
    t = jnp.clip(block_table, 0, P - 1)
    k = k_pages[t].transpose(0, 2, 1, 3, 4).reshape(B, Hkv, n * page, D)
    v = v_pages[t].transpose(0, 2, 1, 3, 4).reshape(B, Hkv, n * page, D)
    positions = (kv_len - G)[:, None] + jnp.arange(G)[None, :]
    return attention_prefill_ref(q, k.astype(q.dtype), v.astype(q.dtype),
                                 causal=True, positions=positions,
                                 kv_len=kv_len, window=window,
                                 softcap=softcap)


# ---------------------------------------------------------------------------
# Dispatch wrappers: use Pallas kernels on TPU, jnp reference elsewhere.
# ---------------------------------------------------------------------------

def attention_prefill(q, k, v, *, causal=True, positions=None, kv_len=None,
                      q_start=None, window=None, softcap=None, alibi=None,
                      layer_index=None, k_scale=None, v_scale=None):
    from turboinfer_tpu.kernels import dispatch
    return dispatch.attention_prefill(q, k, v, causal=causal,
                                      positions=positions, kv_len=kv_len,
                                      q_start=q_start, window=window,
                                      softcap=softcap, alibi=alibi,
                                      layer_index=layer_index,
                                      k_scale=k_scale, v_scale=v_scale)


def attention_decode(q, k_cache, v_cache, kv_len, layer_index=None,
                     window=None, softcap=None, alibi=None,
                     k_scale=None, v_scale=None):
    from turboinfer_tpu.kernels import dispatch
    return dispatch.attention_decode(q, k_cache, v_cache, kv_len,
                                     layer_index=layer_index, window=window,
                                     softcap=softcap, alibi=alibi,
                                     k_scale=k_scale, v_scale=v_scale)


def attention_paged_verify(q, k_pages, v_pages, block_table, kv_len,
                           layer_index=None, window=None, softcap=None,
                           k_scale=None, v_scale=None):
    from turboinfer_tpu.kernels import dispatch
    return dispatch.attention_paged_verify(
        q, k_pages, v_pages, block_table, kv_len,
        layer_index=layer_index, window=window, softcap=softcap,
        k_scale=k_scale, v_scale=v_scale)


def attention_paged_decode(q, k_pages, v_pages, block_table, kv_len,
                           layer_index=None, window=None, softcap=None,
                           k_scale=None, v_scale=None):
    from turboinfer_tpu.kernels import dispatch
    return dispatch.attention_paged_decode(q, k_pages, v_pages, block_table,
                                           kv_len, layer_index=layer_index,
                                           window=window, softcap=softcap,
                                           k_scale=k_scale, v_scale=v_scale)


def attention_decode_fused(q, k_cache, v_cache, kv_len, layer_index=None,
                           window=None, softcap=None, sinks=None,
                           k_scale=None, v_scale=None):
    from turboinfer_tpu.kernels import dispatch
    return dispatch.attention_decode_fused(q, k_cache, v_cache, kv_len,
                                           layer_index=layer_index,
                                           window=window, softcap=softcap,
                                           sinks=sinks, k_scale=k_scale,
                                           v_scale=v_scale)
