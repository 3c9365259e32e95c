"""QTensor: group-wise quantized weight container as a JAX pytree.

TPU-native replacement for the reference Quantizer's in-memory format
(reference: src/optimize/quantization.cpp:36-118). Fixes two reference
defects documented in SURVEY.md:
  - quirk #5: the reference stores INT4 one-value-per-int32 (zero real
    compression, quantization.cpp:46). Here int4 is packed two nibbles per
    uint8 along the contraction axis.
  - quirk #6: the reference is per-tensor despite the per_channel flag
    (quantization.cpp:343-367). Here scales are group-wise along the
    contraction (input) axis: scales[ceil(K/g), N].

Quantization math matches the reference's conventions
(quantization.cpp:352-387):
  int8 symmetric:  scale = absmax/127,  q = clip(round(x/scale), -127, 127)
  int8 asymmetric: scale = (max-min)/255, zp = round(-min/scale) - 128,
                   q = clip(round(x/scale) + zp, -128, 127)
  int4 symmetric:  scale = absmax/7,    q = clip(round(x/scale), -7, 7)
  int4 asymmetric: scale = (max-min)/15, zp = round(-min/scale) - 8,
                   q = clip(round(x/scale) + zp, -8, 7)
(computed per group instead of per tensor; zero-points are stored such that
dequant is always `(q - zp) * scale`, avoiding the reference's int4 sign
convention quirk at quantization.cpp:681/711).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import QuantType
from turboinfer_tpu.utils.errors import QuantizationError


def pack_int4(q: jax.Array, group_size: int) -> jax.Array:
    """Pack int values in [-8, 7] two per byte along axis 0,
    planar-within-group.

    q: [K, ...] with K % group_size == 0 and group_size even. Within each
    scale group of g rows, the first g/2 logical rows land in the LOW
    nibbles of the group's g/2 bytes and the last g/2 rows in the HIGH
    nibbles (offset by +8 so nibbles are unsigned). This layout lets the
    Pallas qmm kernel dequantize with two contiguous half-dots — no
    sublane interleave shuffles on the weight side.
    """
    K = q.shape[0]
    g = group_size if group_size > 0 else K
    if g % 2 or K % g:
        raise QuantizationError(
            f"int4 pack needs even group_size dividing K (K={K}, g={g})")
    u = (q.astype(jnp.int32) + 8).astype(jnp.uint8)       # [0, 15]
    tail = q.shape[1:]
    ug = u.reshape((K // g, g) + tail)
    lo = ug[:, : g // 2]
    hi = ug[:, g // 2:]
    return (lo | (hi << 4)).reshape((K // 2,) + tail).astype(jnp.uint8)


def unpack_int4(packed: jax.Array, group_size: int) -> jax.Array:
    """Inverse of pack_int4: [K//2, ...] uint8 -> [K, ...] int8 in [-8, 7]."""
    K2 = packed.shape[0]
    K = 2 * K2
    g = group_size if group_size > 0 else K
    tail = packed.shape[1:]
    pg = packed.reshape((K // g, g // 2) + tail)
    lo = (pg & 0x0F).astype(jnp.int8) - 8
    hi = ((pg >> 4) & 0x0F).astype(jnp.int8) - 8
    out = jnp.concatenate([lo, hi], axis=1)               # [G, g, ...]
    return out.reshape((K,) + tail)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A quantized 2-D weight [K, N] (K = contraction axis).

    data:   int8 [K, N]  (bits=8)  or packed uint8 [K//2, N] (bits=4)
    scales: [G, N] float32/bfloat16 where G = ceil(K / group_size)
    zero_points: optional [G, N] (None for symmetric)
    """

    data: jax.Array
    scales: jax.Array
    zero_points: Optional[jax.Array]
    bits: int                 # static: 4 or 8
    group_size: int           # static: elements per group along K
    shape: Tuple[int, int]    # static: logical (K, N)
    # Optional SECOND pre-tiled scales copy in the PREFILL kernel's
    # [L, nk, gk, N] layout (pallas/qmm.prepare_scales): the prefill
    # tiles pick a different TK than decode, and the 4-D retile is not
    # a bitcast on TPU — without this the layer scan paid one scales
    # copy per layer per prefill (~0.9 ms of a 48 ms 7B S=512 pass).
    # Derived at engine setup, never persisted; ~1/16 of weight bytes.
    scales_pf: Optional[jax.Array] = None

    # -- pytree protocol (bits/group_size/shape are static) ------------
    def tree_flatten(self):
        children = (self.data, self.scales, self.zero_points,
                    self.scales_pf)
        aux = (self.bits, self.group_size, self.shape)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scales, zp, scales_pf = children
        bits, group_size, shape = aux
        return cls(data=data, scales=scales, zero_points=zp, bits=bits,
                   group_size=group_size, shape=shape,
                   scales_pf=scales_pf)

    # -- convenience ----------------------------------------------------
    @property
    def K(self) -> int:
        return self.shape[0]

    @property
    def N(self) -> int:
        return self.shape[1]

    @property
    def num_groups(self) -> int:
        return self.scales.shape[0]

    @property
    def symmetric(self) -> bool:
        return self.zero_points is None

    def nbytes(self) -> int:
        n = self.data.size * self.data.dtype.itemsize
        n += self.scales.size * self.scales.dtype.itemsize
        if self.zero_points is not None:
            n += self.zero_points.size * self.zero_points.dtype.itemsize
        return n

    def astuple(self):
        return (self.data, self.scales, self.zero_points)


def concat_n(qts) -> "QTensor":
    """Concatenate QTensors along N (the output axis).

    Packing and scale groups run along K, so fusing same-input
    projections (e.g. q/k/v) is a pure concat of data/scales/zero_points
    on the last axis — per-column dequant semantics are unchanged, the
    fused matmul is numerically identical to the separate ones. Works
    for 2-D [K/kd, N] and stacked [L, K/kd, N] layouts alike.
    """
    first = qts[0]
    for qt in qts[1:]:
        if (qt.bits != first.bits or qt.group_size != first.group_size
                or qt.shape[0] != first.shape[0]
                or qt.data.ndim != first.data.ndim
                or qt.scales.dtype != first.scales.dtype
                or (qt.zero_points is None) != (first.zero_points is None)):
            raise QuantizationError(
                "concat_n needs matching K/bits/group_size/scale-dtype/"
                "symmetry across operands")
    data = jnp.concatenate([qt.data for qt in qts], axis=-1)
    scales = jnp.concatenate([qt.scales for qt in qts], axis=-1)
    zp = None if first.zero_points is None else jnp.concatenate(
        [qt.zero_points for qt in qts], axis=-1)
    N = sum(qt.shape[1] for qt in qts)
    return QTensor(data=data, scales=scales, zero_points=zp,
                   bits=first.bits, group_size=first.group_size,
                   shape=(first.shape[0], N))


def _group_reduce(x: jax.Array, group_size: int):
    """Reshape [K, N] -> [G, g, N] with zero padding; returns (xg, G, pad)."""
    K, N = x.shape
    g = group_size if group_size > 0 else K
    G = -(-K // g)
    pad = G * g - K
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x.reshape(G, g, N), G, pad


def _mse_scale(xg: jax.Array, base_scale: jax.Array, qmax: float,
               num_grid: int = 16, shrink_min: float = 0.30,
               moments: Optional[jax.Array] = None) -> jax.Array:
    """Per-group scale minimizing round-trip squared error.

    Grid-searches shrink factors c ∈ [shrink_min, 1] applied to the
    absmax scale: a smaller scale clips the group's outliers but gives
    the bulk finer resolution — for heavy-tailed weight groups the MSE
    optimum is often c < 1. c=1 is in the grid, so the result is never
    worse than plain absmax. (The clipping-threshold search used by AWQ
    and llama.cpp's imatrix-free i-quants, in weight space.)

    moments (optional [G, g]): per-input-channel activation second
    moments E[x_k²] from a calibration pass (quant/calibrate.py).
    Weighting the error by them makes the objective the DIAGONAL
    approximation of the layer output MSE ||x@W - x@Ŵ||² — channels the
    model actually drives hard get quantized more faithfully
    (llama.cpp's imatrix, AWQ's activation-aware criterion).

    xg: [G, g, N] grouped weights; base_scale: [G, N] absmax/qmax.
    """
    best_err = None
    best = base_scale
    m = None
    if moments is not None:
        # Floor at 1% of the mean moment: channels never activated in
        # calibration still count a little, so their weights don't get
        # clipped arbitrarily hard.
        mf = moments.astype(jnp.float32)
        m = (jnp.maximum(mf, 0.01 * jnp.mean(mf)))[:, :, None]  # [G, g, 1]
    for c in jnp.linspace(1.0, shrink_min, num_grid):
        s = jnp.maximum(base_scale * c, 1e-12)
        q = jnp.clip(jnp.round(xg / s[:, None, :]), -qmax, qmax)
        sq = jnp.square(q * s[:, None, :] - xg)
        if m is not None:
            sq = sq * m
        err = jnp.sum(sq, axis=1)                              # [G, N]
        if best_err is None:
            best_err = err
        else:
            take = err < best_err
            best = jnp.where(take, s, best)
            best_err = jnp.minimum(err, best_err)
    return best


def quantize(w: jax.Array, qtype: QuantType, *, group_size: int = 64,
             symmetric: bool = True, scale_dtype=jnp.bfloat16,
             scale_method: str = "absmax",
             weight_moments: Optional[jax.Array] = None) -> QTensor:
    # bf16 scales by default: f32 scales add 25% HBM traffic on top of
    # int4 data at g=64; the ~0.4% scale rounding is far below the int4
    # quantization error itself.
    """Group-wise quantize a 2-D fp weight [K, N] along K."""
    if w.ndim != 2:
        raise QuantizationError(f"quantize expects 2-D [K, N], got {w.shape}")
    if qtype not in (QuantType.INT8, QuantType.INT4):
        raise QuantizationError(f"unsupported qtype {qtype}")
    K, N = w.shape
    bits = 8 if qtype == QuantType.INT8 else 4
    if bits == 4:
        g_eff = group_size if group_size > 0 else K
        if K % 2 != 0 or g_eff % 2 != 0 or K % g_eff != 0:
            raise ValueError(
                f"int4 needs even K and even group_size dividing K "
                f"(K={K}, group_size={g_eff})")
    if scale_method not in ("absmax", "mse"):
        raise QuantizationError(f"unknown scale_method '{scale_method}'")
    if (scale_method == "mse" or weight_moments is not None) \
            and not symmetric:
        raise QuantizationError(
            "scale_method='mse' / calibrated quantization requires "
            "symmetric quantization")
    wf = w.astype(jnp.float32)
    xg, G, pad = _group_reduce(wf, group_size)
    g = xg.shape[1]
    mg = None
    if weight_moments is not None:
        # weight_moments: [K] per-input-channel E[x²] — group like w.
        mf = jnp.asarray(weight_moments, jnp.float32).reshape(-1)
        if mf.shape[0] != K:
            raise QuantizationError(
                f"weight_moments length {mf.shape[0]} != K={K}")
        if pad:
            mf = jnp.pad(mf, (0, pad))
        mg = mf.reshape(G, g)

    if symmetric:
        qmax = 127.0 if bits == 8 else 7.0
        absmax = jnp.max(jnp.abs(xg), axis=1)                     # [G, N]
        scale = jnp.where(absmax > 0, absmax / qmax, 1.0)         # [G, N]
        if scale_method == "mse" or mg is not None:
            scale = _mse_scale(xg, scale, qmax, moments=mg)
        q = jnp.round(xg / scale[:, None, :])
        q = jnp.clip(q, -qmax, qmax)
        zp = None
    else:
        levels = 255.0 if bits == 8 else 15.0
        lo = -128.0 if bits == 8 else -8.0
        hi = 127.0 if bits == 8 else 7.0
        mn = jnp.min(xg, axis=1)
        mx = jnp.max(xg, axis=1)
        rng = mx - mn
        scale = jnp.where(rng > 0, rng / levels, 1.0)
        # zp chosen so that q = round(x/scale) + zp_shift lands in [lo, hi]
        # and dequant is (q - zp) * scale with zp = round(mn/scale) - lo.
        zp_f = jnp.round(mn / scale) - lo                          # [G, N]
        q = jnp.round(xg / scale[:, None, :]) - zp_f[:, None, :] + 0.0
        # q = round(x/scale) - (round(mn/scale) - lo)  ∈ ~[lo, hi]
        q = jnp.clip(q, lo, hi)
        zp = (-zp_f).astype(jnp.float32)  # store zp st dequant=(q-zp)*scale
        # dequant: (q - zp)*scale = (round(x/s) - round(mn/s) + lo + round(mn/s) - lo)*s ≈ x

    q = q.reshape(G * g, N)[:K].astype(jnp.int8)
    if bits == 4:
        data = pack_int4(q, group_size if group_size > 0 else K)
    else:
        data = q
    return QTensor(data=data, scales=scale.astype(scale_dtype),
                   zero_points=None if zp is None else zp.astype(scale_dtype),
                   bits=bits, group_size=(group_size if group_size > 0 else K),
                   shape=(K, N))


def dequantize(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Reconstruct the fp weight [K, N]. Pure-jnp reference path."""
    K, N = qt.shape
    if qt.bits == 4:
        q = unpack_int4(qt.data, qt.group_size)[:K].astype(jnp.float32)
    else:
        q = qt.data.astype(jnp.float32)
    g = qt.group_size
    G = -(-K // g)
    pad = G * g - K
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
    qg = q.reshape(G, g, N)
    sc = qt.scales
    if sc.ndim == 3:                   # pre-tiled [nk, gk, N] (prepare_scales)
        sc = sc.reshape(G, N)
    scales = sc.astype(jnp.float32)[:, None, :]
    if qt.zero_points is not None:
        zp = qt.zero_points
        if zp.ndim == 3:               # pre-tiled [nk, gk, N]
            zp = zp.reshape(G, N)
        qg = qg - zp.astype(jnp.float32)[:, None, :]
    w = (qg * scales).reshape(G * g, N)[:K]
    return w.astype(dtype)


def quantization_error(w: jax.Array, qt: QTensor) -> float:
    """Relative L2 reconstruction error — the honest version of the
    reference's validate_quantization_accuracy tensor-diff mode
    (quantization.cpp:447-608)."""
    wd = dequantize(qt, jnp.float32)
    wf = w.astype(jnp.float32)
    num = jnp.linalg.norm(wf - wd)
    den = jnp.maximum(jnp.linalg.norm(wf), 1e-12)
    return float(num / den)


def estimate_compression_ratio(shape: Tuple[int, int], qtype: QuantType,
                               group_size: int = 64, symmetric: bool = True,
                               from_dtype_bytes: int = 4) -> float:
    """Theoretical compression ratio vs fp source — honest version of the
    reference's estimate (quantization.cpp:396-445), accounting for scales
    and zero-points."""
    K, N = shape
    G = -(-K // (group_size if group_size > 0 else K))
    if qtype == QuantType.INT8:
        data = K * N
    elif qtype == QuantType.INT4:
        data = (K // 2) * N
    elif qtype == QuantType.FLOAT16:
        data = 2 * K * N
    else:
        return 1.0
    meta = G * N * 4 * (1 if symmetric else 2)
    return (from_dtype_bytes * K * N) / float(data + meta)


def to_numpy_blobs(qt: QTensor):
    """Host-side numpy views for persistence (see loader/tinq.py)."""
    blobs = {"data": np.asarray(qt.data), "scales": np.asarray(qt.scales)}
    if qt.zero_points is not None:
        blobs["zero_points"] = np.asarray(qt.zero_points)
    return blobs


# ---------------------------------------------------------------------------
# Quantized embedding table (per-row int8, dequant on gathered rows)
# ---------------------------------------------------------------------------

class QEmbed(NamedTuple):
    """Per-ROW symmetric int8 embedding table.

    The reference quantizes every fp32 tensor including embeddings
    (quantization.cpp:89-118); a matmul-grouped QTensor is the wrong
    container for a gather, so embeddings use per-row scales instead:
    data [V, H] int8, scales [V, 1] f32. Lookup gathers the token rows
    and dequantizes ONLY those rows — the table stays int8 in HBM
    (2x smaller than bf16, 4x than f32).

    NamedTuple => automatic pytree; both leaves are plain arrays, so
    sharding/persistence helpers that only special-case QTensor still
    traverse it.
    """
    data: jax.Array
    scales: jax.Array


def quantize_embed(w: jax.Array) -> QEmbed:
    """[V, H] fp -> per-row symmetric int8."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True),
                    1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return QEmbed(data=q, scales=s)


def dequantize_embed(e: QEmbed, dtype=jnp.float32) -> jax.Array:
    return (e.data.astype(jnp.float32) * e.scales).astype(dtype)
