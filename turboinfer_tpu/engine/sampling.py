"""On-device sampling: temperature / top-k / top-p / multinomial / greedy.

Reference counterpart: InferenceEngine::sample_next_token
(src/model/inference_engine.cpp:1554-1673) and the tensor-level variants
apply_temperature/top_k/top_p (:1675-1796). Same math, but fully
vectorized over the batch, jit-safe (fixed shapes, no host sync), and
driven by jax PRNG keys instead of a wall-clock-seeded mt19937 — so
generation is reproducible given a seed (the reference is not,
inference_engine.cpp:471-473).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SamplingParams(NamedTuple):
    """Static sampling knobs (subset of InferenceConfig).

    Beyond the reference's temperature/top_k/top_p (its whole surface):
    min_p nucleus floor, HF-convention repetition_penalty, and
    OpenAI-convention presence/frequency penalties. A default-valued
    penalty is a no-op and compiles to nothing (static check)."""
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 0.9
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0

    @property
    def needs_counts(self) -> bool:
        """True when sampling needs the seen-token count state."""
        return (self.repetition_penalty != 1.0
                or self.presence_penalty != 0.0
                or self.frequency_penalty != 0.0)


def apply_temperature(logits: jax.Array, temperature: float) -> jax.Array:
    """Divide logits by temperature (reference :1578; <=0 means greedy)."""
    if temperature <= 0.0:
        return logits
    return logits / temperature


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Keep top-k logits, mask the rest to -inf (reference :1585-1598,
    which sorts; here lax.top_k — O(V log k) and TPU-friendly)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering (reference :1614-1650): keep the smallest prefix
    of the sorted distribution with cumulative prob >= p; mask the rest."""
    if p >= 1.0 or p <= 0.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Token i is kept if the cumulative mass BEFORE it is < p (so the first
    # token crossing p is included, matching the reference's loop).
    keep_sorted = (cum - probs) < p
    # Threshold = smallest kept logit.
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                     axis=-1, keepdims=True)
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    """Min-p filtering: drop tokens whose probability is below
    min_p × P(max) (scales the nucleus with model confidence — matches
    transformers' MinPLogitsWarper)."""
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    floor = min_p * jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < floor, NEG_INF, logits)


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    repetition_penalty=1.0, presence_penalty=0.0,
                    frequency_penalty=0.0,
                    out_counts: Optional[jax.Array] = None) -> jax.Array:
    """Seen-token penalties over [..., V] logits given per-token
    occurrence counts [..., V] (int).

    repetition_penalty follows the HF/CTRL convention — divide positive
    logits, multiply negative ones, for any token in `counts` (prompt +
    output). presence/frequency follow the OpenAI convention — flat /
    per-count subtraction over `out_counts` (generated tokens only;
    defaults to `counts`). Scalars or per-row [...] arrays broadcast.
    """
    if out_counts is None:
        out_counts = counts
    # clamp: r<=0 would produce inf/NaN logits (client input reaches
    # this path via the serving API)
    r = jnp.maximum(jnp.asarray(repetition_penalty, jnp.float32), 1e-3)
    pres = jnp.asarray(presence_penalty, jnp.float32)
    freq = jnp.asarray(frequency_penalty, jnp.float32)
    if r.ndim == logits.ndim - 1:
        r = r[..., None]
    if pres.ndim == logits.ndim - 1:
        pres = pres[..., None]
    if freq.ndim == logits.ndim - 1:
        freq = freq[..., None]
    x = logits.astype(jnp.float32)
    penalized = jnp.where(x > 0, x / r, x * r)
    x = jnp.where(counts > 0, penalized, x)
    return x - freq * out_counts.astype(jnp.float32) \
        - pres * (out_counts > 0).astype(jnp.float32)


def sample(rng: jax.Array, logits: jax.Array, params: SamplingParams,
           counts=None) -> jax.Array:
    """Full pipeline: penalties → temperature → top-k → top-p → min-p →
    categorical draw.

    logits: [..., V] -> tokens [...] int32. temperature<=0 → greedy
    (penalties still apply — greedy anti-repetition is a real use).
    `counts` = (all_counts [..., V], out_counts [..., V]) is required
    iff params.needs_counts (all = prompt+output for repetition, out =
    generated-only for presence/frequency).
    """
    x = logits.astype(jnp.float32)
    if params.needs_counts:
        all_counts, out_counts = counts
        x = apply_penalties(x, all_counts, params.repetition_penalty,
                            params.presence_penalty,
                            params.frequency_penalty,
                            out_counts=out_counts)
    if params.temperature <= 0.0:
        return jnp.argmax(x, axis=-1).astype(jnp.int32)
    x = apply_temperature(x, params.temperature)
    # NOTE: a "fused" candidate-space pipeline (one top_k, then
    # top-p/min-p/draw over the [.., k] window, as sample_per_slot does
    # for its own reasons) measured 3.6x SLOWER end-to-end on the tiny
    # decode: sub-lane-width [B, 50] tensors relayout badly and the
    # final take_along_axis gather is latency-bound. Full-vocab masking
    # keeps everything in clean [B, V] vector ops — but when BOTH top-k
    # and top-p are active, ONE descending sort serves both (top-k's
    # threshold is sorted[k-1]; top-p's nucleus scan runs on the same
    # sorted values), saving a separate lax.top_k pass per decode step.
    k, V = params.top_k, x.shape[-1]
    if 0 < k < V and 0.0 < params.top_p < 1.0:
        sorted_desc = jnp.sort(x, axis=-1)[..., ::-1]
        kth = sorted_desc[..., k - 1:k]
        x = jnp.where(x < kth, NEG_INF, x)           # == apply_top_k
        svals = jnp.where(sorted_desc < kth, NEG_INF, sorted_desc)
        probs = jax.nn.softmax(svals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = (cum - probs) < params.top_p
        thresh = jnp.min(jnp.where(keep_sorted, svals, jnp.inf),
                         axis=-1, keepdims=True)
        x = jnp.where(x < thresh, NEG_INF, x)        # == apply_top_p
    else:
        x = apply_top_k(x, params.top_k)
        x = apply_top_p(x, params.top_p)
    x = apply_min_p(x, params.min_p)
    return jax.random.categorical(rng, x, axis=-1).astype(jnp.int32)


def greedy(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def log_softmax(logits: jax.Array) -> jax.Array:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def token_logprob(logits: jax.Array, token: jax.Array) -> jax.Array:
    """Log-probability of `token` under `logits` (reference counterpart:
    compute_logprobs, inference_engine.cpp:873-954 — but exact, no
    sentinel error constants)."""
    lp = log_softmax(logits)
    return jnp.take_along_axis(lp, token[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]


def filtered_dist_per_slot(logits: jax.Array, temperature: jax.Array,
                           top_k: jax.Array, top_p: jax.Array
                           ) -> jax.Array:
    """Per-row (temperature → top-k → top-p)-filtered probability
    distribution — the dist speculative acceptance judges proposals
    under. logits [B, ..., V]; temperature/top_p [B] f32, top_k [B] i32
    broadcast over middle axes. Greedy rows (temperature <= 0) return a
    ONE-HOT at the argmax, which makes rejection-sampling acceptance
    collapse to exact greedy matching for those rows."""
    V = logits.shape[-1]
    x = logits.astype(jnp.float32)
    bshape = (x.shape[0],) + (1,) * (x.ndim - 2)
    t = jnp.maximum(temperature, 1e-6).reshape(bshape + (1,))
    xs = x / t
    sorted_desc = jnp.sort(xs, axis=-1)[..., ::-1]
    k = jnp.where(top_k <= 0, V, jnp.clip(top_k, 1, V)).reshape(bshape)
    kidx = jnp.broadcast_to((k - 1)[..., None], xs.shape[:-1] + (1,))
    kth = jnp.take_along_axis(sorted_desc, kidx, axis=-1)
    xs = jnp.where(xs < kth, NEG_INF, xs)
    svals = jnp.where(sorted_desc < kth, NEG_INF, sorted_desc)
    probs = jax.nn.softmax(svals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    p = jnp.where((top_p <= 0.0) | (top_p >= 1.0), 1.0,
                  top_p).reshape(bshape + (1,))
    keep = (cum - probs) < p
    thresh = jnp.min(jnp.where(keep, svals, jnp.inf), axis=-1,
                     keepdims=True)
    xs = jnp.where(xs < thresh, NEG_INF, xs)
    dist = jax.nn.softmax(xs, axis=-1)
    onehot = jax.nn.one_hot(jnp.argmax(x, axis=-1), V, dtype=jnp.float32)
    g = (temperature <= 0.0).reshape(bshape + (1,))
    return jnp.where(g, onehot, dist)


def sample_per_slot(rng: jax.Array, logits: jax.Array,
                    temperature: jax.Array, top_k: jax.Array,
                    top_p: jax.Array, num_candidates: int = 128,
                    min_p: Optional[jax.Array] = None,
                    repetition_penalty: Optional[jax.Array] = None,
                    presence_penalty: Optional[jax.Array] = None,
                    frequency_penalty: Optional[jax.Array] = None,
                    counts: Optional[jax.Array] = None,
                    out_counts: Optional[jax.Array] = None) -> jax.Array:
    """Per-ROW sampling knobs — each batch slot gets its own
    temperature/top_k/top_p (continuous batching serves concurrent
    requests with different parameters; the reference has no batching
    at all, let alone per-request sampling).

    logits [B, V]; temperature/top_p [B] f32; top_k [B] i32.
    temperature<=0 → greedy for that row. Jit-friendly: the filtering
    runs inside a static `num_candidates`-wide lax.top_k slice (the
    effective per-row k is clamped to it), so there is no data-dependent
    shape anywhere.
    """
    B, V = logits.shape
    C = min(num_candidates, V)
    x = logits.astype(jnp.float32)
    if counts is not None:
        # per-row penalties over the full vocab BEFORE candidate
        # selection (greedy rows must respect them too)
        x = apply_penalties(
            x, counts,
            1.0 if repetition_penalty is None else repetition_penalty,
            0.0 if presence_penalty is None else presence_penalty,
            0.0 if frequency_penalty is None else frequency_penalty,
            out_counts=out_counts)
    vals, idx = jax.lax.top_k(x, C)                       # [B, C] desc
    t = jnp.maximum(temperature, 1e-6)[:, None]
    xs = vals / t
    # top-k within candidates: row position >= k masked (k<=0 → keep all)
    pos = jnp.arange(C)[None, :]
    k = jnp.where(top_k <= 0, C, jnp.minimum(top_k, C))[:, None]
    xs = jnp.where(pos < k, xs, NEG_INF)
    # top-p among the kept candidates (same "first token crossing p is
    # included" convention as apply_top_p)
    probs = jax.nn.softmax(xs, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    p = jnp.where((top_p <= 0.0) | (top_p >= 1.0), 1.0, top_p)[:, None]
    xs = jnp.where((cum - probs) < p, xs, NEG_INF)
    if min_p is not None:
        # min-p floor within candidates (probs are softmax over the
        # candidate window — P(max) matches full-vocab up to the tail)
        floor = min_p[:, None] * jnp.max(probs, axis=-1, keepdims=True)
        xs = jnp.where((probs < floor) & (min_p[:, None] > 0.0),
                       NEG_INF, xs)
    choice = jax.random.categorical(rng, xs, axis=-1)     # [B]
    drawn = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    greedy = idx[:, 0]
    return jnp.where(temperature <= 0.0, greedy,
                     drawn).astype(jnp.int32)
