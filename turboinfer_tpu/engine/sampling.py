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
    """Static sampling knobs (subset of InferenceConfig)."""
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 0.9


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


def sample(rng: jax.Array, logits: jax.Array, params: SamplingParams
           ) -> jax.Array:
    """Full pipeline: temperature → top-k → top-p → categorical draw.

    logits: [..., V] -> tokens [...] int32. temperature<=0 → greedy.
    """
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = apply_temperature(logits.astype(jnp.float32), params.temperature)
    x = apply_top_k(x, params.top_k)
    x = apply_top_p(x, params.top_p)
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


def sample_per_slot(rng: jax.Array, logits: jax.Array,
                    temperature: jax.Array, top_k: jax.Array,
                    top_p: jax.Array, num_candidates: int = 128
                    ) -> jax.Array:
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
    choice = jax.random.categorical(rng, xs, axis=-1)     # [B]
    drawn = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    greedy = idx[:, 0]
    return jnp.where(temperature <= 0.0, greedy,
                     drawn).astype(jnp.int32)
