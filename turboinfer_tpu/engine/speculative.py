"""Speculative decoding: draft model proposes, target verifies in one pass.

No reference counterpart (the reference decodes strictly one token per
forward, inference_engine.cpp:1493-1552). TPU-native design: every
round is ONE fixed-shape jitted call —

  1. draft ingest: one draft forward caches the current token,
  2. draft propose: k autoregressive draft steps under `lax.scan`
     (the k-th also caches d_k, which keeps the draft cache exactly in
     sync with the target's confirmed prefix after every round),
  3. target verify: one (k+1)-wide chunked forward scores ALL proposals
     (this is where the speedup lives: the target model streams its
     weights once per round instead of once per token),
  4. acceptance: greedy match or full rejection sampling
     (accept d_i iff u·q(d_i) <= p(d_i); on reject, resample from the
     residual max(p-q, 0)) — the output distribution provably equals
     the target model's own sampling distribution,
  5. cache-length rollback: rejected positions' K/V stay as masked
     garbage and are overwritten by later writes — no copies.

Per-sequence acceptance varies inside the fixed [B] batch via the
ragged-batch forward (per-sequence cache lengths). Greedy speculative
output is token-identical to plain greedy decoding of the target model
(tested), so speculation is a pure-latency win.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import InferenceConfig, ModelConfig
from turboinfer_tpu.engine import sampling
from turboinfer_tpu.engine.sampling import SamplingParams
from turboinfer_tpu.models import registry
from turboinfer_tpu.models.common import KVCache


class SpecState(NamedTuple):
    tok: jax.Array        # [B] current (confirmed, un-cached) token
    cache_t: KVCache
    cache_d: KVCache


def rejection_accept(pt: jax.Array, qd: jax.Array, drafts: jax.Array,
                     rng_acc, rng_res) -> Tuple[jax.Array, jax.Array]:
    """Shared rejection-sampling core (used by BOTH the engine-level
    spec step below and the scheduler's per-slot round — one copy of
    the acceptance math, so a fix cannot silently miss one of them).

    pt/qd: target/draft FILTERED distributions over the k draft
    positions [B, k, V]; drafts: [B, k] proposed tokens.
    Returns (a [B] accepted counts, corr [B] the residual-resampled
    correction token at the first rejected position).

    Accept d_i iff u·q(d_i) < p(d_i) — STRICT: u==0.0 is reachable
    (uniform draws from [0,1)) and <= would accept a draft the target
    assigns zero filtered probability. On reject, resample from the
    residual max(p-q, 0) (renormalized; falls back to p when the
    residual is empty) — the output distribution provably equals the
    target's own sampling distribution.
    """
    k = drafts.shape[1]
    p_d = jnp.take_along_axis(pt, drafts[..., None], axis=-1)[..., 0]
    q_d = jnp.take_along_axis(qd, drafts[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(rng_acc, drafts.shape)
    ok = u * q_d < p_d
    acc = jnp.cumprod(ok.astype(jnp.int32), axis=1)
    a = jnp.sum(acc, axis=1)                                   # [B]
    slot = jnp.minimum(a, k - 1)
    pt_a = jnp.take_along_axis(pt, slot[:, None, None], axis=1)[:, 0]
    qd_a = jnp.take_along_axis(qd, slot[:, None, None], axis=1)[:, 0]
    res = jnp.maximum(pt_a - qd_a, 0.0)
    res_sum = jnp.sum(res, axis=-1, keepdims=True)
    res = jnp.where(res_sum > 0, res / res_sum, pt_a)
    corr = jax.random.categorical(
        rng_res, jnp.log(jnp.maximum(res, 1e-30))).astype(jnp.int32)
    return a, corr


def emit_layout(drafts: jax.Array, nxt: jax.Array, a: jax.Array
                ) -> jax.Array:
    """Round output layout [B, k+1]: d_1..d_a then nxt, padded with
    nxt (shared by engine and scheduler rounds)."""
    k = drafts.shape[1]
    pos = jnp.arange(k + 1)[None, :]
    return jnp.where(pos < a[:, None],
                     jnp.pad(drafts, ((0, 0), (0, 1))), nxt[:, None])


def _filtered_probs(logits: jax.Array, sp: SamplingParams) -> jax.Array:
    """The (temperature/top-k/top-p)-filtered distribution both models'
    proposals are judged under. Matches sampling.sample's pipeline."""
    x = sampling.apply_temperature(logits.astype(jnp.float32),
                                   sp.temperature)
    x = sampling.apply_top_k(x, sp.top_k)
    x = sampling.apply_top_p(x, sp.top_p)
    return jax.nn.softmax(x, axis=-1)


def make_spec_step(model_t, cfg_t: ModelConfig, model_d, cfg_d: ModelConfig,
                   k: int, sp: SamplingParams):
    """Build the jitted one-round step.

    Returns step(params_t, params_d, state, rng) ->
      (state', out_tokens [B, k+1], out_count [B]) where out_tokens[b]
    holds the a_b accepted drafts followed by the correction/bonus token
    (out_count = a_b + 1 valid entries).
    """
    greedy = sp.temperature <= 0.0

    @jax.jit
    def step(params_t, params_d, state: SpecState, rng: jax.Array):
        B = state.tok.shape[0]
        rng_d, rng_acc, rng_res, rng_bonus = jax.random.split(rng, 4)

        # -- 1. draft ingest of the current token ----------------------
        lg, cache_d = model_d.forward(params_d, cfg_d, state.tok[:, None],
                                      state.cache_d)
        lg0 = lg[:, 0]                                         # [B, V]

        # -- 2. draft propose k tokens --------------------------------
        def draft_body(carry, r):
            lg_prev, cache_d = carry
            d = (sampling.greedy(lg_prev) if greedy
                 else sampling.sample(r, lg_prev, sp))
            lg, cache_d = model_d.forward(params_d, cfg_d, d[:, None],
                                          cache_d)
            return (lg[:, 0], cache_d), (d, lg_prev)

        (_, cache_d), (drafts, dlogits) = jax.lax.scan(
            draft_body, (lg0, cache_d), jax.random.split(rng_d, k))
        drafts = drafts.T                                      # [B, k]
        dlogits = dlogits.transpose(1, 0, 2)                   # [B, k, V]

        # -- 3. target verify in one pass -----------------------------
        chunk_t = jnp.concatenate([state.tok[:, None], drafts], axis=1)
        tlg, cache_t = model_t.forward(params_t, cfg_t, chunk_t,
                                       state.cache_t)          # [B,k+1,V]

        # -- 4. acceptance --------------------------------------------
        if greedy:
            tbest = jnp.argmax(tlg, axis=-1).astype(jnp.int32)  # [B, k+1]
            ok = tbest[:, :k] == drafts                         # [B, k]
            acc = jnp.cumprod(ok.astype(jnp.int32), axis=1)
            a = jnp.sum(acc, axis=1)                            # [B]
            # Correction token = target argmax at the first reject;
            # bonus (all accepted) = target argmax after d_k.
            nxt = jnp.take_along_axis(tbest, a[:, None], axis=1)[:, 0]
        else:
            pt = _filtered_probs(tlg[:, :k], sp)                # [B,k,V]
            qd = _filtered_probs(dlogits, sp)
            a, corr = rejection_accept(pt, qd, drafts, rng_acc, rng_res)
            bonus = sampling.sample(rng_bonus, tlg[:, k], sp)
            nxt = jnp.where(a == k, bonus, corr)

        # -- 5. cache-length rollback ---------------------------------
        # The draft scan also cached d_k, so the draft is never behind:
        # both caches hold exactly the confirmed tokens t0, d_1..d_a.
        len_t = state.cache_t.length + 1 + a
        cache_t = cache_t._replace(length=len_t)
        cache_d = cache_d._replace(length=len_t)

        # Emitted tokens this round: d_1..d_a then nxt, padded with nxt.
        out = emit_layout(drafts, nxt, a)                       # [B, k+1]
        state = SpecState(tok=nxt, cache_t=cache_t, cache_d=cache_d)
        return state, out, a + 1

    return step


@dataclasses.dataclass
class SpecResult:
    tokens: List[List[int]]          # prompt + generated, per sequence
    acceptance_rate: float           # accepted drafts / proposed drafts
    tokens_per_round: float          # mean emitted tokens per round
    rounds: int
    total_time_ms: float


def speculative_generate(params_t: Dict[str, Any], cfg_t: ModelConfig,
                         params_d: Dict[str, Any], cfg_d: ModelConfig,
                         prompts: Sequence[Sequence[int]],
                         max_new_tokens: int = 64, *, k: int = 4,
                         config: Optional[InferenceConfig] = None,
                         max_seq: Optional[int] = None) -> SpecResult:
    """Batched speculative generation (host loop, one jitted round/call).

    The draft and target caches are prefilled on the common prompts
    (right-padded ragged batch); rounds run until every sequence has
    max_new_tokens or hit EOS. k = draft tokens per round.
    """
    config = config or InferenceConfig()
    sp = SamplingParams(temperature=config.temperature,
                        top_k=config.top_k, top_p=config.top_p)
    model_t = registry.get_model(cfg_t.architecture)
    model_d = registry.get_model(cfg_d.architecture)
    B = len(prompts)
    if B == 0 or any(len(p) == 0 for p in prompts):
        raise ValueError("prompts must be non-empty")
    T = max_seq or min(cfg_t.max_seq_len, cfg_d.max_seq_len)
    plens = np.array([len(p) for p in prompts])
    S = int(plens.max())
    arr = np.full((B, S), config.pad_token_id, np.int32)
    for b, p in enumerate(prompts):
        arr[b, : len(p)] = p

    t0 = time.perf_counter()
    rng = jax.random.PRNGKey(config.seed)
    # Prefill BOTH models on prompt[:-1]; the last prompt token is the
    # round loop's first input.
    lens = jnp.asarray(plens - 1, jnp.int32)
    from turboinfer_tpu.models.common import resolve_kv_dtype
    dt_t = resolve_kv_dtype(config.kv_cache_dtype, cfg_t.dtype)
    dt_d = resolve_kv_dtype(config.kv_cache_dtype, cfg_d.dtype)
    for m, dt in ((model_t, dt_t), (model_d, dt_d)):
        if dt == jnp.int8 and not getattr(m, "SUPPORTS_INT8_KV", False):
            raise ValueError(
                "kv_cache_dtype='int8' is not supported by this model "
                "family (its forward does not thread the per-token KV "
                "scales); use 'fp8' or 'bf16'")
    cache_t = model_t.init_cache(cfg_t, B, max_seq=T, dtype=dt_t)
    cache_d = model_d.init_cache(cfg_d, B, max_seq=T, dtype=dt_d)
    if S > 1:
        _, cache_t = model_t.forward(params_t, cfg_t,
                                     jnp.asarray(arr[:, :-1]), cache_t,
                                     seq_lens=lens)
        _, cache_d = model_d.forward(params_d, cfg_d,
                                     jnp.asarray(arr[:, :-1]), cache_d,
                                     seq_lens=lens)
    last = jnp.asarray(arr[np.arange(B), plens - 1], jnp.int32)
    state = SpecState(tok=last, cache_t=cache_t, cache_d=cache_d)

    step = make_spec_step(model_t, cfg_t, model_d, cfg_d, k, sp)
    out: List[List[int]] = [list(p) for p in prompts]
    if S + max_new_tokens + k + 1 > T:
        raise ValueError(
            f"max_seq {T} too small for prompt {S} + {max_new_tokens} "
            f"new + {k} draft slack")
    done = np.zeros((B,), bool)
    accepted = proposed = emitted = rounds = 0
    while not done.all() and rounds < max_new_tokens:
        rng, sub = jax.random.split(rng)
        state, toks, counts = step(params_t, params_d, state, sub)
        toks_np = np.asarray(toks)
        counts_np = np.asarray(counts)
        rounds += 1
        for b in range(B):
            if done[b]:
                continue
            room = max_new_tokens - (len(out[b]) - len(prompts[b]))
            take = min(int(counts_np[b]), room)
            delivered = 0
            for t in toks_np[b, :take]:
                out[b].append(int(t))
                delivered += 1
                if int(t) == config.eos_token_id:
                    done[b] = True
                    break
            if len(out[b]) - len(prompts[b]) >= max_new_tokens:
                done[b] = True
            # metrics count what was actually DELIVERED (room caps and
            # mid-round EOS drop the tail of a round's tokens)
            accepted += max(delivered - 1, 0)
            proposed += k
            emitted += delivered
    dt = (time.perf_counter() - t0) * 1e3
    return SpecResult(tokens=out,
                      acceptance_rate=accepted / max(proposed, 1),
                      tokens_per_round=emitted / max(rounds * B, 1),
                      rounds=rounds, total_time_ms=dt)
