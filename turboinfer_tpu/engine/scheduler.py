"""Continuous batching: slot-based scheduler over a fixed-shape decode step.

The reference has NO real batching — generate_batch is a sequential loop
(reference: src/model/inference_engine.cpp:804-828, SURVEY.md quirk #7).
This is the TPU-native replacement described in SURVEY.md §7 hard part
#3: a fixed-[B] slot pool, per-slot positions/EOS inside one jitted
decode step (no recompilation as requests come and go), prompt prefill
into a free slot's cache region, and slot recycling the moment a
sequence finishes. Arbitrary request streams run at full batch
efficiency instead of one-at-a-time.

Decode step cost is independent of how many slots are live (fixed
shapes); throughput scales with occupancy.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import deque
from typing import Any, Deque, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import InferenceConfig, ModelConfig
from turboinfer_tpu.engine import sampling
from turboinfer_tpu.engine.engine import GenerationResult, _bucket
from turboinfer_tpu.models import registry
from turboinfer_tpu.models.common import KVCache


@dataclasses.dataclass
class _Request:
    rid: int
    prompt: List[int]
    max_new: int
    submitted_at: float
    out_tokens: List[int] = dataclasses.field(default_factory=list)
    out_logprobs: List[float] = dataclasses.field(default_factory=list)
    slot: int = -1
    prefill_ms: float = 0.0
    finished: bool = False
    finished_at: float = 0.0             # perf_counter at completion
    stop_reason: str = "length"
    # per-request sampling overrides (None → InferenceConfig defaults)
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    min_p: Optional[float] = None
    repetition_penalty: Optional[float] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    logit_bias: Optional[Dict[int, float]] = None
    # constrained decoding: "json" | "json_object" |
    # ("schema", <canonical schema json>) | None
    response_format: object = None
    struct_state: object = None          # live grammar state (FSM)


def _scatter_into_slots(cache: KVCache, small: KVCache, slots,
                        seq_lens) -> KVCache:
    """Write a freshly-prefilled small cache's rows into their slots of
    the shared pool (shared by full-width and chunked admission — keep
    the int8-scale branch in ONE place). Handles the deepseek pipeline
    cache too (replicated dense prelude + pp-sharded MoE slabs)."""
    if hasattr(cache, "k_dense"):
        return cache._replace(
            k_dense=cache.k_dense.at[:, slots].set(
                small.k_dense.astype(cache.k_dense.dtype)),
            v_dense=cache.v_dense.at[:, slots].set(
                small.v_dense.astype(cache.v_dense.dtype)),
            k=cache.k.at[:, slots].set(small.k.astype(cache.k.dtype)),
            v=cache.v.at[:, slots].set(small.v.astype(cache.v.dtype)),
            length=cache.length.at[slots].set(seq_lens))
    kc = cache.k.at[:, slots].set(small.k.astype(cache.k.dtype))
    vc = cache.v.at[:, slots].set(small.v.astype(cache.v.dtype))
    ksc = vsc = None
    if cache.k_scale is not None:
        ksc = cache.k_scale.at[:, slots].set(small.k_scale)
        vsc = cache.v_scale.at[:, slots].set(small.v_scale)
    length = cache.length.at[slots].set(seq_lens)
    return KVCache(k=kc, v=vc, length=length, k_scale=ksc, v_scale=vsc)


def _normalize_response_format(rf):
    """Accepts the API surface forms and returns a hashable normal
    form: None | "json" | "json_object" | ("schema", canonical-json).
    Raises ValueError for anything else (schema compile errors surface
    at submit time, not mid-decode)."""
    if rf in (None, "json", "json_object"):
        return rf
    if isinstance(rf, dict):
        t = rf.get("type")
        if t in ("json", "json_object"):
            return t
        if t == "json_schema":
            import json as _json
            js = rf.get("json_schema") or {}
            schema = js.get("schema") if isinstance(js, dict) else None
            if schema is None and isinstance(rf.get("schema"), dict):
                schema = rf["schema"]
            if not isinstance(schema, dict):
                raise ValueError(
                    "response_format json_schema needs "
                    "{'type':'json_schema','json_schema':{'schema': {...}}}")
            from turboinfer_tpu.structured.schema_fsm import SchemaFSM
            SchemaFSM(schema)          # validate/compile now; raises
            # NOTE: no sort_keys — property ORDER is semantic (emitted
            # keys follow the schema's declaration order)
            return ("schema", _json.dumps(schema,
                                          separators=(",", ":")))
    raise ValueError(f"unsupported response_format '{rf}'")


class ContinuousBatchingScheduler:
    """Slot-pool scheduler driving one shared KV cache.

    Usage:
        sched = ContinuousBatchingScheduler(params, model_config,
                                            config, batch_slots=8)
        ids = [sched.submit(p, max_new) for p in prompts]
        results = sched.run()     # {rid: GenerationResult}
    """

    def __new__(cls, *args, **kw):
        # parallel="cp" on the base class transparently constructs the
        # context-parallel scheduler (sequence-sharded prompt cache) —
        # the documented `ContinuousBatchingScheduler(parallel="cp")`
        # API without entangling the slot-pool code with CPCache.
        if (cls is ContinuousBatchingScheduler
                and kw.get("parallel") == "cp"):
            from turboinfer_tpu.engine.cp_scheduler import \
                ContextParallelScheduler
            return super().__new__(ContextParallelScheduler)
        return super().__new__(cls)

    def __init__(self, params: Dict[str, Any], model_config: ModelConfig,
                 config: Optional[InferenceConfig] = None,
                 batch_slots: int = 8, decode_burst: int = 1,
                 max_queue: Optional[int] = None,
                 mesh=None, param_specs: Optional[Dict[str, Any]] = None,
                 tokenizer=None, parallel: str = "tp",
                 draft_params: Optional[Dict[str, Any]] = None,
                 draft_config: Optional[ModelConfig] = None,
                 spec_k: int = 4):
        """mesh: optional jax.sharding.Mesh — continuous batching over a
        TP/DP device mesh (BASELINE config 5: sharded weights + sharded
        KV cache under the slot scheduler). Weights shard per
        `param_specs` (default parallel.shardings.param_specs: qkv/up/
        gate column, o/down row with psum, lm_head column), the cache
        shards batch-over-data and kv-heads-over-tp, and every jitted
        step runs as one pjit program — XLA places the collectives.
        batch_slots must divide by the data-axis size. Multi-host: call
        parallel.mesh.initialize_distributed first and pass the global
        mesh; the host loop runs identically on every process.

        parallel="pp": PIPELINE-parallel continuous batching instead —
        layers stage over the mesh's "pp" axis (weights + slot-pool KV
        cache shard 1/P on the layer axis), so continuous batching can
        serve models larger than one chip's HBM. llama-family decoders
        only (deepseek's split pipeline cache doesn't fit the slot
        scatter); use the engine's pp mode for deepseek.

        draft_params/draft_config: SPECULATIVE decoding under the
        scheduler — every step is one jitted round (draft proposes
        spec_k tokens per slot, one target verify pass scores them,
        per-slot rejection-sampling acceptance under each slot's
        temperature/top-k/top-p filter). Greedy slots are
        trajectory-identical to non-speculative decoding; slots using
        penalties/min_p/logit_bias/grammars fall back to plain
        single-token steps for that iteration (their filters are
        per-token-sequential)."""
        from turboinfer_tpu.kernels import dispatch as _dispatch
        self.params = _dispatch.prepare_params(
            params, fuse=mesh is None)   # fused columns straddle shards
        self.mesh = mesh
        if parallel not in ("tp", "pp", "cp"):
            raise ValueError(f"parallel must be 'tp', 'pp' or 'cp', "
                             f"got '{parallel}'")
        self.parallel = parallel if mesh is not None else "tp"
        if mesh is not None:
            if self.parallel == "pp":
                from turboinfer_tpu.parallel import pipeline as _pl
                self.params = _pl.shard_pp_params(self.params, mesh,
                                                  config=model_config)
            elif self.parallel == "cp":
                from jax.sharding import NamedSharding, PartitionSpec
                from turboinfer_tpu.parallel import context as _cp
                _cp.check_config(model_config)
                if _cp.SP_AXIS not in mesh.shape:
                    raise ValueError("parallel='cp' needs a mesh with "
                                     f"an '{_cp.SP_AXIS}' axis")
                self.params = jax.device_put(
                    self.params, NamedSharding(mesh, PartitionSpec()))
            else:
                from turboinfer_tpu.parallel import shardings as _sh
                self.params = _sh.shard_params(self.params, mesh,
                                               param_specs)
        self.model_config = model_config
        self._model = registry.get_model(model_config.architecture)
        self.config = config or InferenceConfig(
            max_seq_len=model_config.max_seq_len)
        self.B = batch_slots
        self.T = self.config.max_seq_len
        # decode_burst > 1 runs that many decode steps as ONE jitted
        # scan per host iteration: host<->device sync cost amortizes
        # burst-fold (essential over high-latency links; still saves
        # per-step dispatch on-prem). Tradeoff: admission happens only
        # between bursts, and a slot finishing mid-burst idles for the
        # remainder, so keep bursts small relative to typical outputs.
        self.decode_burst = max(1, int(decode_burst))
        # admission control: reject new work beyond this queue depth
        # (None = unbounded); serving maps the rejection to HTTP 429.
        self.max_queue = max_queue
        self._rng = jax.random.PRNGKey(self.config.seed)
        # constrained decoding (response_format): token->bytes trie +
        # per-FSM-state mask cache, built lazily on first structured
        # request (structured/filter.TokenMaskCache)
        self.tokenizer = tokenizer
        self._maskers: Dict[bool, Any] = {}
        # in-flight CHUNKED admission (config.prefill_chunk > 0): one
        # prompt-chunk forward runs per step(), interleaved with decode
        # steps, so live decodes stall at most one chunk — never a full
        # prompt-length (SURVEY §7 hard part 3 / VERDICT r2 item 4).
        self._adm: Optional[Dict[str, Any]] = None
        self._queue: Deque[_Request] = deque()
        self._active: Dict[int, _Request] = {}       # slot -> request
        self._done: Dict[int, _Request] = {}
        self._next_id = 0
        # Device state: shared cache + per-slot current token / activity.
        from turboinfer_tpu.models.common import resolve_kv_dtype
        self._kv_dtype = resolve_kv_dtype(self.config.kv_cache_dtype,
                                          model_config.dtype)
        if self._kv_dtype == jnp.int8 and not getattr(
                self._model, "SUPPORTS_INT8_KV", False):
            raise ValueError(
                "kv_cache_dtype='int8' is not supported by this model "
                "family (its forward does not thread the per-token KV "
                "scales); use 'fp8' or 'bf16'")
        self.cache = self._make_cache()
        self.tokens = jnp.zeros((self.B,), jnp.int32)
        self.active = jnp.zeros((self.B,), jnp.bool_)
        self.budget = jnp.zeros((self.B,), jnp.int32)   # remaining tokens
        # per-slot sampling knobs (requests may override the defaults)
        self.slot_temp = jnp.full((self.B,), self.config.temperature,
                                  jnp.float32)
        self.slot_topk = jnp.full((self.B,), self.config.top_k, jnp.int32)
        self.slot_topp = jnp.full((self.B,), self.config.top_p,
                                  jnp.float32)
        self.slot_minp = jnp.full((self.B,), self.config.min_p,
                                  jnp.float32)
        self.slot_rep = jnp.full((self.B,), self.config.repetition_penalty,
                                 jnp.float32)
        self.slot_pres = jnp.full((self.B,), self.config.presence_penalty,
                                  jnp.float32)
        self.slot_freq = jnp.full((self.B,), self.config.frequency_penalty,
                                  jnp.float32)
        # per-slot seen-token counts for the penalties (prompt / output)
        V = model_config.vocab_size
        self.counts_prompt = jnp.zeros((self.B, V), jnp.int32)
        self.counts_out = jnp.zeros((self.B, V), jnp.int32)
        # per-slot additive logit bias (OpenAI logit_bias)
        self.slot_bias = jnp.zeros((self.B, V), jnp.float32)
        # -- speculative decoding state --------------------------------
        self.spec_k = int(spec_k)
        self._dmodel = None
        # speculative observability: drafts proposed/accepted so far
        self.spec_proposed = 0
        self.spec_accepted = 0
        # host mirror of how many confirmed tokens each slot's DRAFT
        # cache holds (plain/burst fallback steps advance only the
        # target cache; _spec_catchup re-ingests the gap before the
        # next speculative round — without it the draft proposes from
        # a stale context forever and acceptance silently collapses)
        self._spec_dlen: Dict[int, int] = {}
        # host-side per-slot flag: slot's sampling uses only
        # temperature/top-k/top-p (the spec round covers those)
        self._slot_plain = [True] * self.B
        if draft_params is not None:
            if draft_config is None:
                raise ValueError("draft_params requires draft_config")
            from turboinfer_tpu.kernels import dispatch as _dispatch
            self._dmodel = registry.get_model(draft_config.architecture)
            self.draft_config = draft_config
            self.draft_params = _dispatch.prepare_params(
                draft_params, fuse=mesh is None)
            if self.parallel == "pp":
                raise NotImplementedError(
                    "speculative decoding is not supported under the "
                    "pipeline-parallel scheduler")
            self._dkv_dtype = resolve_kv_dtype(self.config.kv_cache_dtype,
                                               draft_config.dtype)
            if self._dkv_dtype == jnp.int8 and not getattr(
                    self._dmodel, "SUPPORTS_INT8_KV", False):
                raise ValueError(
                    "kv_cache_dtype='int8' is not supported by the "
                    "draft model family")
            self.dcache = self._dmodel.init_cache(
                draft_config, self.B, max_seq=self.T,
                dtype=self._dkv_dtype,
                fused=False if mesh is not None else None)
            if mesh is not None:
                from turboinfer_tpu.parallel import shardings as _sh
                self.draft_params = _sh.shard_params(self.draft_params,
                                                     mesh, None)
                self.dcache = _sh.shard_cache(self.dcache, mesh)

    @property
    def _ds_pp(self) -> bool:
        """Pipeline-parallel deepseek: the slot pool is a
        DeepSeekPPCache (replicated dense prelude + staged MoE)."""
        if self.parallel != "pp":
            return False
        from turboinfer_tpu.parallel.pipeline import _family
        return _family(self.model_config)[0] == "deepseek"

    def _wrap_small(self, small):
        """Convert a freshly-initialized deepseek KVCache into the
        pipeline split form the stage relay consumes (no-op
        otherwise)."""
        if not self._ds_pp:
            return small
        from turboinfer_tpu.parallel.pipeline import DeepSeekPPCache
        if small.k_scale is not None:
            raise ValueError("pipeline parallelism does not thread "
                             "int8 KV scales; use bf16 with pp")
        kd = self.model_config.first_k_dense_replace
        return DeepSeekPPCache(k_dense=small.k[:kd],
                               v_dense=small.v[:kd],
                               k=small.k[kd:], v=small.v[kd:],
                               length=small.length)

    def _make_cache(self):
        """The shared slot-pool KV cache (subclasses override: paged
        pool, CP sequence-sharded cache). Sharded runs keep the
        head-major 5-D layout (cache_spec shards kv-heads over tp);
        single-chip runs let the model auto-pick."""
        cache = self._model.init_cache(self.model_config, self.B,
                                       max_seq=self.T,
                                       dtype=self._kv_dtype,
                                       fused=False if self.mesh is not None
                                       else None)
        if self.mesh is not None:
            if self.parallel == "pp":
                from turboinfer_tpu.parallel import pipeline as _pl
                cache = _pl.shard_pp_cache(cache, self.mesh,
                                           config=self.model_config)
            else:
                from turboinfer_tpu.parallel import shardings as _sh
                cache = _sh.shard_cache(cache, self.mesh)
        return cache

    def _adm_bucket(self, plen: int) -> int:
        """Prefill width for an admission group (CP overrides: every
        admission prefills at the fixed ctx width)."""
        return _bucket(plen, self.config.prefill_bucket, cap=self.T)

    def _hit_max_seq(self, req) -> bool:
        """Whether the request has filled its cache capacity (CP
        overrides: the decode tail is the binding bound)."""
        return len(req.prompt) + len(req.out_tokens) >= self.T

    # -- jitted programs ------------------------------------------------

    @functools.cached_property
    def _fwd(self):
        """(params, tokens, cache, seq_lens) -> (logits, cache') — the
        family forward, or the pipeline stage relay under parallel="pp"
        (same indirection as InferenceEngine._fwd)."""
        model, cfg = self._model, self.model_config
        if self.parallel == "pp":
            from turboinfer_tpu.parallel import pipeline as _pl
            mesh = self.mesh

            def fwd(params, tokens, cache, seq_lens=None,
                    logit_idx=None):
                return _pl.pipeline_forward(params, cfg, tokens, cache,
                                            mesh=mesh, seq_lens=seq_lens,
                                            logit_idx=logit_idx)
            return fwd
        return (lambda params, tokens, cache, seq_lens=None,
                logit_idx=None, **kw: model.forward(
                    params, cfg, tokens, cache, seq_lens=seq_lens,
                    logit_idx=logit_idx, **kw))

    @functools.cached_property
    def _decode_fn(self):
        fwd = self._fwd
        eos = self.config.eos_token_id

        @functools.partial(jax.jit, donate_argnums=(3,))
        def step(params, tokens, active, cache, rng, temp, topk, topp,
                 minp, rep, pres, freq, pc, oc, bias):
            """One decode step for every slot; inactive slots still run
            (fixed shape) but their cache length is frozen."""
            logits, new_cache = fwd(params, tokens[:, None], cache)
            logits = logits.at[:, 0].add(bias)
            nxt = sampling.sample_per_slot(
                rng, logits[:, 0], temp, topk, topp, min_p=minp,
                repetition_penalty=rep, presence_penalty=pres,
                frequency_penalty=freq, counts=pc + oc, out_counts=oc)
            lp = sampling.token_logprob(logits[:, 0], nxt)
            oc = oc.at[jnp.arange(oc.shape[0]), nxt].add(
                active.astype(jnp.int32))
            # Inactive slots: keep cache length frozen (writes to their
            # slots are harmless garbage past their length). _replace
            # keeps this polymorphic over KVCache / DeepSeekPPCache.
            cache = new_cache._replace(
                length=jnp.where(active, new_cache.length, cache.length))
            hit_eos = active & (nxt == eos)
            return nxt, lp, hit_eos, cache, oc
        return step

    def _decode_burst_fn(self, n: int):
        """n decode steps as one jitted scan (see decode_burst).

        Per sub-step, each slot samples its next token, decrements its
        budget, and deactivates on EOS / budget exhaustion / cache
        full — all on device, so a burst needs ONE host round trip.
        Returns per-step (token, was_active, hit_eos) so the host can
        reconstruct exactly which tokens each request emitted.
        """
        fwd = self._fwd
        eos = self.config.eos_token_id
        T = self.T

        @functools.partial(jax.jit, donate_argnums=(4,))
        def burst(params, tokens, active, budget, cache, rng,
                  temp, topk, topp, minp, rep, pres, freq, pc, oc, bias):
            def body(carry, rng_i):
                tokens, active, budget, cache, oc = carry
                logits, new_cache = fwd(params, tokens[:, None], cache)
                logits = logits.at[:, 0].add(bias)
                nxt = sampling.sample_per_slot(
                    rng_i, logits[:, 0], temp, topk, topp, min_p=minp,
                    repetition_penalty=rep, presence_penalty=pres,
                    frequency_penalty=freq, counts=pc + oc, out_counts=oc)
                lp = sampling.token_logprob(logits[:, 0], nxt)
                oc = oc.at[jnp.arange(oc.shape[0]), nxt].add(
                    active.astype(jnp.int32))
                new_len = jnp.where(active, new_cache.length, cache.length)
                cache = new_cache._replace(length=new_len)
                was_active = active
                hit_eos = active & (nxt == eos)
                budget = budget - active.astype(jnp.int32)
                active = (active & ~hit_eos & (budget > 0)
                          & (new_len < T))
                tokens = jnp.where(was_active, nxt, tokens)
                return (tokens, active, budget, cache, oc), \
                    (nxt, was_active, hit_eos, lp)
            rngs = jax.random.split(rng, n)
            (tokens, active, budget, cache, oc), \
                (toks, was, eoss, lps) = \
                jax.lax.scan(body, (tokens, active, budget, cache, oc),
                             rngs)
            return (tokens, active, budget, cache, oc, toks, was, eoss,
                    lps)
        return burst

    def _prefill_fn(self, m: int, S: int):
        """Jitted m-prompt prefill: burst admissions share ONE forward
        and one host round trip (m is bucketed to powers of two to
        bound compile variants). With a draft model attached, the SAME
        call prefills the draft cache too (one extra forward, still one
        round trip)."""
        cfg = self.model_config
        model = self._model
        fwd = self._fwd
        fused = (False if self.parallel == "pp"
                 else self.cache.fused_layout)
        spec = self._dmodel is not None
        dmodel = self._dmodel
        dcfg = getattr(self, "draft_config", None)

        last_only = self.parallel in ("tp", "pp")

        @functools.partial(jax.jit,
                           donate_argnums=(4, 5) if spec else (4,))
        def prefill(params, tokens, seq_lens, slots, cache, dcache,
                    params_d, rng, t, k, p, pen, pc_rows, bias_rows):
            """tokens [m, S] → each row written into its slot's cache
            region; per-row first token sampled with its own params."""
            small = self._wrap_small(
                model.init_cache(cfg, m, max_seq=self.T,
                                 dtype=self._kv_dtype, fused=fused))
            idx = jnp.maximum(seq_lens - 1, 0)
            if last_only:
                # head computed for ONLY the last valid position (skips
                # S-1/S of the lm_head FLOPs; see llama.forward); the
                # small cache is brand-new => cold-prefill fast path
                # (single-chip only: the fresh-path Pallas writer/flash
                # kernel have no GSPMD partition rule on a mesh)
                fkw = ({"fresh_prefill": True}
                       if self.mesh is None and getattr(
                           model, "SUPPORTS_FRESH_PREFILL", False) else {})
                logits, small = fwd(params, tokens, small,
                                    seq_lens=seq_lens, logit_idx=idx,
                                    **fkw)
                last = logits[:, 0] + bias_rows                  # [m, V]
            else:
                logits, small = fwd(params, tokens, small,
                                    seq_lens=seq_lens)
                last = jnp.take_along_axis(
                    logits, idx[:, None, None].astype(jnp.int32),
                    axis=1)[:, 0] + bias_rows                    # [m, V]
            minp, rep, pres, freq = pen
            first = sampling.sample_per_slot(
                rng, last, t, k, p, min_p=minp,
                repetition_penalty=rep, presence_penalty=pres,
                frequency_penalty=freq, counts=pc_rows,
                out_counts=jnp.zeros_like(pc_rows))
            first_lp = sampling.token_logprob(last, first)
            cache = _scatter_into_slots(cache, small, slots, seq_lens)
            if spec:
                dsmall = dmodel.init_cache(dcfg, m, max_seq=self.T,
                                           dtype=self._dkv_dtype,
                                           fused=self.dcache.fused_layout)
                # draft prefill logits are discarded — one position's
                # head is enough
                _, dsmall = dmodel.forward(params_d, dcfg, tokens,
                                           dsmall, seq_lens=seq_lens,
                                           logit_idx=idx)
                dcache = _scatter_into_slots(dcache, dsmall, slots, seq_lens)
            return first, first_lp, cache, dcache
        return prefill

    @functools.cached_property
    def _prefill_cache(self):
        return {}

    # -- public API ------------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 50, *,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None,
               min_p: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               presence_penalty: Optional[float] = None,
               frequency_penalty: Optional[float] = None,
               logit_bias: Optional[Dict[int, float]] = None,
               response_format: Optional[str] = None) -> int:
        if len(prompt) == 0:
            raise ValueError("prompt must be non-empty")
        response_format = _normalize_response_format(response_format)
        if response_format is not None and self.tokenizer is None:
            raise ValueError("response_format needs a scheduler tokenizer "
                             "(ContinuousBatchingScheduler(tokenizer=...))")
        if len(prompt) >= self.T:
            raise ValueError(f"prompt length {len(prompt)} >= max_seq_len")
        if self.max_queue is not None and len(self._queue) >= self.max_queue:
            from turboinfer_tpu.utils.errors import SchedulerFullError
            raise SchedulerFullError(
                f"request queue full ({self.max_queue} waiting)")
        rid = self._next_id
        self._next_id += 1
        self._queue.append(_Request(
            rid=rid, prompt=list(prompt), max_new=max_new_tokens,
            submitted_at=time.perf_counter(), temperature=temperature,
            top_k=top_k, top_p=top_p, min_p=min_p,
            repetition_penalty=repetition_penalty,
            presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty, logit_bias=logit_bias,
            response_format=response_format))
        return rid

    def cancel(self, rid: int, reason: str = "cancelled") -> bool:
        """Abort a queued or running request (frees its slot for the
        next admission). Serving layers use this for client disconnects
        and stop-sequence hits."""
        for i, req in enumerate(self._queue):
            if req.rid == rid:
                del self._queue[i]
                req.finished = True
                req.finished_at = time.perf_counter()
                req.stop_reason = reason
                self._done[rid] = req
                return True
        for slot, req in list(self._active.items()):
            if req.rid == rid:
                self._finish(slot, reason)
                return True
        if self._adm is not None:
            for req in self._adm["group"]:
                if req.rid == rid and not req.finished:
                    # mid-chunked-prefill: the batched chunk forwards
                    # keep running (fixed shapes), but the slot is never
                    # activated — _activate_prefilled skips it.
                    req.finished = True
                    req.finished_at = time.perf_counter()
                    req.stop_reason = reason
                    self._done[rid] = req
                    return True
        return False

    def get_request(self, rid: int):
        """Live view of a submitted request (serving layers poll
        out_tokens for streaming)."""
        if rid in self._done:
            return self._done[rid]
        for req in self._active.values():
            if req.rid == rid:
                return req
        for req in self._queue:
            if req.rid == rid:
                return req
        if self._adm is not None:
            for req in self._adm["group"]:
                if req.rid == rid:
                    return req
        return None

    def _set_slot_sp(self, slot: int, req: _Request):
        """Write the request's sampling knobs + prompt token counts
        into the per-slot arrays and return the knobs as device scalars
        for the prefill sample."""
        c = self.config

        def pick(v, d):
            return d if v is None else v
        t = pick(req.temperature, c.temperature)
        k = pick(req.top_k, c.top_k)
        p = pick(req.top_p, c.top_p)
        mp = pick(req.min_p, c.min_p)
        rep = pick(req.repetition_penalty, c.repetition_penalty)
        pres = pick(req.presence_penalty, c.presence_penalty)
        freq = pick(req.frequency_penalty, c.frequency_penalty)
        self.slot_temp = self.slot_temp.at[slot].set(t)
        self.slot_topk = self.slot_topk.at[slot].set(k)
        self.slot_topp = self.slot_topp.at[slot].set(p)
        self.slot_minp = self.slot_minp.at[slot].set(mp)
        self.slot_rep = self.slot_rep.at[slot].set(rep)
        self.slot_pres = self.slot_pres.at[slot].set(pres)
        self.slot_freq = self.slot_freq.at[slot].set(freq)
        V = self.model_config.vocab_size
        row = np.bincount(np.asarray(req.prompt, np.int64),
                          minlength=V).astype(np.int32)
        self.counts_prompt = self.counts_prompt.at[slot].set(
            jnp.asarray(row))
        self.counts_out = self.counts_out.at[slot].set(0)
        bias = np.zeros((V,), np.float32)
        if req.logit_bias:
            for tid, b in req.logit_bias.items():
                tid = int(tid)
                if 0 <= tid < V:
                    bias[tid] = float(b)
        if req.response_format is not None:
            # constrain the FIRST sampled token (prefill admission
            # samples it in the same jitted call) by the grammar's
            # initial state. The USER bias rides every later grammar
            # mask too (_struct_after_token) — it used to be dropped
            # from the second token on.
            req._user_bias = bias.copy() if req.logit_bias else None
            mk = self._masker(req.response_format)
            req.struct_state = mk.initial()
            bias = bias + mk.bias_row(req.struct_state,
                                      self.config.eos_token_id)
        self.slot_bias = self.slot_bias.at[slot].set(jnp.asarray(bias))
        self._slot_plain[slot] = (mp == 0.0 and rep == 1.0
                                  and pres == 0.0 and freq == 0.0
                                  and not req.logit_bias
                                  and req.response_format is None)
        return ((jnp.float32(t), jnp.int32(k), jnp.float32(p)),
                (jnp.float32(mp), jnp.float32(rep), jnp.float32(pres),
                 jnp.float32(freq)), jnp.asarray(row)[None],
                jnp.asarray(bias)[None])

    @property
    def pending(self) -> int:
        adm = len(self._adm["group"]) if self._adm is not None else 0
        return len(self._queue) + len(self._active) + adm

    def _free_slots(self) -> List[int]:
        held = set(self._adm["slots"]) if self._adm is not None else ()
        return [s for s in range(self.B)
                if s not in self._active and s not in held]

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _admit(self):
        """Fill free slots from the queue. Consecutive queued requests
        with the same (bucketed) prompt width prefill as ONE batched
        forward — under burst load this collapses m admissions into a
        single device call (strict FIFO is preserved: only a same-width
        run at the queue head batches).

        When config.prefill_chunk > 0 and decodes are live, a long
        prompt admits CHUNKED: one prefill_chunk-wide forward per
        step(), interleaved with decode steps, so running requests
        never stall for a full prompt-length (the reference has no
        admission at all — generate_batch is sequential,
        inference_engine.cpp:804-828)."""
        if self._adm is not None:
            self._adm_advance()
            return
        while self._queue:
            free = self._free_slots()
            if not free:
                break
            m_cap = 1
            while m_cap * 2 <= len(free):
                m_cap *= 2
            S = self._adm_bucket(len(self._queue[0].prompt))
            group: List[_Request] = []
            while self._queue and len(group) < m_cap and \
                    self._adm_bucket(len(self._queue[0].prompt)) == S:
                group.append(self._queue.popleft())
            m = 1
            while m * 2 <= len(group):
                m *= 2
            for req in reversed(group[m:]):
                self._queue.appendleft(req)
            group = group[:m]
            t0 = time.perf_counter()
            slots = free[:m]
            arr = np.full((m, S), self.config.pad_token_id, np.int32)
            sps, pens, pc_rows, bias_rows = [], [], [], []
            for i, req in enumerate(group):
                arr[i, : len(req.prompt)] = req.prompt
                sp, pen, pc_row, bias_row = self._set_slot_sp(slots[i],
                                                              req)
                sps.append(sp)
                pens.append(pen)
                pc_rows.append(pc_row)
                bias_rows.append(bias_row)
            C = self.config.prefill_chunk
            if 0 < C < S and self._active and self._dmodel is None:
                # Chunked admission — only while decodes are live (an
                # idle scheduler prefills full-width: strictly faster).
                # Speculative schedulers admit full-width (the draft
                # cache prefill isn't chunked).
                self._adm = dict(
                    group=group, slots=slots, arr=arr, S=S, C=C, pos=0,
                    t0=t0, sps=sps, pens=pens, pc_rows=pc_rows,
                    bias_rows=bias_rows, small=None, out_logits=None,
                    lens=np.asarray([len(r.prompt) for r in group],
                                    np.int64))
                self._adm_advance()
                return
            key = (m, S)
            if key not in self._prefill_cache:
                self._prefill_cache[key] = self._prefill_fn(m, S)
            stack = jnp.stack
            spec = self._dmodel is not None
            first, first_lp, self.cache, dcache = self._prefill_cache[key](
                self.params, jnp.asarray(arr),
                jnp.asarray([len(r.prompt) for r in group], jnp.int32),
                jnp.asarray(slots, jnp.int32), self.cache,
                self.dcache if spec else None,
                self.draft_params if spec else None,
                self._next_rng(),
                stack([s[0] for s in sps]), stack([s[1] for s in sps]),
                stack([s[2] for s in sps]),
                tuple(stack([p[j] for p in pens]) for j in range(4)),
                jnp.concatenate(pc_rows), jnp.concatenate(bias_rows))
            if spec:
                self.dcache = dcache
            dt_ms = (time.perf_counter() - t0) * 1e3
            self._activate_prefilled(group, slots, first, first_lp,
                                     dt_ms)

    def _activate_prefilled(self, group, slots, first, first_lp,
                            dt_ms: float):
        """Post-prefill bookkeeping shared by the full-width and chunked
        admission paths: record each request's first token and mark its
        slot live (or finish it immediately on eos/grammar/budget)."""
        first_np, lp_np = jax.device_get(
            self._host_view((first, first_lp)))    # one batched fetch
        for i, req in enumerate(group):
            if req.finished:          # cancelled mid-chunked-admission
                continue
            slot = slots[i]
            req.prefill_ms = dt_ms
            req.slot = slot
            first_i = int(first_np[i])
            req.out_tokens.append(first_i)
            req.out_logprobs.append(float(lp_np[i]))
            self.counts_out = self.counts_out.at[slot, first_i].add(1)
            self.tokens = self.tokens.at[slot].set(first_i)
            self.active = self.active.at[slot].set(True)
            self.budget = self.budget.at[slot].set(
                req.max_new - len(req.out_tokens))
            self._active[slot] = req
            if self._dmodel is not None:
                # admission prefilled the draft cache on the prompt
                self._spec_dlen[slot] = len(req.prompt)
            done_struct = self._struct_after_token(slot, req, first_i)
            if first_i == self.config.eos_token_id:
                self._finish(slot, "eos")
            elif done_struct:
                self._finish(slot, "stop")
            elif len(req.out_tokens) >= req.max_new:
                self._finish(slot, "length")

    # -- chunked admission (prefill/decode mixing) -----------------------

    @functools.cached_property
    def _adm_cache(self):
        return {}

    def _adm_chunk_fn(self, m: int, C: int):
        """One prompt chunk for m admitting rows: append to their small
        prefill cache at the current fill and capture last-token logits
        for rows whose prompt ends inside this chunk."""
        fwd = self._fwd
        last_only = self.parallel in ("tp", "pp")

        @functools.partial(jax.jit, donate_argnums=(3,))
        def chunk_fwd(params, chunk, chunk_lens, small, sel, out_logits):
            idx = jnp.maximum(chunk_lens - 1, 0)
            if last_only:
                logits, small = fwd(params, chunk, small,
                                    seq_lens=chunk_lens, logit_idx=idx)
                last = logits[:, 0]
            else:
                logits, small = fwd(params, chunk, small,
                                    seq_lens=chunk_lens)
                last = jnp.take_along_axis(
                    logits, idx[:, None, None].astype(jnp.int32),
                    axis=1)[:, 0]
            out_logits = jnp.where(sel[:, None],
                                   last.astype(jnp.float32), out_logits)
            return small, out_logits
        return chunk_fwd

    def _adm_final_fn(self, m: int):
        """Finalize a chunked admission: sample each row's first token
        (same math as _prefill_fn's tail) and scatter the small cache
        into the slot pool."""

        @functools.partial(jax.jit, donate_argnums=(1,))
        def final(small, cache, out_logits, slots, seq_lens, rng, t, k,
                  p, pen, pc_rows, bias_rows):
            last = out_logits + bias_rows
            minp, rep, pres, freq = pen
            first = sampling.sample_per_slot(
                rng, last, t, k, p, min_p=minp,
                repetition_penalty=rep, presence_penalty=pres,
                frequency_penalty=freq, counts=pc_rows,
                out_counts=jnp.zeros_like(pc_rows))
            first_lp = sampling.token_logprob(last, first)
            return first, first_lp, _scatter_into_slots(cache, small,
                                                        slots, seq_lens)
        return final

    def _adm_advance(self):
        """Run ONE prompt chunk of the in-flight admission (called once
        per step(), before the decode step)."""
        a = self._adm
        group, slots = a["group"], a["slots"]
        m, S, C, pos = len(group), a["S"], a["C"], a["pos"]
        if a["small"] is None:
            fused = (False if self.parallel == "pp"
                     else self.cache.fused_layout)
            a["small"] = self._wrap_small(self._model.init_cache(
                self.model_config, m, max_seq=self.T,
                dtype=self._kv_dtype, fused=fused))
            a["out_logits"] = jnp.zeros(
                (m, self.model_config.vocab_size), jnp.float32)
        c1 = min(pos + C, S)
        chunk = a["arr"][:, pos:c1]
        if chunk.shape[1] < C:
            chunk = np.pad(chunk, ((0, 0), (0, C - chunk.shape[1])),
                           constant_values=self.config.pad_token_id)
        lens = a["lens"]
        chunk_lens = np.clip(lens - pos, 0, C).astype(np.int32)
        sel = (lens - 1 >= pos) & (lens - 1 < c1)
        ckey = ("chunk", m, C)
        if ckey not in self._adm_cache:
            self._adm_cache[ckey] = self._adm_chunk_fn(m, C)
        a["small"], a["out_logits"] = self._adm_cache[ckey](
            self.params, jnp.asarray(chunk), jnp.asarray(chunk_lens),
            a["small"], jnp.asarray(sel), a["out_logits"])
        a["pos"] = c1
        if c1 < S:
            return
        # last chunk done — sample first tokens + scatter into the pool
        fkey = ("final", m)
        if fkey not in self._adm_cache:
            self._adm_cache[fkey] = self._adm_final_fn(m)
        stack = jnp.stack
        sps, pens = a["sps"], a["pens"]
        first, first_lp, self.cache = self._adm_cache[fkey](
            a["small"], self.cache, a["out_logits"],
            jnp.asarray(slots, jnp.int32),
            jnp.asarray([len(r.prompt) for r in group], jnp.int32),
            self._next_rng(),
            stack([s[0] for s in sps]), stack([s[1] for s in sps]),
            stack([s[2] for s in sps]),
            tuple(stack([p[j] for p in pens]) for j in range(4)),
            jnp.concatenate(a["pc_rows"]),
            jnp.concatenate(a["bias_rows"]))
        dt_ms = (time.perf_counter() - a["t0"]) * 1e3
        self._adm = None
        self._activate_prefilled(group, slots, first, first_lp, dt_ms)

    def _masker(self, rf):
        """TokenMaskCache for a normalized response_format: "json" /
        "json_object" use the generic JSON pushdown; ("schema", <json>)
        compiles the schema to its own byte program (schema_fsm)."""
        m = self._maskers.get(rf)
        if m is None:
            from turboinfer_tpu.structured import TokenMaskCache
            fsm = None
            if isinstance(rf, tuple):
                import json as _json

                from turboinfer_tpu.structured.schema_fsm import SchemaFSM
                fsm = SchemaFSM(_json.loads(rf[1]))
            m = TokenMaskCache(self.tokenizer,
                               require_object=(rf == "json_object"),
                               vocab_size=self.model_config.vocab_size,
                               fsm=fsm)
            self._maskers[rf] = m
        return m

    def _struct_after_token(self, slot: int, req, tid: int) -> bool:
        """Constrained decoding bookkeeping after a slot emitted `tid`:
        advance the request's grammar state and write the NEXT state's
        token mask into the slot's on-device bias row (the jitted step
        applies it before sampling — no extra dispatch). Returns True
        when the grammar completed (caller finishes the slot with
        stop_reason "stop", matching generate_structured)."""
        if req.response_format is None:
            return False
        if tid == self.config.eos_token_id:
            return False                  # the eos branch finishes it
        mk = self._masker(req.response_format)
        nxt = mk.advance(req.struct_state, tid)
        if nxt is None:
            # unreachable: the mask only admits legal tokens; end the
            # request rather than emitting non-grammar output.
            return True
        req.struct_state = nxt
        if mk.done(nxt):
            return True
        row = mk.bias_row(nxt, self.config.eos_token_id)
        ub = getattr(req, "_user_bias", None)
        if ub is not None:
            row = row + ub                 # OpenAI logit_bias persists
        self.slot_bias = self.slot_bias.at[slot].set(jnp.asarray(row))
        return False

    def _has_structured(self) -> bool:
        return any(r.response_format is not None
                   for r in self._active.values())

    def _host_view(self, tree):
        """Make jitted outputs host-readable on every process (no-op
        unless the mesh spans multiple processes — see
        parallel.shardings.replicate_for_host)."""
        if self.mesh is None:
            return tree
        from turboinfer_tpu.parallel import shardings as _sh
        return _sh.replicate_for_host(tree, self.mesh)

    def _finish(self, slot: int, reason: str):
        req = self._active.pop(slot)
        req.finished = True
        req.finished_at = time.perf_counter()
        req.stop_reason = reason
        self.active = self.active.at[slot].set(False)
        self._done[req.rid] = req

    def step(self) -> int:
        """Admit + one decode step (or one `decode_burst`-step scan).
        Returns number of live slots."""
        self._admit()
        if not self._active:
            # nothing decoding — but an in-flight chunked admission
            # still counts as live work for drivers polling step()
            return 0 if self._adm is None else len(self._adm["group"])
        if (self._dmodel is not None
                and all(self._slot_plain[s] for s in self._active)
                and all(len(r.prompt) + len(r.out_tokens)
                        + self.spec_k + 1 <= self.T
                        for r in self._active.values())):
            self._spec_catchup()
            # speculative rounds cover temp/top-k/top-p slots; any
            # active penalties/bias/grammar slot falls the whole batch
            # back to plain steps this iteration (those filters are
            # per-token-sequential). Slots within spec_k+1 of the cache
            # end ALSO fall back: a round's (k+1)-wide verify write
            # would clamp into the valid prompt region and silently
            # corrupt it, and the plain path finishes exactly at T —
            # keeping speculative trajectories identical to plain ones
            # all the way to the boundary.
            return self._step_spec()
        if self.decode_burst > 1 and not self._has_structured():
            # structured slots need their mask refreshed every token —
            # fall back to single steps while any are live.
            return self._step_burst()
        nxt, lp, hit_eos, self.cache, self.counts_out = self._decode_fn(
            self.params, self.tokens, self.active, self.cache,
            self._next_rng(), self.slot_temp, self.slot_topk,
            self.slot_topp, self.slot_minp, self.slot_rep,
            self.slot_pres, self.slot_freq, self.counts_prompt,
            self.counts_out, self.slot_bias)
        self.tokens = nxt
        nxt_np, lp_np, eos_np = jax.device_get(
            self._host_view((nxt, lp, hit_eos)))   # ONE batched fetch:
        # per-array np.asarray costs a full tunnel round trip EACH
        # (~30 ms; CLAUDE.md round-4) — 3x the per-token latency on the
        # default serving path
        for slot in list(self._active):
            req = self._active[slot]
            req.out_tokens.append(int(nxt_np[slot]))
            req.out_logprobs.append(float(lp_np[slot]))
            done_struct = self._struct_after_token(slot, req,
                                                   int(nxt_np[slot]))
            if eos_np[slot]:
                self._finish(slot, "eos")
            elif done_struct:
                self._finish(slot, "stop")
            elif len(req.out_tokens) >= req.max_new:
                self._finish(slot, "length")
            elif self._hit_max_seq(req):
                self._finish(slot, "max_seq")
        self._resync_budget()
        return len(self._active)

    def _resync_budget(self):
        """Plain steps don't carry the device budget array; if bursts
        (or spec rounds) can run later, refresh it from host truth so a
        stale-high budget can't keep a finished slot device-active past
        its true max_new (mirror of the spec-round resync)."""
        if (self.decode_burst <= 1 and self._dmodel is None) \
                or not self._active:
            return
        slots = list(self._active)
        self.budget = self.budget.at[jnp.asarray(slots)].set(
            jnp.asarray([self._active[s].max_new
                         - len(self._active[s].out_tokens)
                         for s in slots], jnp.int32))

    @functools.cached_property
    def _burst_cache(self):
        return {}

    # -- speculative rounds ---------------------------------------------

    @staticmethod
    def _spec_propose(model_d, dcfg, params_d, lg0, dcache, rng_d, k,
                      temp, topk, topp):
        """Draft proposes k tokens per slot under each slot's filter.
        Returns (drafts [B, k], dlogits [B, k, V], dcache)."""
        def draft_body(carry, r):
            lg_prev, dcache = carry
            dist = sampling.filtered_dist_per_slot(lg_prev, temp,
                                                   topk, topp)
            d = jax.random.categorical(
                r, jnp.log(jnp.maximum(dist, 1e-30))).astype(jnp.int32)
            lg, dcache = model_d.forward(params_d, dcfg, d[:, None],
                                         dcache)
            return (lg[:, 0], dcache), (d, lg_prev)

        (_, dcache), (drafts, dlogits) = jax.lax.scan(
            draft_body, (lg0, dcache), jax.random.split(rng_d, k))
        return drafts.T, dlogits.transpose(1, 0, 2), dcache

    @staticmethod
    def _spec_accept(tlg, dlogits, drafts, tokens, active, k, temp,
                     topk, topp, rng_acc, rng_res, rng_bonus):
        """Per-slot rejection-sampling acceptance of the drafts against
        the target logits tlg [B, k+1, V]. Returns (tokens', out
        [B, k+1], lps, n_emit, a)."""
        from turboinfer_tpu.engine.speculative import (emit_layout,
                                                       rejection_accept)
        pt = sampling.filtered_dist_per_slot(tlg[:, :k], temp,
                                             topk, topp)
        qd = sampling.filtered_dist_per_slot(dlogits, temp, topk, topp)
        # shared rejection-sampling core (speculative.rejection_accept)
        # — ONE copy of the acceptance/residual math for the engine
        # round and this per-slot round
        a, corr = rejection_accept(pt, qd, drafts, rng_acc, rng_res)
        bonus_dist = sampling.filtered_dist_per_slot(
            tlg[:, k:k + 1], temp, topk, topp)[:, 0]
        bonus = jax.random.categorical(
            rng_bonus, jnp.log(jnp.maximum(bonus_dist,
                                           1e-30))).astype(jnp.int32)
        nxt = jnp.where(a == k, bonus, corr)
        out = emit_layout(drafts, nxt, a)                  # [B, k+1]
        lps = sampling.token_logprob(tlg, out)
        n_emit = jnp.where(active, a + 1, 0)
        tokens = jnp.where(active, nxt, tokens)
        return tokens, out, lps, n_emit, a

    @functools.cached_property
    def _spec_round(self):
        """One speculative round as ONE jitted program: draft ingest +
        k-proposal scan + one (k+1)-wide target verify + per-slot
        rejection-sampling acceptance. Greedy slots (temperature<=0)
        judge under one-hot filtered dists, which makes acceptance
        exact greedy matching — the output trajectory is identical to
        non-speculative greedy decoding (tested). Inactive slots run
        (fixed shapes) with frozen cache lengths."""
        fwd_t = self._fwd
        model_d, dcfg = self._dmodel, self.draft_config
        k = self.spec_k

        propose = self._spec_propose
        accept = self._spec_accept

        @functools.partial(jax.jit, donate_argnums=(3, 4))
        def spec_round(params, params_d, tokens, cache, dcache, active,
                       rng, temp, topk, topp):
            rng_d, rng_acc, rng_res, rng_bonus = jax.random.split(rng, 4)
            len_t0 = cache.length
            len_d0 = dcache.length

            # 1. draft ingest of the current (confirmed, uncached) token
            lg, dcache = model_d.forward(params_d, dcfg, tokens[:, None],
                                         dcache)
            # 2. draft proposes k tokens under each slot's filter
            drafts, dlogits, dcache = propose(
                model_d, dcfg, params_d, lg[:, 0], dcache, rng_d, k,
                temp, topk, topp)

            # 3. ONE target verify pass over [tok, d_1..d_k]
            chunk = jnp.concatenate([tokens[:, None], drafts], axis=1)
            tlg, cache = fwd_t(params, chunk, cache)           # [B,k+1,V]

            # 4. per-slot rejection-sampling acceptance (out[b, i]
            # aligns with tlg[b, i]: accepted drafts then the
            # correction/bonus token, padded with it)
            tokens, out, lps, n_emit, a = accept(
                tlg, dlogits, drafts, tokens, active, k, temp, topk,
                topp, rng_acc, rng_res, rng_bonus)

            # 5. cache-length rollback: only confirmed tokens count;
            # inactive slots stay frozen (their writes are masked
            # garbage past their length)
            cache = cache._replace(
                length=jnp.where(active, len_t0 + 1 + a, len_t0))
            dcache = dcache._replace(
                length=jnp.where(active, len_d0 + 1 + a, len_d0))
            return tokens, cache, dcache, out, lps, n_emit
        return spec_round

    def _spec_catchup_fn(self, G: int):
        dmodel, dcfg = self._dmodel, self.draft_config

        @functools.partial(jax.jit, donate_argnums=(2,))
        def catchup(params_d, tokens, dcache, seq_lens):
            idx = jnp.zeros((tokens.shape[0],), jnp.int32)
            _, dcache = dmodel.forward(params_d, dcfg, tokens, dcache,
                                       seq_lens=seq_lens, logit_idx=idx)
            return dcache
        return catchup

    def _spec_catchup(self):
        """Re-ingest tokens the draft cache missed while plain/burst
        fallback iterations ran (they advance only the target cache).
        One jitted ragged forward per pass; slots already in sync get
        seq_lens 0. The ingest width is capped so start[b] + W <= T for
        EVERY row (the forward's per-row DUS writes the full W-wide
        slab at the row's draft length regardless of seq_lens — an
        uncapped bucket width near the cache end would clamp the write
        and overwrite valid draft K/V below the slot's length); gaps
        wider than the cap drain over multiple passes."""
        while True:
            gaps = {}
            for slot, req in self._active.items():
                confirmed = len(req.prompt) + len(req.out_tokens) - 1
                d = self._spec_dlen.get(slot, confirmed)
                if confirmed > d:
                    gaps[slot] = (d, confirmed)
            if not gaps:
                return
            G = max(c - d for d, c in gaps.values())
            max_dlen = max(
                self._spec_dlen.get(
                    s, len(r.prompt) + len(r.out_tokens) - 1)
                for s, r in self._active.items())
            # step() guarantees every slot has spec_k+1 headroom, so
            # T - max_dlen >= 2: each pass always makes progress.
            W = min(_bucket(G, True, minimum=8), self.T - max_dlen)
            arr = np.zeros((self.B, W), np.int32)
            lens = np.zeros((self.B,), np.int32)
            for slot, (d, c) in gaps.items():
                req = self._active[slot]
                toks = (req.prompt + req.out_tokens)[d: min(c, d + W)]
                arr[slot, : len(toks)] = toks
                lens[slot] = len(toks)
                self._spec_dlen[slot] = d + len(toks)
            key = ("spec_catchup", W)
            if key not in self._burst_cache:
                self._burst_cache[key] = self._spec_catchup_fn(W)
            self.dcache = self._burst_cache[key](
                self.draft_params, jnp.asarray(arr), self.dcache,
                jnp.asarray(lens))

    def _run_spec_round(self):
        """Dispatch one speculative round; returns host (out, lps,
        n_emit) arrays. The paged scheduler overrides this (pool-based
        verify) and _spec_target_advance; the host loop is shared."""
        (self.tokens, self.cache, self.dcache, out, lps,
         n_emit) = self._spec_round(
            self.params, self.draft_params, self.tokens, self.cache,
            self.dcache, self.active, self._next_rng(), self.slot_temp,
            self.slot_topk, self.slot_topp)
        return tuple(np.asarray(a) for a in jax.device_get(
            self._host_view((out, lps, n_emit))))

    def _spec_target_advance(self, slot: int, n: int) -> None:
        """Post-round target-cache length bookkeeping (contiguous: the
        device program already rolled lengths; paged: host lengths)."""

    def _step_spec(self) -> int:
        eos = self.config.eos_token_id
        out_np, lps_np, n_np = self._run_spec_round()
        live = len(self._active)
        self.spec_proposed += self.spec_k * live
        self.spec_accepted += int(
            sum(max(int(n_np[s]) - 1, 0) for s in self._active))
        for slot in list(self._active):
            req = self._active[slot]
            # the round confirmed everything except the new current
            # token into BOTH caches
            self._spec_dlen[slot] = (len(req.prompt)
                                     + len(req.out_tokens)
                                     + max(int(n_np[slot]), 1) - 1)
            self._spec_target_advance(slot, int(n_np[slot]))
            for i in range(int(n_np[slot])):
                tok = int(out_np[slot, i])
                req.out_tokens.append(tok)
                req.out_logprobs.append(float(lps_np[slot, i]))
                if tok == eos:
                    self._finish(slot, "eos")
                    break
                if len(req.out_tokens) >= req.max_new:
                    self._finish(slot, "length")
                    break
                if self._hit_max_seq(req):
                    # same boundary as the plain path; step() already
                    # guarantees this round had spec_k+1 headroom
                    self._finish(slot, "max_seq")
                    break
            else:
                continue
            # a slot that finished mid-round discards the rest of the
            # round's tokens; resync its current-token register is not
            # needed (the slot is inactive until re-admission resets it)
        if self._active:
            # Resync device-side budgets: a round emits a+1 tokens per
            # slot but the spec program doesn't carry the budget array —
            # a later fallback to plain/burst steps would otherwise run
            # stale-high budgets and keep finished slots device-active.
            slots = list(self._active)
            self.budget = self.budget.at[jnp.asarray(slots)].set(
                jnp.asarray([self._active[s].max_new
                             - len(self._active[s].out_tokens)
                             for s in slots], jnp.int32))
        return len(self._active)

    def _step_burst(self) -> int:
        n = self.decode_burst
        if n not in self._burst_cache:
            self._burst_cache[n] = self._decode_burst_fn(n)
        (self.tokens, self.active, self.budget, self.cache,
         self.counts_out, toks, was, eoss, lps) = self._burst_cache[n](
            self.params, self.tokens, self.active, self.budget,
            self.cache, self._next_rng(), self.slot_temp,
            self.slot_topk, self.slot_topp, self.slot_minp,
            self.slot_rep, self.slot_pres, self.slot_freq,
            self.counts_prompt, self.counts_out, self.slot_bias)
        toks_np, was_np, eos_np, lps_np = (
            np.asarray(a) for a in jax.device_get(
                self._host_view((toks, was, eoss, lps))))
        for slot in list(self._active):
            req = self._active[slot]
            for i in range(n):
                if not was_np[i, slot]:
                    break
                req.out_tokens.append(int(toks_np[i, slot]))
                req.out_logprobs.append(float(lps_np[i, slot]))
                if eos_np[i, slot]:
                    self._finish(slot, "eos")
                    break
                if len(req.out_tokens) >= req.max_new:
                    self._finish(slot, "length")
                    break
                if self._hit_max_seq(req):
                    self._finish(slot, "max_seq")
                    break
        return len(self._active)

    def run(self, max_steps: Optional[int] = None
            ) -> Dict[int, GenerationResult]:
        """Drive until all submitted requests complete."""
        steps = 0
        while self.pending:
            self.step()
            steps += 1
            if max_steps is not None and steps >= max_steps:
                break
        t1 = time.perf_counter()
        out: Dict[int, GenerationResult] = {}
        for rid, req in self._done.items():
            # per-request completion clock (run-end stamping inflated
            # early finishers' latency by the whole remaining run)
            t_done = req.finished_at or t1
            dt_ms = (t_done - req.submitted_at) * 1e3
            n = len(req.out_tokens)
            out[rid] = GenerationResult(
                tokens=req.prompt + req.out_tokens,
                logprobs=list(req.out_logprobs),
                total_time_ms=dt_ms,
                tokens_per_second=n / max(dt_ms / 1e3, 1e-9),
                prefill_time_ms=req.prefill_ms,
                # The scheduler clocks each request from submission to
                # its first token landing on the host: a real TTFT.
                ttft_measured=True,
                finished=req.finished,
                stop_reason=req.stop_reason)
        self._done.clear()
        return out


class PagedContinuousScheduler(ContinuousBatchingScheduler):
    """Continuous batching over the PAGED KV cache (engine/paged_cache.py).

    Same request API as ContinuousBatchingScheduler, but cache memory
    scales with tokens in use instead of batch_slots × max_seq_len:
    sequences borrow fixed-size pages from a shared pool on demand
    (one new page each time they cross a page boundary) and return them
    the moment they finish. `num_pages` may be oversubscribed relative
    to batch_slots × max_pages — admission blocks (request stays queued)
    when the pool can't cover a prompt, and decode raises if the pool is
    truly exhausted mid-flight.

    Page id 0 is RESERVED as a trash page: released block-table rows are
    -1 and the decode path clamps them to 0, so writes from inactive
    slots land in the trash page instead of corrupting live sequences.

    decode_burst > 1 runs `burst` paged decode steps as ONE jitted scan
    per host iteration (step() pre-assigns every live slot's next
    `burst` page positions first, so in-scan appends never need the
    host allocator; if the pool can't cover that it degrades to a
    single step). Same tradeoffs as the contiguous scheduler's bursts.

    Automatic PREFIX CACHING (prefix_caching=True): full prompt pages
    are content-addressed (key = the token prefix up to the page's end),
    so concurrent requests with a common prefix share pages, and pages
    whose last user finished are retained evictably for future identical
    prefixes — repeated system prompts cost HBM once. Sharing never
    changes outputs (shared content is bit-identical by construction).

    Decode runs the model's `forward_paged_decode` (Pallas block-table
    kernel on TPU, gather reference elsewhere). No reference counterpart
    — the reference preallocates per-sequence max_seq buffers
    (inference_engine.cpp:51-54).
    """

    def __init__(self, params: Dict[str, Any], model_config: ModelConfig,
                 config: Optional[InferenceConfig] = None,
                 batch_slots: int = 8, page_size: int = 256,
                 num_pages: Optional[int] = None,
                 prefix_caching: bool = True, tokenizer=None,
                 decode_burst: int = 1, max_queue: Optional[int] = None,
                 mesh=None,
                 param_specs: Optional[Dict[str, Any]] = None,
                 draft_params: Optional[Dict[str, Any]] = None,
                 draft_config: Optional[ModelConfig] = None,
                 spec_k: int = 4):
        # page_size trades paged-kernel grid overhead against allocation
        # / prefix-sharing granularity: on v5e, 7B decode with 64-token
        # pages runs 53.7 ms/step (4096 grid cells/layer) vs 40.7 with
        # 256-token pages — within 3% of the contiguous cache (39.4).
        # mesh: TP/DP-sharded weights + the page POOL sharded
        # heads-over-tp (the pool is shared by all sequences, so the
        # page axis replicates — shardings.shard_paged_cache); block
        # tables/lengths stay replicated host state.
        from turboinfer_tpu.engine import paged_cache as pc
        super().__init__(params, model_config, config, batch_slots,
                         decode_burst=decode_burst, tokenizer=tokenizer,
                         max_queue=max_queue,
                         mesh=mesh, param_specs=param_specs,
                         draft_params=draft_params,
                         draft_config=draft_config, spec_k=spec_k)
        if self._dmodel is not None and not hasattr(
                self._model, "forward_paged_verify"):
            raise NotImplementedError(
                f"{model_config.architecture} has no "
                "forward_paged_verify (speculative paged serving)")
        # (paged + pipeline parallelism is unimplemented: the page-pool
        # kernels index one global layer stack; parallel= is not
        # forwarded above, so pp requests fail in super().__init__ only
        # if passed positionally — guard explicitly.)
        assert self.parallel == "tp", \
            "PagedContinuousScheduler does not support parallel='pp'"
        if not hasattr(self._model, "forward_paged_decode"):
            raise NotImplementedError(
                f"{model_config.architecture} has no forward_paged_decode")
        if self._kv_dtype == jnp.int8 and not getattr(
                self._model, "SUPPORTS_INT8_KV_PAGED",
                getattr(self._model, "SUPPORTS_INT8_KV", False)):
            # e.g. gptoss: contiguous int8 works but its paged body
            # takes no scale pools — fail loudly at construction
            # instead of a TypeError at the first decode step
            raise NotImplementedError(
                f"{model_config.architecture} paged serving does not "
                "support kv_cache_dtype='int8'; use 'fp8' or 'bf16'")
        self._pc = pc
        self.page = page_size
        max_pages = -(-self.T // page_size)
        if num_pages is None:
            num_pages = 1 + self.B * max_pages      # +1: trash page
        self.cache = pc.init_paged_cache(model_config, self.B,
                                         num_pages=num_pages,
                                         page_size=page_size, max_seq=self.T,
                                         dtype=self._kv_dtype)
        if mesh is not None:
            from turboinfer_tpu.parallel import shardings as _sh
            self.cache = _sh.shard_paged_cache(self.cache, mesh)
        self.pool = pc.PrefixPagePool(num_pages)
        self.prefix_caching = prefix_caching
        trash = self.pool.acquire()                 # held forever
        assert trash == 0, "page 0 must be the trash page"
        # Host mirror of the block table (authoritative; device copy is
        # refreshed lazily before each jitted call that consumes it).
        self._table = np.full((self.B, max_pages), -1, np.int32)
        self._table_dirty = False
        self._lengths = np.zeros((self.B,), np.int64)   # host lengths

    def _make_cache(self):
        # the paged pool replaces this right after super().__init__ —
        # building the contiguous slot cache first would transiently
        # double-allocate multi-GB of HBM at 7B scale
        return None

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 50,
               **kw) -> int:
        # Reject prompts that could NEVER admit even against an empty
        # pool (worst case: zero prefix sharing) — otherwise the
        # request stays queued forever and run()/serve spin at 100%
        # CPU with no error (page 0 is the reserved trash page).
        W = -(-_bucket(len(prompt), self.config.prefill_bucket,
                       cap=self.T) // self.page) * self.page
        need = max(W // self.page, -(-(len(prompt) + 1) // self.page))
        if need > self.pool.num_pages - 1:
            raise ValueError(
                f"prompt needs {need} pages but the pool has only "
                f"{self.pool.num_pages - 1} (page_size={self.page}; "
                f"raise num_pages)")
        return super().submit(prompt, max_new_tokens, **kw)

    # -- paged jitted programs -----------------------------------------

    @functools.cached_property
    def _decode_fn(self):
        cfg = self.model_config
        model = self._model
        eos = self.config.eos_token_id

        scaled = self.cache.k_scale_pages is not None

        @functools.partial(jax.jit, donate_argnums=(3, 4, 5, 6))
        def step(params, tokens, active, k_pages, v_pages, ksp, vsp,
                 table, lengths, rng, temp, topk, topp, minp, rep, pres,
                 freq, pc, oc, bias):
            kw = (dict(k_scale_pages=ksp, v_scale_pages=vsp)
                  if scaled else {})     # non-llama paged forwards don't
            out = model.forward_paged_decode(   # take the scale kwargs
                params, cfg, tokens, k_pages, v_pages, table, lengths,
                **kw)
            logits, k_pages, v_pages = out[:3]
            ksp, vsp = out[3:] if scaled else (ksp, vsp)
            logits = logits + bias
            nxt = sampling.sample_per_slot(
                rng, logits, temp, topk, topp, min_p=minp,
                repetition_penalty=rep, presence_penalty=pres,
                frequency_penalty=freq, counts=pc + oc, out_counts=oc)
            lp = sampling.token_logprob(logits, nxt)
            oc = oc.at[jnp.arange(oc.shape[0]), nxt].add(
                active.astype(jnp.int32))
            hit_eos = active & (nxt == eos)
            return nxt, lp, hit_eos, k_pages, v_pages, ksp, vsp, oc
        return step

    def _prefill_fn(self, m: int, S_suf: int):
        """Jitted prefill specialized on (shared prefix pages m, suffix
        width S_suf — a page multiple chosen so pre + S_suf equals the
        width the cache-cold path would use). Computes the forward ONLY
        over the suffix — the shared pages' K/V is gathered into the
        chunked-prefill cache, so TTFT scales with the un-cached part of
        the prompt. Keeping the total cache width identical to the cold
        path keeps XLA's attention reduction shapes (and therefore the
        rounded bf16 K/V bits) identical, so cached and uncached runs
        produce the same greedy trajectories."""
        cfg = self.model_config
        model = self._model
        page = self.page
        pre = m * page
        n_new = S_suf // page
        L = cfg.num_layers
        # Pool dims come from the pools themselves: the k and v pools
        # may be asymmetric (MLA latent + rope-key pools, Hkv=1).
        Hkv = self.cache.k_pages.shape[2]
        Dk = self.cache.k_pages.shape[4]
        Dv = self.cache.v_pages.shape[4]

        scaled = self.cache.k_scale_pages is not None

        @functools.partial(jax.jit, donate_argnums=(5, 6, 7, 8))
        def prefill(params, tokens, seq_len, shared_ids, new_ids, k_pages,
                    v_pages, ksp, vsp, rng, t, k_sp, p, pen, pc_row,
                    bias_row):
            """tokens: [1, S_suf] suffix; seq_len: TOTAL prompt length;
            shared_ids: [m] pages already holding positions [0, pre);
            new_ids: [n_new] pages to receive the suffix K/V."""
            # head-major REQUIRED: the page-injection below reshapes
            # [L, 1, Hkv, T, D] slabs into pages.
            small = model.init_cache(cfg, 1, max_seq=pre + n_new * page,
                                     dtype=self._kv_dtype, fused=False)
            k, v, length = small.k, small.v, small.length
            ks, vs = small.k_scale, small.v_scale
            if m:
                kpre = k_pages[:, shared_ids].transpose(0, 2, 1, 3, 4)
                vpre = v_pages[:, shared_ids].transpose(0, 2, 1, 3, 4)
                k = k.at[:, :, :, :pre].set(
                    kpre.reshape(L, 1, Hkv, pre, Dk).astype(k.dtype))
                v = v.at[:, :, :, :pre].set(
                    vpre.reshape(L, 1, Hkv, pre, Dv).astype(v.dtype))
                if scaled:
                    # int8 prefix pages carry their scales — inject both.
                    kspre = ksp[:, shared_ids].transpose(0, 2, 1, 3)
                    vspre = vsp[:, shared_ids].transpose(0, 2, 1, 3)
                    ks = ks.at[:, :, :, :pre].set(
                        kspre.reshape(L, 1, Hkv, pre))
                    vs = vs.at[:, :, :, :pre].set(
                        vspre.reshape(L, 1, Hkv, pre))
                length = jnp.full_like(length, pre)
            small = small._replace(k=k, v=v, length=length,
                                   k_scale=ks, v_scale=vs)
            suf_len = seq_len - pre
            logits, small = model.forward(params, cfg, tokens, small,
                                          seq_lens=suf_len[None])
            idx = jnp.maximum(suf_len - 1, 0)
            minp, rep, pres, freq = pen
            first = sampling.sample_per_slot(
                rng, logits[0, idx][None] + bias_row, t[None], k_sp[None],
                p[None],
                min_p=minp[None], repetition_penalty=rep[None],
                presence_penalty=pres[None], frequency_penalty=freq[None],
                counts=pc_row, out_counts=jnp.zeros_like(pc_row))[0]
            first_lp = sampling.token_logprob(logits[0, idx] + bias_row[0],
                                              first)
            # [L,1,Hkv,n_new*page,D] suffix region -> [L,n_new,Hkv,page,D]
            kn = small.k[:, 0, :, pre:].reshape(L, Hkv, n_new, page, Dk)
            vn = small.v[:, 0, :, pre:].reshape(L, Hkv, n_new, page, Dv)
            k_pages = k_pages.at[:, new_ids].set(
                kn.transpose(0, 2, 1, 3, 4).astype(k_pages.dtype))
            v_pages = v_pages.at[:, new_ids].set(
                vn.transpose(0, 2, 1, 3, 4).astype(v_pages.dtype))
            if scaled:
                ksn = small.k_scale[:, 0, :, pre:].reshape(L, Hkv, n_new,
                                                           page)
                vsn = small.v_scale[:, 0, :, pre:].reshape(L, Hkv, n_new,
                                                           page)
                ksp = ksp.at[:, new_ids].set(ksn.transpose(0, 2, 1, 3))
                vsp = vsp.at[:, new_ids].set(vsn.transpose(0, 2, 1, 3))
            return first, first_lp, k_pages, v_pages, ksp, vsp
        return prefill

    # -- host-side page bookkeeping ------------------------------------

    def _ensure_pages(self, slot: int, upto_len: int) -> bool:
        """Assign pages so positions [0, upto_len) are backed. Returns
        False (no state change) if the pool can't cover the need.
        Requests past max_seq clamp to the table width — the decode
        scan deactivates a slot at new_len == T before it could write
        beyond the last page (a burst near T used to index off the end
        of the block table here)."""
        need = min(-(-upto_len // self.page), self._table.shape[1])
        have = int((self._table[slot] >= 0).sum())
        if need <= have:
            return True
        if need - have > self.pool.available:
            return False
        for i in range(have, need):
            self._table[slot, i] = self.pool.acquire()
        self._table_dirty = True
        return True

    def _device_table(self):
        if self._table_dirty or not hasattr(self, "_table_dev"):
            self._table_dev = jnp.asarray(self._table)
            self._table_dirty = False
        return self._table_dev

    # -- overridden lifecycle ------------------------------------------

    def _admit(self):
        for slot in self._free_slots():
            if not self._queue:
                break
            req = self._queue[0]
            t0 = time.perf_counter()
            plen = len(req.prompt)
            # Prefix-cache lookup: reuse the longest run of full prompt
            # pages whose content (token prefix) is already pooled. Never
            # share the page holding the LAST prompt token — its hidden
            # state must be recomputed to produce the first logits.
            keys = (self._pc.prefix_page_keys(req.prompt, self.page)
                    if self.prefix_caching else [])
            shared: List[int] = []
            for key in keys[: (plen - 1) // self.page]:
                pid = self.pool.lookup(key)
                if pid is None:
                    break
                shared.append(pid)
            m = len(shared)
            pre = m * self.page
            # Total prefill width = what a cache-cold admission would
            # use (bucketed prompt, rounded up to whole pages); the
            # suffix takes the part past the shared prefix. See
            # _prefill_fn on why the width must match the cold path.
            W = -(-_bucket(plen, self.config.prefill_bucket, cap=self.T)
                  // self.page) * self.page
            S_suf = W - pre
            n_new = S_suf // self.page
            # Cover the scattered suffix region + the first generated
            # token; later pages arrive on demand in step().
            need = max(m + n_new, -(-(plen + 1) // self.page))
            if need - m > self.pool.available:
                self.pool.release(shared)   # pool full: stay queued
                break
            self._queue.popleft()
            self._table[slot, :m] = shared
            for i in range(m, need):
                self._table[slot, i] = self.pool.acquire(
                    keys[i] if i < len(keys) else None)
            self._table_dirty = True
            arr = np.full((1, S_suf), self.config.pad_token_id, np.int32)
            arr[0, : plen - pre] = req.prompt[pre:]
            fkey = (m, S_suf)
            if fkey not in self._prefill_cache:
                self._prefill_cache[fkey] = self._prefill_fn(*fkey)
            (t, k, p), pen, pc_row, bias_row = self._set_slot_sp(slot, req)
            first, first_lp, kp, vp, ksp, vsp = self._prefill_cache[fkey](
                self.params, jnp.asarray(arr), jnp.int32(plen),
                jnp.asarray(self._table[slot, :m]),
                jnp.asarray(self._table[slot, m:m + n_new]),
                self.cache.k_pages, self.cache.v_pages,
                self.cache.k_scale_pages, self.cache.v_scale_pages,
                self._next_rng(), t, k, p, pen, pc_row, bias_row)
            self.cache = self.cache._replace(k_pages=kp, v_pages=vp,
                                             k_scale_pages=ksp,
                                             v_scale_pages=vsp)
            self._lengths[slot] = len(req.prompt)
            req.prefill_ms = (time.perf_counter() - t0) * 1e3
            req.slot = slot
            if self._dmodel is not None:
                # paged admission does not prefill the draft cache (the
                # prefix-cached suffix prefill has no draft analog);
                # _spec_catchup ingests the prompt before the first
                # speculative round. Slot reuse: reset the draft length.
                self._spec_dlen[slot] = 0
                self.dcache = self.dcache._replace(
                    length=self.dcache.length.at[slot].set(0))
            first, first_lp = jax.device_get(
                self._host_view((first, first_lp)))  # one batched fetch
            first_i = int(first)
            req.out_tokens.append(first_i)
            req.out_logprobs.append(float(first_lp))
            self.counts_out = self.counts_out.at[slot, first_i].add(1)
            self.tokens = self.tokens.at[slot].set(first_i)
            self.active = self.active.at[slot].set(True)
            self.budget = self.budget.at[slot].set(
                req.max_new - len(req.out_tokens))
            self._active[slot] = req
            done_struct = self._struct_after_token(slot, req, first_i)
            if first_i == self.config.eos_token_id:
                self._finish(slot, "eos")
            elif done_struct:
                self._finish(slot, "stop")
            elif len(req.out_tokens) >= req.max_new:
                self._finish(slot, "length")

    def _finish(self, slot: int, reason: str):
        self.pool.release(self._table[slot])
        self._table[slot] = -1
        self._table_dirty = True
        self._lengths[slot] = 0
        super()._finish(slot, reason)

    def step(self) -> int:
        self._admit()
        if not self._active:
            return 0
        if (self._dmodel is not None
                and all(self._slot_plain[s] for s in self._active)
                and all(len(r.prompt) + len(r.out_tokens)
                        + self.spec_k + 1 <= self.T
                        for r in self._active.values())
                and all(self._ensure_pages(
                    s, int(self._lengths[s]) + self.spec_k + 1)
                    for s in self._active)):
            # speculative round over the page pool: every live slot's
            # next spec_k+1 positions are page-backed up front (a slot
            # the pool can't cover falls the batch back to plain steps
            # this iteration — same degradation as bursts)
            self._spec_catchup()
            return self._step_spec()
        if self.decode_burst > 1 and not self._has_structured():
            # Burst needs every live slot's NEXT `burst` positions
            # page-backed up front; if the pool can't cover that,
            # degrade to a single step this iteration (structured slots
            # also fall back — their mask refreshes per token).
            n = self.decode_burst
            if all(self._ensure_pages(s, int(self._lengths[s]) + n)
                   for s in self._active):
                return self._step_burst_paged()
        # Each live slot writes its next token at position _lengths[slot]
        # — make sure that position's page exists.
        for slot in self._active:
            if not self._ensure_pages(slot, int(self._lengths[slot]) + 1):
                raise RuntimeError(
                    "KV page pool exhausted mid-decode; raise num_pages "
                    "or lower batch_slots")
        lengths_dev = jnp.asarray(self._lengths.astype(np.int32))
        (nxt, lp, hit_eos, kp, vp, ksp, vsp,
         self.counts_out) = self._decode_fn(
            self.params, self.tokens, self.active, self.cache.k_pages,
            self.cache.v_pages, self.cache.k_scale_pages,
            self.cache.v_scale_pages, self._device_table(), lengths_dev,
            self._next_rng(), self.slot_temp, self.slot_topk,
            self.slot_topp, self.slot_minp, self.slot_rep,
            self.slot_pres, self.slot_freq, self.counts_prompt,
            self.counts_out, self.slot_bias)
        self.cache = self.cache._replace(k_pages=kp, v_pages=vp,
                                         k_scale_pages=ksp,
                                         v_scale_pages=vsp)
        self.tokens = nxt
        nxt_np, lp_np, eos_np = jax.device_get(
            self._host_view((nxt, lp, hit_eos)))   # ONE batched fetch:
        # per-array np.asarray costs a full tunnel round trip EACH
        # (~30 ms; CLAUDE.md round-4) — 3x the per-token latency on the
        # default serving path
        for slot in list(self._active):
            self._lengths[slot] += 1
            req = self._active[slot]
            req.out_tokens.append(int(nxt_np[slot]))
            req.out_logprobs.append(float(lp_np[slot]))
            done_struct = self._struct_after_token(slot, req,
                                                   int(nxt_np[slot]))
            if eos_np[slot]:
                self._finish(slot, "eos")
            elif done_struct:
                self._finish(slot, "stop")
            elif len(req.out_tokens) >= req.max_new:
                self._finish(slot, "length")
            elif self._hit_max_seq(req):
                self._finish(slot, "max_seq")
        self._resync_budget()      # same stale-budget hazard as the
        return len(self._active)   # contiguous plain step


    # -- speculative rounds over the page pool --------------------------

    @functools.cached_property
    def _spec_round_paged(self):
        """Paged analog of _spec_round: the (k+1)-wide verify runs
        forward_paged_verify — chunk K/V lands in the pre-assigned
        pages and the multi-query paged kernel streams each slot's
        prefix ONCE. Target length rollback is free (host block-table
        lengths advance only by the accepted count; rejected drafts'
        K/V is dead weight past the length, overwritten later)."""
        model, cfg = self._model, self.model_config
        model_d, dcfg = self._dmodel, self.draft_config
        k = self.spec_k
        scaled = self.cache.k_scale_pages is not None
        propose = self._spec_propose
        accept = self._spec_accept

        @functools.partial(jax.jit, donate_argnums=(3, 4, 5, 6, 7))
        def spec_round(params, params_d, tokens, kp, vp, ksp, vsp,
                       dcache, active, table, lengths, rng, temp, topk,
                       topp):
            rng_d, rng_acc, rng_res, rng_bonus = jax.random.split(rng, 4)
            len_d0 = dcache.length
            lg, dcache = model_d.forward(params_d, dcfg,
                                         tokens[:, None], dcache)
            drafts, dlogits, dcache = propose(
                model_d, dcfg, params_d, lg[:, 0], dcache, rng_d, k,
                temp, topk, topp)
            chunk = jnp.concatenate([tokens[:, None], drafts], axis=1)
            kw = (dict(k_scale_pages=ksp, v_scale_pages=vsp)
                  if scaled else {})
            out_v = model.forward_paged_verify(
                params, cfg, chunk, kp, vp, table, lengths, **kw)
            tlg, kp, vp = out_v[:3]
            if scaled:
                ksp, vsp = out_v[3:]
            tokens, out, lps, n_emit, a = accept(
                tlg, dlogits, drafts, tokens, active, k, temp, topk,
                topp, rng_acc, rng_res, rng_bonus)
            dcache = dcache._replace(
                length=jnp.where(active, len_d0 + 1 + a, len_d0))
            return tokens, kp, vp, ksp, vsp, dcache, out, lps, n_emit
        return spec_round

    def _run_spec_round(self):
        lengths_dev = jnp.asarray(self._lengths.astype(np.int32))
        (self.tokens, kp, vp, ksp, vsp, self.dcache, out, lps,
         n_emit) = self._spec_round_paged(
            self.params, self.draft_params, self.tokens,
            self.cache.k_pages, self.cache.v_pages,
            self.cache.k_scale_pages, self.cache.v_scale_pages,
            self.dcache, self.active, self._device_table(), lengths_dev,
            self._next_rng(), self.slot_temp, self.slot_topk,
            self.slot_topp)
        self.cache = self.cache._replace(k_pages=kp, v_pages=vp,
                                         k_scale_pages=ksp,
                                         v_scale_pages=vsp)
        return tuple(np.asarray(a) for a in jax.device_get(
            self._host_view((out, lps, n_emit))))

    def _spec_target_advance(self, slot: int, n: int) -> None:
        # host block-table lengths ARE the paged target cache length
        self._lengths[slot] += n

    def _paged_burst_fn(self, n: int):
        """n paged decode steps as ONE jitted scan (the paged analog of
        _decode_burst_fn): per sub-step each slot appends into its
        PRE-ASSIGNED pages (step() ensured positions [len, len+n) are
        backed; inactive/finished slots write to the reserved trash
        page via the block-table -1 clamp), samples, decrements its
        budget, and deactivates on EOS/budget/max-seq — one host round
        trip per burst instead of per token."""
        cfg = self.model_config
        model = self._model
        eos = self.config.eos_token_id
        T = self.T
        scaled = self.cache.k_scale_pages is not None

        @functools.partial(jax.jit, donate_argnums=(4, 5, 6, 7))
        def burst(params, tokens, active, budget, kp, vp, ksp, vsp,
                  table, lengths, rng, temp, topk, topp, minp, rep,
                  pres, freq, pc, oc, bias):
            def body(carry, rng_i):
                (tokens, active, budget, kp, vp, ksp, vsp, lengths,
                 oc) = carry
                kw = (dict(k_scale_pages=ksp, v_scale_pages=vsp)
                      if scaled else {})
                out = model.forward_paged_decode(
                    params, cfg, tokens, kp, vp, table, lengths, **kw)
                logits, kp, vp = out[:3]
                if scaled:
                    ksp, vsp = out[3:]
                logits = logits + bias
                nxt = sampling.sample_per_slot(
                    rng_i, logits, temp, topk, topp, min_p=minp,
                    repetition_penalty=rep, presence_penalty=pres,
                    frequency_penalty=freq, counts=pc + oc,
                    out_counts=oc)
                lp = sampling.token_logprob(logits, nxt)
                oc = oc.at[jnp.arange(oc.shape[0]), nxt].add(
                    active.astype(jnp.int32))
                was = active
                hit_eos = active & (nxt == eos)
                budget = budget - active.astype(jnp.int32)
                new_len = jnp.where(active, lengths + 1, lengths)
                active = active & ~hit_eos & (budget > 0) & (new_len < T)
                tokens = jnp.where(was, nxt, tokens)
                return (tokens, active, budget, kp, vp, ksp, vsp,
                        new_len, oc), (nxt, was, hit_eos, lp)
            rngs = jax.random.split(rng, n)
            carry, ys = jax.lax.scan(
                body, (tokens, active, budget, kp, vp, ksp, vsp,
                       lengths, oc), rngs)
            return carry, ys
        return burst

    def _step_burst_paged(self) -> int:
        n = self.decode_burst
        key = ("paged", n)
        if key not in self._burst_cache:
            self._burst_cache[key] = self._paged_burst_fn(n)
        lengths_dev = jnp.asarray(self._lengths.astype(np.int32))
        carry, (toks, was, eoss, lps) = self._burst_cache[key](
            self.params, self.tokens, self.active, self.budget,
            self.cache.k_pages, self.cache.v_pages,
            self.cache.k_scale_pages, self.cache.v_scale_pages,
            self._device_table(), lengths_dev, self._next_rng(),
            self.slot_temp, self.slot_topk, self.slot_topp,
            self.slot_minp, self.slot_rep, self.slot_pres,
            self.slot_freq, self.counts_prompt, self.counts_out,
            self.slot_bias)
        (self.tokens, self.active, self.budget, kp, vp, ksp, vsp,
         _len_dev, self.counts_out) = carry
        self.cache = self.cache._replace(k_pages=kp, v_pages=vp,
                                         k_scale_pages=ksp,
                                         v_scale_pages=vsp)
        toks_np, was_np, eos_np, lps_np = (
            np.asarray(a) for a in jax.device_get(
                self._host_view((toks, was, eoss, lps))))
        for slot in list(self._active):
            req = self._active[slot]
            for i in range(n):
                if not was_np[i, slot]:
                    break
                self._lengths[slot] += 1     # one token landed in pages
                req.out_tokens.append(int(toks_np[i, slot]))
                req.out_logprobs.append(float(lps_np[i, slot]))
                if eos_np[i, slot]:
                    self._finish(slot, "eos")
                    break
                if len(req.out_tokens) >= req.max_new:
                    self._finish(slot, "length")
                    break
                if self._hit_max_seq(req):
                    self._finish(slot, "max_seq")
                    break
        return len(self._active)
