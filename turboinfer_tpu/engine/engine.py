"""InferenceEngine — the generation runtime.

Reference counterpart: include/turboinfer/model/inference_engine.hpp +
src/model/inference_engine.cpp (generate :734-802, generate_batch
:804-828, beam_search_decode :1912-2069, compute_logprobs :873-954,
performance_stats :1129-1220, memory_usage :1039-1092).

TPU-native redesign:
  - prefill is ONE jitted call over the (bucketed) prompt; decode is a
    jitted step or a fully-fused `lax.scan` over the token budget —
    no per-token Python work on the hot path.
  - generate_batch is REAL batching: right-padded fixed-shape batch,
    per-sequence positions/EOS, one forward for all sequences per step
    (the reference loops sequentially — SURVEY.md quirk #7).
  - beam search shares the KV cache across beams (beams = batch dim,
    cache reordered by gather each step) instead of re-running the full
    prefix per beam per step (quirk #8: O(n²·beam) in the reference).
  - EOS honors config.eos_token_id (quirk #9: reference hardcodes 2).
  - reproducible sampling from an explicit PRNG seed.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.config import InferenceConfig, ModelConfig
from turboinfer_tpu.engine import sampling
from turboinfer_tpu.engine.sampling import SamplingParams
from turboinfer_tpu.models import llama, registry
from turboinfer_tpu.models.common import KVCache
from turboinfer_tpu.utils.errors import TokenError
from turboinfer_tpu.utils.metrics import EngineStats


@dataclasses.dataclass
class StreamChunk:
    """One token from generate_stream. `text` is the newly-decodable
    text delta (None when the engine has no tokenizer, "" while a
    multi-token UTF-8 sequence is still incomplete)."""
    token: int
    text: Optional[str] = None
    index: int = 0                        # 0-based position in the output
    finished: bool = False
    stop_reason: Optional[str] = None     # set on the final chunk


@dataclasses.dataclass
class GenerationResult:
    """Per-call result (reference: GenerationResult,
    inference_engine.hpp:41-48)."""
    tokens: List[int]
    logprobs: Optional[List[float]] = None
    total_time_ms: float = 0.0
    tokens_per_second: float = 0.0
    prefill_time_ms: float = 0.0          # TTFT proxy (not in the reference)
    # True when prefill_time_ms is a real device-synced TTFT
    # (InferenceConfig.measure_ttft, or the per-step host loop); False
    # means it is host ENQUEUE time of the prefill dispatch — the fused
    # scan path deliberately never syncs mid-pipeline (one forced round
    # trip costs ~30-45 ms through a tunnel-attached chip).
    ttft_measured: bool = False
    finished: bool = True
    stop_reason: str = "length"           # "eos" | "length" | "max_seq"
    text: Optional[str] = None            # decoded output (chat() sets it)


def _bucket(n: int, enable: bool, minimum: int = 16,
            cap: Optional[int] = None) -> int:
    """Round prompt length up to a power of two to bound recompilation.

    `cap` (the cache width, max_seq_len): a non-power-of-two
    max_seq_len otherwise yields a prefill slab WIDER than the KV
    cache for long-but-valid prompts (e.g. max_seq 3000, prompt 2500
    -> bucket 4096), which fails the cache dynamic_update_slice at
    trace time (and overruns the paged block table)."""
    if not enable:
        return n
    b = minimum
    while b < n:
        b *= 2
    if cap is not None and b > cap >= n:
        b = cap
    return b


class InferenceEngine:
    """Holds params + configs and drives jitted prefill/decode programs.

    Construct directly from in-memory params (tests/benchmarks) or via
    turboinfer_tpu.load_model() (file formats).
    """

    def __init__(self, params: Dict[str, Any], model_config: ModelConfig,
                 config: Optional[InferenceConfig] = None,
                 tokenizer=None, mesh=None,
                 param_specs: Optional[Dict[str, Any]] = None,
                 parallel: str = "tp",
                 pp_microbatches: Optional[int] = None,
                 params_are_prepared: bool = False,
                 cp_strategy: str = "ring"):
        """mesh: optional jax.sharding.Mesh — the whole engine (prefill,
        fused decode scan, beam search, logprobs) runs tensor/data-
        parallel: weights sharded per `param_specs` (default
        parallel.shardings.param_specs) and the KV cache sharded
        batch-over-data / kv-heads-over-tp; every jitted program
        compiles under GSPMD with XLA-placed collectives.

        parallel="pp": PIPELINE-parallel serving instead — decoder
        layers stage over the mesh's "pp" axis (weights + KV cache
        shard 1/P on the layer axis; parallel/pipeline.py relay), so
        models larger than one chip's HBM are servable through the
        SAME generate/stream/beam API. pp_microbatches staggers
        prefill/batch forwards GPipe-style when the batch divides
        (decode at B=1 uses the plain relay — microbatching can't help
        weight-streaming-bound steps).

        parallel="cp": CONTEXT-parallel serving — the prompt's KV cache
        sequence-shards over the mesh's "sp" axis (1/P of the attention
        working set per chip; parallel/context.py ring prefill +
        psum-combined decode), so contexts larger than one chip's HBM
        are servable through the same API. Weights replicate.
        cp_strategy="ulysses" swaps the ring prefill for the all_to_all
        head-exchange (needs Hq and Hkv divisible by the ring size);
        decode is strategy-independent.

        params_are_prepared=True: `params` already went through
        kernels.dispatch.prepare_params (e.g. they are a live
        scheduler's weights) — share them instead of building fused
        copies (zero extra HBM)."""
        from turboinfer_tpu.kernels import dispatch as _dispatch
        self.params = (params if params_are_prepared else
                       _dispatch.prepare_params(params,
                                                fuse=mesh is None))
        self.mesh = mesh
        if parallel not in ("tp", "pp", "cp"):
            raise ValueError(f"parallel must be 'tp', 'pp' or 'cp', "
                             f"got '{parallel}'")
        self.parallel = parallel if mesh is not None else "tp"
        self.pp_microbatches = pp_microbatches
        self.cp_strategy = cp_strategy
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
        self.tokenizer = tokenizer
        self.stats = EngineStats()
        self._rng = jax.random.PRNGKey(self.config.seed)
        self._jit_cache: Dict[Any, Any] = {}
        self._cache_pool: Dict[Any, Any] = {}

    @functools.cached_property
    def _fwd(self):
        """The engine's forward: (params, tokens, cache, seq_lens) ->
        (logits, cache'). Single-chip and TP/DP meshes call the family
        forward directly; parallel="pp" routes through the pipeline
        stage relay (microbatched when the batch divides); parallel="cp"
        routes through the context-parallel ring prefill / combined
        decode."""
        model, cfg = self._model, self.model_config
        if self.parallel == "cp":
            from turboinfer_tpu.parallel import context as _cp
            mesh = self.mesh
            strat = self.cp_strategy

            def fwd_cp(params, tokens, cache, seq_lens=None):
                if tokens.shape[1] > 1:
                    return _cp.cp_prefill(params, cfg, tokens, cache,
                                          mesh=mesh, seq_lens=seq_lens,
                                          strategy=strat)
                return _cp.cp_decode(params, cfg, tokens, cache,
                                     mesh=mesh)
            return fwd_cp
        if self.parallel == "pp":
            from turboinfer_tpu.parallel import pipeline as _pl
            mesh, mb = self.mesh, self.pp_microbatches

            def fwd(params, tokens, cache, seq_lens=None, logit_idx=None):
                B = tokens.shape[0]
                if mb and mb > 1 and B % mb == 0:
                    # microbatch relay has no last-position head yet —
                    # preserve the [B, 1, V] contract by gathering here
                    logits, cache = _pl.pipeline_forward_microbatch(
                        params, cfg, tokens, cache, mesh=mesh,
                        microbatches=mb, seq_lens=seq_lens)
                    if logit_idx is not None:
                        logits = jnp.take_along_axis(
                            logits, logit_idx[:, None, None].astype(
                                jnp.int32), axis=1)
                    return logits, cache
                return _pl.pipeline_forward(params, cfg, tokens, cache,
                                            mesh=mesh, seq_lens=seq_lens,
                                            logit_idx=logit_idx)
            return fwd
        return (lambda params, tokens, cache, seq_lens=None,
                logit_idx=None, **kw: model.forward(
                    params, cfg, tokens, cache, seq_lens=seq_lens,
                    logit_idx=logit_idx, **kw))

    # -- KV-cache buffer pool -------------------------------------------

    def _take_cache(self, batch_size: int, prompt_width: int = 0):
        """Reuse the HBM KV buffers from a previous generate call when the
        shape matches — allocating + zero-filling a multi-GB cache per
        call costs real time over the device link. Stale K/V contents are
        harmless: every attention path masks by the per-sequence length,
        so resetting `length` to zero is a full reset (the honest
        equivalent of the reference's zero-fill KVCache::reset,
        inference_engine.cpp:60-69, without the memset).

        prompt_width (cp mode only): the padded prompt width — the cp
        cache's sequence-sharded ctx region is sized to it (one compile
        + one pool entry per prompt bucket)."""
        if self.parallel == "cp":
            return self._take_cp_cache(batch_size, prompt_width)
        key = (batch_size, self.config.max_seq_len)
        cache = self._cache_pool.pop(key, None)
        if cache is None:
            from turboinfer_tpu.models.common import resolve_kv_dtype
            dt = resolve_kv_dtype(self.config.kv_cache_dtype,
                                  self.model_config.dtype)
            if dt == jnp.int8 and not getattr(self._model,
                                              "SUPPORTS_INT8_KV", False):
                raise ValueError(
                    "kv_cache_dtype='int8' is not supported by this "
                    "model family (its forward does not thread the "
                    "per-token KV scales); use 'fp8' or 'bf16'")
            # fused=None -> model-chosen layout (llama-family picks the
            # fused-head layout for D % 128 != 0 so decode stays on a
            # Pallas kernel; other modules treat None as head-major).
            # Sharded engines force head-major: cache_spec shards the
            # 5-D kv-head axis over tp.
            cache = self._model.init_cache(
                self.model_config, batch_size,
                max_seq=self.config.max_seq_len, dtype=dt,
                fused=False if self.mesh is not None else None)
            if self.mesh is not None:
                if self.parallel == "pp":
                    from turboinfer_tpu.parallel import pipeline as _pl
                    cache = _pl.shard_pp_cache(cache, self.mesh,
                                               config=self.model_config)
                else:
                    from turboinfer_tpu.parallel import shardings as _sh
                    cache = _sh.shard_cache(cache, self.mesh)
            return cache
        return cache._replace(length=jnp.zeros_like(cache.length))

    def _take_cp_cache(self, batch_size: int, s_ctx: int):
        from turboinfer_tpu.models.common import resolve_kv_dtype
        from turboinfer_tpu.parallel import context as _cp
        dt = resolve_kv_dtype(self.config.kv_cache_dtype,
                              self.model_config.dtype)
        if dt == jnp.uint8:
            raise ValueError("the context-parallel engine supports "
                             "kv_cache_dtype 'model'/'bf16'/'int8' "
                             "(int8 is the compressed long-context "
                             "cache; fp8 is not threaded)")
        t_tail = max(self.config.max_seq_len - s_ctx, 8)
        key = (batch_size, s_ctx, self.config.max_seq_len)
        cache = self._cache_pool.pop(key, None)
        if cache is None:
            return _cp.init_cp_cache(self.model_config, batch_size,
                                     s_ctx, t_tail, self.mesh, dtype=dt)
        return cache._replace(length=jnp.zeros_like(cache.length),
                              ctx_len=jnp.zeros_like(cache.ctx_len))

    def _put_cache(self, batch_size: int, cache) -> None:
        for leaf in jax.tree_util.tree_leaves(cache):
            if getattr(leaf, "is_deleted", None) and leaf.is_deleted():
                # a donated buffer whose dispatch failed (e.g. tunnel
                # drop mid-call) — pooling it would poison every later
                # request with 'Array has been deleted'
                return
        if self.parallel == "cp":
            key = (batch_size, cache.k_ctx.shape[3],
                   self.config.max_seq_len)
            self._cache_pool[key] = cache
            return
        self._cache_pool[(batch_size, self.config.max_seq_len)] = cache

    # -- jitted programs ----------------------------------------------------

    def _prefill_program(self, fresh: bool):
        """Jitted prefill. fresh=True (non-chunked path): the model may
        assume cache.length == 0 — llama-family attention then reads
        the just-computed K/V directly and the cache writes overlap
        with compute (SUPPORTS_FRESH_PREFILL). Chunked prefill uses the
        fresh=False program."""
        key = ("prefill", fresh)
        if key in self._jit_cache:
            return self._jit_cache[key]
        fwd = self._fwd
        # single-chip / TP forwards AND the PP relay compute the head
        # for ONLY the last valid position (skips S-1/S of the lm_head
        # FLOPs + the [B, S, V] f32 materialization — at 7B S=512 B=8
        # the PP relay also psum-broadcast ~0.5 GB of it across the
        # ring); the cp relay returns full logits and gathers here.
        last_only = self.parallel in ("tp", "pp")
        # fresh_prefill stays single-chip: its Pallas cache writer /
        # direct-K/V flash kernel have no GSPMD partition rule, so on a
        # sharded mesh they would force replication (or fail to lower).
        kw = ({"fresh_prefill": True}
              if fresh and last_only and self.mesh is None and getattr(
                  self._model, "SUPPORTS_FRESH_PREFILL", False) else {})

        @functools.partial(jax.jit, donate_argnums=(3,))
        def prefill(params, tokens, seq_lens, cache):
            idx = jnp.maximum(seq_lens - 1, 0)
            if last_only:
                logits, cache = fwd(params, tokens, cache,
                                    seq_lens=seq_lens, logit_idx=idx,
                                    **kw)
                return logits[:, 0], cache
            logits, cache = fwd(params, tokens, cache,
                                seq_lens=seq_lens)
            last = jnp.take_along_axis(
                logits, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
            return last, cache
        self._jit_cache[key] = prefill
        return prefill

    @property
    def _prefill_fn(self):
        # chunk-safe program (callers that guarantee a cold cache use
        # _prefill_program(True) via _run_prefill)
        return self._prefill_program(False)

    @functools.cached_property
    def _decode_step_fn(self):
        fwd = self._fwd

        @functools.partial(jax.jit, donate_argnums=(2,))
        def step(params, token, cache):
            logits, cache = fwd(params, token[:, None], cache)
            return logits[:, 0], cache
        return step

    def _decode_scan_fn(self, num_tokens: int, params_s: SamplingParams,
                        eos_id: int, pad_id: int,
                        want_logprobs: bool = False):
        """Fused decode loop: one XLA program generating `num_tokens`.
        want_logprobs=False skips the per-step full-vocab log_softmax
        (a few us/token on small models); the logprobs output is then
        zeros."""
        key = ("scan", num_tokens, params_s, eos_id, pad_id, want_logprobs)
        if key in self._jit_cache:
            return self._jit_cache[key]
        fwd = self._fwd
        # Per-row headroom stop: the scan length covers the SHORTEST
        # row's budget, so longer-filled rows must finish individually
        # when their cache fills (their later clamped writes only touch
        # the finished row, whose tokens the host discards). CP carries
        # a different cache structure (no .length) and keeps the
        # conservative global clamp instead.
        row_limit = (self.config.max_seq_len - 1
                     if self.parallel == "tp" else None)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode(params, first_logits, cache, rng, prompt_counts):
            """Samples the FIRST token from the prefill logits and scans
            the rest — one program, so generate_batch never syncs between
            prefill and decode (the tunnel charges ~30-45 ms per forced
            round trip; sampling the first token eagerly on the host path
            cost a full extra RTT on the headline tiny bench).
            The rng split tree matches the host-loop path exactly
            (split -> r_pre for the first token, r_dec for the scan) so
            scan/host trajectories stay identical.
            Returns (tokens [B, num_tokens], logprobs [B, num_tokens])."""
            B = first_logits.shape[0]
            rows = jnp.arange(B)
            r_pre, r_dec = jax.random.split(rng)
            first_counts = ((prompt_counts, jnp.zeros_like(prompt_counts))
                            if params_s.needs_counts else None)
            first_token = sampling.sample(r_pre, first_logits, params_s,
                                          first_counts)

            def body(carry, rng_i):
                token, cache, finished, out_counts = carry
                logits, cache = fwd(params, token[:, None], cache)
                logits = logits[:, 0]
                counts = ((prompt_counts + out_counts, out_counts)
                          if params_s.needs_counts else None)
                nxt = sampling.sample(rng_i, logits, params_s, counts)
                if want_logprobs:
                    lp = sampling.token_logprob(logits, nxt)
                    lp = jnp.where(finished, 0.0, lp)
                else:
                    lp = jnp.zeros((B,), jnp.float32)
                nxt = jnp.where(finished, pad_id, nxt)
                if params_s.needs_counts:
                    out_counts = out_counts.at[rows, nxt].add(
                        (~finished).astype(jnp.int32))
                finished = finished | (nxt == eos_id)
                if row_limit is not None:
                    # post-write length T-1: this row just emitted its
                    # last in-headroom token — stop it individually
                    # (applied AFTER this step's sample so the final
                    # allowed token is kept)
                    finished = finished | (cache.length >= row_limit)
                return (nxt, cache, finished, out_counts), (nxt, lp)

            finished0 = first_token == eos_id
            out_counts0 = (jnp.zeros_like(prompt_counts).at[
                rows, first_token].add(1)
                if params_s.needs_counts else jnp.zeros((), jnp.int32))
            rngs = jax.random.split(r_dec, max(num_tokens - 1, 1))
            # Token-scan unroll: measured INCONCLUSIVE on the tiny
            # headline — interleaved A/B runs split 2-2 between
            # unroll=1 and 2 while the chip swung +-20% run to run
            # (unroll=4 clearly regressed). Default 1; env knob kept
            # for experiments. (The LAYER scan must never unroll —
            # copy-insertion trap, see models/common.layer_unroll;
            # this outer TOKEN scan tolerates it since each body
            # consumes the previous body's cache.)
            import os
            env = os.environ.get("TURBOINFER_DECODE_UNROLL", "0")
            unroll = int(env) if env.isdigit() and int(env) > 0 else 1
            (last, cache, finished, _), (toks, lps) = jax.lax.scan(
                body, (first_token, cache, finished0, out_counts0),
                rngs[:num_tokens - 1], unroll=unroll)
            first_lp = (sampling.token_logprob(first_logits, first_token)
                        if want_logprobs else jnp.zeros((B,), jnp.float32))
            tokens = jnp.concatenate([first_token[:, None], toks.T], axis=1)
            logprobs = jnp.concatenate([first_lp[:, None], lps.T], axis=1)
            return tokens, logprobs, cache, finished
        self._jit_cache[key] = decode
        return decode

    def _run_prefill(self, tokens, seq_lens, cache):
        """Prefill, optionally in fixed-size chunks (config.prefill_chunk)
        — bounds compile shapes + activation memory for long prompts.
        Returns (last_logits [B, V], cache)."""
        B, S = tokens.shape
        C = self.config.prefill_chunk
        if C <= 0 or S <= C or self.parallel == "cp":
            # cp: the ring prefill is one shot over the whole (sharded)
            # prompt — chunking would re-enter it with a filled cache.
            # Non-chunked = cold cache: use the fresh-prefill program.
            return self._prefill_program(True)(self.params, tokens,
                                               seq_lens, cache)
        lens_np = np.asarray(seq_lens)
        out_logits = None
        for c0 in range(0, S, C):
            c1 = min(c0 + C, S)
            chunk = tokens[:, c0:c1]
            if chunk.shape[1] < C:
                chunk = jnp.pad(chunk, ((0, 0), (0, C - chunk.shape[1])),
                                constant_values=self.config.pad_token_id)
            chunk_lens = jnp.clip(seq_lens - c0, 0, C)
            logits, cache = self._prefill_fn(self.params, chunk,
                                             chunk_lens, cache)
            sel = (lens_np - 1 >= c0) & (lens_np - 1 < c1)
            if out_logits is None:
                out_logits = logits
            else:
                out_logits = jnp.where(jnp.asarray(sel)[:, None], logits,
                                       out_logits)
        return out_logits, cache

    # -- helpers --------------------------------------------------------

    def _pad_batch(self, prompts: Sequence[Sequence[int]]
                   ) -> Tuple[jax.Array, jax.Array, int]:
        lens = [len(p) for p in prompts]
        S = _bucket(max(lens), self.config.prefill_bucket,
                    cap=self.config.max_seq_len)
        if self.parallel == "cp":
            # the sequence-sharded prefill needs S divisible by the
            # ring size
            from turboinfer_tpu.parallel.context import SP_AXIS
            p = self.mesh.shape[SP_AXIS]
            S = -(-S // p) * p
        B = len(prompts)
        arr = np.full((B, S), self.config.pad_token_id, np.int32)
        for i, p in enumerate(prompts):
            arr[i, : len(p)] = np.asarray(p, np.int32)
        return (jnp.asarray(arr), jnp.asarray(lens, np.int32), S)

    def _validate(self, tokens: Sequence[int]):
        """Reference: validate_input_tokens (inference_engine.cpp:1409-1417)."""
        if len(tokens) == 0:
            raise TokenError("input tokens must be non-empty")
        if len(tokens) >= self.config.max_seq_len:
            raise TokenError(
                f"prompt length {len(tokens)} exceeds max_seq_len "
                f"{self.config.max_seq_len}")
        V = self.model_config.vocab_size
        bad = [t for t in tokens if not (0 <= t < V)]
        if bad:
            raise TokenError(f"token ids out of vocab range [0,{V}): {bad[:5]}")

    def _sampling_params(self, temperature=None, top_k=None, top_p=None,
                         min_p=None, repetition_penalty=None,
                         presence_penalty=None, frequency_penalty=None
                         ) -> SamplingParams:
        c = self.config

        def pick(v, d):
            return d if v is None else v
        return SamplingParams(
            temperature=pick(temperature, c.temperature),
            top_k=pick(top_k, c.top_k),
            top_p=pick(top_p, c.top_p),
            min_p=pick(min_p, c.min_p),
            repetition_penalty=pick(repetition_penalty,
                                    c.repetition_penalty),
            presence_penalty=pick(presence_penalty, c.presence_penalty),
            frequency_penalty=pick(frequency_penalty, c.frequency_penalty))

    def _prompt_counts(self, tokens, seq_lens):
        """[B, V] int32 occurrence counts of the (unpadded) prompt."""
        B, S = tokens.shape
        V = self.model_config.vocab_size
        valid = (jnp.arange(S)[None, :] < seq_lens[:, None]).astype(
            jnp.int32)
        return jnp.zeros((B, V), jnp.int32).at[
            jnp.arange(B)[:, None], tokens].add(valid)

    def next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _host_view(self, tree):
        """Make jitted outputs host-readable on every process (no-op
        unless the mesh spans multiple processes — see
        parallel.shardings.replicate_for_host)."""
        if self.mesh is None:
            return tree
        from turboinfer_tpu.parallel import shardings as _sh
        return _sh.replicate_for_host(tree, self.mesh)

    # -- generation -------------------------------------------------------

    def generate(self, input_tokens: Sequence[int], max_new_tokens: int = 50,
                 *, return_logprobs: bool = False,
                 **sampling_kw) -> GenerationResult:
        """Single-prompt generation (reference: generate,
        inference_engine.cpp:734-802). sampling_kw: temperature, top_k,
        top_p, min_p, repetition_penalty, presence_penalty,
        frequency_penalty (None → InferenceConfig defaults)."""
        return self.generate_batch([input_tokens], max_new_tokens,
                                   return_logprobs=return_logprobs,
                                   **sampling_kw)[0]

    def generate_batch(self, prompts: Sequence[Sequence[int]],
                       max_new_tokens: int = 50, *,
                       return_logprobs: bool = False,
                       **sampling_kw) -> List[GenerationResult]:
        """True batched generation — one forward per step for ALL
        sequences (the reference loops prompts sequentially,
        inference_engine.cpp:804-828)."""
        for p in prompts:
            self._validate(p)
        sp = self._sampling_params(**sampling_kw)
        eos = self.config.eos_token_id
        pad = self.config.pad_token_id
        t0 = time.perf_counter()

        if not self.config.use_cache:
            return self._generate_batch_nocache(prompts, max_new_tokens, sp,
                                                eos, pad, t0,
                                                return_logprobs)

        tokens, seq_lens, S = self._pad_batch(prompts)
        B = len(prompts)
        # Budget bound: the SHORTEST row's fill decides the scan length
        # so each row can use its own headroom — clamping to the
        # longest prompt's headroom silently truncated short rows'
        # outputs based on who they were batched with (a 10-token
        # prompt got 28 tokens because a 100-token prompt shared the
        # batch). Rows that exhaust their own headroom finish per-row
        # inside the scan; CP keeps the conservative clamp (its tail
        # writes must never clamp).
        lens_lim = (int(seq_lens.max()) if self.parallel == "cp"
                    else int(seq_lens.min()))
        max_new = min(max_new_tokens,
                      self.config.max_seq_len - lens_lim)
        if max_new <= 0:
            # zero budget: a clean no-op (one token used to leak out)
            return [GenerationResult(tokens=list(p), logprobs=[] if
                                     return_logprobs else None,
                                     finished=True, stop_reason="length")
                    for p in prompts]
        cache = self._take_cache(B, S)
        if self.parallel == "cp":
            # the decode tail bounds the generation budget
            max_new = min(max_new, cache.k_tail.shape[3])

        last_logits, cache = self._run_prefill(tokens, seq_lens, cache)
        rng = self.next_rng()
        pc = (self._prompt_counts(tokens, seq_lens) if sp.needs_counts
              else jnp.zeros((), jnp.int32))
        # The scan path does not sync between the prefill and decode
        # dispatches by default (a forced round trip costs ~30-45 ms on
        # a tunnel-attached chip), so prefill_time_ms is host ENQUEUE
        # time — set InferenceConfig.measure_ttft=True (the CLI does)
        # to pay one sync for an accurate TTFT. The host-loop path
        # syncs per step anyway; serving TTFT comes from the
        # scheduler's own per-request clock.
        if self.config.measure_ttft:
            last_logits.block_until_ready()
        t_prefill = time.perf_counter()

        if max_new <= 1 or self.config.decode_loop != "scan":
            r_pre, r_dec = jax.random.split(rng)
            first = sampling.sample(
                r_pre, last_logits, sp,
                (pc, jnp.zeros_like(pc)) if sp.needs_counts else None)

        if max_new <= 1:
            toks = first[:, None]
            lps = sampling.token_logprob(last_logits, first)[:, None]
            finished = first == eos
        elif self.config.decode_loop == "scan":
            # Bucket the scan length to multiples of 32 (like prompt
            # bucketing): the fused program compiles per LENGTH, and
            # callers sweeping max_new_tokens used to mint a multi-
            # second XLA compile per distinct value. The ≤31 extra
            # decoded tokens are discarded host-side; the kept prefix
            # is bit-identical (split(key, N)[i] is N-independent).
            n_prog = max_new
            if self.config.prefill_bucket:
                n_prog = min(-(-max_new // 32) * 32,
                             self.config.max_seq_len - lens_lim)
            if self.parallel == "cp":
                # mirror the max_new tail clamp: with a padded prompt
                # (S > seq_lens.max()) the bucket round-up could exceed
                # the tail width and the slack steps' tail writes would
                # clamp onto the last valid tail row
                n_prog = min(n_prog, cache.k_tail.shape[3])
            decode = self._decode_scan_fn(n_prog, sp, eos, pad,
                                          want_logprobs=return_logprobs)
            toks, lps, cache, finished = decode(self.params, last_logits,
                                                cache, rng, pc)
        else:  # host loop with early exit on all-finished
            first.block_until_ready()
            t_prefill = time.perf_counter()
            toks_l, lps_l = [first], [sampling.token_logprob(last_logits,
                                                             first)]
            finished = first == eos
            token = first
            rows = jnp.arange(B)
            oc = (jnp.zeros_like(pc).at[rows, first].add(1)
                  if sp.needs_counts else None)
            # SAME per-step keys as the fused scan (split(r_dec, N)[i]
            # is N-independent in threefry counter mode) — the old
            # chain-splitting diverged from the scan path from the 2nd
            # sampled token, breaking the reproducibility contract
            step_rngs = jax.random.split(r_dec, max(max_new - 1, 1))
            for i in range(max_new - 1):
                logits, cache = self._decode_step_fn(self.params, token,
                                                     cache)
                r_i = step_rngs[i]
                nxt = sampling.sample(r_i, logits, sp,
                                      (pc + oc, oc) if sp.needs_counts
                                      else None)
                if sp.needs_counts:
                    oc = oc.at[rows, nxt].add((~finished).astype(jnp.int32))
                lp = sampling.token_logprob(logits, nxt)
                nxt = jnp.where(finished, pad, nxt)
                toks_l.append(nxt)
                lps_l.append(jnp.where(finished, 0.0, lp))
                finished = finished | (nxt == eos)
                token = nxt
                if bool(finished.all()):
                    break
            toks = jnp.stack(toks_l, axis=1)
            lps = jnp.stack(lps_l, axis=1)

        toks_np, lps_np, fin_np = (
            np.asarray(a) for a in jax.device_get(
                self._host_view((toks, lps, finished))))
        self._put_cache(B, cache)
        t1 = time.perf_counter()

        results = []
        new_total = 0
        for b in range(B):
            # drop bucket slack AND this row's beyond-headroom pads
            # (rows finish individually when their cache fills)
            cap_b = min(max_new,
                        self.config.max_seq_len - len(prompts[b]))
            row = toks_np[b][:max(cap_b, 0)].tolist()
            if eos in row:
                n = row.index(eos) + 1
                stop = "eos"
            else:
                n = len(row)
                stop = ("max_seq" if len(prompts[b]) + n >=
                        self.config.max_seq_len else "length")
            new_total += n
            dt_ms = (t1 - t0) * 1e3
            results.append(GenerationResult(
                tokens=list(prompts[b]) + row[:n],
                logprobs=(lps_np[b][:n].tolist() if return_logprobs else None),
                total_time_ms=dt_ms,
                tokens_per_second=n / max((t1 - t0), 1e-9),
                prefill_time_ms=(t_prefill - t0) * 1e3,
                ttft_measured=(self.config.measure_ttft
                               or self.config.decode_loop != "scan"),
                finished=bool(fin_np[b]) or stop == "eos",
                stop_reason=stop))

        self.stats.record_generation(new_tokens=new_total,
                                     elapsed_s=(t1 - t0),
                                     prefill_s=(t_prefill - t0),
                                     batch=B)
        return results

    # -- structured (grammar-constrained) generation -------------------------

    def generate_structured(self, input_tokens: Sequence[int],
                            max_new_tokens: int = 256, *,
                            response_format="json_object",
                            temperature: Optional[float] = None,
                            token_filter=None) -> GenerationResult:
        """Grammar-constrained generation: every emitted token must be a
        legal continuation of the active grammar, so the output is
        guaranteed to parse. response_format="json_object" constrains to
        a single top-level JSON object (OpenAI semantics);
        {"type": "json_schema", "json_schema": {"schema": {...}}}
        constrains to a compiled JSON Schema (structured/schema_fsm.py:
        objects with required AND optional properties, anyOf/oneOf,
        enums, bounded arrays, integer minimum/maximum, string
        minLength/maxLength/pattern, number/boolean/null); pass a custom
        `token_filter` (see structured/filter.py) for other grammars.

        PERFORMANCE WARNING: this standalone API runs a HOST decode
        loop — one device round trip per token (~30-45 ms each through
        a tunnel-attached chip), roughly 100x slower than generate()'s
        fused scan. For serving-speed constrained decoding use the
        continuous-batching scheduler's response_format instead: it
        applies the same grammars as on-device per-slot logit masks
        with no extra dispatches (scheduler.py::_struct_after_token).

        No reference analog (it has no constrained decoding).
        """
        self._validate(input_tokens)
        if token_filter is None:
            if self.tokenizer is None:
                raise RuntimeError("structured generation requires a "
                                   "tokenizer (or an explicit "
                                   "token_filter)")
            from turboinfer_tpu.structured import JsonTokenFilter
            fsm = None
            if isinstance(response_format, dict):
                from turboinfer_tpu.engine.scheduler import \
                    _normalize_response_format
                rf = _normalize_response_format(response_format)
                if isinstance(rf, tuple):
                    import json as _json

                    from turboinfer_tpu.structured.schema_fsm import \
                        SchemaFSM
                    fsm = SchemaFSM(_json.loads(rf[1]))
                response_format = rf
            token_filter = JsonTokenFilter(
                self.tokenizer,
                require_object=(response_format == "json_object"),
                fsm=fsm, eos_id=self.config.eos_token_id)
        temp = (self.config.temperature if temperature is None
                else temperature)
        t0 = time.perf_counter()
        tokens, seq_lens, S = self._pad_batch([input_tokens])
        budget = min(max_new_tokens,
                     self.config.max_seq_len - len(input_tokens))
        cache = self._take_cache(1, S)
        if self.parallel == "cp":
            # the decode tail bounds the budget (same guard as
            # generate_batch/generate_stream — overflowing it clamps
            # tail writes onto earlier tokens)
            budget = min(budget, cache.k_tail.shape[3])
        rng_np = np.random.default_rng(
            int(jax.random.randint(self.next_rng(), (), 0, 2**31 - 1)))
        out: List[int] = []
        try:
            last_logits, cache = self._run_prefill(tokens, seq_lens, cache)
            logits_np = np.asarray(last_logits[0], np.float32)
            t_prefill = time.perf_counter()
            while len(out) < budget and not token_filter.done:
                tid = token_filter.pick(logits_np, temperature=temp,
                                        rng=rng_np)
                if tid is None:
                    break
                if (token_filter.done
                        and tid == self.config.eos_token_id):
                    # a MAY-finish grammar chose to stop (top-level
                    # number schemas): don't append the EOS itself
                    break
                out.append(tid)
                if token_filter.done or len(out) >= budget:
                    break
                logits_dev, cache = self._decode_step_fn(
                    self.params, jnp.asarray([tid], jnp.int32), cache)
                logits_np = np.asarray(logits_dev[0], np.float32)
        finally:
            self._put_cache(1, cache)
        t1 = time.perf_counter()
        self.stats.record_generation(new_tokens=len(out),
                                     elapsed_s=(t1 - t0),
                                     prefill_s=(t_prefill - t0), batch=1)
        text = (self.tokenizer.decode(out)
                if self.tokenizer is not None else None)
        return GenerationResult(
            tokens=list(input_tokens) + out,
            total_time_ms=(t1 - t0) * 1e3,
            tokens_per_second=len(out) / max(t1 - t0, 1e-9),
            prefill_time_ms=(t_prefill - t0) * 1e3,
            ttft_measured=True,               # host loop syncs per step
            finished=token_filter.done,
            stop_reason="stop" if token_filter.done else "length",
            text=text)

    # -- streaming ---------------------------------------------------------

    def _stream_burst_fn(self, burst: int, params_s: SamplingParams,
                         eos_id: int, pad_id: int):
        """`burst` decode steps as ONE jitted scan for streaming: a
        burst costs a single host round trip (the tunnel charges a fixed
        dispatch RTT per call, so per-token dispatch would dominate)."""
        key = ("stream", burst, params_s, eos_id, pad_id)
        if key in self._jit_cache:
            return self._jit_cache[key]
        fwd = self._fwd

        @functools.partial(jax.jit, donate_argnums=(2,))
        def run(params, token, cache, finished, rng, prompt_counts,
                out_counts):
            rows = jnp.arange(token.shape[0])

            def body(carry, rng_i):
                token, cache, finished, oc = carry
                logits, cache = fwd(params, token[:, None], cache)
                counts = ((prompt_counts + oc, oc)
                          if params_s.needs_counts else None)
                nxt = sampling.sample(rng_i, logits[:, 0], params_s, counts)
                nxt = jnp.where(finished, pad_id, nxt)
                if params_s.needs_counts:
                    oc = oc.at[rows, nxt].add((~finished).astype(jnp.int32))
                finished = finished | (nxt == eos_id)
                return (nxt, cache, finished, oc), nxt

            (token, cache, finished, out_counts), toks = jax.lax.scan(
                body, (token, cache, finished, out_counts),
                jax.random.split(rng, burst))
            return toks[:, 0], token, cache, finished, out_counts
        self._jit_cache[key] = run
        return run

    def generate_stream(self, input_tokens: Sequence[int],
                        max_new_tokens: int = 50, *,
                        burst: int = 8, **sampling_kw):
        """Yield StreamChunk per generated token (no reference analog —
        its API is blocking-only, inference_engine.hpp:87-160).

        TPU-shaped streaming: tokens are produced in fused `burst`-step
        scans, one host round trip per burst — burst=1 minimizes
        per-token latency, larger bursts amortize dispatch overhead
        (throughput). Greedy output is token-identical to generate().
        """
        self._validate(input_tokens)
        sp = self._sampling_params(**sampling_kw)
        eos = self.config.eos_token_id
        pad = self.config.pad_token_id
        burst = max(1, int(burst))
        tokens, seq_lens, S = self._pad_batch([input_tokens])
        budget = min(max_new_tokens,
                     self.config.max_seq_len - len(input_tokens))
        if budget <= 0:
            return
        cache = self._take_cache(1, S)
        if self.parallel == "cp":
            budget = min(budget, cache.k_tail.shape[3])
        t0 = time.perf_counter()
        from turboinfer_tpu.tokenizer.stream import IncrementalDecoder
        decoder = IncrementalDecoder(self.tokenizer)
        out: List[int] = []

        def chunk(tok: int) -> StreamChunk:
            out.append(tok)
            # O(1) incremental detokenization (a UTF-8 char can span
            # several tokens; the decoder withholds incomplete tails)
            text = (decoder.push(tok) if self.tokenizer is not None
                    else None)
            done = tok == eos or len(out) >= budget
            reason = None
            if done:
                reason = "eos" if tok == eos else (
                    "max_seq" if len(input_tokens) + len(out) >=
                    self.config.max_seq_len else "length")
            return StreamChunk(token=tok, text=text, index=len(out) - 1,
                               finished=done, stop_reason=reason)

        try:
            last_logits, cache = self._run_prefill(tokens, seq_lens, cache)
            rng = self.next_rng()
            rng, r0 = jax.random.split(rng)
            pc = (self._prompt_counts(tokens, seq_lens) if sp.needs_counts
                  else jnp.zeros((), jnp.int32))
            oc = jnp.zeros_like(pc)
            token = sampling.sample(r0, last_logits, sp,
                                    (pc, oc) if sp.needs_counts else None)
            if sp.needs_counts:
                oc = oc.at[jnp.arange(1), token].add(1)
            first = chunk(int(token[0]))
            yield first
            if first.finished:
                return
            finished = token == eos
            run = self._stream_burst_fn(burst, sp, eos, pad)
            while len(out) < budget:
                rng, r_b = jax.random.split(rng)
                toks, token, cache, finished, oc = run(
                    self.params, token, cache, finished, r_b, pc, oc)
                for tok in np.asarray(toks).tolist():
                    c = chunk(int(tok))
                    yield c
                    if c.finished:
                        return
        finally:
            self._put_cache(1, cache)
            self.stats.record_generation(new_tokens=len(out),
                                         elapsed_s=time.perf_counter() - t0,
                                         prefill_s=0.0, batch=1)

    def _generate_batch_nocache(self, prompts, max_new_tokens, sp, eos, pad,
                                t0, return_logprobs):
        """use_cache=False path: recompute the full sequence every token
        (the reference's flag silently does nothing — SURVEY.md quirk #9;
        here it honestly disables incremental decoding)."""
        seqs = [list(p) for p in prompts]
        lps: List[List[float]] = [[] for _ in prompts]
        finished = [False] * len(prompts)
        stop = ["length"] * len(prompts)
        for _ in range(max_new_tokens):
            if all(finished):
                break
            tokens, seq_lens, S = self._pad_batch(seqs)
            logits = self._logprob_fn(tokens, seq_lens)
            idx = jnp.maximum(seq_lens - 1, 0)
            last = jnp.take_along_axis(
                logits, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
            rng = self.next_rng()
            counts = None
            if sp.needs_counts:
                V = self.model_config.vocab_size
                ac = np.zeros((len(seqs), V), np.int32)
                oc = np.zeros((len(seqs), V), np.int32)
                for b, s in enumerate(seqs):
                    np.add.at(ac[b], np.asarray(s, np.int64), 1)
                    out = np.asarray(s[len(prompts[b]):], np.int64)
                    np.add.at(oc[b], out, 1)
                counts = (jnp.asarray(ac), jnp.asarray(oc))
            nxt = np.asarray(sampling.sample(rng, last, sp, counts))
            lp = np.asarray(sampling.token_logprob(last, jnp.asarray(nxt)))
            for b, s in enumerate(seqs):
                if finished[b]:
                    continue
                s.append(int(nxt[b]))
                lps[b].append(float(lp[b]))
                if int(nxt[b]) == eos:
                    finished[b] = True
                    stop[b] = "eos"
                elif len(s) >= self.config.max_seq_len:
                    finished[b] = True
                    stop[b] = "max_seq"
        t1 = time.perf_counter()
        results = []
        for b, s in enumerate(seqs):
            n = len(s) - len(prompts[b])
            results.append(GenerationResult(
                tokens=s, logprobs=lps[b] if return_logprobs else None,
                total_time_ms=(t1 - t0) * 1e3,
                tokens_per_second=n / max(t1 - t0, 1e-9),
                finished=finished[b] or n >= max_new_tokens,
                stop_reason=stop[b]))
        self.stats.record_generation(
            new_tokens=sum(len(s) - len(p) for s, p in zip(seqs, prompts)),
            elapsed_s=(t1 - t0), prefill_s=0.0, batch=len(prompts))
        return results

    # -- beam search ------------------------------------------------------

    def generate_beam_search(self, input_tokens: Sequence[int],
                             max_new_tokens: int = 50, beam_size: int = 4,
                             *, length_penalty: Optional[float] = None,
                             temperature: Optional[float] = None,
                             top_k: Optional[int] = None,
                             top_p: Optional[float] = None,
                             return_all_beams: bool = False):
        """Beam search with a KV cache SHARED across beams.

        Reference: beam_search_decode (inference_engine.cpp:1912-2069)
        recomputes the full prefix per beam per step; here beams live on
        the batch axis, the cache is gathered/reordered per step, and
        the whole loop (first expansion included) is ONE fused XLA
        program. Length-normalized scoring `logp / len^length_penalty`
        matches the reference (:2023-2027).

        temperature/top_k/top_p apply the reference's candidate
        filtering (inference_engine.cpp:1971-1988): logits/T -> softmax
        -> top-k filter + renormalize -> top-p nucleus + renormalize;
        accumulated beam log-probs are logs of the FILTERED distribution.
        Defaults (None) leave the distribution unfiltered — classic beam
        search (the reference always applies its config_ values; pass
        them explicitly for that behavior).

        Returns the best beam as a GenerationResult with per-token
        `logprobs`, or all `beam_size` results sorted by normalized
        score when return_all_beams=True (the reference returns a
        vector<GenerationResult>, inference_engine.hpp:163).
        """
        self._validate(input_tokens)
        if max_new_tokens <= 0:
            raise TokenError("beam search needs max_new_tokens >= 1")
        if self.parallel == "cp":
            raise NotImplementedError(
                "beam search is not supported on the context-parallel "
                "engine yet")
        lp_pen = (self.config.length_penalty if length_penalty is None
                  else length_penalty)
        eos = self.config.eos_token_id
        temp = 1.0 if temperature is None else float(temperature)
        tk = 0 if top_k is None else int(top_k)
        tp = 1.0 if top_p is None else float(top_p)
        t0 = time.perf_counter()

        tokens, seq_lens, S = self._pad_batch([input_tokens])
        max_new = min(max_new_tokens,
                      self.config.max_seq_len - len(input_tokens))
        cache = self._take_cache(1, S)
        if not hasattr(cache, "k_scale"):
            # DeepSeekPPCache: the beam program's per-step cache
            # gather/tiling assumes the KVCache field layout.
            self._put_cache(1, cache)
            raise NotImplementedError(
                "beam search is not supported on the deepseek "
                "pipeline-parallel engine yet")
        # ONE fused program: prompt prefill + first expansion + the
        # whole beam scan. The tunnel charges a fixed ~30 ms dispatch
        # RTT PER JITTED CALL (CLAUDE.md) — a separate prefill dispatch
        # cost the old path a third of its e2e wall on the tiny
        # benchmark (device self-time is ~0.1 ms/step; the rest was
        # per-call overhead). prefill_chunk does not apply here.
        run = self._beam_run_fn(beam_size, max_new - 1, temp, tk, tp)
        # ONE device_get for all seven outputs: per-array np.asarray
        # fetches each cost a full tunnel round trip (~30 ms) — seven
        # of them were ~200 ms of a 210 ms beam call (device self-time
        # is ~6 ms; measured via XProf, profile_beam_trace.py).
        (first_np, first_lp_np, scores, finished_np, toks_np,
         parents_np, lps_np) = (np.asarray(a) for a in jax.device_get(
            self._host_view(run(self.params, tokens, seq_lens, cache))))
        self._put_cache(1, cache)     # prefill ran on a program-internal
        # copy; the pooled buffer is reused (length resets on take)
        n_steps = toks_np.shape[0]
        beam_tokens = np.zeros((beam_size, n_steps + 1), np.int64)
        beam_lps = np.zeros((beam_size, n_steps + 1), np.float64)
        for b in range(beam_size):
            cur = b
            for t in range(n_steps - 1, -1, -1):
                beam_tokens[b, t + 1] = toks_np[t, cur]
                beam_lps[b, t + 1] = lps_np[t, cur]
                cur = parents_np[t, cur]
            beam_tokens[b, 0] = first_np[cur]
            beam_lps[b, 0] = first_lp_np[cur]

        # Final ranking by length-normalized score.
        lengths = np.array([self._beam_len(beam_tokens[b], eos)
                            for b in range(beam_size)])
        norm = scores / np.maximum(lengths, 1) ** lp_pen
        order = np.argsort(-norm)
        t1 = time.perf_counter()

        results = []
        for b in order:
            row = beam_tokens[b].tolist()
            n = self._beam_len(row, eos)
            results.append(GenerationResult(
                tokens=list(input_tokens) + row[:n],
                logprobs=beam_lps[b, :n].tolist(),
                total_time_ms=(t1 - t0) * 1e3,
                tokens_per_second=n / max(t1 - t0, 1e-9),
                finished=bool(finished_np[b]),
                stop_reason="eos" if eos in row[:n] else "length"))
        best_n = len(results[0].tokens) - len(input_tokens)
        self.stats.record_generation(new_tokens=best_n, elapsed_s=t1 - t0,
                                     prefill_s=0.0, batch=1)
        return results if return_all_beams else results[0]

    @staticmethod
    def _beam_len(row, eos) -> int:
        row = list(row)
        return row.index(eos) + 1 if eos in row else len(row)

    def _beam_run_fn(self, beam_size: int, n_steps: int, temp: float,
                     tk: int, tp: float):
        """Fused beam program: prompt prefill + first expansion +
        `n_steps` beam-expansion scan, emitting (token, parent, logp)
        per step for host-side lineage backtracking. ONE dispatch."""
        key = ("beam_run", beam_size, n_steps, temp, tk, tp)
        if key in self._jit_cache:
            return self._jit_cache[key]
        fwd = self._fwd
        eos = self.config.eos_token_id
        NEG = -1e30

        def filt(logits):
            """Reference candidate filtering (:1971-1988): the masked
            log_softmax IS the log of the filtered renormalized probs."""
            x = sampling.apply_temperature(logits, temp)
            x = sampling.apply_top_k(x, tk)
            x = sampling.apply_top_p(x, tp)
            return sampling.log_softmax(x)

        @jax.jit
        def run(params, tokens, seq_lens, cache):
            # Prefill inside the program (no separate dispatch).
            logits, cache = fwd(params, tokens, cache, seq_lens=seq_lens)
            idx = jnp.maximum(seq_lens - 1, 0)
            first_logits = jnp.take_along_axis(
                logits, idx[:, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            # First expansion: top beam_size of the filtered prompt
            # distribution (cache is still batch=1 here).
            logp0 = filt(first_logits[0])                    # [V]
            first_lp, first_ix = jax.lax.top_k(logp0, beam_size)
            scores = first_lp
            finished = first_ix == eos
            token = first_ix.astype(jnp.int32)
            # Tile the prefill cache across beams on the batch axis.
            scaled = cache.k_scale is not None
            cache_b = cache._replace(
                k=jnp.repeat(cache.k, beam_size, axis=1),
                v=jnp.repeat(cache.v, beam_size, axis=1),
                length=jnp.repeat(cache.length, beam_size, axis=0),
                k_scale=(jnp.repeat(cache.k_scale, beam_size, axis=1)
                         if scaled else None),
                v_scale=(jnp.repeat(cache.v_scale, beam_size, axis=1)
                         if scaled else None))

            def body(carry, _):
                token, scores, finished, cache = carry
                logits, cache = fwd(params, token[:, None], cache)
                logp = filt(logits[:, 0])                    # [beam, V]
                V = logp.shape[-1]
                # Finished beams only propose EOS at score 0 (frozen).
                frozen = jnp.full((beam_size, V), NEG).at[:, eos].set(0.0)
                logp = jnp.where(finished[:, None], frozen, logp)
                total = scores[:, None] + logp               # [beam, V]
                top_s, top_i = jax.lax.top_k(total.reshape(-1), beam_size)
                parent = (top_i // V).astype(jnp.int32)
                tok = (top_i % V).astype(jnp.int32)
                step_lp = top_s - scores[parent]
                new_finished = finished[parent] | (tok == eos)
                cache = cache._replace(
                    k=cache.k[:, parent], v=cache.v[:, parent],
                    length=cache.length[parent],
                    k_scale=(cache.k_scale[:, parent] if scaled else None),
                    v_scale=(cache.v_scale[:, parent] if scaled else None))
                return (tok, top_s, new_finished, cache), \
                    (tok, parent, step_lp)

            (token, scores, finished, cache_b), (toks, parents, lps) = \
                jax.lax.scan(body, (token, scores, finished, cache_b),
                             None, length=n_steps)
            return first_ix, first_lp, scores, finished, toks, parents, lps
        self._jit_cache[key] = run
        return run

    # -- logprobs ---------------------------------------------------------

    def compute_logprobs(self, tokens: Sequence[int]) -> List[float]:
        """Log-prob of each token given its prefix (reference:
        compute_logprobs, inference_engine.cpp:873-954). First token gets
        0.0 (no context), matching the reference's convention."""
        self._validate(tokens)
        S = _bucket(len(tokens), self.config.prefill_bucket,
                    cap=self.config.max_seq_len)
        if self.parallel == "cp":
            from turboinfer_tpu.parallel.context import SP_AXIS
            p = self.mesh.shape[SP_AXIS]
            S = -(-S // p) * p
        arr = np.full((1, S), self.config.pad_token_id, np.int32)
        arr[0, : len(tokens)] = np.asarray(tokens, np.int32)
        logits = self._host_view(
            self._logprob_fn(jnp.asarray(arr),
                             jnp.asarray([len(tokens)], np.int32)))
        lp = sampling.log_softmax(logits[0])                  # [S, V]
        tok = jnp.asarray(arr[0], jnp.int32)
        token_lp = jnp.take_along_axis(lp[:-1], tok[1:, None],
                                       axis=-1)[:, 0]
        out = [0.0] + np.asarray(token_lp)[: len(tokens) - 1].tolist()
        return out

    @functools.cached_property
    def _logprob_fn(self):
        cfg = self.model_config
        model = self._model
        if self.parallel == "cp":
            # Sequence-parallel scoring: exactly the workload CP exists
            # for (a context whose [S, ...] working set won't fit one
            # chip). The throwaway cache is built in-trace; the ring
            # prefill's shard_map specs place it.
            from turboinfer_tpu.parallel import context as _cp
            mesh = self.mesh

            @jax.jit
            def run_cp(tokens, seq_lens):
                B, S = tokens.shape
                L, Hkv, D = (cfg.num_layers, cfg.kv_heads,
                             cfg.head_dim_)
                z = lambda t: jnp.zeros((L, B, Hkv, t, D), cfg.dtype)
                cache = _cp.CPCache(
                    k_ctx=z(S), v_ctx=z(S), k_tail=z(8), v_tail=z(8),
                    ctx_len=jnp.zeros((B,), jnp.int32),
                    length=jnp.zeros((B,), jnp.int32))
                logits, _ = _cp.cp_prefill(self.params, cfg, tokens,
                                           cache, mesh=mesh,
                                           seq_lens=seq_lens)
                return logits
            return run_cp
        if self.parallel == "pp":
            # Cacheless full-sequence scoring through the stage relay: a
            # fresh width-S pipeline cache is built in-trace (zeros) and
            # discarded; shard_map's in_specs place it.
            fwd = self._fwd
            from turboinfer_tpu.parallel.pipeline import (DeepSeekPPCache,
                                                          _family)
            is_ds = _family(cfg)[0] == "deepseek"
            kd = cfg.first_k_dense_replace if is_ds else 0

            @jax.jit
            def run_pp(tokens, seq_lens):
                B, S = tokens.shape
                cache = model.init_cache(cfg, B, max_seq=S, fused=False)
                if is_ds:
                    cache = DeepSeekPPCache(
                        k_dense=cache.k[:kd], v_dense=cache.v[:kd],
                        k=cache.k[kd:], v=cache.v[kd:],
                        length=cache.length)
                logits, _ = fwd(self.params, tokens, cache,
                                seq_lens=seq_lens)
                return logits
            return run_pp

        @jax.jit
        def run(tokens, seq_lens):
            return model.forward_no_cache(self.params, cfg, tokens,
                                          seq_lens=seq_lens)
        return run

    # -- introspection ------------------------------------------------------

    def reset_state(self):
        """Reference: reset_state (inference_engine.cpp:1014-1037)."""
        self.stats = EngineStats()
        self._rng = jax.random.PRNGKey(self.config.seed)
        self._cache_pool.clear()

    def memory_usage(self) -> int:
        """Bytes for weights + one max-shape KV cache (reference:
        memory_usage, inference_engine.cpp:1039-1092)."""
        w = self._model.param_bytes(self.params)
        c = self.model_config
        from turboinfer_tpu.models.common import resolve_kv_dtype
        kv_dt = resolve_kv_dtype(self.config.kv_cache_dtype, c.dtype)
        cache_elems = (c.num_layers * self.config.max_batch_size *
                       self.config.max_seq_len * c.kv_heads * c.head_dim_)
        cache_bytes = 2 * cache_elems * jnp.dtype(kv_dt).itemsize
        if kv_dt == jnp.int8:
            # per-(token, head) f32 scale planes ride along
            cache_bytes += (2 * 4 * c.num_layers
                            * self.config.max_batch_size
                            * self.config.max_seq_len * c.kv_heads)
        return int(w + cache_bytes)

    def performance_stats(self) -> str:
        """Formatted report (reference: performance_stats,
        inference_engine.cpp:1129-1220)."""
        return self.stats.report(model_name=self.model_config.name,
                                 memory_bytes=self.memory_usage())

    # -- chat ---------------------------------------------------------------

    def _chat_prompt(self, messages) -> List[int]:
        if self.tokenizer is None:
            raise RuntimeError("chat requires a tokenizer (load the model "
                               "from a checkpoint with a vocab)")
        return self.tokenizer.apply_chat_template(messages, tokenize=True)

    def chat(self, messages, max_new_tokens: int = 256,
             **sampling_kw) -> GenerationResult:
        """One assistant turn: render `messages` with the checkpoint's
        chat template, generate, and return the result with `.text` set
        to the decoded assistant reply. (No reference analog — it has no
        chat/template support at all.)"""
        ids = self._chat_prompt(messages)
        res = self.generate(ids, max_new_tokens, **sampling_kw)
        res.text = self.tokenizer.decode(res.tokens[len(ids):])
        return res

    def chat_stream(self, messages, max_new_tokens: int = 256, *,
                    burst: int = 8, **sampling_kw):
        """Streaming chat(): yields StreamChunk with text deltas."""
        return self.generate_stream(self._chat_prompt(messages),
                                    max_new_tokens, burst=burst,
                                    **sampling_kw)

    # -- tokenizer passthrough ----------------------------------------------

    def encode(self, text: str) -> List[int]:
        if self.tokenizer is None:
            raise RuntimeError("engine has no tokenizer attached")
        return self.tokenizer.encode(text)

    def decode(self, tokens: Sequence[int]) -> str:
        if self.tokenizer is None:
            raise RuntimeError("engine has no tokenizer attached")
        return self.tokenizer.decode(tokens)


def quick_generate(params, model_config, prompt_tokens, max_new_tokens=50,
                   **kw) -> List[int]:
    """Reference: quick_generate helper (inference_engine.cpp:2071-2082)."""
    eng = InferenceEngine(params, model_config)
    return eng.generate(prompt_tokens, max_new_tokens, **kw).tokens
