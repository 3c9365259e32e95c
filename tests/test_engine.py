"""InferenceEngine integration tests on the synthetic tiny model.

Reference counterparts: tests/test_inference_engine.cpp,
test_enhanced_transformer.cpp (generate → non-empty + tok/s),
test_beam_search.cpp, test_logprob_defaults.cpp,
test_performance_stats.cpp — plus determinism and EOS-honoring tests
the reference can't do (wall-clock seeded, hardcoded EOS).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import turboinfer_tpu as ti
from turboinfer_tpu.models import llama


def test_generate_basic(tiny_engine):
    r = tiny_engine.generate([1, 5, 7, 9], max_new_tokens=12,
                             temperature=0.8)
    assert len(r.tokens) > 4
    assert r.tokens[:4] == [1, 5, 7, 9]
    assert r.tokens_per_second > 0
    assert r.stop_reason in ("eos", "length", "max_seq")


def test_generate_greedy_deterministic(tiny_engine):
    a = tiny_engine.generate([1, 2, 3], 10, temperature=0.0).tokens
    b = tiny_engine.generate([1, 2, 3], 10, temperature=0.0).tokens
    assert a == b


def test_generate_seeded_sampling_reproducible(tiny_params, tiny_cfg):
    e1 = ti.InferenceEngine(tiny_params, tiny_cfg,
                            ti.InferenceConfig(seed=42))
    e2 = ti.InferenceEngine(tiny_params, tiny_cfg,
                            ti.InferenceConfig(seed=42))
    a = e1.generate([1, 2, 3], 10, temperature=1.0).tokens
    b = e2.generate([1, 2, 3], 10, temperature=1.0).tokens
    assert a == b


def test_generate_batch_matches_solo_greedy(tiny_engine):
    """Real batching (quirk #7 fixed): batched greedy rows == solo runs."""
    p1, p2 = [1, 2, 3], [4, 5, 6, 7, 8]
    batch = tiny_engine.generate_batch([p1, p2], 8, temperature=0.0)
    solo1 = tiny_engine.generate(p1, 8, temperature=0.0)
    solo2 = tiny_engine.generate(p2, 8, temperature=0.0)
    assert batch[0].tokens == solo1.tokens
    assert batch[1].tokens == solo2.tokens


def test_eos_honored(tiny_params, tiny_cfg):
    """quirk #9 fixed: config.eos_token_id stops generation."""
    probe = ti.InferenceEngine(tiny_params, tiny_cfg)
    first = probe.generate([1, 2, 3], 1, temperature=0.0).tokens[-1]
    eng = ti.InferenceEngine(tiny_params, tiny_cfg,
                             ti.InferenceConfig(eos_token_id=first))
    r = eng.generate([1, 2, 3], 10, temperature=0.0)
    assert r.stop_reason == "eos"
    assert r.finished
    assert r.tokens == [1, 2, 3, first]


def test_host_loop_matches_scan_loop(tiny_params, tiny_cfg):
    es = ti.InferenceEngine(tiny_params, tiny_cfg,
                            ti.InferenceConfig(decode_loop="scan"))
    eh = ti.InferenceEngine(tiny_params, tiny_cfg,
                            ti.InferenceConfig(decode_loop="host"))
    assert (es.generate([1, 2, 3, 4], 10, temperature=0.0).tokens ==
            eh.generate([1, 2, 3, 4], 10, temperature=0.0).tokens)


def test_logprobs_returned(tiny_engine):
    r = tiny_engine.generate([1, 2, 3], 6, temperature=0.0,
                             return_logprobs=True)
    n_new = len(r.tokens) - 3
    assert r.logprobs is not None and len(r.logprobs) == n_new
    assert all(lp <= 0.0 for lp in r.logprobs)


def test_compute_logprobs(tiny_engine):
    lp = tiny_engine.compute_logprobs([1, 5, 7, 9, 11])
    assert len(lp) == 5
    assert lp[0] == 0.0           # first token convention
    assert all(x < 0.0 for x in lp[1:])
    assert all(np.isfinite(lp))


def test_beam_search_beats_or_matches_greedy_score(tiny_engine):
    """Beam search's length-normalized logprob must be >= greedy's
    (on the same model, penalty 1.0)."""
    prompt = [1, 5, 7]
    n = 8
    g = tiny_engine.generate(prompt, n, temperature=0.0,
                             return_logprobs=True)
    b = tiny_engine.generate_beam_search(prompt, n, beam_size=4,
                                         length_penalty=1.0)
    g_new = g.tokens[len(prompt):]
    b_new = b.tokens[len(prompt):]
    assert len(b_new) > 0
    g_score = sum(g.logprobs) / max(len(g_new), 1)
    b_lp = tiny_engine.compute_logprobs(b.tokens)
    b_score = sum(b_lp[len(prompt):]) / max(len(b_new), 1)
    assert b_score >= g_score - 1e-3


def test_beam_size_one_equals_greedy(tiny_engine):
    prompt = [2, 4, 6]
    g = tiny_engine.generate(prompt, 8, temperature=0.0).tokens
    b = tiny_engine.generate_beam_search(prompt, 8, beam_size=1).tokens
    assert g == b


def _numpy_beam_golden(engine, prompt, max_new, beam_size, temp, tk, tp,
                       eos):
    """Pure-numpy beam search with the reference's candidate filtering
    (inference_engine.cpp:1971-1988): temperature -> softmax -> top-k
    renormalize -> top-p renormalize; accumulated log-probs are logs of
    the filtered distribution. Recomputes full prefixes per step like
    the reference (:1961) — slow but independent of the engine's fused
    scan/cache machinery."""
    cfg = engine.model_config
    model = engine._model

    def last_logits(seq):
        toks = jnp.asarray([seq], jnp.int32)
        logits = model.forward_no_cache(
            engine.params, cfg, toks,
            seq_lens=jnp.asarray([len(seq)], jnp.int32))
        return np.asarray(logits[0, len(seq) - 1], np.float64)

    def filt(logits):
        x = logits / temp if temp > 0 else logits
        e = np.exp(x - x.max())
        p = e / e.sum()
        if 0 < tk < len(p):
            order = np.argsort(-p)
            p[order[tk:]] = 0.0
            p /= p.sum()
        if 0.0 < tp < 1.0:
            order = np.argsort(-p)
            cum = np.cumsum(p[order])
            keep = (cum - p[order]) < tp     # first crossing included
            p[order[~keep]] = 0.0
            p /= p.sum()
        with np.errstate(divide="ignore"):
            return np.log(p)

    logp0 = filt(last_logits(list(prompt)))
    first = np.argsort(-logp0)[:beam_size]
    beams = [(list(prompt) + [int(t)], float(logp0[t]), int(t) == eos)
             for t in first]
    for _ in range(max_new - 1):
        V = None
        cand = []
        for bi, (seq, score, fin) in enumerate(beams):
            if fin:
                lp = None                     # frozen: EOS at 0
            else:
                lp = filt(last_logits(seq))
            cand.append((bi, lp))
            V = len(logp0)
        flat = np.full((beam_size, V), -1e30)
        for bi, lp in cand:
            if lp is None:
                flat[bi, eos] = beams[bi][1]
            else:
                flat[bi] = beams[bi][1] + lp
        top = np.argsort(-flat.reshape(-1))[:beam_size]
        new_beams = []
        for ix in top:
            parent, tok = divmod(int(ix), V)
            seq, score, fin = beams[parent]
            new_beams.append((seq + [int(tok)],
                              float(flat.reshape(-1)[ix]),
                              fin or int(tok) == eos))
        beams = new_beams
    return beams


@pytest.mark.parametrize("temp,tk,tp", [(1.0, 0, 1.0), (0.7, 5, 1.0),
                                        (1.0, 0, 0.85), (0.9, 8, 0.9)])
def test_beam_filtering_matches_numpy_golden(tiny_engine, temp, tk, tp):
    """Beam temperature/top-k/top-p semantics (reference
    inference_engine.cpp:1971-1988) vs an independent numpy beam."""
    prompt = [1, 5, 9]
    n, bs = 5, 3
    eos = tiny_engine.config.eos_token_id
    got = tiny_engine.generate_beam_search(
        prompt, n, beam_size=bs, temperature=temp, top_k=tk, top_p=tp,
        length_penalty=1.0, return_all_beams=True)
    want = _numpy_beam_golden(tiny_engine, prompt, n, bs, temp, tk, tp,
                              eos)
    got_set = {tuple(r.tokens) for r in got}
    want_set = {tuple(seq[:len(prompt) + tiny_engine._beam_len(
        seq[len(prompt):], eos)]) for seq, _, _ in want}
    assert got_set == want_set
    # accumulated filtered log-prob must match per beam
    want_scores = {tuple(seq): s for seq, s, _ in want}
    for r in got:
        # engine truncates at EOS; golden keeps full length — compare
        # via the logprobs sum on the engine side against the golden
        # score of the matching full sequence when lengths agree.
        full = [k for k in want_scores if k[:len(r.tokens)] == tuple(
            r.tokens)]
        assert full, r.tokens
        if len(full[0]) == len(r.tokens):
            assert abs(sum(r.logprobs) - want_scores[full[0]]) < 1e-3


def test_beam_all_beams_and_logprobs(tiny_engine):
    """return_all_beams returns beam_size results sorted by normalized
    score, each with per-token logprobs consistent with its tokens."""
    prompt = [1, 2, 3]
    rs = tiny_engine.generate_beam_search(prompt, 6, beam_size=4,
                                          return_all_beams=True)
    assert len(rs) == 4
    eos = tiny_engine.config.eos_token_id
    for r in rs:
        n_new = len(r.tokens) - len(prompt)
        assert r.logprobs is not None and len(r.logprobs) == n_new
        assert all(lp <= 1e-6 for lp in r.logprobs)
    # sorted by normalized score
    def norm(r):
        n = len(r.tokens) - len(prompt)
        return sum(r.logprobs) / max(n, 1)
    norms = [norm(r) for r in rs]
    assert norms == sorted(norms, reverse=True)
    # best beam == the single-result API
    best = tiny_engine.generate_beam_search(prompt, 6, beam_size=4)
    assert best.tokens == rs[0].tokens


def test_stats_and_memory(tiny_engine):
    tiny_engine.reset_state()
    tiny_engine.generate([1, 2], 5, temperature=0.0)
    s = tiny_engine.performance_stats()
    assert "tok/s" in s and "TTFT" in s
    assert tiny_engine.stats.total_generations == 1
    assert tiny_engine.memory_usage() > 0


def test_validation_errors(tiny_engine):
    with pytest.raises(ValueError):
        tiny_engine.generate([], 5)
    with pytest.raises(ValueError):
        tiny_engine.generate([99999], 5)
    with pytest.raises(ValueError):
        tiny_engine.generate(list(range(300)), 5)


def test_quick_generate(tiny_params, tiny_cfg):
    from turboinfer_tpu.engine.engine import quick_generate
    toks = quick_generate(tiny_params, tiny_cfg, [1, 2, 3],
                          max_new_tokens=5, temperature=0.0)
    assert len(toks) > 3


def test_facade_init_shutdown():
    assert ti.initialize(enable_logging=False)
    assert ti.is_initialized()
    assert "jax" in ti.build_info()
    ti.shutdown()
    assert not ti.is_initialized()


def test_chunked_prefill_matches_single_shot(tiny_params, tiny_cfg):
    """prefill_chunk must not change greedy outputs."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.config import InferenceConfig
    prompt = list(range(1, 25))
    e1 = ti.InferenceEngine(tiny_params, tiny_cfg, InferenceConfig(
        max_seq_len=128, seed=0))
    e2 = ti.InferenceEngine(tiny_params, tiny_cfg, InferenceConfig(
        max_seq_len=128, seed=0, prefill_chunk=8, prefill_bucket=False))
    w = e1.generate(prompt, 10, temperature=0.0).tokens
    g = e2.generate(prompt, 10, temperature=0.0).tokens
    assert g == w


def test_use_cache_false_matches_cached(tiny_params, tiny_cfg):
    """use_cache=False recomputes but must produce identical greedy
    output (the reference's flag silently does nothing)."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.config import InferenceConfig
    prompt = [1, 5, 42, 7]
    e1 = ti.InferenceEngine(tiny_params, tiny_cfg, InferenceConfig(
        max_seq_len=128, seed=0))
    e2 = ti.InferenceEngine(tiny_params, tiny_cfg, InferenceConfig(
        max_seq_len=128, seed=0, use_cache=False))
    w = e1.generate(prompt, 8, temperature=0.0).tokens
    g = e2.generate(prompt, 8, temperature=0.0).tokens
    assert g == w


class TestFp8KVCache:
    """kv_cache_dtype="fp8": float8_e4m3 cache storage (half the HBM
    bytes/bandwidth of bf16, no scale bookkeeping)."""

    def test_cache_dtype_and_memory(self, tiny_params, tiny_cfg):
        import jax.numpy as jnp
        import turboinfer_tpu as ti
        from turboinfer_tpu.config import InferenceConfig
        e = ti.InferenceEngine(tiny_params, tiny_cfg, InferenceConfig(
            max_seq_len=128, seed=0, kv_cache_dtype="fp8"))
        c = e._take_cache(1)
        # fp8 cache is STORED as raw e4m3 bytes (uint8) — see
        # common.resolve_kv_dtype.
        assert c.k.dtype == jnp.uint8
        assert c.k.nbytes == c.k.size

    def test_logits_close_to_bf16_cache(self, tiny_params, tiny_cfg):
        import numpy as np
        import jax.numpy as jnp
        from turboinfer_tpu.models import llama
        tokens = jnp.asarray([[1, 5, 42, 7, 9, 300, 12, 77]])
        ref, _ = llama.forward(tiny_params, tiny_cfg, tokens,
                               llama.init_cache(tiny_cfg, 1, max_seq=32))
        got, _ = llama.forward(
            tiny_params, tiny_cfg, tokens,
            llama.init_cache(tiny_cfg, 1, max_seq=32,
                             dtype=jnp.float8_e4m3fn))
        r = np.asarray(ref[0, -1])
        g = np.asarray(got[0, -1])
        # fp8 K/V rounding perturbs logits slightly; same top token on
        # a clear-margin distribution and small numeric delta.
        assert np.abs(g - r).max() < 0.25 * max(1.0, np.abs(r).max())

    def test_incremental_matches_full_forward_fp8(self, tiny_params,
                                                  tiny_cfg):
        """Cache correctness is dtype-independent: prefill+decode over an
        fp8 cache must equal one full forward over the same fp8 cache."""
        import numpy as np
        import jax.numpy as jnp
        from turboinfer_tpu.models import llama
        seq = [1, 5, 42, 7, 9, 300]
        full, _ = llama.forward(
            tiny_params, tiny_cfg, jnp.asarray([seq]),
            llama.init_cache(tiny_cfg, 1, max_seq=32,
                             dtype=jnp.float8_e4m3fn))
        cache = llama.init_cache(tiny_cfg, 1, max_seq=32,
                                 dtype=jnp.float8_e4m3fn)
        outs = []
        for t in seq:
            logits, cache = llama.forward(tiny_params, tiny_cfg,
                                          jnp.asarray([[t]]), cache)
            outs.append(np.asarray(logits[0, 0]))
        np.testing.assert_allclose(np.stack(outs),
                                   np.asarray(full[0]), rtol=2e-2,
                                   atol=2e-2)

    def test_scheduler_fp8_matches_engine_fp8(self, tiny_params, tiny_cfg):
        import turboinfer_tpu as ti
        from turboinfer_tpu.config import InferenceConfig
        from turboinfer_tpu.engine.scheduler import \
            ContinuousBatchingScheduler
        cfg = InferenceConfig(max_seq_len=128, temperature=0.0, seed=0,
                              kv_cache_dtype="fp8")
        eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
        want = eng.generate([1, 5, 42, 7], 10, temperature=0.0).tokens
        sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                            batch_slots=2, decode_burst=4)
        rid = sched.submit([1, 5, 42, 7], 10)
        assert sched.run()[rid].tokens == want


class TestInt8KVCache:
    """kv_cache_dtype="int8": scaled-int8 storage (half the HBM bytes of
    bf16 like fp8, but ~2 VPU passes to decode instead of ~14 of e4m3
    bit math — see kernels/pallas/decode_attention)."""

    def test_cache_dtype_scales_and_memory(self, tiny_params, tiny_cfg):
        import jax.numpy as jnp
        import turboinfer_tpu as ti
        from turboinfer_tpu.config import InferenceConfig
        e = ti.InferenceEngine(tiny_params, tiny_cfg, InferenceConfig(
            max_seq_len=128, seed=0, kv_cache_dtype="int8"))
        c = e._take_cache(1)
        assert c.k.dtype == jnp.int8 and c.k.nbytes == c.k.size
        assert c.k_scale is not None and c.k_scale.dtype == jnp.float32
        # scales are head-major [L, B, Hkv, T] for BOTH cache layouts
        L, B = c.k.shape[:2]
        T = c.k.shape[2] if c.fused_layout else c.k.shape[3]
        assert c.k_scale.shape == (L, B, tiny_cfg.kv_heads, T)

    def test_encode_decode_roundtrip_error_bound(self):
        import jax, jax.numpy as jnp
        from turboinfer_tpu.models.common import (decode_kv,
                                                  encode_kv_scaled)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64, 32),
                              jnp.float32)
        q, s = encode_kv_scaled(x, jnp.int8)
        assert q.dtype == jnp.int8 and s.shape == x.shape[:-1]
        back = decode_kv(q, jnp.float32, s)
        # symmetric absmax: |err| <= scale/2 = absmax/254 per row
        bound = (jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 254.0
                 + 1e-6)
        assert bool(jnp.all(jnp.abs(back - x) <= bound))

    def test_logits_close_to_bf16_cache(self, tiny_params, tiny_cfg):
        import numpy as np
        import jax.numpy as jnp
        from turboinfer_tpu.models import llama
        tokens = jnp.asarray([[1, 5, 42, 7, 9, 300, 12, 77]])
        ref, _ = llama.forward(tiny_params, tiny_cfg, tokens,
                               llama.init_cache(tiny_cfg, 1, max_seq=32))
        got, _ = llama.forward(
            tiny_params, tiny_cfg, tokens,
            llama.init_cache(tiny_cfg, 1, max_seq=32, dtype=jnp.int8))
        r = np.asarray(ref[0, -1])
        g = np.asarray(got[0, -1])
        assert np.abs(g - r).max() < 0.25 * max(1.0, np.abs(r).max())

    def test_incremental_matches_full_forward_int8(self, tiny_params,
                                                   tiny_cfg):
        """Cache correctness is dtype-independent: prefill+decode over an
        int8 cache must equal one full forward over the same int8
        cache."""
        import numpy as np
        import jax.numpy as jnp
        from turboinfer_tpu.models import llama
        seq = [1, 5, 42, 7, 9, 300]
        full, _ = llama.forward(
            tiny_params, tiny_cfg, jnp.asarray([seq]),
            llama.init_cache(tiny_cfg, 1, max_seq=32, dtype=jnp.int8))
        cache = llama.init_cache(tiny_cfg, 1, max_seq=32, dtype=jnp.int8)
        outs = []
        for t in seq:
            logits, cache = llama.forward(tiny_params, tiny_cfg,
                                          jnp.asarray([[t]]), cache)
            outs.append(np.asarray(logits[0, 0]))
        np.testing.assert_allclose(np.stack(outs),
                                   np.asarray(full[0]), rtol=2e-2,
                                   atol=2e-2)

    def test_scheduler_int8_matches_engine_int8(self, tiny_params,
                                                tiny_cfg):
        import turboinfer_tpu as ti
        from turboinfer_tpu.config import InferenceConfig
        from turboinfer_tpu.engine.scheduler import \
            ContinuousBatchingScheduler
        cfg = InferenceConfig(max_seq_len=128, temperature=0.0, seed=0,
                              kv_cache_dtype="int8")
        eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
        want = eng.generate([1, 5, 42, 7], 10, temperature=0.0).tokens
        sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                            batch_slots=2, decode_burst=4)
        rid = sched.submit([1, 5, 42, 7], 10)
        assert sched.run()[rid].tokens == want

    def test_beam_search_int8_runs(self, tiny_params, tiny_cfg):
        import turboinfer_tpu as ti
        from turboinfer_tpu.config import InferenceConfig
        e = ti.InferenceEngine(tiny_params, tiny_cfg, InferenceConfig(
            max_seq_len=128, seed=0, kv_cache_dtype="int8"))
        r = e.generate_beam_search([1, 5, 42], 6, beam_size=3)
        assert len(r.tokens) >= 4

    def test_fused_layout_int8(self, tiny_params, tiny_cfg):
        """int8 + the fused-head layout: scales live in head-major
        [L, B, Hkv, T] planes; the tiny fixture (D=32) auto-picks the
        fused layout and must decode deterministically."""
        import jax.numpy as jnp
        import turboinfer_tpu as ti
        from turboinfer_tpu.config import InferenceConfig
        from turboinfer_tpu.models import common
        c = common.init_cache(tiny_cfg, 1, max_seq=32, dtype=jnp.int8,
                              fused=True)
        assert c.fused_layout and c.k_scale is not None
        assert c.k_scale.shape == (tiny_cfg.num_layers, 1,
                                   tiny_cfg.kv_heads, 32)
        e = ti.InferenceEngine(tiny_params, tiny_cfg, InferenceConfig(
            max_seq_len=128, seed=0, kv_cache_dtype="int8"))
        ec = e._take_cache(1)
        assert ec.fused_layout, "tiny fixture should auto-pick fused"
        e._put_cache(1, ec)
        r = e.generate([1, 5, 42, 7], 10, temperature=0.0)
        assert r.tokens == e.generate([1, 5, 42, 7], 10,
                                      temperature=0.0).tokens


# ---------------------------------------------------------------------------
# Streaming generation (no reference analog — its API is blocking-only)
# ---------------------------------------------------------------------------

def test_stream_matches_generate_greedy(tiny_engine):
    want = tiny_engine.generate([1, 5, 42, 7], 12, temperature=0.0).tokens
    got = [c.token for c in tiny_engine.generate_stream(
        [1, 5, 42, 7], 12, temperature=0.0, burst=4)]
    assert [1, 5, 42, 7] + got == want
    # burst size must not change the tokens
    got1 = [c.token for c in tiny_engine.generate_stream(
        [1, 5, 42, 7], 12, temperature=0.0, burst=1)]
    assert got1 == got


def test_stream_chunk_metadata(tiny_engine):
    chunks = list(tiny_engine.generate_stream([3, 2, 1], 6,
                                              temperature=0.0, burst=3))
    assert [c.index for c in chunks] == list(range(len(chunks)))
    assert all(not c.finished for c in chunks[:-1])
    assert chunks[-1].finished and chunks[-1].stop_reason in (
        "eos", "length", "max_seq")
    assert all(c.text is None for c in chunks)    # no tokenizer attached


def test_stream_stops_at_eos(tiny_params, tiny_cfg):
    import turboinfer_tpu as ti
    # force an EOS the greedy path actually emits: run once, pick the
    # 3rd generated token as eos, re-run and expect early stop there
    eng0 = ti.InferenceEngine(tiny_params, tiny_cfg)
    toks = [c.token for c in eng0.generate_stream([1, 2], 8,
                                                  temperature=0.0)]
    eos = toks[2]
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             eos_token_id=eos)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
    chunks = list(eng.generate_stream([1, 2], 8, temperature=0.0, burst=8))
    assert chunks[-1].token == eos
    assert chunks[-1].stop_reason == "eos"
    assert len(chunks) == 3


def test_stream_text_deltas(tiny_params, tiny_cfg):
    import turboinfer_tpu as ti
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    tok = BuiltinTokenizer(vocab_size=tiny_cfg.vocab_size)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, tokenizer=tok)
    chunks = list(eng.generate_stream([1, 5, 9], 10, temperature=0.0))
    streamed = "".join(c.text for c in chunks)
    assert streamed == tok.decode([c.token for c in chunks])


def test_engine_on_mesh_matches_single_device(tiny_params, tiny_cfg):
    """InferenceEngine(mesh=...): generate, beam search, and logprobs
    over a (2, 4) TP/DP mesh must match the unsharded engine exactly
    (greedy, f32)."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.parallel.mesh import make_mesh

    cfg = ti.InferenceConfig(max_seq_len=64, eos_token_id=-1, seed=0)
    base = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
    mesh_eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg,
                                  mesh=make_mesh((2, 4)))

    want = base.generate_batch([[1, 5, 9], [2, 4, 6]], 10, temperature=0.0)
    got = mesh_eng.generate_batch([[1, 5, 9], [2, 4, 6]], 10,
                                  temperature=0.0)
    assert [r.tokens for r in got] == [r.tokens for r in want]

    wb = base.generate_beam_search([1, 5, 9], 8, beam_size=4)
    gb = mesh_eng.generate_beam_search([1, 5, 9], 8, beam_size=4)
    assert gb.tokens == wb.tokens

    import numpy as np
    np.testing.assert_allclose(
        np.asarray(mesh_eng.compute_logprobs([1, 5, 9, 2])),
        np.asarray(base.compute_logprobs([1, 5, 9, 2])),
        rtol=1e-5, atol=1e-5)


def test_engine_on_mesh_int8_kv_matches_single_device(tiny_params,
                                                      tiny_cfg):
    """int8 KV cache under the TP/DP mesh engine: scale planes shard
    via shard_cache (cache_spec minus the D axis) and the sharded
    trajectory must equal the single-device int8 one (greedy, f32)."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.parallel.mesh import make_mesh

    cfg = ti.InferenceConfig(max_seq_len=64, eos_token_id=-1, seed=0,
                             kv_cache_dtype="int8")
    base = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
    mesh_eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg,
                                  mesh=make_mesh((2, 4)))
    c = mesh_eng._take_cache(2)
    assert c.k_scale is not None
    mesh_eng._put_cache(2, c)
    want = base.generate_batch([[1, 5, 9], [2, 4, 6]], 10, temperature=0.0)
    got = mesh_eng.generate_batch([[1, 5, 9], [2, 4, 6]], 10,
                                  temperature=0.0)
    assert [r.tokens for r in got] == [r.tokens for r in want]


def test_scan_and_host_loop_sampled_trajectories_match(tiny_params,
                                                       tiny_cfg):
    """decode_loop='scan' and 'host' consume the SAME per-step rng keys
    (split(r_dec, N)[i]); sampled outputs are identical — the host loop
    used to chain-split and diverge from the 2nd token."""
    import dataclasses

    import turboinfer_tpu as ti
    icfg = ti.InferenceConfig(max_seq_len=128, temperature=0.8, seed=5,
                              top_k=40, eos_token_id=-1)
    e1 = ti.InferenceEngine(tiny_params, tiny_cfg, icfg)
    want = e1.generate([1, 5, 9], 20).tokens
    e2 = ti.InferenceEngine(tiny_params, tiny_cfg,
                            dataclasses.replace(icfg,
                                                decode_loop="host"))
    assert e2.generate([1, 5, 9], 20).tokens == want


def test_zero_token_budget_is_a_noop(tiny_engine):
    res = tiny_engine.generate([1, 5, 9], 0)
    assert res.tokens == [1, 5, 9] and res.finished
    assert list(tiny_engine.generate_stream([1, 5, 9], 0)) == []
    import pytest as _pytest

    from turboinfer_tpu.utils.errors import TokenError
    with _pytest.raises(TokenError):
        tiny_engine.generate_beam_search([1, 5, 9], 0, beam_size=2)


def test_decode_scan_budget_bucketing(tiny_params, tiny_cfg):
    """Distinct max_new_tokens values share one fused decode program
    (bucketed to multiples of 32) and produce prefix-identical
    outputs."""
    import turboinfer_tpu as ti
    icfg = ti.InferenceConfig(max_seq_len=256, temperature=0.8, seed=1,
                              eos_token_id=-1)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, icfg)
    r64 = eng.generate([1, 5, 9], 64).tokens
    n_progs = len(eng._jit_cache)
    r40 = eng.generate([1, 5, 9], 40).tokens
    r33 = eng.generate([1, 5, 9], 33).tokens
    assert len(eng._jit_cache) == n_progs          # no new compiles
    # NOTE: rng advances per call; compare against fresh engines
    e2 = ti.InferenceEngine(tiny_params, tiny_cfg, icfg)
    assert e2.generate([1, 5, 9], 64).tokens == r64


def test_nonpow2_max_seq_long_prompt(tiny_params, tiny_cfg):
    """Prompt bucketing clamps to max_seq_len: a non-power-of-two
    max_seq_len with a long-but-valid prompt used to bucket the prefill
    slab WIDER than the KV cache and fail at trace time."""
    import numpy as np
    eng = ti.InferenceEngine(tiny_params, tiny_cfg,
                             ti.InferenceConfig(max_seq_len=96,
                                                temperature=0.0,
                                                eos_token_id=-1))
    prompt = [int(t) for t in
              np.random.default_rng(0).integers(1, 900, 70)]
    r = eng.generate(prompt, 10)
    assert len(r.tokens) == 80
    # logprob path shares the bucketing
    lps = eng.compute_logprobs(prompt)
    assert len(lps) == 70


def test_generate_batch_per_row_budget(tiny_params, tiny_cfg):
    """Each row uses its OWN max_seq headroom: a short prompt's output
    must not shrink because a long prompt shares the batch (the old
    global clamp keyed every row to the LONGEST prompt's headroom)."""
    import numpy as np
    icfg = ti.InferenceConfig(max_seq_len=128, temperature=0.0,
                              eos_token_id=-1)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, icfg)
    rng = np.random.default_rng(1)
    short = [int(t) for t in rng.integers(1, 900, 10)]
    long = [int(t) for t in rng.integers(1, 900, 100)]
    rs = eng.generate_batch([short, long], max_new_tokens=50)
    assert len(rs[0].tokens) == 60            # full requested budget
    assert len(rs[1].tokens) == 128           # its own headroom (28)
    assert rs[1].stop_reason == "max_seq"
    solo = eng.generate_batch([short], max_new_tokens=50)
    assert rs[0].tokens == solo[0].tokens     # batch-composition-free
