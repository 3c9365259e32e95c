"""Continuous batching scheduler tests.

No reference counterpart — the reference's generate_batch is a
sequential loop (SURVEY.md quirk #7); these tests pin the TPU-native
scheduler's semantics: greedy outputs must exactly match one-at-a-time
generation, slots must recycle, and mixed-length streams must finish.
"""

import jax
import numpy as np
import pytest

import turboinfer_tpu as ti
from turboinfer_tpu.config import InferenceConfig
from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler


@pytest.fixture()
def sched_setup(tiny_params, tiny_cfg):
    cfg = InferenceConfig(max_seq_len=128, temperature=0.0, seed=0)
    return tiny_params, tiny_cfg, cfg


def test_single_request_matches_engine(sched_setup):
    params, mcfg, cfg = sched_setup
    prompt = [1, 5, 42, 7]
    eng = ti.InferenceEngine(params, mcfg, cfg)
    want = eng.generate(prompt, 12, temperature=0.0).tokens

    sched = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2)
    rid = sched.submit(prompt, 12)
    results = sched.run()
    assert results[rid].tokens == want


def test_many_requests_few_slots(sched_setup):
    params, mcfg, cfg = sched_setup
    prompts = [[1, i + 2, 2 * i + 3] for i in range(5)]
    eng = ti.InferenceEngine(params, mcfg, cfg)
    want = {i: eng.generate(p, 8, temperature=0.0).tokens
            for i, p in enumerate(prompts)}

    sched = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2)
    rids = {sched.submit(p, 8): i for i, p in enumerate(prompts)}
    results = sched.run()
    assert len(results) == 5
    for rid, i in rids.items():
        assert results[rid].tokens == want[i], f"request {i} diverged"


def test_mixed_lengths_and_recycling(sched_setup):
    params, mcfg, cfg = sched_setup
    sched = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2)
    rids = [sched.submit([1, 2, 3], 3), sched.submit([4, 5], 15),
            sched.submit([6], 6)]
    results = sched.run()
    assert len(results) == 3
    assert len(results[rids[0]].tokens) == 3 + 3
    assert len(results[rids[1]].tokens) <= 2 + 15
    assert all(r.finished for r in results.values())


def test_submit_validation(sched_setup):
    params, mcfg, cfg = sched_setup
    sched = ContinuousBatchingScheduler(params, mcfg, cfg)
    with pytest.raises(ValueError):
        sched.submit([], 5)
    with pytest.raises(ValueError):
        sched.submit(list(range(500)), 5)


def test_incremental_submission(sched_setup):
    """Requests submitted while others are decoding join the batch."""
    params, mcfg, cfg = sched_setup
    sched = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=4)
    r1 = sched.submit([1, 2], 10)
    for _ in range(3):
        sched.step()
    r2 = sched.submit([3, 4], 10)
    results = sched.run()
    assert set(results) == {r1, r2}
    assert all(r.finished for r in results.values())


# ---------------------------------------------------------------------------
# Paged scheduler: same semantics as the contiguous one, memory by pages
# ---------------------------------------------------------------------------

def test_paged_matches_contiguous(sched_setup):
    """Greedy outputs through the paged cache must exactly match the
    contiguous-cache scheduler (same prompts, slots, seeds)."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    params, mcfg, cfg = sched_setup
    prompts = [[1, i + 2, 2 * i + 3, 5] for i in range(5)]

    base = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2)
    want = {base.submit(p, 10): p for p in prompts}
    want = {rid: r.tokens for rid, r in base.run().items()}

    sched = PagedContinuousScheduler(params, mcfg, cfg, batch_slots=2,
                                     page_size=8)
    rids = [sched.submit(p, 10) for p in prompts]
    results = sched.run()
    assert len(results) == 5
    for rid in rids:
        assert results[rid].tokens == want[rid], f"request {rid} diverged"


def test_paged_burst_matches_per_step(sched_setup):
    """Paged decode bursts (one jitted n-step scan, pages pre-assigned
    by step()) must reproduce the per-step paged trajectory exactly —
    including EOS-mid-burst slot recycling and the final pool state."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    params, mcfg, cfg = sched_setup
    prompts = [[1, i + 2, 2 * i + 3, 5] for i in range(5)]

    base = PagedContinuousScheduler(params, mcfg, cfg, batch_slots=2,
                                    page_size=8)
    want = {}
    for p in prompts:
        want[base.submit(p, 10)] = None
    want = {rid: r.tokens for rid, r in base.run().items()}

    sched = PagedContinuousScheduler(params, mcfg, cfg, batch_slots=2,
                                     page_size=8, decode_burst=4)
    rids = [sched.submit(p, 10) for p in prompts]
    results = sched.run()
    for rid in rids:
        assert results[rid].tokens == want[rid], f"request {rid} diverged"
    assert sched.pool.available == base.pool.available


def test_paged_burst_int8(sched_setup):
    """Paged bursts over an int8 page pool run and stay deterministic."""
    import dataclasses
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    params, mcfg, cfg = sched_setup
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    outs = []
    for _ in range(2):
        s = PagedContinuousScheduler(params, mcfg, cfg8, batch_slots=2,
                                     page_size=8, decode_burst=4)
        rid = s.submit([1, 5, 42, 7], 10)
        outs.append(s.run()[rid].tokens)
    assert outs[0] == outs[1]


def test_paged_pool_reuse_and_release(sched_setup):
    """Pages released by finished sequences are reused; the pool never
    leaks (all pages free after run())."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    params, mcfg, cfg = sched_setup
    # Pool sized for ~2 live sequences of ~32 tokens at page 8: force
    # recycling across 6 requests.
    sched = PagedContinuousScheduler(params, mcfg, cfg, batch_slots=2,
                                     page_size=8, num_pages=1 + 12)
    rids = [sched.submit([1, i + 2, 3], 12) for i in range(6)]
    results = sched.run()
    assert len(results) == 6
    assert all(r.finished for r in results.values())
    assert sched.pool.available == 12            # everything returned


def test_paged_admission_blocks_until_pages_free(sched_setup):
    """A prompt that can't fit in the free pool stays queued (no crash,
    no partial admission) and is admitted once pages free up."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    params, mcfg, cfg = sched_setup
    # 5 free pages of 8 tokens; bucketed prefill of a 20-token prompt
    # needs ceil(32/8)=4 pages, so only one can ever be live.
    sched = PagedContinuousScheduler(params, mcfg, cfg, batch_slots=2,
                                     page_size=8, num_pages=1 + 5)
    long_prompt = list(range(1, 21))
    r1 = sched.submit(long_prompt, 4)
    r2 = sched.submit(long_prompt, 4)
    results = sched.run()
    assert set(results) == {r1, r2}
    assert all(r.finished for r in results.values())
    assert sched.pool.available == 5


def test_prefix_caching_shares_and_retains(sched_setup):
    """Requests repeating a long prompt hit the prefix cache (pages
    shared while concurrent, retained evictably after), and outputs are
    identical to a cache-cold run."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    params, mcfg, cfg = sched_setup
    prompt = list(range(1, 25))            # 24 tokens = 3 full pages @ 8

    cold = PagedContinuousScheduler(params, mcfg, cfg, batch_slots=2,
                                    page_size=8, prefix_caching=False)
    r = cold.submit(prompt, 8)
    want = cold.run()[r].tokens
    assert cold.pool.hits == 0

    warm = PagedContinuousScheduler(params, mcfg, cfg, batch_slots=2,
                                    page_size=8)
    rids = [warm.submit(prompt, 8) for _ in range(4)]
    results = warm.run()
    for rid in rids:
        assert results[rid].tokens == want
    # 3 full pages of the shared prompt, but the page holding the LAST
    # prompt token is never shared (its hidden state must be recomputed
    # for the first logits) -> 2 shareable pages per warm request.
    # Request 2 runs concurrently with request 1 (shares live pages),
    # requests 3-4 reuse retained pages after 1-2 finish. Only the first
    # request misses (lookup stops at the first miss).
    assert warm.pool.hits == 3 * 2
    assert warm.pool.misses == 1


def test_prefix_cache_eviction_under_pressure(sched_setup):
    """Retained prefix pages are evicted (not leaked) when the pool runs
    dry, and everything still completes."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    params, mcfg, cfg = sched_setup
    sched = PagedContinuousScheduler(params, mcfg, cfg, batch_slots=2,
                                     page_size=8, num_pages=1 + 6)
    # Distinct 16-token prompts: each leaves 2 retained pages; the pool
    # only has 6, so later admissions must evict earlier retained pages.
    rids = [sched.submit([i * 100 + j for j in range(16)], 6)
            for i in range(5)]
    results = sched.run()
    assert len(results) == 5
    assert all(r.finished for r in results.values())
    assert sched.pool.available == 6


def test_prefix_caching_long_trajectories_match(sched_setup):
    """Regression: warm (prefix-cached) runs must track cache-cold runs
    token-for-token over long decodes. The warm prefill's cache width
    must equal the cold path's, or XLA's attention reduction shapes
    differ and one-ulp bf16 K/V flips diverge greedy decoding."""
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    params, mcfg, cfg = sched_setup
    sys_prompt = list(range(1, 40))
    warm = PagedContinuousScheduler(params, mcfg, cfg, batch_slots=4,
                                    page_size=8)
    rids = [warm.submit(sys_prompt + [100 + i], 16) for i in range(8)]
    res = warm.run()
    base = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=4)
    rids2 = [base.submit(sys_prompt + [100 + i], 16) for i in range(8)]
    res2 = base.run()
    assert warm.pool.hits > 0
    for r in rids:
        assert res[r].tokens == res2[r].tokens


def test_burst_decode_matches_per_step(sched_setup):
    """decode_burst must be a pure batching change: greedy outputs
    identical to burst=1, including requests that finish mid-burst
    (budget, EOS, slot recycling all resolved on device)."""
    params, mcfg, cfg = sched_setup
    prompts = [[1, i + 2, 3 * i + 5] for i in range(5)]
    budgets = [3, 8, 12, 5, 9]          # several finish mid-burst

    base = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2)
    rids = [base.submit(p, n) for p, n in zip(prompts, budgets)]
    want = base.run()

    burst = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2,
                                        decode_burst=8)
    rids2 = [burst.submit(p, n) for p, n in zip(prompts, budgets)]
    got = burst.run()
    for r1, r2 in zip(rids, rids2):
        assert want[r1].tokens == got[r2].tokens
        assert want[r1].stop_reason == got[r2].stop_reason


def test_burst_decode_eos(sched_setup):
    """EOS inside a burst stops the request at the right token."""
    params, mcfg, cfg = sched_setup
    import dataclasses
    base = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=1)
    rid0 = base.submit([1, 9, 4], 40)
    ref = base.run()[rid0]
    # pick the 5th generated token as a fake EOS so it trips mid-burst
    fake_eos = ref.tokens[3 + 4]
    cfg_eos = dataclasses.replace(cfg, eos_token_id=int(fake_eos))

    a = ContinuousBatchingScheduler(params, mcfg, cfg_eos, batch_slots=1)
    b = ContinuousBatchingScheduler(params, mcfg, cfg_eos, batch_slots=1,
                                    decode_burst=16)
    ra = a.run() if not a.submit([1, 9, 4], 40) is None else None
    rb = b.run() if not b.submit([1, 9, 4], 40) is None else None
    (ka, va), (kb, vb) = list(ra.items())[0], list(rb.items())[0]
    assert va.tokens == vb.tokens
    assert va.stop_reason == vb.stop_reason == "eos"


# ---------------------------------------------------------------------------
# Per-request sampling (no reference analog — it has no batching at all)
# ---------------------------------------------------------------------------

def test_per_request_sampling_mixed_batch(tiny_params, tiny_cfg):
    """A greedy request in a batch alongside high-temperature requests
    must still produce the exact greedy trajectory."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             temperature=1.0, eos_token_id=-1)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
    want = eng.generate([1, 5, 42, 7], 10, temperature=0.0).tokens

    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        batch_slots=3)
    greedy_rid = sched.submit([1, 5, 42, 7], 10, temperature=0.0)
    hot = [sched.submit([2, 3], 10, temperature=5.0, top_k=0, top_p=1.0)
           for _ in range(2)]
    results = sched.run()
    assert results[greedy_rid].tokens == want
    for rid in hot:
        assert len(results[rid].tokens) == 2 + 10


def test_per_request_sampling_burst(tiny_params, tiny_cfg):
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             temperature=1.0, eos_token_id=-1)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
    want = eng.generate([1, 5, 42, 7], 10, temperature=0.0).tokens
    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        batch_slots=2, decode_burst=4)
    rid = sched.submit([1, 5, 42, 7], 10, temperature=0.0)
    sched.submit([9, 8], 10, temperature=3.0)
    assert sched.run()[rid].tokens == want


def test_get_request_live_view(tiny_params, tiny_cfg):
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             eos_token_id=-1)
    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        batch_slots=2)
    rid = sched.submit([1, 2, 3], 6, temperature=0.0)
    req = sched.get_request(rid)
    assert req is not None and req.out_tokens == []
    sched.step()
    assert len(sched.get_request(rid).out_tokens) >= 1
    while sched.pending:
        sched.step()
    assert sched.get_request(rid).finished
    assert sched.get_request(99999) is None


def test_per_request_penalties(tiny_params, tiny_cfg):
    """A repetition-penalized greedy request in the scheduler matches
    the engine's penalized greedy output; an unpenalized greedy request
    in the SAME batch matches plain greedy."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             eos_token_id=-1)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
    plain = eng.generate([1, 5, 42, 7], 12, temperature=0.0).tokens
    pen = eng.generate([1, 5, 42, 7], 12, temperature=0.0,
                       repetition_penalty=1.8).tokens
    assert pen != plain
    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        batch_slots=2)
    rid_pen = sched.submit([1, 5, 42, 7], 12, temperature=0.0,
                           repetition_penalty=1.8)
    rid_plain = sched.submit([1, 5, 42, 7], 12, temperature=0.0)
    results = sched.run()
    assert results[rid_pen].tokens == pen
    assert results[rid_plain].tokens == plain


def test_scheduler_logprobs_match_engine(tiny_params, tiny_cfg):
    import numpy as np
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             eos_token_id=-1)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
    want = eng.generate([1, 5, 42, 7], 8, temperature=0.0,
                        return_logprobs=True)
    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        batch_slots=2)
    rid = sched.submit([1, 5, 42, 7], 8, temperature=0.0)
    res = sched.run()[rid]
    assert res.tokens == want.tokens
    np.testing.assert_allclose(res.logprobs, want.logprobs, atol=1e-4)


def test_batched_admission_matches_solo(tiny_params, tiny_cfg):
    """A burst of same-width submissions prefills as ONE batched call
    (compile key (m, S)) and every request still matches the engine's
    solo greedy output."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             eos_token_id=-1)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
    prompts = [[1, 5, 42, 7], [2, 9, 4], [8, 8, 1, 3], [6, 2]]
    want = [eng.generate(p, 8, temperature=0.0).tokens for p in prompts]
    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        batch_slots=4)
    rids = [sched.submit(p, 8, temperature=0.0) for p in prompts]
    results = sched.run()
    for rid, w in zip(rids, want):
        assert results[rid].tokens == w
    # all four prompts bucket to S=16 → one (4, 16) prefill variant
    assert (4, 16) in sched._prefill_cache
    assert (1, 16) not in sched._prefill_cache


def test_scheduler_on_tp_dp_mesh_matches_single_device(tiny_params,
                                                       tiny_cfg):
    """BASELINE config 5 orchestration: continuous batching over a
    (data=2, tp=4) mesh — weights column/row-sharded, KV cache sharded
    batch-over-data and heads-over-tp — must produce the same greedy
    trajectories as the unsharded scheduler."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    from turboinfer_tpu.parallel.mesh import make_mesh

    cfg = ti.InferenceConfig(max_seq_len=64, temperature=0.0,
                             eos_token_id=-1, seed=0)
    prompts = [[1, 5, 9], [2, 4], [7, 3, 8, 6], [11, 12]]

    base = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                       batch_slots=4)
    for p in prompts:
        base.submit(p, 12)
    want = {r: g.tokens for r, g in base.run().items()}

    mesh = make_mesh((2, 4))
    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        batch_slots=4, mesh=mesh)
    assert not sched.cache.fused_layout      # head-major for cache_spec
    assert sched.cache.k.sharding.spec == (None, "data", "tp", None, None)
    for p in prompts:
        sched.submit(p, 12)
    got = {r: g.tokens for r, g in sched.run().items()}
    assert got == want


def test_scheduler_mesh_burst_decode(tiny_params, tiny_cfg):
    """Burst decoding (N steps per host round trip) composes with the
    sharded cache: one pjit scan program over the mesh."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    from turboinfer_tpu.parallel.mesh import make_mesh

    cfg = ti.InferenceConfig(max_seq_len=64, temperature=0.0,
                             eos_token_id=-1, seed=0)
    base = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                       batch_slots=2)
    r0 = base.submit([1, 5, 9], 10)
    want = base.run()[r0].tokens

    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        batch_slots=2, decode_burst=4,
                                        mesh=make_mesh((2, 4)))
    r1 = sched.submit([1, 5, 9], 10)
    assert sched.run()[r1].tokens == want


# ---------------------------------------------------------------------------
# Chunked admission: prefill/decode mixing (SURVEY §7 hard part 3)
# ---------------------------------------------------------------------------

def _drive(sched, long_prompt):
    """Shared request pattern: decode r1 a few steps, then admit a long
    prompt mid-flight, then drain."""
    r1 = sched.submit([1, 2, 3], 24, temperature=0.0)
    for _ in range(4):
        sched.step()
    r2 = sched.submit(long_prompt, 8, temperature=0.0)
    results = sched.run()
    return results[r1].tokens, results[r2].tokens


def test_chunked_admission_trajectory_identical(sched_setup):
    """Greedy outputs with chunked admission must exactly match the
    full-width-prefill scheduler (same submit/step sequence)."""
    params, mcfg, cfg = sched_setup
    long_prompt = list(range(1, 41))
    import dataclasses
    cfg_chunk = dataclasses.replace(cfg, prefill_chunk=8)

    base = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2)
    want1, want2 = _drive(base, long_prompt)
    ck = ContinuousBatchingScheduler(params, mcfg, cfg_chunk,
                                     batch_slots=2)
    got1, got2 = _drive(ck, long_prompt)
    assert got1 == want1
    assert got2 == want2


def test_chunked_admission_decodes_keep_flowing(sched_setup):
    """While a long prompt admits chunk-by-chunk, live decodes must
    advance every step (the whole point: no full-prompt stall)."""
    import dataclasses
    params, mcfg, cfg = sched_setup
    cfg = dataclasses.replace(cfg, prefill_chunk=8, prefill_bucket=False)
    sched = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2)
    r1 = sched.submit([1, 2, 3], 40, temperature=0.0)
    sched.step()                                  # admit + first decode
    n0 = len(sched.get_request(r1).out_tokens)
    r2 = sched.submit(list(range(1, 33)), 4, temperature=0.0)  # 4 chunks
    for i in range(4):
        sched.step()                              # one chunk + one decode
        assert sched._adm is not None or i == 3
        n1 = len(sched.get_request(r1).out_tokens)
        assert n1 == n0 + i + 1, "decode stalled during admission"
    assert sched._adm is None                     # admission completed
    assert len(sched.get_request(r2).out_tokens) >= 1
    results = sched.run()
    assert all(r.finished for r in results.values())


def test_chunked_admission_cancel_mid_flight(sched_setup):
    """Cancelling a request during its chunked admission frees it
    without activating the slot; other requests are unaffected."""
    import dataclasses
    params, mcfg, cfg = sched_setup
    cfg = dataclasses.replace(cfg, prefill_chunk=8, prefill_bucket=False)
    sched = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2)
    r1 = sched.submit([1, 2, 3], 16, temperature=0.0)
    sched.step()
    r2 = sched.submit(list(range(1, 33)), 8, temperature=0.0)
    sched.step()                                  # first chunk in flight
    assert sched._adm is not None
    assert sched.cancel(r2, reason="client gone")
    results = sched.run()
    assert results[r2].stop_reason == "client gone"
    assert results[r2].tokens == list(range(1, 33))   # no output tokens
    assert results[r1].finished


def test_chunked_admission_queue_behind(sched_setup):
    """Requests queued behind a chunked admission admit after it
    completes; everything drains."""
    import dataclasses
    params, mcfg, cfg = sched_setup
    cfg = dataclasses.replace(cfg, prefill_chunk=8, prefill_bucket=False)
    sched = ContinuousBatchingScheduler(params, mcfg, cfg, batch_slots=2)
    sched.submit([1, 2, 3], 30, temperature=0.0)
    sched.step()
    rids = [sched.submit(list(range(1, 33)), 6, temperature=0.0),
            sched.submit([7, 8], 6, temperature=0.0)]
    results = sched.run()
    assert all(results[r].finished for r in rids)
    assert all(len(results[r].tokens) > 0 for r in rids)


def test_paged_scheduler_on_tp_mesh_matches_single_device(tiny_params,
                                                          tiny_cfg):
    """Paged continuous batching over a (1, tp=4) mesh: weights
    column/row-sharded, the shared page POOL sharded heads-over-tp
    (pages replicated — every chip holds its head slice of every page),
    block tables replicated host state. Greedy trajectories (incl. a
    prefix-cached repeat) must equal the unsharded paged scheduler's."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    from turboinfer_tpu.parallel.mesh import make_mesh

    cfg = ti.InferenceConfig(max_seq_len=64, temperature=0.0,
                             eos_token_id=-1, seed=0)
    prompts = [[1, 5, 9], [2, 4], [7, 3, 8, 6]]

    base = PagedContinuousScheduler(tiny_params, tiny_cfg, cfg,
                                    batch_slots=2, page_size=8)
    for p in prompts:
        base.submit(p, 10)
    want = {r: g.tokens for r, g in base.run().items()}

    import jax
    mesh = make_mesh((1, 4), devices=jax.devices()[:4])
    sched = PagedContinuousScheduler(tiny_params, tiny_cfg, cfg,
                                     batch_slots=2, page_size=8,
                                     mesh=mesh)
    assert sched.cache.k_pages.sharding.spec == (None, None, "tp",
                                                 None, None)
    for p in prompts:
        sched.submit(p, 10)
    got = {r: g.tokens for r, g in sched.run().items()}
    assert got == want
    # prefix-cached repeat on the sharded pool (prompt spans 2 pages)
    long_p = list(range(1, 20))
    r1 = sched.submit(long_p, 6)
    t1 = sched.run()[r1].tokens
    hits = sched.pool.hits
    r2 = sched.submit(long_p, 6)
    assert sched.run()[r2].tokens == t1
    assert sched.pool.hits > hits


def test_paged_burst_near_max_seq_completes(tiny_params, tiny_cfg):
    """A burst near max_seq used to index off the end of the block
    table in _ensure_pages; it must clamp and finish with max_seq."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    cfg = ti.InferenceConfig(max_seq_len=64, temperature=0.0,
                             eos_token_id=-1)
    sched = PagedContinuousScheduler(tiny_params, tiny_cfg, cfg,
                                     batch_slots=2, page_size=16,
                                     decode_burst=4)
    rid = sched.submit(list(range(1, 58)), 50)     # 57 tokens, T=64
    res = sched.run()
    assert res[rid].stop_reason == "max_seq"
    assert len(res[rid].tokens) == 64
