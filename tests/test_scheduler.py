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
    assert sched.alloc.free_pages == 12          # everything returned


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
    assert sched.alloc.free_pages == 5
