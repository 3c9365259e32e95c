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
