"""Sampling pipeline tests (reference counterparts: sampling paths in
tests/test_inference_engine.cpp and the tensor-level variants
inference_engine.cpp:1675-1796)."""

import jax
import jax.numpy as jnp
import numpy as np

from turboinfer_tpu.engine import sampling
from turboinfer_tpu.engine.sampling import SamplingParams


def test_temperature():
    x = jnp.asarray([1.0, 2.0, 4.0])
    np.testing.assert_allclose(np.asarray(sampling.apply_temperature(x, 2.0)),
                               [0.5, 1.0, 2.0])


def test_top_k_masks_all_but_k():
    x = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    y = np.asarray(sampling.apply_top_k(x, 2))
    kept = (y > sampling.NEG_INF / 2).sum()
    assert kept == 2
    assert y[0, 1] == 5.0 and y[0, 4] == 4.0


def test_top_k_noop_when_k_large():
    x = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(sampling.apply_top_k(x, 10)),
                                  np.asarray(x))


def test_top_p_keeps_nucleus():
    # probs ~ [0.643, 0.236, 0.087, 0.032, 0.002]; p=0.8 keeps first two
    # (cumulative-before rule includes the prob that crosses p).
    logits = jnp.log(jnp.asarray([[0.643, 0.236, 0.087, 0.032, 0.002]]))
    y = np.asarray(sampling.apply_top_p(logits, 0.8))
    kept = y > sampling.NEG_INF / 2
    assert kept.sum() == 2
    assert kept[0, 0] and kept[0, 1]


def test_top_p_always_keeps_argmax():
    logits = jnp.asarray([[10.0, 0.0, 0.0]])
    y = np.asarray(sampling.apply_top_p(logits, 0.01))
    assert y[0, 0] == 10.0
    assert (y[0, 1:] < sampling.NEG_INF / 2).all()


def test_greedy_sample_at_zero_temperature():
    logits = jnp.asarray([[1.0, 9.0, 3.0], [7.0, 2.0, 1.0]])
    t = sampling.sample(jax.random.PRNGKey(0), logits,
                        SamplingParams(temperature=0.0))
    np.testing.assert_array_equal(np.asarray(t), [1, 0])


def test_categorical_sampling_distribution():
    """Multinomial draw must roughly follow the softmax distribution
    (reference: CDF draw at inference_engine.cpp:1652-1666)."""
    logits = jnp.log(jnp.asarray([0.7, 0.2, 0.1]))
    logits = jnp.broadcast_to(logits, (4000, 3))
    draws = sampling.sample(jax.random.PRNGKey(1), logits,
                            SamplingParams(temperature=1.0, top_k=0,
                                           top_p=1.0))
    freq = np.bincount(np.asarray(draws), minlength=3) / 4000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.04)


def test_top_k_top_p_restrict_support():
    logits = jnp.broadcast_to(
        jnp.asarray([5.0, 4.9, 0.0, -1.0, -2.0]), (1000, 5))
    draws = sampling.sample(jax.random.PRNGKey(2), logits,
                            SamplingParams(temperature=1.0, top_k=2,
                                           top_p=1.0))
    assert set(np.asarray(draws).tolist()) <= {0, 1}


def test_token_logprob():
    logits = jnp.asarray([[0.0, jnp.log(3.0)]])  # probs [0.25, 0.75]
    lp = sampling.token_logprob(logits, jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(lp), np.log(0.75), rtol=1e-5)


def test_sample_per_slot_row_isolation():
    """Per-row knobs: greedy rows, top_k=1 rows, and tiny top_p rows all
    reduce to argmax; each row's setting must not leak to others."""
    import jax
    import jax.numpy as jnp
    from turboinfer_tpu.engine import sampling as S
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 64)) * 3.0
    argmax = jnp.argmax(logits, -1)
    out = S.sample_per_slot(
        rng, logits,
        temperature=jnp.asarray([0.0, 1.0, 1.0, 5.0], jnp.float32),
        top_k=jnp.asarray([50, 1, 0, 1], jnp.int32),
        top_p=jnp.asarray([0.9, 1.0, 1e-6, 1.0], jnp.float32))
    assert out[0] == argmax[0]          # greedy row
    assert out[1] == argmax[1]          # top_k=1 row
    assert out[2] == argmax[2]          # top_p→0 row keeps first token
    assert out[3] == argmax[3]          # hot but top_k=1


def test_sample_per_slot_respects_top_k_support():
    """With top_k=2 every draw must come from the two largest logits."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from turboinfer_tpu.engine import sampling as S
    logits = jnp.asarray([[0.0, 5.0, 4.9, -1.0, 2.0] + [-10.0] * 11])
    top2 = {1, 2}
    temp = jnp.asarray([2.0], jnp.float32)
    k = jnp.asarray([2], jnp.int32)
    p = jnp.asarray([1.0], jnp.float32)
    draws = {int(S.sample_per_slot(jax.random.PRNGKey(i), logits,
                                   temp, k, p)[0]) for i in range(40)}
    assert draws <= top2 and len(draws) == 2


# ---------------------------------------------------------------------------
# Penalties + min_p (beyond the reference's temperature/top_k/top_p) —
# golden vs transformers' logits processors
# ---------------------------------------------------------------------------

def test_repetition_penalty_golden_vs_hf():
    import numpy as np
    import jax.numpy as jnp
    import pytest as _pytest
    torch = _pytest.importorskip("torch")
    from transformers import RepetitionPenaltyLogitsProcessor
    from turboinfer_tpu.engine import sampling as S
    rng = np.random.default_rng(0)
    V = 97
    logits = rng.normal(size=(2, V)).astype(np.float32) * 4
    ids = np.array([[3, 7, 7, 11], [50, 3, 2, 2]])
    counts = np.zeros((2, V), np.int32)
    for b in range(2):
        np.add.at(counts[b], ids[b], 1)
    want = RepetitionPenaltyLogitsProcessor(1.7)(
        torch.tensor(ids), torch.tensor(logits)).numpy()
    got = np.asarray(S.apply_penalties(jnp.asarray(logits),
                                       jnp.asarray(counts),
                                       repetition_penalty=1.7))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_min_p_golden_vs_hf():
    import numpy as np
    import jax.numpy as jnp
    import pytest as _pytest
    torch = _pytest.importorskip("torch")
    from transformers import MinPLogitsWarper
    from turboinfer_tpu.engine import sampling as S
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 64)).astype(np.float32) * 3
    want = MinPLogitsWarper(0.25)(
        torch.zeros((3, 1), dtype=torch.long),
        torch.tensor(logits)).numpy()
    got = np.asarray(S.apply_min_p(jnp.asarray(logits), 0.25))
    # both mask with large negatives; compare kept-set and kept values
    np.testing.assert_array_equal(got > -1e29, want > -1e29)
    keep = want > -1e29
    np.testing.assert_allclose(got[keep], want[keep], rtol=1e-6)


def test_frequency_presence_penalty_math():
    import numpy as np
    import jax.numpy as jnp
    from turboinfer_tpu.engine import sampling as S
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    all_c = jnp.asarray([[2, 1, 0, 0]], jnp.int32)
    out_c = jnp.asarray([[2, 0, 0, 0]], jnp.int32)
    got = np.asarray(S.apply_penalties(
        logits, all_c, presence_penalty=0.5, frequency_penalty=0.25,
        out_counts=out_c))
    # token0: 1 - 0.25*2 - 0.5 = 0.0; token1 out_count=0: unchanged
    np.testing.assert_allclose(got[0], [0.0, 2.0, 3.0, 4.0], atol=1e-6)


def test_repetition_penalty_breaks_greedy_loops(tiny_engine):
    """Greedy decoding with a strong repetition penalty must produce
    fewer repeated tokens than plain greedy on the same prompt."""
    base = tiny_engine.generate([1, 5, 42, 7], 24, temperature=0.0).tokens
    pen = tiny_engine.generate([1, 5, 42, 7], 24, temperature=0.0,
                               repetition_penalty=1.8).tokens

    def max_repeat(seq):
        from collections import Counter
        return max(Counter(seq).values())

    assert pen != base
    assert max_repeat(pen[4:]) <= max_repeat(base[4:])


def test_penalties_consistent_across_decode_paths(tiny_params, tiny_cfg):
    """scan, host-loop, stream, and nocache paths must all produce the
    same greedy trajectory under penalties."""
    import dataclasses
    import turboinfer_tpu as ti
    kw = dict(temperature=0.0, repetition_penalty=1.5,
              presence_penalty=0.3, frequency_penalty=0.2)
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             eos_token_id=-1)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg)
    want = eng.generate([2, 9, 4], 12, **kw).tokens
    host = ti.InferenceEngine(
        tiny_params, tiny_cfg,
        dataclasses.replace(cfg, decode_loop="host"))
    assert host.generate([2, 9, 4], 12, **kw).tokens == want
    streamed = [c.token for c in eng.generate_stream([2, 9, 4], 12,
                                                     burst=5, **kw)]
    assert [2, 9, 4] + streamed == want
    nocache = ti.InferenceEngine(
        tiny_params, tiny_cfg,
        dataclasses.replace(cfg, use_cache=False))
    assert nocache.generate([2, 9, 4], 12, **kw).tokens == want
