"""Constrained JSON decoding tests (structured/).

The guarantee under test: ANY model — including a random-weight one
that would otherwise emit byte soup — produces output that json.loads
accepts, greedy or sampled.
"""

import json

import pytest

from turboinfer_tpu.structured import json_fsm


def _accepts(text: str, require_object: bool = True) -> bool:
    st = json_fsm.initial(require_object)
    st = json_fsm.advance_bytes(st, text.encode())
    return st is not None and json_fsm.done(st)


VALID = [
    '{}',
    '{"a": 1}',
    '{"a": -0.5e+10, "b": [1, 2, 3]}',
    '{"nested": {"deep": [{"x": null}, true, false]}}',
    '{ "ws" :\n[ 1 ,\t2 ] }',
    '{"esc": "a\\"b\\\\c\\n\\u00e9"}',
    '{"unicode": "héllo 🎉"}',
    '{"empty_arr": [], "empty_obj": {}}',
]

INVALID = [
    '',                      # nothing
    '[1, 2]',                # top-level array in object mode
    '"str"',                 # top-level string in object mode
    '{"a": 1,}',             # trailing comma
    '{"a" 1}',               # missing colon
    "{'a': 1}",              # single quotes
    '{"a": 01}',             # leading zero
    '{"a": 1} extra',        # trailing garbage
    '{"a": .5}',             # bare fraction
    '{"a": tru}',            # bad literal
    '{"a": "unterminated}',  # FSM not done (string open)
    '{"a": 1',               # not closed
]


@pytest.mark.parametrize("text", VALID)
def test_fsm_accepts_valid(text):
    assert _accepts(text)
    json.loads(text)        # sanity: stdlib agrees


@pytest.mark.parametrize("text", INVALID)
def test_fsm_rejects_invalid(text):
    assert not _accepts(text)


def test_fsm_top_level_any_value():
    assert _accepts('[1, "two", {"three": 3}]', require_object=False)
    assert _accepts('"just a string"', require_object=False)
    assert not _accepts('nope', require_object=False)


def test_done_tolerates_trailing_whitespace():
    st = json_fsm.advance_bytes(json_fsm.initial(), b'{"a":1}  \n')
    assert st is not None and json_fsm.done(st)


def test_token_bytes_table_builtin():
    from turboinfer_tpu.structured import token_bytes_table
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    tok = BuiltinTokenizer(vocab_size=400)
    table = token_bytes_table(tok)
    assert table[tok.bos_id] is None and table[tok.eos_id] is None
    assert table[4 + ord("{")] == b"{"           # byte tokens at 4..259
    assert table[260] == b"the"                  # first subword
    assert table[399] is None                    # <extra_*> filler


def _filter_and_tok(vocab_size=1000):
    from turboinfer_tpu.structured import JsonTokenFilter
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    tok = BuiltinTokenizer(vocab_size=vocab_size)
    return JsonTokenFilter(tok), tok


def test_filter_follows_model_when_legal():
    """When the model's argmax is grammar-legal the filter takes it
    verbatim: drive pick() with one-hot logits spelling a JSON doc."""
    import numpy as np
    filt, tok = _filter_and_tok()
    target = '{"a": [1, true, "x\\n"], "b": {"c": null}}'
    ids = tok.encode(target)
    out = []
    for tid in ids:
        logits = np.full((tok.vocab_size,), -10.0, np.float32)
        logits[tid] = 10.0
        got = filt.pick(logits, temperature=0.0)
        out.append(got)
        assert got == tid, (tok.tokens[tid], tok.tokens[got])
    assert filt.done
    assert json.loads(tok.decode(out)) == json.loads(target)


def test_filter_overrides_illegal_argmax():
    """When the argmax is illegal, the filter falls to the best legal
    candidate instead."""
    import numpy as np
    filt, tok = _filter_and_tok()
    brace = tok.encode("{")[0]
    x_byte = tok.encode("x")[0]
    logits = np.full((tok.vocab_size,), -10.0, np.float32)
    logits[x_byte] = 10.0                 # illegal at top level
    logits[brace] = 5.0                   # best legal
    assert filt.pick(logits, temperature=0.0) == brace
    # eos is never allowed mid-grammar
    logits = np.full((tok.vocab_size,), -10.0, np.float32)
    logits[tok.eos_id] = 10.0
    got = filt.pick(logits, temperature=0.0)
    assert got != tok.eos_id


def test_generate_structured_prefix_always_legal(tiny_params, tiny_cfg):
    """A RANDOM-weight model emits a legal JSON prefix at every budget,
    greedy and sampled; parse must succeed whenever the FSM closed."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    tok = BuiltinTokenizer(vocab_size=tiny_cfg.vocab_size)
    for seed, temp in [(0, 0.0), (1, 0.9), (2, 0.9)]:
        eng = ti.InferenceEngine(
            tiny_params, tiny_cfg,
            ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                               seed=seed),
            tokenizer=tok)
        res = eng.generate_structured([1, 7, 9], max_new_tokens=60,
                                      temperature=temp)
        assert res.text.lstrip().startswith("{")
        st = json_fsm.advance_bytes(json_fsm.initial(),
                                    res.text.encode())
        assert st is not None, f"illegal prefix: {res.text!r}"
        if res.finished:
            assert isinstance(json.loads(res.text), dict)
            assert res.stop_reason == "stop"


def test_generate_structured_requires_tokenizer(tiny_engine):
    with pytest.raises(RuntimeError, match="tokenizer"):
        tiny_engine.generate_structured([1, 2, 3])


def test_token_bytes_table_gguf_byte_level():
    """GGUF gpt2-family BPETokenizer pieces live in the b2u alphabet;
    the table must map them back to raw bytes ('Ġ{' → b' {')."""
    from turboinfer_tpu.structured import token_bytes_table
    from turboinfer_tpu.tokenizer.bpe import BPETokenizer, \
        _bytes_to_unicode
    b2u = _bytes_to_unicode()
    pieces = ["<unk>", b2u[ord(" ")] + "{", b2u[ord("\n")], "ab"]
    tok = BPETokenizer(pieces, merges=[], bos_id=0, eos_id=0, unk_id=0)
    table = token_bytes_table(tok)
    assert table[1] == b" {"
    assert table[2] == b"\n"
    assert table[3] == b"ab"
