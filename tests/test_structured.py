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


# ---------------------------------------------------------------------------
# TokenMaskCache: on-device constrained decoding under the scheduler
# ---------------------------------------------------------------------------

def _json_piece_tok():
    """Minimal tokenizer-shaped object whose vocab includes multi-byte
    JSON pieces (incl. multi-pop tokens) to exercise the mask cache's
    bounded stack key."""
    from types import SimpleNamespace
    pieces = ["<pad>", "{", "}", "[", "]", ",", ":", '"', " ", "a", "b",
              "x", "1", "2", "0", "-", ".", "e", "true", "false", "null",
              '{"', '": ', '"}', '":', ', "', "}}", "]}", '},{"', '}},[',
              '"a"', '[{']
    return SimpleNamespace(tokens=pieces, special_ids=(0,), added={},
                           byte_level=False)


def _brute_mask(table, state, V):
    import numpy as np
    m = np.zeros((V,), bool)
    for tid, bs in enumerate(table):
        if bs is None:
            continue
        m[tid] = json_fsm.advance_bytes(state, bs) is not None
    return m


def test_mask_cache_matches_bruteforce():
    """mask(state) must equal per-token advance_bytes legality for every
    reachable state we drive it through — including stacks deeper than
    the bounded cache key (the 'deep' sharing must be exact)."""
    import numpy as np
    from turboinfer_tpu.structured import TokenMaskCache
    tok = _json_piece_tok()
    mk = TokenMaskCache(tok, require_object=True)
    prefixes = ["", "{", '{"a', '{"a"', '{"a": ', '{"a": 1',
                '{"a": -0.5e', '{"a": [', '{"a": [{', '{"a": [{"b": 1',
                '{"x": [{"a": {"b": 1', '{"x": {"a": {"b": 1',
                '{"a": {"b": {"c": {"d": 1', '{"a": [[[1', '{"a": "s',
                '{"a": "s\\\\', "{}"]
    for p in prefixes:
        st = json_fsm.advance_bytes(json_fsm.initial(True), p.encode())
        assert st is not None, p
        got = mk.mask(st)
        want = _brute_mask(mk.table, st, mk.V)
        assert np.array_equal(got, want), (
            p, [tok.tokens[i] for i in np.nonzero(got != want)[0]])


def test_mask_cache_key_depth_beyond_pops():
    """Regression: legality can read ONE frame below the deepest pop
    ('}},['  pops two objects, then ',[' needs the 3rd-from-top frame to
    be an array). States agreeing on the top max_pops frames but not
    that one must NOT share a cached mask."""
    from turboinfer_tpu.structured import TokenMaskCache
    tok = _json_piece_tok()
    mk = TokenMaskCache(tok, require_object=True)
    tid = tok.tokens.index('}},[')
    in_arr = json_fsm.advance_bytes(json_fsm.initial(True),
                                    b'{"x": [{"a": {"b": 1')
    in_obj = json_fsm.advance_bytes(json_fsm.initial(True),
                                    b'{"x": {"a": {"b": 1')
    # same (mode, payload, top-2 frames); differ at frame -3 (a vs o)
    assert in_arr[:2] == in_obj[:2] and in_arr[2][-2:] == in_obj[2][-2:]
    assert mk.mask(in_arr)[tid]          # ...1}},[  inside an array: ok
    assert not mk.mask(in_obj)[tid]      # inside an object: ',[' illegal
    assert mk.advance(in_obj, tid) is None


def test_mask_cache_bias_row_done_allows_only_eos():
    import numpy as np
    from turboinfer_tpu.structured import TokenMaskCache
    mk = TokenMaskCache(_json_piece_tok(), require_object=True)
    done_st = json_fsm.advance_bytes(json_fsm.initial(True), b"{}")
    assert mk.done(done_st)
    row = mk.bias_row(done_st, eos_id=3)
    assert row[3] == 0.0
    assert (np.delete(row, 3) < -1e29).all()


def _sched_structured_setup(tiny_params, tiny_cfg, **kw):
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    tok = BuiltinTokenizer(vocab_size=tiny_cfg.vocab_size)
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             temperature=0.0, seed=0)
    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        tokenizer=tok, **kw)
    return sched, tok, cfg


def test_scheduler_structured_greedy_matches_host_loop(tiny_params,
                                                       tiny_cfg):
    """VERDICT r2 item 5 acceptance: greedy structured output under
    continuous batching is token-identical to the host-loop path."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    tok = BuiltinTokenizer(vocab_size=tiny_cfg.vocab_size)
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             temperature=0.0, seed=0)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, cfg, tokenizer=tok)
    want = eng.generate_structured([1, 7, 9], max_new_tokens=48,
                                   temperature=0.0)

    sched, tok, _ = _sched_structured_setup(tiny_params, tiny_cfg,
                                            batch_slots=2)
    rid = sched.submit([1, 7, 9], 48, temperature=0.0,
                       response_format="json_object")
    res = sched.run()[rid]
    assert res.tokens == want.tokens
    if want.finished:
        assert res.stop_reason == "stop"
        assert isinstance(json.loads(tok.decode(res.tokens[3:])), dict)


def test_scheduler_structured_mixed_batch(tiny_params, tiny_cfg):
    """A structured slot must not perturb plain slots sharing the batch,
    and every structured output is a legal JSON prefix."""
    sched, tok, cfg = _sched_structured_setup(tiny_params, tiny_cfg,
                                              batch_slots=4)
    plain_prompt = [1, 5, 42, 7]
    base = _sched_structured_setup(tiny_params, tiny_cfg,
                                   batch_slots=4)[0]
    want_plain = base.run_one = base.submit(plain_prompt, 12,
                                            temperature=0.0)
    want_plain = base.run()[want_plain].tokens

    r_plain = sched.submit(plain_prompt, 12, temperature=0.0)
    r_json = sched.submit([1, 7, 9], 24, temperature=0.0,
                          response_format="json_object")
    r_json2 = sched.submit([2, 8], 24, temperature=0.9,
                           response_format="json_object")
    results = sched.run()
    assert results[r_plain].tokens == want_plain
    for rid, n_prompt in ((r_json, 3), (r_json2, 2)):
        text = tok.decode(results[rid].tokens[n_prompt:])
        st = json_fsm.advance_bytes(json_fsm.initial(True), text.encode())
        assert st is not None, f"illegal prefix: {text!r}"
        if results[rid].stop_reason == "stop":
            json.loads(text)


def test_scheduler_structured_with_burst(tiny_params, tiny_cfg):
    """decode_burst>1 falls back to per-token steps while a structured
    request is live — greedy output identical to the burst=1 run."""
    a, tok, _ = _sched_structured_setup(tiny_params, tiny_cfg,
                                        batch_slots=2)
    ra = a.submit([1, 7, 9], 32, temperature=0.0,
                  response_format="json_object")
    want = a.run()[ra].tokens

    b, _, _ = _sched_structured_setup(tiny_params, tiny_cfg,
                                      batch_slots=2, decode_burst=4)
    rb = b.submit([1, 7, 9], 32, temperature=0.0,
                  response_format="json_object")
    assert b.run()[rb].tokens == want


def test_paged_scheduler_structured(tiny_params, tiny_cfg):
    """Structured decoding over the paged cache: same greedy tokens as
    the contiguous scheduler."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    a, tok, cfg = _sched_structured_setup(tiny_params, tiny_cfg,
                                          batch_slots=2)
    ra = a.submit([1, 7, 9], 24, temperature=0.0,
                  response_format="json_object")
    want = a.run()[ra].tokens

    p = PagedContinuousScheduler(tiny_params, tiny_cfg, cfg,
                                 batch_slots=2, page_size=8,
                                 tokenizer=tok)
    rp = p.submit([1, 7, 9], 24, temperature=0.0,
                  response_format="json_object")
    assert p.run()[rp].tokens == want


def test_scheduler_structured_validation(tiny_params, tiny_cfg):
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len)
    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg)
    with pytest.raises(ValueError, match="tokenizer"):
        sched.submit([1, 2], 4, response_format="json_object")
    with pytest.raises(ValueError, match="response_format"):
        sched.submit([1, 2], 4, response_format="xml")


# ---------------------------------------------------------------------------
# JSON-SCHEMA constrained decoding (VERDICT r3 next-step 7): schema ->
# byte program -> on-device slot masks under the scheduler.
# ---------------------------------------------------------------------------

import turboinfer_tpu as ti


@pytest.fixture()
def tok_engine(tiny_params, tiny_cfg):
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    tok = BuiltinTokenizer(vocab_size=tiny_cfg.vocab_size)
    eng = ti.InferenceEngine(
        tiny_params, tiny_cfg,
        ti.InferenceConfig(max_seq_len=256, seed=0,
                           eos_token_id=tok.eos_id),
        tokenizer=tok)
    return eng, tok, tiny_cfg, tiny_params

SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string", "maxLength": 12},
        "age": {"type": "integer"},
        "mood": {"type": "string", "enum": ["happy", "sad"]},
        "tags": {"type": "array",
                 "items": {"type": "string", "maxLength": 6},
                 "minItems": 1, "maxItems": 3},
        "meta": {"type": "object",
                 "properties": {"ok": {"type": "boolean"}},
                 "required": ["ok"]},
    },
    "required": ["name", "age", "mood", "tags", "meta"],
}


def test_schema_fsm_accepts_conforming_bytes():
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    fsm = SchemaFSM(SCHEMA)
    doc = ('{"name":"bo","age":-12,"mood":"sad",'
           '"tags":["a","b"],"meta":{"ok":true}}')
    st = fsm.advance_bytes(fsm.initial(), doc.encode())
    assert st is not None and fsm.done(st)
    # violations rejected at the first bad byte
    for bad in ('{"name":1', '{"age"', '{"name":"x","age":1.5',
                '{"name":"x","age":1,"mood":"angry',
                '{"name":"x","age":1,"mood":"sad","tags":[]'):
        assert fsm.advance_bytes(fsm.initial(), bad.encode()) is None, bad


def test_schema_fsm_array_bounds_and_integer():
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    fsm = SchemaFSM({"type": "array", "items": {"type": "integer"},
                     "minItems": 2, "maxItems": 3})
    ok = fsm.advance_bytes(fsm.initial(), b"[1,23,4]")
    assert ok is not None and fsm.done(ok)
    assert fsm.advance_bytes(fsm.initial(), b"[1]") is None
    assert fsm.advance_bytes(fsm.initial(), b"[1,2,3,4") is None
    assert fsm.advance_bytes(fsm.initial(), b"[1.5") is None


def test_schema_fsm_rejects_unsupported():
    from turboinfer_tpu.structured.schema_fsm import (SchemaError,
                                                      SchemaFSM)
    for bad in ({"$ref": "#/x"}, {"type": ["string", "null"]},
                {"type": "array"},
                {"enum": [1, 12]}):          # 1 is a byte-prefix of 12
        with pytest.raises(SchemaError):
            SchemaFSM(bad)


def test_scheduler_schema_outputs_conform(tok_engine):
    """Scheduler decoding under a schema mask: output parses AND
    conforms (keys in order, enum honored, bounds honored)."""
    import json as _json
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    eng, tok, cfg, params = tok_engine
    icfg = ti.InferenceConfig(max_seq_len=256, temperature=0.9,
                              eos_token_id=tok.eos_id)
    sched = ContinuousBatchingScheduler(params, cfg, icfg,
                                        batch_slots=2, tokenizer=tok)
    rf = {"type": "json_schema", "json_schema": {"schema": SCHEMA}}
    rids = [sched.submit(tok.encode("give me json"), 160,
                         response_format=rf) for _ in range(2)]
    res = sched.run()
    for r in rids:
        out = res[r]
        assert out.stop_reason == "stop", out.stop_reason
        text = tok.decode(out.tokens[len(tok.encode("give me json")):])
        doc = _json.loads(text)
        assert list(doc) == ["name", "age", "mood", "tags", "meta"]
        assert isinstance(doc["age"], int)
        assert doc["mood"] in ("happy", "sad")
        assert 1 <= len(doc["tags"]) <= 3
        assert isinstance(doc["meta"]["ok"], bool)


def test_engine_generate_structured_schema(tok_engine):
    import json as _json
    eng, tok, cfg, params = tok_engine
    rf = {"type": "json_schema",
          "json_schema": {"schema": {
              "type": "object",
              "properties": {"n": {"type": "integer"},
                             "ok": {"type": "boolean"}},
              "required": ["n", "ok"]}}}
    res = eng.generate_structured(tok.encode("data"), 64,
                                  response_format=rf, temperature=0.8)
    assert res.finished
    doc = _json.loads(tok.decode(res.tokens[len(tok.encode("data")):]))
    assert list(doc) == ["n", "ok"]
    assert isinstance(doc["n"], int) and isinstance(doc["ok"], bool)


def test_scheduler_rejects_bad_schema(tok_engine):
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    eng, tok, cfg, params = tok_engine
    sched = ContinuousBatchingScheduler(params, cfg,
                                        ti.InferenceConfig(max_seq_len=64),
                                        batch_slots=2, tokenizer=tok)
    with pytest.raises(ValueError):
        sched.submit([1, 2], 8, response_format={
            "type": "json_schema",
            "json_schema": {"schema": {"$ref": "#/nope"}}})


def test_schema_mask_cache_bounded_for_unbounded_strings(tok_engine):
    """Free strings without maxLength must not mint a fresh vocab mask
    per generated token (the state's char counter canonicalizes once
    past minLength)."""
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    eng, tok, cfg, params = tok_engine
    icfg = ti.InferenceConfig(max_seq_len=256, temperature=0.9, seed=3,
                              eos_token_id=tok.eos_id)
    sched = ContinuousBatchingScheduler(params, cfg, icfg,
                                        batch_slots=2, tokenizer=tok)
    rf = {"type": "json_schema", "json_schema": {"schema": {
        "type": "object", "properties": {"text": {"type": "string"}},
        "required": ["text"]}}}
    rid = sched.submit(tok.encode("write"), 120, response_format=rf)
    res = sched.run()
    assert len(res[rid].tokens) > 10
    mk = next(iter(sched._maskers.values()))
    # distinct mask keys stay far below one-per-token
    assert len(mk._masks) < 40, len(mk._masks)


def test_schema_top_level_number_can_span_tokens():
    """A top-level integer schema must allow digits to continue AND
    EOS at terminal states (done() no longer freezes after the first
    digit token)."""
    from turboinfer_tpu.structured.filter import TokenMaskCache
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    tok = BuiltinTokenizer(vocab_size=1000)
    fsm = SchemaFSM({"type": "integer"})
    mk = TokenMaskCache(tok, vocab_size=1000, fsm=fsm)
    st = fsm.advance_bytes(fsm.initial(), b"7")
    assert not fsm.done(st) and fsm.may_finish(st)
    row = mk.bias_row(st, tok.eos_id)
    assert row[tok.eos_id] == 0.0                  # stopping is legal
    digit_ids = [i for i, bs in enumerate(mk.table)
                 if bs == b"3"]
    assert digit_ids and row[digit_ids[0]] == 0.0  # so is continuing
    st2 = fsm.advance_bytes(st, b"23")
    assert st2 is not None and fsm.may_finish(st2)


def test_schema_array_of_objects_compiles_and_conforms(tok_engine):
    """Array-of-objects schemas crashed compilation (the arr_open
    placeholder hit _lit's merge check)."""
    import json as _json
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    schema = {"type": "array", "minItems": 1, "maxItems": 2,
              "items": {"type": "object",
                        "properties": {"a": {"type": "integer"}},
                        "required": ["a"]}}
    fsm = SchemaFSM(schema)
    st = fsm.advance_bytes(fsm.initial(), b'[{"a":1},{"a":22}]')
    assert st is not None and fsm.done(st)
    assert fsm.advance_bytes(fsm.initial(), b'[]') is None   # minItems
    # end-to-end under the engine host loop
    eng, tok, cfg, params = tok_engine
    rf = {"type": "json_schema", "json_schema": {"schema": schema}}
    res = eng.generate_structured(tok.encode("list"), 80,
                                  response_format=rf, temperature=0.9)
    if res.finished:
        doc = _json.loads(tok.decode(
            res.tokens[len(tok.encode("list")):]))
        assert isinstance(doc, list) and 1 <= len(doc) <= 2


def test_generate_structured_top_level_number_finishes(tok_engine):
    """Host-loop path: a top-level number schema can now stop (EOS
    competes at may-finish states) instead of emitting digits until
    MAX_NUM_LEN kills the grammar."""
    import json as _json
    eng, tok, cfg, params = tok_engine
    rf = {"type": "json_schema",
          "json_schema": {"schema": {"type": "integer"}}}
    res = eng.generate_structured(tok.encode("n"), 40,
                                  response_format=rf, temperature=0.0)
    out = res.tokens[len(tok.encode("n")):]
    text = tok.decode(out)
    assert text.lstrip("-").isdigit()
    val = _json.loads(text)
    assert isinstance(val, int)


def test_scheduler_structured_keeps_user_logit_bias(tiny_params,
                                                    tiny_cfg):
    """The user's logit_bias must ride every grammar mask, not just the
    first token."""
    import turboinfer_tpu as ti
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    import numpy as _np
    tok = BuiltinTokenizer(vocab_size=tiny_cfg.vocab_size)
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg.max_seq_len,
                             temperature=0.0, seed=0)
    sched = ContinuousBatchingScheduler(tiny_params, tiny_cfg, cfg,
                                        tokenizer=tok, batch_slots=2)
    tid = tok.encode("x")[-1]
    rid = sched.submit([1, 5], 6, response_format="json",
                       logit_bias={int(tid): -123.0})
    sched.step()
    req = sched.get_request(rid)
    if req is not None and not req.finished:
        row = _np.asarray(sched.slot_bias[req.slot])
        assert row[tid] <= -123.0


# -- round-5 schema widening: optional props, anyOf, bounds, pattern ---

def _random_walks(schema, n=40, seed=0, max_bytes=400):
    """Sample n random documents by walking the schema FSM byte-by-byte
    over its legal-byte sets, then jsonschema-validate every one — an
    accept-path soundness property test."""
    import random
    import jsonschema
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    fsm = SchemaFSM(schema)
    rng = random.Random(seed)
    docs = []
    for _ in range(n):
        st = fsm.initial()
        out = bytearray()
        for _step in range(max_bytes):
            if fsm.done(st):
                break
            legal = [b for b in range(0x20, 0x7F)
                     if fsm.advance(st, b) is not None]
            if not legal:
                # terminal-only state ("0" at top level): must be a
                # legal stopping point — dead ends are forbidden
                assert fsm.may_finish(st), (bytes(out), st)
                break
            if fsm.may_finish(st) and rng.random() < 0.5:
                break
            b = rng.choice(legal)
            st = fsm.advance(st, b)
            out.append(b)
        else:
            raise AssertionError(f"walk did not terminate: {bytes(out)}")
        doc = json.loads(out.decode())
        jsonschema.validate(doc, schema)
        docs.append(doc)
    return docs


def test_schema_optional_properties():
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"},
                             "opt1": {"type": "boolean"},
                             "b": {"type": "integer"},
                             "opt2": {"type": "boolean"}},
              "required": ["a", "b"]}
    fsm = SchemaFSM(schema)
    for ok in (b'{"a":1,"b":2}', b'{"a":1,"opt1":true,"b":2}',
               b'{"a":1,"b":2,"opt2":false}',
               b'{"a":1,"opt1":true,"b":2,"opt2":true}'):
        st = fsm.advance_bytes(fsm.initial(), ok)
        assert st is not None and fsm.done(st), ok
    for bad in (b'{"b":2', b'{"opt1":true,"opt2"', b'{"a":1}',
                b'{"a":1,"opt2":true,"b"', b'{"a":1,"b":2,"opt1"'):
        assert fsm.advance_bytes(fsm.initial(), bad) is None, bad
    docs = _random_walks(schema, n=30)
    # optionality genuinely exercised in sampled outputs
    assert any("opt1" in d for d in docs)
    assert any("opt1" not in d for d in docs)


def test_schema_all_optional_object():
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    schema = {"type": "object",
              "properties": {"x": {"type": "integer"},
                             "y": {"type": "boolean"}},
              "required": []}
    fsm = SchemaFSM(schema)
    for ok in (b"{}", b'{"x":5}', b'{"y":true}', b'{"x":5,"y":false}'):
        st = fsm.advance_bytes(fsm.initial(), ok)
        assert st is not None and fsm.done(st), ok
    assert fsm.advance_bytes(fsm.initial(), b'{,') is None
    _random_walks(schema, n=20)


def test_schema_anyof_union():
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    schema = {"anyOf": [{"type": "string", "maxLength": 4},
                        {"type": "integer"},
                        {"type": "null"}]}
    fsm = SchemaFSM(schema)
    for ok in (b'"hi"', b"-42", b"null"):
        st = fsm.advance_bytes(fsm.initial(), ok)
        assert st is not None and (fsm.done(st) or fsm.may_finish(st)), ok
    assert fsm.advance_bytes(fsm.initial(), b"true") is None
    _random_walks(schema, n=30, seed=1)


def test_schema_anyof_ambiguous_object_prefix():
    """Two object alternatives share the '{' prefix — the NFA keeps
    both branches live until the key disambiguates."""
    import jsonschema
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    schema = {"oneOf": [
        {"type": "object", "properties": {"cat": {"type": "string",
                                                  "maxLength": 3}},
         "required": ["cat"]},
        {"type": "object", "properties": {"count": {"type": "integer"}},
         "required": ["count"]}]}
    fsm = SchemaFSM(schema)
    for ok in (b'{"cat":"ab"}', b'{"count":7}'):
        st = fsm.advance_bytes(fsm.initial(), ok)
        assert st is not None and fsm.done(st), ok
    # '{"c' keeps both alive; '{"ca' kills the count branch
    st = fsm.advance_bytes(fsm.initial(), b'{"c')
    assert st is not None and st[0] == "NFA"
    st = fsm.advance_bytes(st, b'a')
    assert st is not None and st[0] != "NFA"
    assert fsm.advance_bytes(fsm.initial(), b'{"dog') is None
    for d in _random_walks(schema, n=20, seed=2):
        jsonschema.validate(d, schema)


def test_schema_integer_bounds():
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    schema = {"type": "object",
              "properties": {"pct": {"type": "integer", "minimum": 0,
                                     "maximum": 100},
                             "t": {"type": "integer", "minimum": -40,
                                   "maximum": 60}},
              "required": ["pct", "t"]}
    fsm = SchemaFSM(schema)
    for ok in (b'{"pct":0,"t":-40}', b'{"pct":100,"t":60}',
               b'{"pct":55,"t":0}'):
        st = fsm.advance_bytes(fsm.initial(), ok)
        assert st is not None and fsm.done(st), ok
    for bad in (b'{"pct":101', b'{"pct":-', b'{"pct":200',
                b'{"pct":55,"t":-41', b'{"pct":55,"t":61',
                b'{"pct":007'):
        assert fsm.advance_bytes(fsm.initial(), bad) is None, bad
    # "10" must stay extendable to 100 but not 101
    st = fsm.advance_bytes(fsm.initial(), b'{"pct":10')
    assert fsm.advance(st, ord("0")) is not None
    assert fsm.advance(st, ord("1")) is None
    docs = _random_walks(schema, n=40, seed=3)
    assert any(d["t"] < 0 for d in docs)       # negatives sampled


def test_schema_exclusive_bounds_and_top_level():
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    fsm = SchemaFSM({"type": "integer", "exclusiveMinimum": 0,
                     "exclusiveMaximum": 10})
    for v in range(1, 10):
        st = fsm.advance_bytes(fsm.initial(), str(v).encode())
        assert st is not None and fsm.may_finish(st), v
    assert fsm.advance_bytes(fsm.initial(), b"0") is None
    st = fsm.advance_bytes(fsm.initial(), b"1")
    assert fsm.advance(st, ord("0")) is None   # 10 out of range


def test_schema_string_pattern():
    import re
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    schema = {"type": "object",
              "properties": {"id": {"type": "string",
                                    "pattern": "^[a-z]{3}-[0-9]{2}$"}},
              "required": ["id"]}
    fsm = SchemaFSM(schema)
    st = fsm.advance_bytes(fsm.initial(), b'{"id":"abc-42"}')
    assert st is not None and fsm.done(st)
    for bad in (b'{"id":"ab-42"', b'{"id":"abcd', b'{"id":"abc-4"',
                b'{"id":"ABC'):
        assert fsm.advance_bytes(fsm.initial(), bad) is None, bad
    docs = _random_walks(schema, n=25, seed=4)
    for d in docs:
        assert re.fullmatch(r"[a-z]{3}-[0-9]{2}", d["id"]), d


def test_schema_pattern_unanchored_and_classes():
    import re
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    # unanchored: must CONTAIN a digit run; also \d and + quantifier
    schema = {"type": "string", "pattern": "\\d+", "maxLength": 8,
              "minLength": 1}
    fsm = SchemaFSM(schema)
    for ok in (b'"7"', b'"ab12cd"'):
        st = fsm.advance_bytes(fsm.initial(), ok)
        assert st is not None and fsm.done(st), ok
    assert fsm.advance_bytes(fsm.initial(), b'"abc"') is None
    for d in _random_walks(schema, n=25, seed=5, max_bytes=60):
        assert re.search(r"\d+", d), d


def test_schema_combined_keywords_end_to_end(tok_engine):
    """All four round-5 keywords in ONE schema, decoded under the
    continuous-batching scheduler at high temperature, every output
    jsonschema-validated."""
    import json as _json
    import jsonschema
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    eng, tok, cfg, params = tok_engine
    schema = {"type": "object",
              "properties": {
                  "kind": {"enum": ["cat", "dog"]},
                  "nick": {"type": "string",
                           "pattern": "^[a-z]{2,5}$"},
                  "age": {"type": "integer", "minimum": 0,
                          "maximum": 30},
                  "extra": {"anyOf": [{"type": "null"},
                                      {"type": "integer",
                                       "minimum": 1, "maximum": 9}]}},
              "required": ["kind", "age"]}
    icfg = ti.InferenceConfig(max_seq_len=256, temperature=1.2, seed=11,
                              eos_token_id=tok.eos_id)
    sched = ContinuousBatchingScheduler(params, cfg, icfg,
                                        batch_slots=4, tokenizer=tok)
    rf = {"type": "json_schema", "json_schema": {"schema": schema}}
    prompt = tok.encode("pet:")
    rids = [sched.submit(prompt, 120, response_format=rf)
            for _ in range(4)]
    res = sched.run()
    for r in rids:
        assert res[r].stop_reason == "stop"
        doc = _json.loads(tok.decode(res[r].tokens[len(prompt):]))
        jsonschema.validate(doc, schema)


def test_schema_fractional_exclusive_bounds():
    """Fractional exclusive bounds: smallest int > x is floor(x)+1,
    largest < x is ceil(x)-1 (regression: int() truncation forbade 0
    for exclusiveMaximum=0.5 and made {-0.5, 0.5} unsatisfiable)."""
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    fsm = SchemaFSM({"type": "integer", "exclusiveMinimum": -0.5,
                     "exclusiveMaximum": 0.5})
    st = fsm.advance_bytes(fsm.initial(), b"0")
    assert st is not None and fsm.may_finish(st)
    assert fsm.advance_bytes(fsm.initial(), b"1") is None
    assert fsm.advance_bytes(fsm.initial(), b"-1") is None
    fsm = SchemaFSM({"type": "integer", "exclusiveMaximum": 2.5})
    st = fsm.advance_bytes(fsm.initial(), b"2")
    assert st is not None and fsm.may_finish(st)
    st3 = fsm.advance_bytes(fsm.initial(), b"3")
    assert st3 is None or not fsm.may_finish(st3)


def test_regex_zero_quantifier():
    """{0} / {0,0} accept exactly zero occurrences of the atom
    (regression: the original fragment stayed wired in, accepting
    one)."""
    import re
    from turboinfer_tpu.structured.schema_fsm import SchemaFSM
    schema = {"type": "string", "pattern": "^ab{0}c$"}
    fsm = SchemaFSM(schema)
    st = fsm.advance_bytes(fsm.initial(), b'"ac"')
    assert st is not None and fsm.done(st)
    assert fsm.advance_bytes(fsm.initial(), b'"abc"') is None
    assert re.fullmatch("ab{0}c", "ac")            # sanity: re agrees
    schema = {"type": "string", "pattern": "^a{0,0}$"}
    fsm = SchemaFSM(schema)
    st = fsm.advance_bytes(fsm.initial(), b'""')
    assert st is not None and fsm.done(st)
    assert fsm.advance_bytes(fsm.initial(), b'"a"') is None
