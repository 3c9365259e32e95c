"""Serving layer tests: ServingEngine + OpenAI-compatible HTTP server.

Beyond-reference subsystem (the reference is a blocking library with no
server); correctness is pinned to the engine's own greedy outputs and
to the OpenAI wire format.
"""

import http.client
import json
import threading
import time

import pytest

import turboinfer_tpu as ti
from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
from turboinfer_tpu.serve import ServingEngine, StreamEnd, make_server
from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer


@pytest.fixture(scope="module")
def served(tiny_params_mod, tiny_cfg_mod):
    tok = BuiltinTokenizer(vocab_size=tiny_cfg_mod.vocab_size)
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg_mod.max_seq_len,
                             eos_token_id=-1, temperature=0.8)
    sched = ContinuousBatchingScheduler(tiny_params_mod, tiny_cfg_mod, cfg,
                                        batch_slots=4, tokenizer=tok)
    beam_eng = ti.InferenceEngine(sched.params, tiny_cfg_mod, cfg,
                                  tokenizer=tok,
                                  params_are_prepared=True)
    eng = ServingEngine(sched, tokenizer=tok, model_name="tiny-test",
                        beam_engine=beam_eng)
    srv = make_server(eng, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield eng, srv.server_address[1], tok, cfg
    srv.shutdown()
    eng.shutdown()


# conftest fixtures are session-scoped function fixtures; rebind at
# module scope for the server fixture above.
@pytest.fixture(scope="module")
def tiny_cfg_mod():
    import jax.numpy as jnp
    return ti.tiny_config(dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_params_mod(tiny_cfg_mod):
    import jax
    from turboinfer_tpu.models import llama
    return llama.init_params(jax.random.PRNGKey(0), tiny_cfg_mod)


def _post(port, path, obj):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(obj),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    return resp, conn


def _post_json(port, path, obj):
    resp, conn = _post(port, path, obj)
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def test_serving_engine_matches_generate(tiny_params_mod, tiny_cfg_mod):
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg_mod.max_seq_len,
                             eos_token_id=-1)
    want = ti.InferenceEngine(tiny_params_mod, tiny_cfg_mod, cfg).generate(
        [1, 5, 42, 7], 8, temperature=0.0).tokens
    sched = ContinuousBatchingScheduler(tiny_params_mod, tiny_cfg_mod, cfg,
                                        batch_slots=2)
    eng = ServingEngine(sched)
    rid = eng.submit([1, 5, 42, 7], 8, temperature=0.0)
    toks, end = eng.result(rid)
    eng.shutdown()
    assert [1, 5, 42, 7] + toks == want
    assert isinstance(end, StreamEnd)
    assert end.completion_tokens == 8 and end.prompt_tokens == 4


def test_health_and_models(served):
    _, port, _, _ = served
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/health")
    r = conn.getresponse()
    assert r.status == 200 and json.loads(r.read())["status"] == "ok"
    conn.request("GET", "/v1/models")
    r = conn.getresponse()
    data = json.loads(r.read())
    conn.close()
    assert data["data"][0]["id"] == "tiny-test"


def test_completions_text_prompt(served, tiny_params_mod, tiny_cfg_mod):
    _, port, tok, cfg = served
    status, body = _post_json(port, "/v1/completions", {
        "prompt": "hello world", "max_tokens": 8, "temperature": 0})
    assert status == 200
    assert body["object"] == "text_completion"
    assert body["usage"]["completion_tokens"] == 8
    # greedy server output == engine greedy continuation of same ids
    ids = tok.encode("hello world", add_bos=True)
    eng = ti.InferenceEngine(tiny_params_mod, tiny_cfg_mod,
                             ti.InferenceConfig(
                                 max_seq_len=tiny_cfg_mod.max_seq_len,
                                 eos_token_id=-1),
                             tokenizer=tok)
    want = eng.generate(ids, 8, temperature=0.0).tokens[len(ids):]
    # the server streams through IncrementalDecoder (invalid bytes →
    # U+FFFD immediately, incomplete UTF-8 tails withheld)
    from turboinfer_tpu.tokenizer.stream import IncrementalDecoder
    dec = IncrementalDecoder(tok)
    want_text = "".join(dec.push(t) for t in want)
    assert body["choices"][0]["text"] == want_text
    assert body["choices"][0]["finish_reason"] == "length"


def test_completions_token_ids_prompt(served):
    _, port, _, _ = served
    status, body = _post_json(port, "/v1/completions", {
        "prompt": [1, 5, 42, 7], "max_tokens": 4, "temperature": 0})
    assert status == 200
    assert body["usage"]["prompt_tokens"] == 4


def test_chat_completions(served):
    _, port, _, _ = served
    status, body = _post_json(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi there"}],
        "max_tokens": 6, "temperature": 0})
    assert status == 200
    assert body["object"] == "chat.completion"
    msg = body["choices"][0]["message"]
    assert msg["role"] == "assistant" and isinstance(msg["content"], str)


def test_streaming_sse(served):
    _, port, _, _ = served
    resp, conn = _post(port, "/v1/completions", {
        "prompt": "hello world", "max_tokens": 6, "temperature": 0,
        "stream": True})
    assert resp.status == 200
    assert resp.headers["Content-Type"].startswith("text/event-stream")
    events = []
    buf = b""
    while True:
        chunk = resp.read(1)
        if not chunk:
            break
        buf += chunk
        while b"\n\n" in buf:
            ev, buf = buf.split(b"\n\n", 1)
            if ev.startswith(b"data: "):
                events.append(ev[6:].decode())
        if events and events[-1] == "[DONE]":
            break
    conn.close()
    assert events[-1] == "[DONE]"
    parsed = [json.loads(e) for e in events[:-1]]
    text = "".join(p["choices"][0]["text"] for p in parsed)
    assert len(text) > 0
    assert parsed[-1]["choices"][0]["finish_reason"] == "length"
    # streamed text equals the blocking endpoint's text
    _, body = _post_json(port, "/v1/completions", {
        "prompt": "hello world", "max_tokens": 6, "temperature": 0})
    assert text == body["choices"][0]["text"]


def test_chat_streaming_delta_format(served):
    _, port, _, _ = served
    resp, conn = _post(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4, "temperature": 0, "stream": True})
    raw = resp.read().decode()
    conn.close()
    events = [e[6:] for e in raw.split("\n\n") if e.startswith("data: ")]
    assert events[-1] == "[DONE]"
    first = json.loads(events[0])
    assert first["choices"][0]["delta"]["role"] == "assistant"
    assert json.loads(events[-2])["choices"][0]["finish_reason"] \
        in ("stop", "length")


def test_stop_sequence(served):
    _, port, tok, _ = served
    # find what greedy produces, then stop on its first char
    _, full = _post_json(port, "/v1/completions", {
        "prompt": "hello world", "max_tokens": 8, "temperature": 0})
    target = full["choices"][0]["text"]
    if not target:
        pytest.skip("greedy output decodes to empty text")
    stop = target[0]
    _, body = _post_json(port, "/v1/completions", {
        "prompt": "hello world", "max_tokens": 8, "temperature": 0,
        "stop": stop})
    assert body["choices"][0]["text"] == ""
    assert body["choices"][0]["finish_reason"] == "stop"


def test_errors(served):
    _, port, _, _ = served
    status, body = _post_json(port, "/v1/completions", {"prompt": ""})
    assert status == 400 and "error" in body
    status, body = _post_json(port, "/v1/chat/completions", {"messages": []})
    assert status == 400
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/v1/completions", "{not json",
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 400
    r.read()
    conn.request("GET", "/nope")
    r = conn.getresponse()
    assert r.status == 404
    r.read()
    conn.close()


def test_concurrent_requests(served):
    _, port, _, _ = served
    results = {}

    def one(i):
        _, body = _post_json(port, "/v1/completions", {
            "prompt": [1 + i, 5, 9], "max_tokens": 6, "temperature": 0})
        results[i] = body

    threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 6
    for body in results.values():
        assert body["usage"]["completion_tokens"] == 6


def test_metrics_endpoint(served):
    _, port, _, _ = served
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/metrics")
    r = conn.getresponse()
    body = r.read().decode()
    conn.close()
    assert r.status == 200
    assert "turboinfer_requests_total" in body
    assert "turboinfer_pending_requests" in body


def test_logprobs_field(served):
    _, port, _, _ = served
    status, body = _post_json(port, "/v1/completions", {
        "prompt": [1, 5, 9], "max_tokens": 5, "temperature": 0,
        "logprobs": True})
    assert status == 200
    lp = body["choices"][0]["logprobs"]
    assert len(lp["token_logprobs"]) == 5
    assert all(v <= 0.0 for v in lp["token_logprobs"])
    status, body = _post_json(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4, "temperature": 0, "logprobs": True})
    assert len(body["choices"][0]["logprobs"]["content"]) == 4


def test_logit_bias_forces_token(served):
    """+100 bias on one token makes greedy pick it every step."""
    _, port, _, _ = served
    forced = 123
    status, body = _post_json(port, "/v1/completions", {
        "prompt": [1, 5, 9], "max_tokens": 5, "temperature": 0,
        "logit_bias": {str(forced): 100.0}})
    assert status == 200
    # decode the produced ids via a fresh request with logprobs? simpler:
    # the text of token 123 five times == decoded output
    eng, _, tok, _ = served
    assert body["choices"][0]["text"] == tok.decode([forced] * 5)


def test_n_choices(served):
    _, port, _, _ = served
    status, body = _post_json(port, "/v1/completions", {
        "prompt": [1, 5, 9], "max_tokens": 4, "temperature": 1.0, "n": 3})
    assert status == 200
    assert [c["index"] for c in body["choices"]] == [0, 1, 2]
    assert body["usage"]["completion_tokens"] == 12
    status, body = _post_json(port, "/v1/completions", {
        "prompt": [1], "max_tokens": 2, "n": 2, "stream": True})
    assert status == 400


def test_invalid_token_ids_rejected(served):
    _, port, _, _ = served
    for bad in ([-5], [10**9], [1, "x"]):
        status, body = _post_json(port, "/v1/completions", {
            "prompt": bad, "max_tokens": 4})
        assert status == 400, bad
    status, _ = _post_json(port, "/v1/completions", {
        "prompt": [1, 2], "max_tokens": 4, "repetition_penalty": 0})
    assert status == 400


def test_driver_survives_step_exception(tiny_params_mod, tiny_cfg_mod):
    """One failing step() must fail the affected requests with an error
    StreamEnd, not kill the serving thread."""
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg_mod.max_seq_len,
                             eos_token_id=-1)
    sched = ContinuousBatchingScheduler(tiny_params_mod, tiny_cfg_mod, cfg,
                                        batch_slots=2)
    eng = ServingEngine(sched)
    real_step = sched.step
    calls = {"n": 0}

    def flaky_step():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected failure")
        return real_step()

    sched.step = flaky_step
    rid = eng.submit([1, 2, 3], 4, temperature=0.0)
    toks, end = eng.result(rid, timeout=60)
    assert end.stop_reason.startswith("error")
    # the driver is still alive: a new request completes normally
    rid2 = eng.submit([1, 2, 3], 4, temperature=0.0)
    toks2, end2 = eng.result(rid2, timeout=60)
    assert len(toks2) == 4 and end2.stop_reason in ("length", "eos")
    eng.shutdown()


def test_abandoned_stream_cancels_and_reclaims(tiny_params_mod,
                                               tiny_cfg_mod):
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg_mod.max_seq_len,
                             eos_token_id=-1)
    sched = ContinuousBatchingScheduler(tiny_params_mod, tiny_cfg_mod, cfg,
                                        batch_slots=2)
    eng = ServingEngine(sched)
    rid = eng.submit([1, 2, 3], 200, temperature=0.0)
    it = eng.stream(rid, timeout=60)
    next(it)                      # consume one token, then walk away
    it.close()                    # generator finalizer → cancel
    import time as _t
    deadline = _t.time() + 30
    while _t.time() < deadline and (sched._active or sched._done):
        _t.sleep(0.2)
    assert not sched._active      # slot reclaimed
    assert not sched._done        # no leaked finished request
    eng.shutdown()


def test_queue_full_raises(tiny_params_mod, tiny_cfg_mod):
    """max_queue admission control, no driver thread (deterministic:
    nothing drains the queue between submits)."""
    from turboinfer_tpu.utils.errors import SchedulerFullError
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg_mod.max_seq_len,
                             eos_token_id=-1)
    sched = ContinuousBatchingScheduler(tiny_params_mod, tiny_cfg_mod, cfg,
                                        batch_slots=1, max_queue=1)
    sched.submit([1, 2, 3], 4)
    with pytest.raises(SchedulerFullError):
        sched.submit([1, 2, 3], 4)


def test_queue_full_maps_to_429(served):
    """HTTP layer turns SchedulerFullError into 429."""
    from turboinfer_tpu.utils.errors import SchedulerFullError
    eng, port, _, _ = served
    real = eng.submit

    def full(*a, **k):
        raise SchedulerFullError("request queue full (test)")

    eng.submit = full
    try:
        status, body = _post_json(port, "/v1/completions", {
            "prompt": [1, 2], "max_tokens": 4})
    finally:
        eng.submit = real
    assert status == 429
    assert body["error"]["type"] == "rate_limit_exceeded"


def test_echo_prepends_prompt(served):
    _, port, tok, _ = served
    ids = [1, 5, 42, 7]
    _, plain = _post_json(port, "/v1/completions", {
        "prompt": ids, "max_tokens": 4, "temperature": 0})
    _, echoed = _post_json(port, "/v1/completions", {
        "prompt": ids, "max_tokens": 4, "temperature": 0, "echo": True})
    assert echoed["choices"][0]["text"] == \
        tok.decode(ids) + plain["choices"][0]["text"]


def test_completions_response_format_json(served):
    """OpenAI response_format={"type": "json_object"}: the server output
    is always a legal JSON prefix, and parses when it stopped on the
    grammar (finish_reason "stop")."""
    from turboinfer_tpu.structured import json_fsm
    _, port, tok, _ = served
    status, body = _post_json(port, "/v1/completions", {
        "prompt": "give me json", "max_tokens": 48, "temperature": 0,
        "response_format": {"type": "json_object"}})
    assert status == 200
    choice = body["choices"][0]
    st = json_fsm.advance_bytes(json_fsm.initial(True),
                                choice["text"].encode())
    assert st is not None, f"illegal prefix: {choice['text']!r}"
    if choice["finish_reason"] == "stop":
        assert isinstance(json.loads(choice["text"]), dict)


def test_completions_response_format_validation(served):
    _, port, _, _ = served
    status, body = _post_json(port, "/v1/completions", {
        "prompt": "x", "max_tokens": 4,
        "response_format": {"type": "xml"}})
    assert status == 400
    # "text" is the OpenAI default: accepted, unconstrained
    status, _ = _post_json(port, "/v1/completions", {
        "prompt": "x", "max_tokens": 4,
        "response_format": {"type": "text"}})
    assert status == 200


def test_beam_search_http(served):
    """`use_beam_search` on the batch path: n best beams come back as
    choices, matching the engine's own beam search."""
    eng, port, tok, cfg = served
    status, body = _post_json(port, "/v1/completions", {
        "prompt": [1, 5, 9], "max_tokens": 8, "use_beam_search": True,
        "best_of": 4, "n": 2, "logprobs": True})
    assert status == 200
    assert len(body["choices"]) == 2
    assert body["choices"][0]["finish_reason"] in ("stop", "length")
    # parity with a direct engine beam call
    want = eng.beam_engine.generate_beam_search(
        [1, 5, 9], 8, beam_size=4, return_all_beams=True)
    assert body["choices"][0]["text"] == tok.decode(want[0].tokens[3:])
    lp = body["choices"][0]["logprobs"]["token_logprobs"]
    assert len(lp) == len(want[0].tokens) - 3


def test_beam_search_http_streaming_rejected(served):
    eng, port, tok, cfg = served
    status, body = _post_json(port, "/v1/completions", {
        "prompt": [1, 5, 9], "max_tokens": 8, "use_beam_search": True,
        "stream": True})
    assert status == 400


def test_best_of_ranking(served):
    """OpenAI best_of: sample best_of candidates, return the n best by
    mean token logprob."""
    eng, port, tok, cfg = served
    status, body = _post_json(port, "/v1/completions", {
        "prompt": [1, 5, 9], "max_tokens": 8, "best_of": 4, "n": 2,
        "temperature": 0.9})
    assert status == 200
    assert len(body["choices"]) == 2
    assert [c["index"] for c in body["choices"]] == [0, 1]
    assert body["usage"]["completion_tokens"] == 32   # all 4 sampled


def test_response_format_json_schema_http(served):
    """response_format={"type":"json_schema",...} constrains the HTTP
    completion to the compiled schema."""
    eng, port, tok, cfg = served
    schema = {"type": "object",
              "properties": {"n": {"type": "integer"},
                             "ok": {"type": "boolean"}},
              "required": ["n", "ok"]}
    status, body = _post_json(port, "/v1/completions", {
        "prompt": "data please", "max_tokens": 64, "temperature": 0.9,
        "response_format": {"type": "json_schema",
                            "json_schema": {"schema": schema}}})
    assert status == 200
    doc = json.loads(body["choices"][0]["text"])
    assert list(doc) == ["n", "ok"]
    assert isinstance(doc["n"], int) and isinstance(doc["ok"], bool)
    # a broken schema is a 400, not a wedged request
    status, body = _post_json(port, "/v1/completions", {
        "prompt": "x", "max_tokens": 8,
        "response_format": {"type": "json_schema",
                            "json_schema": {"schema": {"$ref": "#/x"}}}})
    assert status == 400


def test_best_of_validation(served):
    eng, port, tok, cfg = served
    status, _ = _post_json(port, "/v1/completions", {
        "prompt": [1, 5], "max_tokens": 4, "best_of": 2, "n": 3})
    assert status == 400                    # best_of < n
    status, _ = _post_json(port, "/v1/completions", {
        "prompt": [1, 5], "max_tokens": 4, "best_of": 2,
        "stream": True})
    assert status == 400                    # best_of with streaming


def test_request_validation_hardening(served):
    """Round-5 review regressions: non-dict JSON bodies and
    max_tokens < 1 return 400 (not AttributeError / silent 128)."""
    _, port, _, _ = served
    status, body = _post_json(port, "/v1/completions", [1, 2, 3])
    assert status == 400 and "error" in body
    status, body = _post_json(port, "/v1/completions", "hi")
    assert status == 400
    status, body = _post_json(
        port, "/v1/completions", {"prompt": [1, 5], "max_tokens": 0})
    assert status == 400 and "max_tokens" in body["error"]["message"]


def test_structured_stream_finish_reason_stop(served):
    """A structured stream that completes its grammar reports
    finish_reason 'stop' (the streaming map used to omit 'stop' and
    fall through to 'length', disagreeing with the blocking path)."""
    _, port, _, _ = served
    schema = {"type": "object", "required": ["ok"],
              "properties": {"ok": {"type": "boolean"}}}
    resp, conn = _post(port, "/v1/completions", {
        "prompt": [1, 5, 7], "max_tokens": 64, "stream": True,
        "temperature": 0.0,
        "response_format": {"type": "json_schema",
                            "json_schema": {"schema": schema}}})
    assert resp.status == 200
    finishes = []
    buf = b""
    while True:
        chunk = resp.read(1)
        if not chunk:
            break
        buf += chunk
        if buf.endswith(b"\n\n"):
            for line in buf.split(b"\n"):
                if line.startswith(b"data: ") and b"[DONE]" not in line:
                    d = json.loads(line[6:])
                    finishes.append(d["choices"][0]["finish_reason"])
            if b"[DONE]" in buf:
                break
            buf = b""
    conn.close()
    assert finishes[-1] == "stop"


def test_partial_pool_submit_cleans_up(tiny_params_mod, tiny_cfg_mod):
    """n>1 submit hitting a full queue cancels the already-submitted
    part of the pool instead of leaking streams that generate forever."""
    tok = BuiltinTokenizer(vocab_size=tiny_cfg_mod.vocab_size)
    cfg = ti.InferenceConfig(max_seq_len=tiny_cfg_mod.max_seq_len,
                             eos_token_id=-1)
    sched = ContinuousBatchingScheduler(tiny_params_mod, tiny_cfg_mod,
                                        cfg, batch_slots=1, max_queue=2,
                                        tokenizer=tok)
    eng = ServingEngine(sched, tokenizer=tok, model_name="t")
    srv = make_server(eng, host="127.0.0.1", port=0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        port = srv.server_address[1]
        status, body = _post_json(port, "/v1/completions", {
            "prompt": [1, 5], "max_tokens": 4, "n": 8})
        assert status == 429
        # the partial pool was cancelled: no orphan streams linger
        deadline = time.time() + 30
        while time.time() < deadline and eng._streams:
            time.sleep(0.2)
        assert not eng._streams
    finally:
        srv.shutdown()
        eng.shutdown()
