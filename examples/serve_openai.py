"""Serving example: start the OpenAI-compatible server in-process and
talk to it with plain HTTP (any OpenAI client works the same way with
base_url="http://127.0.0.1:8000/v1").

Run from the repo root:  python examples/serve_openai.py

Uses the synthetic model (no downloads), mirroring the other examples;
point `load_model` at a GGUF/safetensors/TINQ checkpoint for real text.
"""

import http.client
import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")        # example runs anywhere

import turboinfer_tpu as ti                                  # noqa: E402
from turboinfer_tpu.engine.scheduler import \
    ContinuousBatchingScheduler                              # noqa: E402
from turboinfer_tpu.loader.synthetic import \
    create_synthetic_model                                   # noqa: E402
from turboinfer_tpu.serve import ServingEngine, make_server  # noqa: E402


def main():
    data = create_synthetic_model()
    sched = ContinuousBatchingScheduler(
        data.params, data.config,
        ti.InferenceConfig(max_seq_len=data.config.max_seq_len),
        batch_slots=4, decode_burst=4)
    eng = ServingEngine(sched, tokenizer=data.tokenizer,
                        model_name="synthetic-tiny")
    srv = make_server(eng, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    print(f"serving on http://127.0.0.1:{port}/v1")

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

    # blocking completion
    conn.request("POST", "/v1/completions", json.dumps({
        "prompt": "hello world", "max_tokens": 16, "temperature": 0.7,
        "logprobs": True}), {"Content-Type": "application/json"})
    body = json.loads(conn.getresponse().read())
    print("completion:", repr(body["choices"][0]["text"]))
    print("usage:", body["usage"])

    # streaming chat
    conn.request("POST", "/v1/chat/completions", json.dumps({
        "messages": [{"role": "user", "content": "Tell me something."}],
        "max_tokens": 16, "stream": True}),
        {"Content-Type": "application/json"})
    resp = conn.getresponse()
    print("streamed: ", end="")
    for block in resp.read().decode().split("\n\n"):
        if not block.startswith("data: ") or block == "data: [DONE]":
            continue
        delta = json.loads(block[6:])["choices"][0].get("delta", {})
        print(delta.get("content", ""), end="")
    print()
    conn.close()

    srv.shutdown()
    eng.shutdown()


if __name__ == "__main__":
    main()
