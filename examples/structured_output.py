"""Constrained JSON generation example: ANY model (here: synthetic
random weights) emits output that json.loads accepts.

Run from the repo root:  python examples/structured_output.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")      # example runs anywhere

import turboinfer_tpu as ti                               # noqa: E402
from turboinfer_tpu.loader.synthetic import \
    create_synthetic_model                                # noqa: E402


def main():
    data = create_synthetic_model()
    eng = ti.InferenceEngine(data.params, data.config,
                             tokenizer=data.tokenizer)
    prompt = eng.encode("Give me a JSON object:")
    res = eng.generate_structured(prompt, max_new_tokens=200,
                                  temperature=0.7)
    print("raw text:", res.text)
    if res.finished:
        obj = json.loads(res.text)          # guaranteed to parse
        print("parsed:", obj)
    else:
        print("budget exhausted mid-object (prefix is still legal JSON)")


if __name__ == "__main__":
    main()
