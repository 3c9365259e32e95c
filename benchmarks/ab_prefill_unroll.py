"""In-process A/B: prefill layer-scan unroll factor (chain-difference
device wall). Decode unroll is a measured dead end (cache copies); the
prefill fresh path writes the cache through the ALIASED Pallas writer,
so unrolled bodies may keep in-place updates.
Usage (from repo root): python benchmarks/ab_prefill_unroll.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from turboinfer_tpu.config import llama7b_config
from turboinfer_tpu.kernels import dispatch
from turboinfer_tpu.loader.synthetic import create_synthetic_quantized_model
from turboinfer_tpu.models import llama

S, B, REPS = 512, 1, 6
cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=1024)
data = create_synthetic_quantized_model(cfg, bits=4, group_size=64)
params = dispatch.prepare_params(data.params); del data
cache0 = llama.init_cache(cfg, B, max_seq=1024)


def build(unroll):
    os.environ["TURBOINFER_LAYER_UNROLL"] = str(unroll)

    @jax.jit
    def prefill(params, tokens, cache, tag):
        idx = jnp.full((tokens.shape[0],), tokens.shape[1] - 1, jnp.int32)
        logits, cache = llama.forward(params, cfg, tokens, cache,
                                      logit_idx=idx, fresh_prefill=True)
        return logits[:, 0] + 0.0 * tag, cache
    return prefill


def measure(unroll):
    prefill = build(unroll)
    tag = jnp.float32(unroll)

    def chain(k, seed):
        tokens = jnp.full((B, S), 1 + seed, jnp.int32)
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r, _ = prefill(params, tokens, cache0, tag)
            tokens = jnp.concatenate(
                [tokens[:, :-1],
                 jnp.argmax(r, -1, keepdims=True).astype(jnp.int32)], 1)
        np.asarray(r)
        return time.perf_counter() - t0

    chain(1, 0)
    t1 = min(chain(1, 10 + i) for i in range(REPS))
    t4 = min(chain(4, 40 + i) for i in range(REPS))
    dev = (t4 - t1) / 3.0 * 1e3
    print(f"unroll={unroll}: device wall {dev:.2f} ms/prefill "
          f"(chain1 {t1*1e3:.0f} chain4 {t4*1e3:.0f})", flush=True)
    return dev


for u in (1, 2, 4, 8, 1):
    measure(u)
