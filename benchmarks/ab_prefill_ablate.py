"""In-process ablation: how much prefill device time do the RoPE /
RMSNorm / SwiGLU elementwise chains actually cost? Monkeypatch each op
to a cheap stand-in, rebuild the jit program, chain-difference wall.
NOT a correctness run — outputs are garbage in ablated variants.
Usage (from repo root): python benchmarks/ab_prefill_ablate.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from turboinfer_tpu.config import llama7b_config
from turboinfer_tpu.kernels import dispatch, ops
from turboinfer_tpu.loader.synthetic import create_synthetic_quantized_model
from turboinfer_tpu.models import llama

S, B, REPS = 512, 1, 6
cfg = llama7b_config(dtype=jnp.bfloat16, max_seq_len=1024)
data = create_synthetic_quantized_model(cfg, bits=4, group_size=64)
params = dispatch.prepare_params(data.params); del data
cache0 = llama.init_cache(cfg, B, max_seq=1024)

orig_rope = ops.apply_rope
orig_norm = ops.rms_norm
orig_glu = ops.glu


def measure(label):
    @jax.jit
    def prefill(params, tokens, cache):
        idx = jnp.full((tokens.shape[0],), tokens.shape[1] - 1, jnp.int32)
        logits, cache = llama.forward(params, cfg, tokens, cache,
                                      logit_idx=idx, fresh_prefill=True)
        return logits[:, 0], cache

    def chain(k, seed):
        tokens = jnp.full((B, S), 1 + seed, jnp.int32)
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r, _ = prefill(params, tokens, cache0)
            tokens = jnp.concatenate(
                [tokens[:, :-1],
                 jnp.argmax(r, -1, keepdims=True).astype(jnp.int32)], 1)
        np.asarray(r)
        return time.perf_counter() - t0

    chain(1, 0)
    t1 = min(chain(1, 10 + i) for i in range(REPS))
    t4 = min(chain(4, 40 + i) for i in range(REPS))
    dev = (t4 - t1) / 3.0 * 1e3
    print(f"{label}: device wall {dev:.2f} ms/prefill", flush=True)
    return dev


base = measure("base")
ops.apply_rope = lambda x, positions, *a, **k: x
measure("no-rope")
ops.apply_rope = orig_rope
ops.rms_norm = lambda x, w, *a, **k: x * w.astype(x.dtype)
measure("no-norm (scale only)")
ops.rms_norm = orig_norm
ops.glu = lambda gate, up, act="silu": gate
measure("no-glu (gate passthrough)")
ops.glu = orig_glu
measure("base again")
