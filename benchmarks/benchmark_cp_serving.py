"""Long-context SERVING measurement: the context-parallel scheduler
admits a 16k-token prompt (ring prefill over the sequence-sharded
pool, int8-compressed KV) and decodes against it — the scenario CP
exists for, measured end-to-end through the serving path.

Runs on an 8-virtual-device CPU mesh (multi-chip TPU hardware is not
available in this environment); the numbers demonstrate CAPABILITY and
scaling shape, not TPU throughput. Per-device KV for the 16k prompt is
1/8 of the context — the whole point: a context larger than one
device's attention working set is servable.

Usage (from repo root): python benchmarks/benchmark_cp_serving.py [S_CTX]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

import turboinfer_tpu as ti
from turboinfer_tpu.models import llama
from turboinfer_tpu.parallel import mesh as pmesh

S_CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 16384 - 64
MAX_NEW = 32
T = 18432          # cp_ctx defaults to (T - tail)//8*8 = 16384
cfg = ti.tiny_config(dtype=jnp.bfloat16, max_seq_len=T)
params = llama.init_params(jax.random.PRNGKey(0), cfg)
mesh = pmesh.make_mesh((8, 1), axis_names=("sp", "tp"),
                       devices=jax.devices()[:8])
icfg = ti.InferenceConfig(max_seq_len=T, temperature=0.0,
                          eos_token_id=-1, kv_cache_dtype="int8")

from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
sched = ContinuousBatchingScheduler(params, cfg, icfg, batch_slots=2,
                                    mesh=mesh, parallel="cp",
                                    cp_ctx=16384)
rng = np.random.default_rng(0)
long_prompt = [int(t) for t in rng.integers(1, 900, size=S_CTX)]
short = [int(t) for t in rng.integers(1, 900, size=64)]

t0 = time.perf_counter()
r1 = sched.submit(long_prompt, MAX_NEW)
r2 = sched.submit(short, MAX_NEW)
res = sched.run()
wall = time.perf_counter() - t0
n_out = sum(len(res[r].tokens) - n
            for r, n in ((r1, len(long_prompt)), (r2, len(short))))
kv_bytes = sched.cache.k_ctx.size  # int8: 1 byte/elem, whole pool
per_dev = kv_bytes // 8
print(f"CP serving: S_ctx={S_CTX} + 64-tok request, ring=8, int8 KV")
print(f"  admitted + decoded {n_out} tokens in {wall:.1f}s wall "
      f"(CPU virtual mesh; capability demo, not TPU perf)")
print(f"  seq-sharded K pool: {kv_bytes/1e6:.1f} MB total, "
      f"{per_dev/1e6:.1f} MB/device (1/8 of the context each)")
print(f"  outputs: long={res[r1].tokens[-4:]} short={res[r2].tokens[-4:]}")
assert len(res[r1].tokens) == len(long_prompt) + MAX_NEW
assert len(res[r2].tokens) == len(short) + MAX_NEW
print("OK")
