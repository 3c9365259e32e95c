"""Parallel serving modes, end to end on a virtual device mesh.

Demonstrates the four product-tier parallelism paths (no pod needed —
this runs on 8 virtual CPU devices, the same mechanism the test suite
uses; on real hardware drop the virtual-device setup and the same code
spans chips):

  1. TP/DP   — InferenceEngine(mesh=...) / scheduler(mesh=...)
  2. PP      — InferenceEngine(parallel="pp"): layers + KV cache shard
               1/P per device (models larger than one chip's HBM)
  3. CP      — InferenceEngine(parallel="cp"): the prompt's KV cache
               sequence-shards over the mesh (contexts larger than one
               chip's HBM)
  4. EP      — MoE expert stacks shard over the mesh through the same
               engine decode

CLI equivalents: `serve --tp N`, `serve --pp-stages N`,
`generate --context-parallel N`, `serve --draft-model ...`.

Run: python examples/parallel_serving.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
import jax

# the demo needs 8 devices — run on the virtual CPU mesh even on a
# TPU host (on a real pod slice, drop these two lines)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import turboinfer_tpu as ti
from turboinfer_tpu.models import llama, moe
from turboinfer_tpu.parallel import mesh as pmesh, shardings

cfg = ti.tiny_config(dtype=jnp.float32).replace(num_layers=4)
params = llama.init_params(jax.random.PRNGKey(0), cfg)
icfg = ti.InferenceConfig(max_seq_len=128, temperature=0.0,
                          eos_token_id=-1)
prompt = [1, 17, 42, 256, 731]

ref = ti.InferenceEngine(params, cfg, icfg).generate(prompt, 12).tokens
print("single-device greedy:", ref)

# 1. tensor/data parallel -------------------------------------------------
tp_mesh = pmesh.make_mesh((2, 4))
eng = ti.InferenceEngine(params, cfg, icfg, mesh=tp_mesh)
assert eng.generate(prompt, 12).tokens == ref
print("TP/DP  (2x4 mesh): identical trajectory")

# 2. pipeline parallel ----------------------------------------------------
pp_mesh = pmesh.make_mesh((2, 1), axis_names=("pp", "tp"),
                          devices=jax.devices()[:2])
eng = ti.InferenceEngine(params, cfg, icfg, mesh=pp_mesh, parallel="pp",
                         pp_microbatches=2)
assert eng.generate(prompt, 12).tokens == ref
print("PP     (2 stages, layers+cache 1/2 per device): identical")

# 3. context parallel -----------------------------------------------------
cp_mesh = pmesh.make_mesh((4, 1), axis_names=("sp", "tp"),
                          devices=jax.devices()[:4])
eng = ti.InferenceEngine(params, cfg, icfg, mesh=cp_mesh, parallel="cp")
assert eng.generate(prompt, 12).tokens == ref
print("CP     (prompt cache seq-sharded over 4): identical")

# 4. expert parallel ------------------------------------------------------
moe_cfg = cfg.replace(architecture="mixtral", num_experts=4,
                      experts_per_token=2, num_layers=2)
moe_params = moe.init_params(jax.random.PRNGKey(1), moe_cfg)
moe_ref = ti.InferenceEngine(moe_params, moe_cfg, icfg).generate(
    prompt, 10).tokens
ep_mesh = pmesh.make_mesh((1, 4), devices=jax.devices()[:4])
eng = ti.InferenceEngine(moe_params, moe_cfg, icfg, mesh=ep_mesh,
                         param_specs=shardings.moe_param_specs())
assert eng.generate(prompt, 10).tokens == moe_ref
print("EP     (4 experts sharded over 4 devices): identical")

print("all parallel modes trajectory-identical to single-device")
