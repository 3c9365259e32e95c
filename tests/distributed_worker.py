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
     mesh reproduces the same trajectory.

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

    print("DISTRIBUTED_OK", flush=True)


if __name__ == "__main__":
    main()
