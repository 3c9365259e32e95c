"""Beam-search XProf trace on the tiny benchmark model: where do the
~3 ms/step go? (The r3 'dispatch floor' theory was wrong — beam wall
time is device-bound.)
Usage (repo root, real TPU): python benchmarks/profile_beam_trace.py [BEAMS] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from benchmark_inference import make_engine

BEAMS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64

eng = make_engine()
eng.generate_beam_search([1, 5, 9], N, beam_size=BEAMS)   # compile
t0 = time.perf_counter()
eng.generate_beam_search([1, 5, 9], N, beam_size=BEAMS)
print(f"wall {(time.perf_counter()-t0)*1e3:.1f} ms for {N} steps",
      flush=True)

import shutil
shutil.rmtree("/tmp/trace_beam", ignore_errors=True)
jax.profiler.start_trace("/tmp/trace_beam")
eng.generate_beam_search([1, 5, 9], N, beam_size=BEAMS)
jax.profiler.stop_trace()

import glob
import json

from xprof.convert import raw_to_tool_data as rtd
d = glob.glob("/tmp/trace_beam/**/*.xplane.pb", recursive=True)
out, _ = rtd.xspace_to_tool_data(d, "framework_op_stats", {})
s = out.decode() if isinstance(out, bytes) else str(out)
tbl = json.loads(s)[0]
cols = [c["id"] for c in tbl["cols"]]
rows = [dict(zip(cols, [c["v"] if c else None for c in r["c"]]))
        for r in tbl["rows"]]
rows = [r for r in rows if r.get("host_or_device") == "Device"]
rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
tot = sum(r.get("total_self_time") or 0 for r in rows)
print(f"device total self time: {tot/N/1000:.3f} ms/step")
for r in rows[:18]:
    print(f"  {r['total_self_time']/N:>9.1f}us/step "
          f"{int(r['occurrences']):>6}  {str(r['operation'])[-70:]}")
