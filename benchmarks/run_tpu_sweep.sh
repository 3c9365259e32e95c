#!/usr/bin/env bash
# One-command TPU measurement sweep (run from the repo root when the
# chip is reachable). Each step runs under timeout so a tunnel drop
# mid-sweep cannot hang the run; results accumulate in
# benchmarks/sweep_results/.
set -u
mkdir -p benchmarks/sweep_results
R=benchmarks/sweep_results
stamp=$(date +%Y%m%d-%H%M%S)

run() {
  local name="$1"; shift
  echo "=== $name ==="
  timeout "${SWEEP_STEP_TIMEOUT:-900}" "$@" 2>&1 \
    | tee "$R/${stamp}-${name}.log" | tail -5
}

# headline bench (tiny-int4 e2e) — the driver's metric
run headline-tiny python bench.py

# 7B-shape decode: int4 B=1 / B=8, int8 B=1, paged, fp8 KV
run 7b-int4-b1   python benchmarks/profile_decode_min.py 1 960 4 64 6 1024
run 7b-int4g256  python benchmarks/profile_decode_min.py 1 960 4 256 6 1024
run 7b-int8-b1   python benchmarks/profile_decode_min.py 1 960 8 64 6 1024
run 7b-int4-b8   python benchmarks/profile_decode_min.py 8 960 4 64 6 1024
TURBOINFER_PROF_KV=fp8 \
run 7b-int4-fp8kv python benchmarks/profile_decode_min.py 1 960 4 64 6 1024

# prefill MFU
run 7b-prefill   python benchmarks/profile_prefill.py

# serving (continuous batching, Poisson load) — batched admission TTFT
run serving      python benchmarks/benchmark_serving.py

# 7B north-star through the engine
BENCH_CONFIG=7b-int4 run headline-7b python bench.py

echo "sweep done -> $R/${stamp}-*.log"
