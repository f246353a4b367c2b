#!/bin/bash
# Round-4 retry queue #3: jobs killed by the 16:09Z session restart plus the
# adam_mu_dtype A/B.  S=512 long-seq rows completed green in retry #2 and
# are recorded in RESULTS.md (flash train WINS: 39.25 vs 60.08 ms); only the
# S=1024 rows, the reversed-order serving wdtype A/B, and the bf16-mu bench
# remain.  Same crash isolation as scripts/tpu_queue_r4.sh.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r4_tpu_logs}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ==="
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "    rc=$rc  tail: $(tail -1 "$LOG/$name.log" 2>/dev/null | head -c 200)"
}

# 1. long-seq S=1024 fwd+train rows (xla fwd re-runs from the warm cache)
run bench_long_seq4 7200 env BENCH_S=1024 BENCH_GRAD=1 BENCH_TIMEOUT=1800 \
    python benchmarks/bench_long_seq.py

# 2. serving weight-dtype A/B in REVERSED variant order — decides whether the
#    round-4 "f32 fastest" surprise was ordering drift or real
run bench_serving_wdtype_rev 2400 env BENCH_WDTYPE_ORDER=rev \
    python benchmarks/bench_serving.py --sections wdtype

# 3. Adam first-moment bf16 storage (cfg.adam_mu_dtype) vs the 18.24 ms
#    headline: halves mu's HBM read+write per step (~0.65 ms candidate)
run bench_mu_bf16 1800 env BENCH_MU_DTYPE=bfloat16 python bench.py

echo "=== retry3 queue done; logs in $LOG ==="
