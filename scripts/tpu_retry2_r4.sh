#!/bin/bash
# Round-4 retry queue #2: the jobs killed by the session restart at 14:40Z.
# fused_ln2 / fused_ln_flash2 already completed green in retry #1 (19.60 /
# 29.57 ms — both recorded in RESULTS.md); only the long-seq sweep and the
# reversed-order serving wdtype A/B remain.  Same crash isolation as
# scripts/tpu_queue_r4.sh.
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

# 1. long-seq flash at S=512/1024, fwd AND train (fwd+bwd + in-kernel dropout):
#    subprocess-isolated per variant; xla rows re-run from the warm cache
run bench_long_seq3 7200 env BENCH_S=512,1024 BENCH_GRAD=1 BENCH_TIMEOUT=1500 \
    python benchmarks/bench_long_seq.py

# 2. serving weight-dtype A/B in REVERSED variant order — decides whether the
#    round-4 "f32 fastest" surprise was ordering drift or real
run bench_serving_wdtype_rev 2400 env BENCH_WDTYPE_ORDER=rev \
    python benchmarks/bench_serving.py --sections wdtype

echo "=== retry2 queue done; logs in $LOG ==="
