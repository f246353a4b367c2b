#!/bin/bash
# Round-4 queue #6: T=256 full-step re-run after the bwd-calibrated LSTM
# footprint gate (towers fall back to the XLA scan at T=256; attn stays XLA
# per auto).  Crash isolation as scripts/tpu_queue_r4.sh.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r4_tpu_logs}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ==="
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "    rc=$?  tail: $(tail -1 "$LOG/$name.log" 2>/dev/null | head -c 200)"
}
run bench_t256_2 2400 env BENCH_B=64 BENCH_T=256 BENCH_ATTN=auto python bench.py
echo "=== retry6 queue done ==="
