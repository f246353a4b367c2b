#!/bin/bash
# Round-4 queue #4: end-to-end FULL-train-step A/B at T=512 — does the new
# attn_impl='auto' default (flash for training at S>=512) win on the product
# step, not just the bert-tower microbench (bench_long_seq)?  B=32 keeps the
# XLA variant's saved S^2 probs activations comfortably inside HBM so the
# comparison is time, not memory.  Crash isolation as scripts/tpu_queue_r4.sh.
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

run bench_t512_xla  2400 env BENCH_B=32 BENCH_T=512 BENCH_ATTN=xla  python bench.py
run bench_t512_auto 2400 env BENCH_B=32 BENCH_T=512 BENCH_ATTN=auto python bench.py

echo "=== retry4 queue done; logs in $LOG ==="
