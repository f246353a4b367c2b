#!/bin/bash
# Round-4 queue #5: re-run the T=512 end-to-end full-train-step A/B after the
# footprint-aware LSTM block gate (the first attempt faulted the Pallas LSTM
# at 40 MiB scoped VMEM — commit f834c1c); plus a T=256 row that exercises
# the NEW 8-row-block kernel geometry on hardware.  Crash isolation as
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

# end-to-end attn auto win at T=512 (auto resolves to flash in training)
run bench_t512_xla2  2400 env BENCH_B=32 BENCH_T=512 BENCH_ATTN=xla  python bench.py
run bench_t512_auto2 2400 env BENCH_B=32 BENCH_T=512 BENCH_ATTN=auto python bench.py

# T=256: LSTM kernel's new BB=8 grid on hardware (attn stays xla per auto)
run bench_t256 2400 env BENCH_B=64 BENCH_T=256 BENCH_ATTN=auto python bench.py

echo "=== retry5 queue done; logs in $LOG ==="
