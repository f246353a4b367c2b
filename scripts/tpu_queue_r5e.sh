#!/bin/bash
# Round-5 TPU queue, part E (supersedes parts C/D after the ragged-Q kernels
# landed mid-batch-5 — the bf16 A/B rows from bench_flash_bf16 mixed kernel
# versions; bench_flash_r5.py re-runs the full 2x2 coherently).
#   7 = unified flash matrix (bf16 x ragged 2x2 + threshold probes)
#   8 = batch-4 follow-ups, reordered: GRU T=256 true-streaming re-measure
#       (fwd+rev), post-readback-fix north-star epoch, then the
#       compiled-epoch A/B (exploratory, last)
set -u
cd "$(dirname "$0")/.."
BATCH=${1:?batch number}
LOG=${2:-benchmarks/r5_tpu_logs}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ==="
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "    rc=$rc  tail: $(tail -1 "$LOG/$name.log" 2>/dev/null | head -c 200)"
}

case "$BATCH" in
7)
  run bench_flash_r5 14400 python benchmarks/bench_flash_r5.py
  ;;
8)
  run bench_stream_gru256_fixed 2400 env BENCH_CELL=gru BENCH_TS=256 python benchmarks/bench_stream_rnn.py
  run bench_stream_gru256_fixed_rev 2400 env BENCH_CELL=gru BENCH_TS=256 BENCH_ORDER=rev python benchmarks/bench_stream_rnn.py
  run bench_epoch_postfix 3600 env BENCH_EPOCHS=3 python benchmarks/bench_epoch.py
  run bench_epoch_c16 3600 env BENCH_EPOCHS=3 BENCH_COMPILED=1 BENCH_SCAN_CHUNK=16 python benchmarks/bench_epoch.py
  run bench_epoch_c32 3600 env BENCH_EPOCHS=3 BENCH_COMPILED=1 BENCH_SCAN_CHUNK=32 python benchmarks/bench_epoch.py
  ;;
*)
  echo "unknown batch $BATCH"; exit 2;;
esac

echo "=== queue batch $BATCH done; logs in $LOG ==="
