#!/bin/bash
# Round-5 TPU queue, part C — runs AFTER tpu_queue_r5b.sh batch 4 exits
# (separate file: never edit a bash script while bash executes it).
#   5 = bf16-operand flash attention A/B (the round-5 mixed-precision
#       kernel change; CPU equivalence + Mosaic lowering tests must be
#       green BEFORE this batch is queued — round-4 discipline)
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
5)
  run bench_flash_bf16 14400 python benchmarks/bench_flash_bf16.py
  ;;
*)
  echo "unknown batch $BATCH"; exit 2;;
esac

echo "=== queue batch $BATCH done; logs in $LOG ==="
