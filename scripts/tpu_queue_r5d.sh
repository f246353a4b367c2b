#!/bin/bash
# Round-5 TPU queue, part D — runs AFTER tpu_queue_r5b.sh batch 4 exits
# (separate file: never edit a bash script while bash executes it).
#   6 = ragged-Q flash attention A/B (pad-to-8 vs pad-to-128 Q side;
#       CPU equivalence + Mosaic lowering green before queueing —
#       tests/test_pallas_attention.py, tests/test_tpu_lowering.py)
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
6)
  run bench_flash_ragged 14400 python benchmarks/bench_flash_ragged.py
  ;;
*)
  echo "unknown batch $BATCH"; exit 2;;
esac

echo "=== queue batch $BATCH done; logs in $LOG ==="
