#!/bin/bash
# Round-5 TPU queue, part F (resumes part E, which died at the session
# snapshot with 4/10 flash-matrix variants done).  Priority order:
#   9 = north-star epoch post-readback-fix (VERDICT #2 completion), then
#       the remaining flash 2x2 rows (T=1024 coherent pair, auto-threshold
#       probes at T=256 and S=48, drift-bound re-run), then the GRU T=256
#       true-streaming re-measure (fwd+rev), then the exploratory
#       compiled-epoch A/Bs last.
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
9)
  run bench_epoch_postfix 3600 env BENCH_EPOCHS=3 python benchmarks/bench_epoch.py
  run bench_flash_r5_rest 10800 env \
    BENCH_ONLY=t512_base_again,t1024_base,t1024_f32_pad128,t256_auto_xla,t256_flash,s48_flash \
    python benchmarks/bench_flash_r5.py
  run bench_stream_gru256_fixed 2400 env BENCH_CELL=gru BENCH_TS=256 python benchmarks/bench_stream_rnn.py
  run bench_stream_gru256_fixed_rev 2400 env BENCH_CELL=gru BENCH_TS=256 BENCH_ORDER=rev python benchmarks/bench_stream_rnn.py
  run bench_epoch_c16 3600 env BENCH_EPOCHS=3 BENCH_COMPILED=1 BENCH_SCAN_CHUNK=16 python benchmarks/bench_epoch.py
  ;;
*)
  echo "unknown batch $BATCH"; exit 2;;
esac

echo "=== queue batch $BATCH done; logs in $LOG ==="
