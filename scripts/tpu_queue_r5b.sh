#!/bin/bash
# Round-5 TPU queue, part B — runs AFTER tpu_queue_r5.sh batch 3 exits
# (a separate file because editing a bash script while bash executes it
# changes the running program; never touch a live queue script).
# Jobs act on batch-3 follow-ups:
#   4 = compiled-epoch A/B (host-stacked chunked scans vs free-running
#       per-step dispatch — the north-star 27.0-vs-18.25 ms/step gap)
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
4)
  # GRU T=256 after the _route fix: the prior "stream_pallas" rows at this
  # shape actually measured the MIS-ROUTED gridded whole-T kernel (bb=8,
  # 4 serialized batch blocks); this is the first TRUE streaming number.
  # Both orders (fwd + rev) since the prior result at this shape surprised.
  run bench_stream_gru256_fixed 2400 env BENCH_CELL=gru BENCH_TS=256 python benchmarks/bench_stream_rnn.py
  run bench_stream_gru256_fixed_rev 2400 env BENCH_CELL=gru BENCH_TS=256 BENCH_ORDER=rev python benchmarks/bench_stream_rnn.py
  # VERDICT #2 follow-up: does the host-stacked chunked scan close the
  # free-running dispatch gap?  chunk=16 then chunk=32 (same compiled
  # program per bucket; chunk is a leading scan length, so each size is
  # one new compile per bucket)
  run bench_epoch_c16 3600 env BENCH_EPOCHS=3 BENCH_COMPILED=1 BENCH_SCAN_CHUNK=16 python benchmarks/bench_epoch.py
  run bench_epoch_c32 3600 env BENCH_EPOCHS=3 BENCH_COMPILED=1 BENCH_SCAN_CHUNK=32 python benchmarks/bench_epoch.py
  # reversed-order guard: re-run the per-step baseline LAST so drift over
  # the queue is bounded (round-4 lesson: act only on order-stable gaps)
  run bench_epoch_perstep_again 3600 env BENCH_EPOCHS=3 python benchmarks/bench_epoch.py
  ;;
*)
  echo "unknown batch $BATCH"; exit 2;;
esac

echo "=== queue batch $BATCH done; logs in $LOG ==="
