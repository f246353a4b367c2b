#!/bin/bash
# Round-5 TPU job queue (VERDICT r4 next-steps): crash-isolated, one process
# per job, timeouts, logs to files (never pipe long TPU jobs through
# grep/tail — CLAUDE.md).  Usage:
#   bash scripts/tpu_queue_r5.sh <batch> [logdir]
# Batches let us interleave code-writing with hardware time:
#   1 = no-new-code items (epoch north-star re-capture, profiler retry)
#   2 = streaming recurrence kernel A/B (after lowering tests pass)
#   3 = T=512 gap accounting + serving drift-robust matrix
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
1)
  # VERDICT #2: north-star epoch wall-clock at today's defaults
  run bench_epoch 3600 python benchmarks/bench_epoch.py
  # VERDICT #7: one bounded jax.profiler.trace attempt through the relay
  run profile_probe 1800 python benchmarks/profile_probe.py
  ;;
2)
  # VERDICT #1: streaming (time-chunked) recurrence kernel tower-pair A/B
  run bench_stream_lstm 3600 env BENCH_CELL=lstm python benchmarks/bench_stream_rnn.py
  run bench_stream_gru 3600 env BENCH_CELL=gru python benchmarks/bench_stream_rnn.py
  # end-to-end: full MISA step at T=512/B=32 with kernelized towers
  # (BENCH_ATTN=auto matches the round-4 187.57 ms comparator row)
  run bench_t512_stream 3600 env BENCH_B=32 BENCH_T=512 BENCH_STEPS=8 BENCH_ATTN=auto python bench.py
  # VERDICT #7 (carried from batch 1, which was interrupted after
  # bench_epoch): one bounded jax.profiler.trace attempt through the relay
  run profile_probe 1800 python benchmarks/profile_probe.py
  ;;
3)
  # VERDICT #3: T=512 step gap accounting (subprocess-isolated variants)
  run bench_gap512 7200 python benchmarks/bench_gap_long.py
  # VERDICT #4: drift-robust serving matrix (interleaved A/B/A, both orders)
  run bench_serving_r5 7200 python benchmarks/bench_serving_r5.py
  ;;
*)
  echo "unknown batch $BATCH"; exit 2;;
esac

echo "=== queue batch $BATCH done; logs in $LOG ==="
