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
  # GRU T=256 streaming anomaly: reversed-order drift check BEFORE gating
  # (stream fwd was slower at T=256 than T=512 — physically implausible)
  run bench_stream_gru256_rev 2400 env BENCH_CELL=gru BENCH_TS=256 BENCH_ORDER=rev python benchmarks/bench_stream_rnn.py
  # VERDICT #2: epoch re-run with the new per-phase timers
  # (eval_time_s / post_eval_time_s attribute the 77 s non-train gap)
  run bench_epoch_phases 3600 env BENCH_EPOCHS=3 python benchmarks/bench_epoch.py
  # VERDICT #3: T=512 step gap accounting (subprocess-isolated variants,
  # base-first-and-last drift bound, device trace via BENCH_PROFILE)
  run bench_gap512 14400 python benchmarks/bench_gap_long.py
  # VERDICT #4: drift-robust serving matrix (two passes, opposite orders)
  run bench_serving_r5 10800 python benchmarks/bench_serving_r5.py
  # VERDICT #4: p50/p99 mixed-bucket latency reload
  run bench_serving_mixed 3600 python benchmarks/bench_serving.py --sections mixed
  ;;
*)
  echo "unknown batch $BATCH"; exit 2;;
esac

echo "=== queue batch $BATCH done; logs in $LOG ==="
