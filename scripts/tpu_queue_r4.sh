#!/bin/bash
# Round-4 TPU job queue (VERDICT r3 next-steps #1): every deferred hardware
# measurement, crash-isolated (one process per job, timeouts, logs to files —
# NEVER pipe long TPU jobs through grep/tail, buffering swallows output when
# a later variant crashes; CLAUDE.md).  Run when the axon relay is back:
#   bash scripts/tpu_queue_r4.sh [logdir]
# Jobs are ordered by value; a crash/timeout moves on to the next.
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

# 1. headline sanity after the round-3 losses-dict change + new JSON fields
run bench_headline 1800 python bench.py

# 2. flash in-kernel dropout A/B at the headline shape (VERDICT #2):
#    does deleting the attn-probs mask tensor beat the 18.7 ms headline?
run bench_attn_flash 1800 env BENCH_ATTN=flash python bench.py
#    fused short-seq kernel composed with fast_dropout (round-3 set 2 only
#    measured it against float-dropout base)
run bench_attn_fused 1800 env BENCH_ATTN=fused python bench.py

# 3. long-seq flash validation at S=512/1024 (VERDICT #8) — subprocess-
#    isolated per variant by bench_long_seq itself
run bench_long_seq 4800 env BENCH_S=512,1024 BENCH_TIMEOUT=1200 \
    python benchmarks/bench_long_seq.py

# 4. MoE top-2 row (VERDICT weak #3)
run bench_moe_top2 2400 env BENCH_MOE_TOPK=2 python benchmarks/bench_moe.py

# 5. serving weights-dtype A/B (bf16 storage default)
run bench_serving_wdtype 2400 python benchmarks/bench_serving.py --sections wdtype


# 6. fused LN(x + dropout(h)) Pallas sites (round-4 kernel) vs headline
run bench_fused_ln 1800 env BENCH_FUSED_LN=1 python bench.py
# 6b. composed: fused LN sites + in-kernel-dropout flash attention
run bench_fused_ln_flash 1800 env BENCH_FUSED_LN=1 BENCH_ATTN=flash python bench.py

echo "=== queue done; logs in $LOG ==="
