#!/bin/bash
# Round-4 retry queue: the jobs that failed on the tile-illegal block specs
# (fixed in commit "Fix TPU tile-illegal Pallas block specs"), plus the new
# train-mode long-seq variants (fwd+bwd, dropout ON) that exercise the
# blockwise backward + in-kernel dropout.  Same crash isolation as
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

# 1. fused LN(x + dropout(h)) sites vs the 18.24 ms headline (bwd fix)
run bench_fused_ln2 1800 env BENCH_FUSED_LN=1 python bench.py
# 2. composed: fused LN + in-kernel-dropout flash attention
run bench_fused_ln_flash2 1800 env BENCH_FUSED_LN=1 BENCH_ATTN=flash python bench.py

# 3. long-seq flash at S=512/1024, fwd AND train (fwd+bwd + dropout):
#    subprocess-isolated per variant; xla fwd rows re-run from the warm cache
run bench_long_seq2 7200 env BENCH_S=512,1024 BENCH_GRAD=1 BENCH_TIMEOUT=1500 \
    python benchmarks/bench_long_seq.py

echo "=== retry queue done; logs in $LOG ==="
