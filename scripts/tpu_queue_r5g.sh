#!/bin/bash
# Round-5 TPU queue, part G (run after part F drains):
#   10 = fastser checkpoint receipts at bert-base scale (bench_ckpt: the
#        round-3 numbers were 24-62 s full saves with the flax codec),
#        then a fresh T=512 device trace at the new bf16+ragged flash base
#        (the round-5 mid trace attributed 46.6% to f32-operand kernels and
#        15.8 ms to pad/slice — both were since removed), then a headline
#        sanity run.
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
10)
  run bench_ckpt_fastser 2400 python benchmarks/bench_ckpt.py --device cpu
  run bench_ckpt_flax 2400 env MMDA_CKPT_CODEC=flax python benchmarks/bench_ckpt.py --device cpu
  run bench_t512_profile 2400 env BENCH_B=32 BENCH_T=512 BENCH_ATTN=auto \
    BENCH_PROFILE="$LOG/profile/t512_r5g" python bench.py
  run bench_headline_sanity 2400 python bench.py
  # fwd-only inference crossover with the bf16+ragged kernels (the auto
  # inference threshold is still the round-4 'XLA through S=1024' line)
  run bench_infer_crossover 7200 env BENCH_S=512,1024 BENCH_B=8 \
    python benchmarks/bench_long_seq.py
  ;;
*)
  echo "unknown batch $BATCH"; exit 2;;
esac

echo "=== queue batch $BATCH done; logs in $LOG ==="
