"""bf16-operand flash attention A/B (round 5).

The T=512 device trace put the f32-operand flash kernels at 46.6% of the
step (benchmarks/RESULTS.md round-5); the kernel now runs its matmuls in
the input dtype (bf16 from the model on TPU) with f32 accumulation.  This
harness measures the end-to-end effect with the gap-accounting discipline:
one subprocess per variant (benchmarks/subproc.py rationale), base FIRST
and LAST to bound relay drift, MMDA_FLASH_F32=1 as the old-behavior
ablation (models/bert.py call site).

Variants also probe whether bf16 operands MOVE the attn_impl='auto'
thresholds: flash was measured-rejected at S=50 (+10.3 ms) and not engaged
at T=256 with f32 operands — both re-measured here with bf16.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_flash_bf16.py
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = {"BENCH_STEPS": "8", "BENCH_REPS": "3"}

# (tag, env) — BENCH_B/BENCH_T are set per variant (long-seq geometries
# match bench_gap_long.py so rows are comparable across the two tables)
VARIANTS = [
    ("t512_base_bf16", {"BENCH_B": "32", "BENCH_T": "512",
                        "BENCH_ATTN": "auto"}),
    ("t512_flash_f32", {"BENCH_B": "32", "BENCH_T": "512",
                        "BENCH_ATTN": "auto", "MMDA_FLASH_F32": "1"}),
    ("t1024_base_bf16", {"BENCH_B": "8", "BENCH_T": "1024",
                         "BENCH_ATTN": "auto"}),
    ("t1024_flash_f32", {"BENCH_B": "8", "BENCH_T": "1024",
                         "BENCH_ATTN": "auto", "MMDA_FLASH_F32": "1"}),
    # threshold probes: does bf16 move the auto boundaries?
    ("t256_auto_xla", {"BENCH_B": "64", "BENCH_T": "256",
                       "BENCH_ATTN": "auto"}),
    ("t256_flash_bf16", {"BENCH_B": "64", "BENCH_T": "256",
                         "BENCH_ATTN": "flash"}),
    ("s48_flash_bf16", {"BENCH_ATTN": "flash"}),   # headline shape B=64/T=48
    ("t512_base_again", {"BENCH_B": "32", "BENCH_T": "512",
                         "BENCH_ATTN": "auto"}),   # drift bound vs row 1
]


def main():
    timeout_s = int(os.environ.get("BENCH_TIMEOUT", "2400"))
    for tag, delta in VARIANTS:
        env = dict(COMMON)
        env.update(os.environ)
        env.update(delta)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                env=env, capture_output=True, text=True, timeout=timeout_s)
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("{")), None)
            if proc.returncode != 0 or line is None:
                print(f"{tag:18s} FAILED rc={proc.returncode} "
                      f"stderr: {proc.stderr.strip()[-300:]}", flush=True)
                continue
            print(f"{tag:18s} {line}  (wall {time.perf_counter() - t0:.0f}s)",
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f"{tag:18s} TIMEOUT after {timeout_s}s", flush=True)


if __name__ == "__main__":
    main()
