"""Ragged-Q flash attention A/B (round 5).

BERT sequences are text_len + 2 specials (data/loader.py:47), so the real
long-seq shapes (S = 514, 1026) are never multiples of the 128 flash block:
the gridded kernels padded both sides to the block (514 -> 640), wasting
~55% of the QK/PV FLOPs plus ~15.8 ms/step of pad/slice HLOs (T=512 device
trace, benchmarks/RESULTS.md round-5).  The ragged-Q kernels
(ops/pallas/attention.py, MMDA_FLASH_RAGGED gate) pad Q only to the 8-row
sublane tile.

Gap-accounting discipline: one subprocess per variant (benchmarks/subproc.py
rationale), base FIRST and LAST to bound relay drift, MMDA_FLASH_RAGGED=0 as
the old-behavior ablation.  Geometries match bench_gap_long.py /
bench_flash_bf16.py so rows are comparable across the round-5 tables.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_flash_ragged.py
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = {"BENCH_STEPS": "8", "BENCH_REPS": "3"}

VARIANTS = [
    ("t512_ragged", {"BENCH_B": "32", "BENCH_T": "512",
                     "BENCH_ATTN": "auto"}),
    ("t512_pad128", {"BENCH_B": "32", "BENCH_T": "512",
                     "BENCH_ATTN": "auto", "MMDA_FLASH_RAGGED": "0"}),
    ("t1024_ragged", {"BENCH_B": "8", "BENCH_T": "1024",
                      "BENCH_ATTN": "auto"}),
    ("t1024_pad128", {"BENCH_B": "8", "BENCH_T": "1024",
                      "BENCH_ATTN": "auto", "MMDA_FLASH_RAGGED": "0"}),
    ("t512_ragged_again", {"BENCH_B": "32", "BENCH_T": "512",
                           "BENCH_ATTN": "auto"}),  # drift bound vs row 1
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
