"""T=512 step gap accounting (VERDICT r4 item 3): decompose the long-seq
full-MISA step and measure >=2 mitigations per major term in the HBM-bound
regime where S=50 economics can flip sign.

Design: each variant is ONE subprocess running bench.py (crash isolation —
a pathological compile costs one variant, benchmarks/subproc.py rationale)
at B=32/T=512 with env deltas.  The base variant runs FIRST and LAST so
relay drift over the run is bounded by the A..A disagreement.  A device
trace of the base step is captured via BENCH_PROFILE (the relay exposes
xplane as of round 5) and summarized host-side by trace_summary.py.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_gap_long.py
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROFILE_DIR = os.path.join(ROOT, "benchmarks", "r5_tpu_logs", "profile",
                           "t512")

BASE_ENV = {
    "BENCH_B": "32", "BENCH_T": "512", "BENCH_STEPS": "8", "BENCH_REPS": "3",
    "BENCH_ATTN": "auto",
}

# (tag, env deltas) — mitigations per major term:
#   attention: attn_xla (kernel vs XLA), flash block sweep bq64/bq256/bk512
#   towers:    towers_xla (streaming kernel vs XLA scan)
#   dropout:   dropout_off (total cost), fastdrop_off (uint8+recompute vs
#              float-draw)
#   memory:    remat (per-layer checkpoint — rejected at S=50, retry here)
VARIANTS = [
    ("base", {}),
    ("attn_xla", {"BENCH_ATTN": "xla"}),
    ("towers_xla", {"BENCH_PALLAS": "0"}),
    ("dropout_off", {"BENCH_DROPOUT0": "1"}),
    ("fastdrop_off", {"BENCH_FASTDROP": "0"}),
    ("remat", {"BENCH_REMAT": "1"}),
    ("flash_bq256", {"MMDA_FLASH_BQ": "256", "MMDA_FLASH_BK": "256"}),
    ("flash_bk512", {"MMDA_FLASH_BK": "512"}),
    ("flash_bq64", {"MMDA_FLASH_BQ": "64"}),
    ("base_profiled", {"BENCH_PROFILE": PROFILE_DIR}),
    ("base_again", {}),      # drift bound: compare with the first base row
]


def main():
    timeout_s = int(os.environ.get("BENCH_TIMEOUT", "2400"))
    results = {}
    for tag, delta in VARIANTS:
        # outer env wins over BASE_ENV (lets a CPU smoke shrink shapes)
        env = dict(BASE_ENV)
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
                print(f"{tag:16s} FAILED rc={proc.returncode} "
                      f"stderr: {proc.stderr.strip()[-300:]}", flush=True)
                continue
            row = json.loads(line)
            results[tag] = row
            print(f"{tag:16s} {row['ms_per_step']:8.2f} ms/step  "
                  f"{row['value']:8.1f} utt/s  mfu {row.get('mfu')}  "
                  f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)
        except subprocess.TimeoutExpired:
            print(f"{tag:16s} TIMEOUT after {timeout_s}s", flush=True)

    if "base" in results and "base_again" in results:
        a = results["base"]["ms_per_step"]
        b = results["base_again"]["ms_per_step"]
        drift = abs(a - b) / min(a, b)
        print(f"\nA..A drift: {a:.2f} vs {b:.2f} ms ({100 * drift:.1f}%) — "
              f"deltas smaller than this are NOISE", flush=True)
    print(json.dumps({t: r.get("ms_per_step") for t, r in results.items()}))


if __name__ == "__main__":
    main()
