"""Unified round-5 flash-attention matrix: bf16-operands x ragged-Q.

Two kernel changes landed this round (ops/pallas/attention.py):
  * bf16 matmul operands with f32 accumulation (da0f8d5) — the T=512
    device trace put the f32-operand kernels at 46.6% of the step;
  * ragged-Q tiling (79ff49f) — S = text_len + 2 is never a multiple of
    the 128 block, and the both-sides pad (514 -> 640) wasted ~55% of the
    QK/PV FLOPs plus ~15.8 ms/step of pad/slice HLOs.

This measures the full 2x2 at T=512 so each effect is attributable, plus
T=1024 and the attn_impl='auto' threshold probes (does bf16+ragged move
the measured flash boundaries at T=256 and the S=50 headline?).
Discipline: one subprocess per variant, base FIRST and LAST to bound
relay drift.  Ablation envs: MMDA_FLASH_F32=1 (f32 operands,
models/bert.py), MMDA_FLASH_RAGGED=0 (gridded pad-128 tiling).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_flash_r5.py
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = {"BENCH_STEPS": "8", "BENCH_REPS": "3"}

T512 = {"BENCH_B": "32", "BENCH_T": "512", "BENCH_ATTN": "auto"}

VARIANTS = [
    # the 2x2 (T=512, B=32): base = bf16 + ragged (today's defaults)
    ("t512_base", dict(T512)),
    ("t512_pad128", dict(T512, MMDA_FLASH_RAGGED="0")),
    ("t512_f32ops", dict(T512, MMDA_FLASH_F32="1")),
    ("t512_f32_pad128", dict(T512, MMDA_FLASH_F32="1",
                             MMDA_FLASH_RAGGED="0")),  # round-4 behavior
    # T=1024: ragged+bf16 measured 86.89 ms mid-queue; pair it
    ("t1024_base", {"BENCH_B": "8", "BENCH_T": "1024",
                    "BENCH_ATTN": "auto"}),
    ("t1024_f32_pad128", {"BENCH_B": "8", "BENCH_T": "1024",
                          "BENCH_ATTN": "auto", "MMDA_FLASH_F32": "1",
                          "MMDA_FLASH_RAGGED": "0"}),
    # auto-threshold probes: flash was not engaged at T=256 training and
    # was measured-rejected at the S=50 headline (+10.3 ms) with f32+pad128
    ("t256_auto_xla", {"BENCH_B": "64", "BENCH_T": "256",
                       "BENCH_ATTN": "auto"}),
    ("t256_flash", {"BENCH_B": "64", "BENCH_T": "256",
                    "BENCH_ATTN": "flash"}),
    ("s48_flash", {"BENCH_ATTN": "flash"}),
    # drift bound vs row 1
    ("t512_base_again", dict(T512)),
]


def main():
    timeout_s = int(os.environ.get("BENCH_TIMEOUT", "2400"))
    only = os.environ.get("BENCH_ONLY")  # comma-separated tags (queue resume)
    variants = VARIANTS if not only else [
        (t, d) for t, d in VARIANTS if t in only.split(",")]
    for tag, delta in variants:
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
