"""Crash-isolated benchmark variants: run each variant in its own subprocess.

Round 3 lost ~11 h of TPU time because bench_long_seq.py ran every variant in
one process — the S=512 XLA compile crashed the axon relay and took the whole
queue (and the round's remaining hardware jobs) with it (VERDICT r3 weak #4,
benchmarks/RESULTS.md).  A pathological compile must cost ONE variant, not
the run: the parent re-execs itself per variant with a hard timeout and keeps
going on failure.

Usage pattern (see bench_long_seq.py):

    variants = [...]                       # list of string tags
    if run_variants_isolated(variants):    # parent: spawned children, done
        return
    tag = os.environ[VARIANT_ENV]          # child: measure ONE variant
"""

import json
import os
import subprocess
import sys
import time

VARIANT_ENV = "BENCH_VARIANT"


def run_variants_isolated(variants, timeout_s: int | None = None) -> bool:
    """In the parent process: spawn one child per variant tag (same argv,
    VARIANT_ENV set) with a timeout, streaming each child's output; return
    True.  In a child (VARIANT_ENV already set), or with BENCH_ISOLATE=0
    (share one process's compile warmup when shapes are known-safe): return
    False — the caller then measures current_variant() if set, else every
    variant in-process."""
    if os.environ.get(VARIANT_ENV):
        return False
    if os.environ.get("BENCH_ISOLATE", "1") == "0":
        return False
    timeout_s = timeout_s or int(os.environ.get("BENCH_TIMEOUT", "1200"))
    for tag in variants:
        env = dict(os.environ, **{VARIANT_ENV: str(tag)})
        t0 = time.perf_counter()
        try:
            proc = subprocess.run([sys.executable] + sys.argv, env=env,
                                  timeout=timeout_s)
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        if rc not in (0,):
            print(json.dumps({"variant": str(tag), "error": f"rc={rc}",
                              "wall_s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
    return True


def current_variant() -> str:
    return os.environ.get(VARIANT_ENV, "")
