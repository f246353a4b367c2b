"""Summarize a jax.profiler chrome-trace (vm.trace.json.gz) into a device-time
attribution table.

The axon relay exposes real device traces as of round 5 (profile_probe.py,
benchmarks/r5_tpu_logs/profile/).  Each XLA-op event carries `source`
(file:line), `tf_op` (the jax op path, including any jax.named_scope
segments), `hlo_category`, `model_flops` and `bytes_accessed` — enough to
build the gap-accounting tables VERDICT r4 item 3 asks for without any
host-side ablation.

Usage:
  python benchmarks/trace_summary.py <vm.trace.json.gz> [--steps N] [--top K]

--steps divides totals by the number of profiled step repetitions so the
table reads in ms/step.  Output: totals by named scope (if the model was
annotated with jax.named_scope), by source line, by HLO category, and a
fwd/bwd split (jvp() vs transpose(jvp()) path segments).

Pure stdlib — safe to run on the 1-core host while the TPU queue is busy.
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import re

# tf_op path segments that are harness structure, not user scopes.
_STRUCTURAL = re.compile(
    r"^(jit\(.*\)|jvp\(.*\)|transpose\(jvp\(.*\)\)|checkpoint|remat.*|"
    r"custom_vjp.*|while|body|cond|scan|branch.*|None)$"
)


def load_device_ops(path: str):
    """Return the XLA-op events (pid=device, tid='XLA Ops') from a trace."""
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    op_tids = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e.get("args", {}).get("name") == "XLA Ops"
        and e["pid"] in dev_pids
    }
    return [
        e
        for e in events
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids
    ]


def scope_of(tf_op: str) -> str:
    """First non-structural tf_op segment = the innermost jax.named_scope
    chain (or the primitive when the model has no scopes)."""
    segs = [s for s in tf_op.split("/") if s]
    user = [s.rstrip(":") for s in segs if not _STRUCTURAL.match(s)]
    if not user:
        return "<unscoped>"
    # Drop the trailing primitive (dot_general, mul, ...) if a scope precedes.
    return user[0] if len(user) == 1 else "/".join(user[:-1])


def direction_of(tf_op: str) -> str:
    if "transpose(jvp(" in tf_op:
        return "bwd"
    if "jvp(" in tf_op:
        return "fwd"
    return "other"  # optimizer update, loss scalars, rng


def summarize(path: str, steps: int, top: int) -> None:
    ops = load_device_ops(path)
    if not ops:
        print(f"no device XLA-op events in {path}")
        return

    by_scope = collections.Counter()
    by_pair = collections.Counter()
    by_src = collections.Counter()
    by_cat = collections.Counter()
    by_dir = collections.Counter()
    flops_by_scope = collections.Counter()
    bytes_by_scope = collections.Counter()
    total_us = 0.0

    for e in ops:
        dur = e.get("dur", 0.0)
        a = e.get("args") or {}
        tf_op = a.get("tf_op", "")
        src = a.get("source", "<none>")
        src = src.rsplit("/", 1)[-1]
        scope = scope_of(tf_op)
        total_us += dur
        by_scope[scope] += dur
        by_pair[(scope, src)] += dur
        by_src[src] += dur
        by_cat[a.get("hlo_category", "<none>")] += dur
        by_dir[direction_of(tf_op)] += dur
        flops_by_scope[scope] += int(a.get("model_flops", 0) or 0)
        bytes_by_scope[scope] += int(a.get("raw_bytes_accessed", 0) or 0)

    ms = 1000.0 * steps  # us -> ms, per step

    print(f"device XLA-op time: {total_us / ms:.3f} ms/step "
          f"({len(ops)} events / {steps} steps)")

    print("\n-- by direction --")
    for k, v in by_dir.most_common():
        print(f"  {v / ms:9.3f} ms  {100 * v / total_us:5.1f}%  {k}")

    print(f"\n-- by scope (top {top}) --")
    for k, v in by_scope.most_common(top):
        fl = flops_by_scope[k] / steps
        by = bytes_by_scope[k] / steps
        gfs = fl / (v / steps) / 1e3 if v else 0.0  # flops/us = MFLOP/ms
        gbs = by / (v / steps) / 1e3 if v else 0.0
        print(f"  {v / ms:9.3f} ms  {100 * v / total_us:5.1f}%  "
              f"{gfs:8.0f} GF/s {gbs:7.1f} GB/s  {k[:90]}")

    print(f"\n-- by source line (top {top}) --")
    for k, v in by_src.most_common(top):
        print(f"  {v / ms:9.3f} ms  {100 * v / total_us:5.1f}%  {k}")

    print(f"\n-- by HLO category --")
    for k, v in by_cat.most_common():
        print(f"  {v / ms:9.3f} ms  {100 * v / total_us:5.1f}%  {k}")

    print(f"\n-- by (scope, source) (top {top}) --")
    for (s, src), v in by_pair.most_common(top):
        print(f"  {v / ms:9.3f} ms  {100 * v / total_us:5.1f}%  "
              f"{s[:40]:40s} {src}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--steps", type=int, default=3,
                    help="profiled repetitions (divide totals)")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()
    summarize(args.trace, args.steps, args.top)


if __name__ == "__main__":
    main()
