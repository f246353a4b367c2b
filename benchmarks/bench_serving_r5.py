"""Drift-robust serving matrix (VERDICT r4 item 4).

Round 4 showed in-process serving A/Bs drift up to ~2x through the relay
(the wdtype table flipped when the variant order was reversed), so this
harness:
  * runs every variant in its OWN subprocess (fresh tunnel dispatch state),
  * runs the whole matrix TWICE — forward order then reversed order,
  * reports per-variant p50 + spread from both passes and flags any
    pairwise ordering the two passes disagree on (those rows are NOISE).

Matrix rows (the never-timed hardware rows called out by the verdict):
  live_f32 / live_bf16 / live_int8   — Predictor bert_weights_dtype
  aot_bf16 / aot_int8                — ExportedPredictor from export_model
Each row measures full-batch B=64 and padded B=8 calls (request -> numpy
result, host pack + device_put + compiled forward + readback).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_serving_r5.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ["live_f32", "live_bf16", "live_int8", "aot_bf16", "aot_int8"]
VARIANT_ENV = "SERVE_VARIANT"
REPS = 9


def child(tag: str) -> None:
    import jax

    if os.environ.get("SERVE_SMOKE") == "1":
        # force CPU for the code-path smoke — env vars are IGNORED under the
        # axon sitecustomize; only this config call works (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mmda_tpu.config import Config
    from mmda_tpu.models import get_model
    from mmda_tpu.models.bert import BertConfig

    cfg = Config(use_bert=True, batch_size=64, max_seq_len=48,
                 compute_dtype="bfloat16", data="mosei", name="serve_r5",
                 bucket_sizes=(48,))
    # SERVE_SMOKE=1: tiny BERT for the CPU harness smoke (code-path check
    # only — hardware rows always use bert-base)
    bert_cfg = (BertConfig.tiny(vocab_size=2001)
                if os.environ.get("SERVE_SMOKE") == "1"
                else BertConfig.base())
    init_fn, _ = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)

    rng = np.random.default_rng(0)

    def make_req(L=48):
        return {
            "text": rng.integers(2, 100, size=L).astype(np.int32),
            "visual": rng.normal(size=(L, cfg.visual_size)).astype(np.float32),
            "acoustic": rng.normal(
                size=(L, cfg.acoustic_size)).astype(np.float32),
            "bert_ids": rng.integers(4, 2000, size=L + 2).astype(np.int32),
            "bert_type": np.zeros(L + 2, np.int32),
            "bert_mask": np.ones(L + 2, np.int32),
        }

    if tag.startswith("live_"):
        from mmda_tpu.serving import Predictor

        wdt = {"f32": "float32", "bf16": "bfloat16", "int8": "int8"}[
            tag.split("_")[1]]
        pred = Predictor(cfg, params=params, bert_cfg=bert_cfg, max_batch=64,
                         bert_weights_dtype=wdt)
    else:
        from mmda_tpu.serving_export import ExportedPredictor, export_model

        wdt = {"bf16": "bfloat16", "int8": "int8"}[tag.split("_")[1]]
        out_dir = f"/tmp/mmda_aot_{wdt}"
        if os.environ.get("SERVE_SMOKE") == "1":
            out_dir += "_smoke"     # never share artifacts with real runs
        if not os.path.exists(os.path.join(out_dir, "manifest.json")):
            export_model(cfg, params, out_dir, bert_cfg=bert_cfg,
                         max_batch=64, bucket_sizes=(48,), weights_dtype=wdt)
        pred = ExportedPredictor(out_dir)

    out = {"variant": tag}
    for B in (64, 8):
        reqs = [make_req() for _ in range(B)]
        pred(reqs)                                   # warmup/compile
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            pred(reqs)
            times.append((time.perf_counter() - t0) * 1e3)
        times.sort()
        out[f"b{B}_p50_ms"] = round(times[len(times) // 2], 2)
        out[f"b{B}_spread_pct"] = round(
            100 * (times[-2] - times[1]) / times[len(times) // 2], 1)
        if B == 64:
            out["utt_s_b64"] = round(64e3 / times[len(times) // 2], 1)
    print("RESULT " + json.dumps(out), flush=True)


def main() -> None:
    tag = os.environ.get(VARIANT_ENV)
    if tag:
        child(tag)
        return

    timeout_s = int(os.environ.get("BENCH_TIMEOUT", "2400"))
    rows = {}                                   # variant -> [pass1, pass2]
    for pass_i, order in enumerate((VARIANTS, VARIANTS[::-1])):
        print(f"--- pass {pass_i + 1}: order {order} ---", flush=True)
        for tag in order:
            env = dict(os.environ, **{VARIANT_ENV: tag})
            try:
                proc = subprocess.run([sys.executable] + sys.argv, env=env,
                                      capture_output=True, text=True,
                                      timeout=timeout_s)
                line = next((l for l in proc.stdout.splitlines()
                             if l.startswith("RESULT ")), None)
                if proc.returncode != 0 or line is None:
                    print(f"{tag:10s} FAILED rc={proc.returncode} "
                          f"{proc.stderr.strip()[-300:]}", flush=True)
                    continue
                row = json.loads(line[len("RESULT "):])
                rows.setdefault(tag, []).append(row)
                print(f"{tag:10s} b64 {row['b64_p50_ms']:8.2f} ms "
                      f"(+-{row['b64_spread_pct']}%)  "
                      f"b8 {row['b8_p50_ms']:7.2f} ms  "
                      f"{row['utt_s_b64']:8.1f} utt/s", flush=True)
            except subprocess.TimeoutExpired:
                print(f"{tag:10s} TIMEOUT", flush=True)

    print("\n--- order-agreement table (p50 ms, pass1 / pass2) ---",
          flush=True)
    for tag, rs in rows.items():
        if len(rs) == 2:
            a, b = rs[0]["b64_p50_ms"], rs[1]["b64_p50_ms"]
            drift = abs(a - b) / min(a, b) * 100
            print(f"{tag:10s} b64 {a:8.2f} / {b:8.2f}  (drift {drift:5.1f}%)"
                  f"   b8 {rs[0]['b8_p50_ms']:7.2f} / {rs[1]['b8_p50_ms']:7.2f}",
                  flush=True)

    # pairwise ordering agreement: a conclusion stands only if both passes
    # rank the pair the same way AND the gap exceeds both passes' drift
    tags = [t for t in VARIANTS if len(rows.get(t, [])) == 2]
    print("\n--- conclusions both orders agree on (b64 p50) ---", flush=True)
    for i in range(len(tags)):
        for j in range(i + 1, len(tags)):
            t1, t2 = tags[i], tags[j]
            d1 = rows[t1][0]["b64_p50_ms"] - rows[t2][0]["b64_p50_ms"]
            d2 = rows[t1][1]["b64_p50_ms"] - rows[t2][1]["b64_p50_ms"]
            if d1 * d2 > 0:
                faster = t2 if d1 > 0 else t1
                gap = min(abs(d1), abs(d2))
                print(f"  {faster} beats {t2 if faster == t1 else t1} "
                      f"in BOTH orders (min gap {gap:.2f} ms)", flush=True)
            else:
                print(f"  {t1} vs {t2}: ORDERS DISAGREE — noise", flush=True)


if __name__ == "__main__":
    main()
