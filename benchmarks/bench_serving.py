"""Serving-path throughput on the real TPU.

Measures the full request->result path (host pack, device_put, compiled
forward, host readback — every call materializes numpy results, so relay
timing pathologies don't apply):

  base section:
    batch64     offline Predictor, full 64-row batches
    batch8      small batches (padding to max_batch=64)
    server8     PredictionServer with 8 concurrent single-request clients
                (micro-batching coalesces them)
    server_tok  raw-text requests through the native WordPiece path
  mixed section (round 3):
    mixed_load  p50/p90/p99 per-request latency under 4 concurrent clients
                with gamma-distributed lengths across buckets 16/32/48

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_serving.py
       [--sections base,mixed]   (mixed alone skips the base compiles)
"""

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_req(rng, cfg, L=48):
    return {
        "text": rng.integers(2, 100, size=L).astype(np.int32),
        "visual": rng.normal(size=(L, cfg.visual_size)).astype(np.float32),
        "acoustic": rng.normal(size=(L, cfg.acoustic_size)).astype(np.float32),
        "bert_ids": rng.integers(4, 2000, size=L + 2).astype(np.int32),
        "bert_type": np.zeros(L + 2, np.int32),
        "bert_mask": np.ones(L + 2, np.int32),
    }


def _timed(tag, n_utts, fn, reps=5):
    fn()  # warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{tag:12s} {n_utts / med:9.0f} utt/s   ({med * 1e3:7.2f} ms / "
          f"{n_utts} utts)", flush=True)


def run_base(cfg, params, bert_cfg, tok, rng):
    from mmda_tpu.serving import Predictor
    from mmda_tpu.serving_server import PredictionServer

    B = cfg.batch_size
    pred = Predictor(cfg, params=params, bert_cfg=bert_cfg, max_batch=B,
                     tokenizer=tok, word2id={})
    reqs64 = [_make_req(rng, cfg) for _ in range(B)]
    _timed("batch64", B, lambda: pred(reqs64))
    reqs8 = reqs64[:8]
    _timed("batch8", 8, lambda: pred(reqs8))

    server = PredictionServer(pred, max_wait_ms=5.0)

    def server_round():
        outs = [None] * 8

        def client(i):
            outs[i] = server.predict(_make_req(rng, cfg), timeout_s=120)

        ts = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()

    _timed("server8", 8, server_round)

    text_reqs = [{"text": " ".join(
        rng.choice([f"w{i:04d}" for i in range(2000)], size=40))}
        for _ in range(B)]
    _timed("server_tok", B, lambda: pred(text_reqs))
    server.close()
    print("stats:", pred.stats, flush=True)


def run_mixed(cfg, params, bert_cfg, tok, rng):
    """p50/p99 per-request latency under concurrent mixed-bucket load: 4
    client threads firing single requests with gamma-distributed lengths;
    the micro-batching worker groups same-bucket requests."""
    from mmda_tpu.serving import Predictor
    from mmda_tpu.serving_server import PredictionServer

    cfg_mb = cfg.replace(bucket_sizes=(16, 32, 48))
    pred_mb = Predictor(cfg_mb, params=params, bert_cfg=bert_cfg, max_batch=16,
                        tokenizer=tok, word2id={})
    server_mb = PredictionServer(pred_mb, max_wait_ms=5.0)
    server_mb.warmup()
    print("mixed_load warmup done", flush=True)
    n_clients, n_per_client = 4, 40
    lengths = np.clip(rng.gamma(2.2, 5.0, size=n_clients * n_per_client)
                      .astype(int) + 2, 2, 48)
    lat = []
    lat_lock = threading.Lock()

    def mixed_client(ci):
        for j in range(n_per_client):
            L = int(lengths[ci * n_per_client + j])
            t0 = time.perf_counter()
            server_mb.predict(_make_req(rng, cfg_mb, L), timeout_s=120)
            dt = time.perf_counter() - t0
            with lat_lock:
                lat.append(dt)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=mixed_client, args=(i,))
          for i in range(n_clients)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    lat_ms = np.sort(np.array(lat)) * 1e3
    print(f"mixed_load   {len(lat) / wall:9.0f} req/s   "
          f"p50={np.percentile(lat_ms, 50):7.1f} ms  "
          f"p90={np.percentile(lat_ms, 90):7.1f} ms  "
          f"p99={np.percentile(lat_ms, 99):7.1f} ms  "
          f"({n_clients} clients x {n_per_client} reqs, buckets 16/32/48)",
          flush=True)
    server_mb.close()


def run_wdtype(cfg, params, bert_cfg, tok, rng):
    """bf16 vs f32 BERT weight STORAGE for serving (round 3): the forward
    casts kernels to bf16 per call either way; bf16 storage halves the
    weight HBM reads.  Auto-on for TPU serving — this section measures it."""
    from mmda_tpu.serving import Predictor

    B = cfg.batch_size
    reqs = [_make_req(rng, cfg) for _ in range(B)]
    # int8 (round 4): weight-only per-channel quantized kernels — half of
    # bf16's weight reads; accuracy bound in tests/test_int8_serving.py
    # BENCH_WDTYPE_ORDER=rev reverses the variant order: the first round-4
    # run measured f32 (run first) fastest, which is inconsistent with an
    # HBM-read-bound model — reversing decides ordering-artifact vs real.
    dts = (None, "bfloat16", "int8")
    if os.environ.get("BENCH_WDTYPE_ORDER", "") == "rev":
        dts = tuple(reversed(dts))
    for dt in dts:
        pred = Predictor(cfg, params=params, bert_cfg=bert_cfg, max_batch=B,
                         tokenizer=tok, word2id={}, bert_weights_dtype=dt)
        tag = f"w{dt or 'f32'}"
        _timed(f"batch64_{tag}", B, lambda p=pred: p(reqs))
        _timed(f"batch8_{tag}", 8, lambda p=pred: p(reqs[:8]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="base,mixed")
    args = ap.parse_args()
    sections = set(args.sections.split(","))

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mmda_tpu.config import Config
    from mmda_tpu.data.etl.tokenizer import WordPieceTokenizer
    from mmda_tpu.models import get_model
    from mmda_tpu.models.bert import BertConfig

    cfg = Config(use_bert=True, batch_size=64, compute_dtype="bfloat16",
                 data="mosei", name="srv", bucket_sizes=(48,), log_sinks=())
    bert_cfg = BertConfig.base()
    init_fn, _ = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)

    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        + [f"w{i:04d}" for i in range(2000)])}
    tok = WordPieceTokenizer(vocab)
    rng = np.random.default_rng(0)

    if "base" in sections:
        run_base(cfg, params, bert_cfg, tok, rng)
    if "mixed" in sections:
        run_mixed(cfg, params, bert_cfg, tok, rng)
    if "wdtype" in sections:
        run_wdtype(cfg, params, bert_cfg, tok, rng)


if __name__ == "__main__":
    main()
