"""Training CLI - the `python src/train.py` equivalent (reference
src/train.py:36-72), with the same flags via mmda_tpu.config.

Usage:
  python -m mmda_tpu.cli.train --data mosei
  python -m mmda_tpu.cli.train --data mosei --use_confidNet True   # train_confid.sh
  python -m mmda_tpu.cli.train --data mosei --eval_mode micro \
         --learning_rate 1e-5 --dropout 0.7                        # train_micro.sh
  python -m mmda_tpu.cli.train --data synthetic --n_epoch 2        # hermetic smoke
"""

from __future__ import annotations

import json
import os

import numpy as np


def load_data(cfg):
    from mmda_tpu.data import load_splits, make_dataset

    if cfg.data == "synthetic":
        return make_dataset(num_train=512, num_dev=128, num_test=128,
                            max_len=cfg.max_seq_len), None
    data_dir = os.path.join(cfg.data_dir, cfg.data.upper())
    splits = load_splits(data_dir)
    emb_path = os.path.join(data_dir, "glove_emb.npy")
    emb = np.load(emb_path) if os.path.exists(emb_path) else None
    return splits, emb


def main(argv=None):
    from mmda_tpu.config import get_config
    from mmda_tpu.train.loop import Trainer
    from mmda_tpu.utils.logging import MetricLogger

    cfg = get_config(argv=argv)
    if cfg.use_wandb and "wandb" not in cfg.log_sinks:
        cfg = cfg.replace(log_sinks=tuple(cfg.log_sinks) + ("wandb",))
    print(cfg)

    if cfg.device != "tpu" or cfg.debug_nans or cfg.disable_jit:
        import jax

        if cfg.device != "tpu":
            # the reference's --device picks the CUDA card (src/config.py);
            # here it picks the JAX platform.  Env vars are NOT reliable for
            # this under the axon sitecustomize - the config update is.
            jax.config.update("jax_platforms", cfg.device)
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if cfg.disable_jit:
            jax.config.update("jax_disable_jit", True)

    data, pretrained_emb = load_data(cfg)

    # multi-run support: the reference parses --runs but never uses it
    # (src/config.py:110); here each run gets seed+i and its own name
    summaries = []
    from mmda_tpu.utils.timing import profile

    n_runs = max(cfg.runs, 1) if cfg.mode == "multirun" else 1
    for i in range(n_runs):
        run_cfg = cfg if n_runs == 1 else cfg.replace(
            seed=cfg.seed + i, name=f"{cfg.name}_r{i}")
        logger = MetricLogger(run_cfg.log_sinks, run_name=run_cfg.name)
        trainer = Trainer(run_cfg, data, pretrained_emb=pretrained_emb,
                          logger=logger)
        try:
            with profile(run_cfg.profile_dir):
                summaries.append(trainer.train())
        finally:
            trainer.close()   # drop process-global encoder hooks (pp/sp/ep)
    summary = summaries[-1]
    if n_runs > 1:
        import numpy as _np

        keys = [k for k in summary if k.startswith("test_") and
                isinstance(summary[k], (int, float))]
        agg = {f"mean_{k}": float(_np.mean([s[k] for s in summaries]))
               for k in keys}
        agg.update({f"std_{k}": float(_np.std([s[k] for s in summaries]))
                    for k in keys})
        print(json.dumps(agg, indent=2))
        summary = {**summary, **agg}

    print("=" * 50)
    print(f"Best epoch: {summary['best_epoch']}")
    for label, key in (("Accuracy", "test_acc"), ("F1 score", "test_f1"),
                       ("Precision", "test_precision"), ("Recall", "test_recall"),
                       ("MAE", "test_mae"), ("Corr", "test_corr"),
                       ("Acc2", "test_acc2")):
        if key in summary:
            print(f"{label}: {summary[key]}")
    out_path = os.path.join(cfg.ckpt_dir, f"summary_{cfg.name}.json")
    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({k: v for k, v in summary.items() if k != "history"}, f,
                  indent=2, default=float)
    logger.close()
    return summary


if __name__ == "__main__":
    main()
