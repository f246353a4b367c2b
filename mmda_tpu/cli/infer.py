"""Inference CLI - net-new surface: the reference's src/inference.py is a
one-line TODO stub (reference src/inference.py:1).

Loads the best-on-dev checkpoint exported by training
(checkpoints/best_model_MISA[_C]_{data}.msgpack), runs batched prediction over
a split (or synthetic data), prints emotion metrics, and writes predictions.

Usage:
  python -m mmda_tpu.cli.infer --data mosei --mode test
  python -m mmda_tpu.cli.infer --data synthetic --mode test --missing_modality visual
"""

from __future__ import annotations

import json
import os

import numpy as np


def main(argv=None):
    import jax

    from mmda_tpu.config import get_config
    from mmda_tpu.cli.train import load_data
    from mmda_tpu.data.loader import ArrayLoader
    from mmda_tpu.models import get_model
    from mmda_tpu.models.bert import BertConfig
    from mmda_tpu.train import checkpoint as ckpt
    from mmda_tpu.train.step import make_eval_step
    from mmda_tpu.utils.metrics import get_accuracy, get_metrics

    cfg = get_config(argv=argv)
    if cfg.device != "tpu":
        jax.config.update("jax_platforms", cfg.device)
    data, pretrained_emb = load_data(cfg)
    split = data[cfg.mode if cfg.mode in data else "test"]

    init_fn, fwd_fn = get_model(cfg.model)
    from mmda_tpu.models.bert import bert_config_for

    bert_cfg = bert_config_for(cfg)
    template = init_fn(
        jax.random.PRNGKey(0), cfg,
        visual_size=split["visual"].shape[-1],
        acoustic_size=split["acoustic"].shape[-1],
        vocab_size=int(split["text"].max()) + 1,
        bert_cfg=bert_cfg,
        pretrained_emb=pretrained_emb,
    )
    name = ckpt.best_model_name(cfg)
    if not ckpt.checkpoint_exists(cfg.ckpt_dir, name):
        raise FileNotFoundError(
            f"{cfg.ckpt_dir}/{name}.msgpack not found - train first "
            f"(python -m mmda_tpu.cli.train --data {cfg.data})")
    params = ckpt.load_checkpoint(cfg.ckpt_dir, name, template)

    eval_step = make_eval_step(cfg, fwd_fn, bert_cfg)
    loader = ArrayLoader(split, batch_size=cfg.batch_size, shuffle=False)

    # hidden-representation export (reference save_hidden parity,
    # src/utils/tools.py:52-60): the 6 fused shared/private vectors
    import jax as _jax

    @_jax.jit
    def hidden_step(params, batch):
        out = fwd_fn(params, cfg, batch, bert_cfg=bert_cfg, deterministic=True)
        if out.shared_t is None:
            # non-MISA families (EF_LSTM/LF_DNN/MULT) have no shared/private
            # factorization; export scores as the hidden representation, like
            # serving.Predictor does
            return out.scores
        return _jax.numpy.concatenate(
            [out.private_t, out.private_v, out.private_a,
             out.shared_t, out.shared_v, out.shared_a], axis=1)

    scores, labels, truths, tcps, hiddens = [], [], [], [], []
    for batch in loader:
        out = eval_step(params, batch)
        # one batched readback per batch (each np.asarray costs a relay RTT)
        out, hid, sw, emo = jax.device_get(
            (out, hidden_step(params, batch), batch.sample_weight,
             batch.emo_label))
        w = np.asarray(sw) > 0
        scores.append(out["scores"][w])
        labels.append(out["labels"][w])
        tcps.append(out["tcp"][w])
        truths.append(np.asarray(emo)[w])
        hiddens.append(np.asarray(hid)[w])
    scores = np.concatenate(scores)
    labels = np.concatenate(labels)
    truths = np.concatenate(truths)
    tcps = np.concatenate(tcps)
    hiddens = np.concatenate(hiddens)

    metrics = get_metrics(truths, labels)
    metrics["acc"] = get_accuracy(truths, labels)
    print(json.dumps(metrics, indent=2, default=float))

    out_path = os.path.join(cfg.ckpt_dir, f"predictions_{cfg.name}_{cfg.mode}.npz")
    np.savez_compressed(out_path, scores=scores, labels=labels,
                        truths=truths, tcp=tcps, hidden=hiddens)
    print(f"predictions written to {out_path}")
    return metrics


if __name__ == "__main__":
    main()
