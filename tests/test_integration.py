"""Full-chain integration: ETL (synthetic UR_FUNNY pickles) -> .npz splits ->
load_splits -> Trainer -> best-export -> serving Predictor."""

import os

import numpy as np

from mmda_tpu.config import Config
from mmda_tpu.data import load_splits
from mmda_tpu.data.etl.datasets import build_dataset
from mmda_tpu.serving import Predictor
from mmda_tpu.train.loop import Trainer
from tests.test_etl_urfunny import _write_urfunny_pickles


def test_etl_train_serve_chain(tmp_path):
    data_dir = str(tmp_path)
    _write_urfunny_pickles(os.path.join(data_dir, "UR_FUNNY"), n=24)
    build_dataset("ur_funny", data_dir, max_len=8)

    splits = load_splits(os.path.join(data_dir, "UR_FUNNY"))
    assert splits["train"]["emo_label"].shape[1] == 1

    cfg = Config(
        data="ur_funny", use_bert=False, hidden_size=8, embedding_size=8,
        batch_size=8, n_epoch=2, bucket_sizes=(8,), compute_dtype="float32",
        learning_rate=3e-3, log_sinks=(), name="chain",
        ckpt_dir=os.path.join(data_dir, "ckpt"),
    )
    tr = Trainer(cfg, splits, use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    assert "test_acc2" in summary

    # serve from the exported checkpoint via the on-disk contract
    pred = Predictor(
        cfg.replace(num_classes=1),
        visual_size=splits["train"]["visual"].shape[-1],
        acoustic_size=splits["train"]["acoustic"].shape[-1],
        vocab_size=int(splits["train"]["text"].max()) + 1,
        max_batch=8,
    )
    test = splits["test"]
    n_req = min(3, len(test["lengths"]))
    reqs = []
    for i in range(n_req):
        L = int(test["lengths"][i])
        reqs.append({
            "text": test["text"][i, :L],
            "visual": test["visual"][i, :L],
            "acoustic": test["acoustic"][i, :L],
            "bert_ids": test["bert_ids"][i, : L + 2],
            "bert_type": test["bert_type"][i, : L + 2],
            "bert_mask": test["bert_mask"][i, : L + 2],
        })
    out = pred(reqs)
    assert out["scores"].shape == (n_req, 1)
    assert np.isfinite(out["scores"]).all()
