"""Data subsystem: offline ETL -> fixed-shape arrays -> host loader.

Split format (the framework's on-disk contract, produced by data/etl or
data/synthetic): one .npz per split with keys matching models.Batch fields
(text, visual, acoustic, lengths, bert_ids, bert_type, bert_mask, sentiment,
emo_label[, sample_weight]).
"""

import os
from typing import Dict

import numpy as np

from mmda_tpu.data.loader import ArrayLoader
from mmda_tpu.data.synthetic import SyntheticSpec, make_dataset, make_split

SPLITS = ("train", "dev", "test")


def save_splits(out_dir: str, splits: Dict[str, Dict[str, np.ndarray]]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, arrays in splits.items():
        np.savez_compressed(os.path.join(out_dir, f"{name}.npz"), **arrays)


def load_splits(data_dir: str) -> Dict[str, Dict[str, np.ndarray]]:
    out = {}
    for name in SPLITS:
        path = os.path.join(data_dir, f"{name}.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} not found - run the ETL (python -m mmda_tpu.cli.etl) "
                f"or use --data synthetic")
        with np.load(path) as z:
            out[name] = {k: z[k] for k in z.files}
    return out


__all__ = ["ArrayLoader", "SyntheticSpec", "make_dataset", "make_split",
           "save_splits", "load_splits", "SPLITS"]
