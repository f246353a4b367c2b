"""Synthetic MOSEI/MOSI-shaped datasets for tests and benchmarks.

The real ETL (data/etl) needs the CMU-MultimodalSDK download + GloVe file; this
module generates arrays with the same shapes/statistics so the full training
stack runs hermetically (SURVEY.md §7 step 2: "include a synthetic-data
generator so the real SDK download is optional").

Shapes mirror the reference collate output (src/data_loader.py:59-122):
word ids, visual (FACET 35-dim), acoustic (COVAREP 74-dim), lengths, BERT
ids/type/mask, 7-dim label split into sentiment + 6 binary emotions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np


@dataclasses.dataclass(frozen=True)
class SyntheticSpec:
    num_examples: int = 512
    max_len: int = 32
    visual_size: int = 35
    acoustic_size: int = 74
    vocab_size: int = 2048
    bert_vocab_size: int = 30522
    num_classes: int = 6
    seed: int = 0
    aligned: bool = True      # False: per-modality lengths (unaligned MOSEI
                              # shape - the reference's empty stub at
                              # src/data_loader.py:133-135)


def make_split(spec: SyntheticSpec) -> Dict[str, np.ndarray]:
    """Generate one split as a dict of fixed-shape arrays.

    A weak learnable signal is planted: emotion labels correlate with the mean
    of the acoustic/visual streams, so smoke tests can assert loss decreases.
    """
    rng = np.random.default_rng(spec.seed)
    n, t = spec.num_examples, spec.max_len

    lengths = rng.integers(4, t + 1, size=n).astype(np.int32)
    tmask = (np.arange(t)[None, :] < lengths[:, None])

    text = rng.integers(2, spec.vocab_size, size=(n, t)).astype(np.int32)
    text[~tmask] = 1  # PAD=1 like the reference vocab (src/create_dataset.py:25-27)

    # z-normed per instance like the ETL (src/create_dataset.py:198-199)
    visual = rng.normal(size=(n, t, spec.visual_size)).astype(np.float32)
    acoustic = rng.normal(size=(n, t, spec.acoustic_size)).astype(np.float32)

    # plant signal in class-specific directions
    class_dirs_v = rng.normal(size=(spec.num_classes, spec.visual_size)).astype(np.float32)
    class_dirs_a = rng.normal(size=(spec.num_classes, spec.acoustic_size)).astype(np.float32)
    emo = (rng.uniform(size=(n, spec.num_classes)) < 0.3).astype(np.float32)
    visual += 0.5 * (emo @ class_dirs_v)[:, None, :]
    acoustic += 0.5 * (emo @ class_dirs_a)[:, None, :]
    visual[~tmask] = 0.0
    acoustic[~tmask] = 0.0

    sentiment = np.clip(rng.normal(scale=1.2, size=n) + emo.sum(1) - 0.9, -3, 3).astype(np.float32)

    s = t + 2  # BERT adds [CLS]/[SEP] (src/data_loader.py:87)
    # real BERT vocab: CLS=101, SEP=102; tiny test vocabs use 1/2
    cls_id, sep_id = (101, 102) if spec.bert_vocab_size > 103 else (1, 2)
    bert_ids = rng.integers(sep_id + 1, spec.bert_vocab_size, size=(n, s)).astype(np.int32)
    bert_ids[:, 0] = cls_id
    bert_mask = np.zeros((n, s), np.int32)
    for i, L in enumerate(lengths):
        bert_ids[i, L + 1] = sep_id
        bert_ids[i, L + 2:] = 0
        bert_mask[i, : L + 2] = 1
    bert_type = np.zeros((n, s), np.int32)

    out = {
        "text": text,
        "visual": visual,
        "acoustic": acoustic,
        "lengths": lengths,
        "bert_ids": bert_ids,
        "bert_type": bert_type,
        "bert_mask": bert_mask,
        "sentiment": sentiment,
        "emo_label": emo,
        "sample_weight": np.ones(n, np.float32),
    }

    if not spec.aligned:
        # unaligned: visual/acoustic streams get their own (longer) time axes
        tv, ta = 2 * t, 3 * t
        v_len = rng.integers(4, tv + 1, size=n).astype(np.int32)
        a_len = rng.integers(4, ta + 1, size=n).astype(np.int32)
        vis = rng.normal(size=(n, tv, spec.visual_size)).astype(np.float32)
        aco = rng.normal(size=(n, ta, spec.acoustic_size)).astype(np.float32)
        vis += 0.5 * (emo @ class_dirs_v)[:, None, :]
        aco += 0.5 * (emo @ class_dirs_a)[:, None, :]
        vis[~(np.arange(tv)[None, :] < v_len[:, None])] = 0.0
        aco[~(np.arange(ta)[None, :] < a_len[:, None])] = 0.0
        out["visual"] = vis
        out["acoustic"] = aco
        out["visual_lengths"] = v_len
        out["acoustic_lengths"] = a_len
    return out


def make_dataset(
    num_train: int = 512,
    num_dev: int = 128,
    num_test: int = 128,
    **kw,
) -> Dict[str, Dict[str, np.ndarray]]:
    base = SyntheticSpec(**kw)
    return {
        "train": make_split(dataclasses.replace(base, num_examples=num_train, seed=base.seed)),
        "dev": make_split(dataclasses.replace(base, num_examples=num_dev, seed=base.seed + 1)),
        "test": make_split(dataclasses.replace(base, num_examples=num_test, seed=base.seed + 2)),
    }
