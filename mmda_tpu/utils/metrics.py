"""Multi-label emotion metrics - exact reference semantics.

These are the parity-check numbers, so they reproduce
reference src/utils/eval.py behaviorally:

  * `get_accuracy`: per-sample multilabel Jaccard accuracy (:14-31), vectorized
    (the reference loops in Python over 1871x6), rounded to 4 decimals like the
    reference;
  * `get_metrics`: same dict keys (acc, f1, precision, recall, micro_*,
    weighted_*) computed with sklearn exactly as the reference does (:33-65).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from sklearn import metrics as skm


def get_accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Per-sample Jaccard: |true AND pred| / |true OR pred| (with 0/0 -> 0/1),
    averaged over samples, rounded to 4 decimals (src/utils/eval.py:14-31)."""
    y_true = np.asarray(y_true) > 0
    y_pred = np.asarray(y_pred) > 0
    inter = np.sum(y_true & y_pred, axis=1).astype(np.float64)
    union = np.sum(y_true | y_pred, axis=1).astype(np.float64)
    union = np.where(union <= 0, 1.0, union)
    acc = float(np.mean(inter / union))
    return round(acc, 4)


def get_metrics(y_true: np.ndarray, y_pred: np.ndarray) -> Dict[str, float]:
    """Multilabel accuracy + macro/micro/weighted P/R/F1
    (src/utils/eval.py:33-65; keys preserved for wandb-name parity,
    src/solver.py:244-282)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    out = {"acc": get_accuracy(y_true, y_pred)}
    for avg, prefix in (("macro", ""), ("micro", "micro_"), ("weighted", "weighted_")):
        out[f"{prefix}f1"] = skm.f1_score(y_true, y_pred, average=avg, zero_division=0)
        out[f"{prefix}precision"] = skm.precision_score(
            y_true, y_pred, average=avg, zero_division=0)
        out[f"{prefix}recall"] = skm.recall_score(
            y_true, y_pred, average=avg, zero_division=0)
    # reference key names: f1/precision/recall are the macro ones
    return out


def select_by_eval_mode(values: Dict[str, float], eval_mode: str) -> Dict[str, float]:
    """The wandb log payload per eval_mode (src/solver.py:244-282)."""
    prefix = {"macro": "", "micro": "micro_", "weighted": "weighted_"}[eval_mode]
    return {
        "test_f_score": values[f"{prefix}f1"],
        "test_precision": values[f"{prefix}precision"],
        "test_recall": values[f"{prefix}recall"],
        "test_acc2": values["acc"],
    }
