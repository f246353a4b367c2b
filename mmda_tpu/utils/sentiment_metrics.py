"""Sentiment regression metrics (MOSEI/MOSI) - reference
src/utils/eval_metrics.py semantics, numpy-only.

The reference computes these for the sentiment-regression configs; the emotion
train loop never calls them (SURVEY.md C12) but they are part of the public
surface, so all of them are here: MAE, Pearson corr, acc7/acc5, binary acc/F1
with and without zero labels, weighted accuracy, extreme-MAE (|truth| > 2).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from sklearn.metrics import accuracy_score, f1_score


def multiclass_acc(preds: np.ndarray, truths: np.ndarray) -> float:
    """Rounded-bucket accuracy (src/utils/eval_metrics.py:7-15)."""
    return float(np.sum(np.round(preds) == np.round(truths)) / float(len(truths)))


def weighted_accuracy(preds: np.ndarray, truths: np.ndarray) -> float:
    """(tp * n/p + tn) / 2n over >0 binarization (src/utils/eval_metrics.py:18-26)."""
    true_label = truths > 0
    pred_label = preds > 0
    tp = float(np.sum(true_label & pred_label))
    tn = float(np.sum(~true_label & ~pred_label))
    p = float(np.sum(true_label))
    n = float(np.sum(~true_label))
    # all-positive / all-negative batches make the reference formula divide by
    # zero (src/utils/eval_metrics.py:18-26); degrade to plain accuracy of the
    # one class that exists instead of returning inf/nan
    if p == 0.0 or n == 0.0:
        return (tp + tn) / float(len(true_label)) if len(true_label) else float("nan")
    return (tp * (n / p) + tn) / (2 * n)


def extreme_mae(preds: np.ndarray, truths: np.ndarray) -> float:
    """MAE restricted to |truth| > 2 (src/utils/eval_metrics.py:28-35)."""
    sel = np.abs(truths) > 2.0
    if not sel.any():
        return float("nan")
    return float(np.mean(np.abs(preds[sel] - truths[sel])))


def eval_mosei_senti(results, truths, exclude_zero: bool = False,
                     verbose: bool = False) -> Dict[str, float]:
    """Full sentiment eval (src/utils/eval_metrics.py:37-78).  Same return
    keys: mae, corr, mult, f1, acc2, acc2_non0, acc7, acc5, mae_intensity."""
    preds = np.asarray(results, dtype=np.float64).reshape(-1)
    truth = np.asarray(truths, dtype=np.float64).reshape(-1)

    non_zeros = np.array([i for i, e in enumerate(truth) if e != 0], dtype=np.int64)

    preds_a7 = np.clip(preds, -3.0, 3.0)
    truth_a7 = np.clip(truth, -3.0, 3.0)
    preds_a5 = np.clip(preds, -2.0, 2.0)
    truth_a5 = np.clip(truth, -2.0, 2.0)

    mae = float(np.mean(np.abs(preds - truth)))
    corr = float(np.corrcoef(preds, truth)[0][1])
    mult_a7 = multiclass_acc(preds_a7, truth_a7)
    mult_a5 = multiclass_acc(preds_a5, truth_a5)

    if len(non_zeros):
        bt_non0 = truth[non_zeros] > 0
        bp_non0 = preds[non_zeros] > 0
        f_score_non0 = float(f1_score(bt_non0, bp_non0, average="weighted"))
        acc_2_non0 = float(accuracy_score(bt_non0, bp_non0))
    else:
        f_score_non0 = acc_2_non0 = float("nan")

    bt_has0 = truth >= 0
    bp_has0 = preds >= 0
    acc_2 = float(accuracy_score(bt_has0, bp_has0))
    f_score = float(f1_score(bt_has0, bp_has0, average="weighted"))
    mae_intensity = extreme_mae(preds, truth)

    out = {
        "mae": mae, "corr": corr, "mult": mult_a7, "f1": f_score,
        "acc2": acc_2, "acc2_non0": acc_2_non0,
        "acc7": mult_a7, "acc5": mult_a5, "mae_intensity": mae_intensity,
    }
    if verbose:
        print("-" * 50)
        for k, v in out.items():
            print(f"{k}: {v}")
        print("-" * 50)
    return out


def eval_mosi(results, truths, exclude_zero: bool = False) -> Dict[str, float]:
    return eval_mosei_senti(results, truths, exclude_zero)


def eval_binary(results, truths, verbose: bool = False) -> Dict[str, float]:
    """Binary classification eval (UR_FUNNY humor; src/utils/eval_metrics.py:83-92)."""
    acc_2 = float(accuracy_score(truths, results))
    f_score = float(f1_score(truths, results, average="weighted"))
    if verbose:
        print(f"F1 score: {round(f_score, 4)}  Accuracy: {round(acc_2, 4)}")
    return {"acc2": acc_2, "f1": f_score}
