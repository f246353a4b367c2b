"""ConfidNet confidence-quality metrics (VERDICT r2 weak #8)."""

import numpy as np

from mmda_tpu.utils.confidence_metrics import confidence_metrics


def test_perfectly_ranked_confidence():
    """tcp high on correct cells, low on errors -> AUPRs ~ 1, separable
    means, near-zero FPR@95TPR."""
    rng = np.random.default_rng(0)
    N, C = 50, 6
    truth = (rng.random((N, C)) > 0.5).astype(np.float32)
    pred = truth.copy()
    pred[:10] = 1.0 - pred[:10]                     # first 10 rows all wrong
    tcp = np.where(pred == truth, 0.9, 0.1).astype(np.float32)
    scores = np.where(truth > 0, 0.9, 0.1).astype(np.float32)

    m = confidence_metrics(scores, tcp, pred, truth)
    assert m["aupr_error"] > 0.99
    assert m["aupr_success"] > 0.99
    assert m["fpr_at_95tpr"] < 0.05
    assert m["mean_tcp_correct"] > 0.8 > 0.2 > m["mean_tcp_error"]
    assert abs(m["error_rate"] - 10 / 50) < 1e-9


def test_tcp_mse_matches_regression_target():
    """tcp == truth*score exactly -> tcp_mse == 0; constant-off-by-d -> d^2."""
    rng = np.random.default_rng(1)
    N, C = 40, 6
    truth = (rng.random((N, C)) > 0.5).astype(np.float64)
    scores = rng.random((N, C))
    pred = (scores > 0.35).astype(np.float64)
    tcp = truth * scores
    assert confidence_metrics(scores, tcp, pred, truth)["tcp_mse"] == 0.0
    m = confidence_metrics(scores, np.clip(tcp + 0.1, 0, 1.1), pred, truth)
    np.testing.assert_allclose(m["tcp_mse"], 0.01, rtol=1e-6)


def test_anti_ranked_confidence_scores_badly():
    """Confidence HIGH on errors must score WORSE than random on
    failure prediction."""
    rng = np.random.default_rng(2)
    N, C = 50, 6
    truth = (rng.random((N, C)) > 0.5).astype(np.float32)
    pred = truth.copy()
    pred[:25] = 1.0 - pred[:25]
    tcp_good = np.where(pred == truth, 0.9, 0.1)
    tcp_bad = np.where(pred == truth, 0.1, 0.9)
    scores = np.full((N, C), 0.5, np.float32)
    good = confidence_metrics(scores, tcp_good, pred, truth)
    bad = confidence_metrics(scores, tcp_bad, pred, truth)
    assert good["aupr_error"] > 0.99 > 0.6 > bad["aupr_error"]


def test_degenerate_all_correct():
    truth = np.ones((8, 6), np.float32)
    pred = np.ones((8, 6), np.float32)
    scores = np.full((8, 6), 0.9, np.float32)
    tcp = np.full((8, 6), 0.8, np.float32)
    m = confidence_metrics(scores, tcp, pred, truth)
    assert np.isnan(m["aupr_error"])        # no errors to rank
    assert np.isnan(m["mean_tcp_error"])
    assert m["error_rate"] == 0.0


def test_trainer_reports_confidnet_quality(tmp_path):
    """End-to-end: use_confidNet training summary contains finite conf_*
    metrics computed on the final test pass."""
    import jax
    from mmda_tpu.config import Config
    from mmda_tpu.train.loop import Trainer

    rng = np.random.default_rng(3)

    def mk(n):
        L, Dv, Da = 8, 5, 6
        return {
            "text": rng.integers(2, 64, size=(n, L)).astype(np.int32),
            "visual": rng.normal(size=(n, L, Dv)).astype(np.float32),
            "acoustic": rng.normal(size=(n, L, Da)).astype(np.float32),
            "lengths": rng.integers(2, L + 1, size=n).astype(np.int32),
            "bert_ids": rng.integers(3, 64, size=(n, L + 2)).astype(np.int32),
            "bert_type": np.zeros((n, L + 2), np.int32),
            "bert_mask": np.ones((n, L + 2), np.int32),
            "sentiment": rng.normal(size=n).astype(np.float32),
            "emo_label": (rng.random(size=(n, 6)) > 0.6).astype(np.float32),
        }

    data = {"train": mk(32), "dev": mk(16), "test": mk(16)}
    cfg = Config(hidden_size=16, embedding_size=8, compute_dtype="float32",
                 use_bert=False, batch_size=8, bucket_sizes=(8,),
                 max_seq_len=8, n_epoch=1, use_confidNet=True,
                 fix_conf_loss=True, confid_two_stage=False,
                 log_sinks=(), ckpt_dir=str(tmp_path), name="confq",
                 prefetch=0)
    summary = Trainer(cfg, data, use_mesh=False).train()
    assert np.isfinite(summary["conf_tcp_mse"])
    assert np.isfinite(summary["conf_error_rate"])
    for k in ("conf_aupr_error", "conf_aupr_success", "conf_fpr_at_95tpr"):
        v = summary[k]
        assert np.isnan(v) or 0.0 <= v <= 1.0
