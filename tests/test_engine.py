"""Engine tests: loader bucketing/padding, metrics parity vs sklearn-on-loops,
checkpoint round-trip, full Trainer smoke run on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmda_tpu.config import Config
from mmda_tpu.data.loader import ArrayLoader
from mmda_tpu.data.synthetic import SyntheticSpec, make_split, make_dataset
from mmda_tpu.train import checkpoint as ckpt
from mmda_tpu.train.loop import Trainer
from mmda_tpu.utils.metrics import get_accuracy, get_metrics
from mmda_tpu.utils.sentiment_metrics import eval_mosei_senti, multiclass_acc


def _cfg(**kw):
    base = dict(
        hidden_size=16, num_classes=6, visual_size=5, acoustic_size=6,
        vocab_size=64, embedding_size=8, compute_dtype="float32",
        use_bert=False, batch_size=16, learning_rate=3e-3, n_epoch=3,
        bucket_sizes=(8,), name="smoke", ckpt_dir="/tmp/mmda_test_ckpt",
        log_sinks=(),
    )
    base.update(kw)
    return Config(**base)


def _split(n, t=8, seed=0):
    return make_split(SyntheticSpec(
        num_examples=n, max_len=t, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64, seed=seed))


# ---------------------------------------------------------------------------
# Loader
# ---------------------------------------------------------------------------


def test_loader_fixed_shapes_and_padding():
    data = _split(37)
    loader = ArrayLoader(data, batch_size=16, shuffle=False, drop_last=False,
                         prefetch=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    for b in batches:
        assert b.text.shape == (16, 8)
        assert b.bert_ids.shape == (16, 10)
    total_real = sum(int(np.asarray(b.sample_weight).sum()) for b in batches)
    assert total_real == 37


def test_loader_bucketing_caps_time_axis():
    data = _split(64, t=16)
    loader = ArrayLoader(data, batch_size=8, shuffle=True, drop_last=True,
                         bucket_sizes=(8, 16), seed=1, prefetch=0)
    seen = set()
    for b in loader:
        seen.add(b.text.shape[1])
        # every row's length fits its bucket
        assert int(np.asarray(b.lengths).max()) <= b.text.shape[1]
    assert seen <= {8, 16}
    assert len(seen) >= 1


def test_loader_epochs_reshuffle():
    data = _split(32)
    loader = ArrayLoader(data, batch_size=32, shuffle=True, seed=3, prefetch=0)
    a = np.asarray(next(iter(loader)).lengths)
    b = np.asarray(next(iter(loader)).lengths)
    assert not np.array_equal(a, b)


def test_loader_prefetch_matches_sync():
    data = _split(48)
    a = [np.asarray(b.text) for b in ArrayLoader(data, 16, shuffle=False, prefetch=0)]
    b = [np.asarray(b.text) for b in ArrayLoader(data, 16, shuffle=False, prefetch=2)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


# ---------------------------------------------------------------------------
# Metrics (oracle: reference formulas in plain loops)
# ---------------------------------------------------------------------------


def test_get_accuracy_matches_reference_loop():
    rng = np.random.default_rng(0)
    y = (rng.uniform(size=(50, 6)) > 0.6).astype(np.float32)
    p = (rng.uniform(size=(50, 6)) > 0.6).astype(np.float32)

    # reference loop (src/utils/eval.py:14-31)
    count = 0.0
    for i in range(len(y)):
        y_true = sum(1 for j in range(6) if y[i][j] > 0 and p[i][j] > 0)
        all_y = sum(1 for j in range(6) if y[i][j] > 0 or p[i][j] > 0)
        count += y_true / max(all_y, 1)
    want = round(count / len(y), 4)
    assert get_accuracy(y, p) == want


def test_get_metrics_keys_and_sklearn_parity():
    rng = np.random.default_rng(1)
    y = (rng.uniform(size=(40, 6)) > 0.5).astype(int)
    p = (rng.uniform(size=(40, 6)) > 0.5).astype(int)
    m = get_metrics(y, p)
    from sklearn import metrics as skm

    assert np.isclose(m["f1"], skm.f1_score(y, p, average="macro"))
    assert np.isclose(m["micro_precision"], skm.precision_score(y, p, average="micro"))
    assert np.isclose(m["weighted_recall"], skm.recall_score(y, p, average="weighted"))
    assert set(m) == {
        "acc", "f1", "precision", "recall", "micro_f1", "micro_precision",
        "micro_recall", "weighted_f1", "weighted_precision", "weighted_recall",
    }


def test_eval_mosei_senti_basic():
    rng = np.random.default_rng(2)
    truth = rng.uniform(-3, 3, size=200)
    preds = truth + rng.normal(scale=0.5, size=200)
    out = eval_mosei_senti(preds, truth)
    assert 0 < out["mae"] < 1.0
    assert out["corr"] > 0.9
    assert 0 <= out["acc7"] <= 1
    assert out["acc2"] > 0.8
    assert np.isclose(out["mult"], multiclass_acc(np.clip(preds, -3, 3),
                                                  np.clip(truth, -3, 3)))


# ---------------------------------------------------------------------------
# Checkpoint
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "b": [jnp.ones(4), {"c": jnp.zeros((2, 2), jnp.int32)}]}
    ckpt.save_checkpoint(str(tmp_path), "t", tree, {"epoch": 3})
    template = jax.tree_util.tree_map(jnp.zeros_like, tree)
    got = ckpt.load_checkpoint(str(tmp_path), "t", template)
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.load_metadata(str(tmp_path), "t")["epoch"] == 3


# ---------------------------------------------------------------------------
# Trainer end-to-end smoke (SURVEY.md §4.5)
# ---------------------------------------------------------------------------


def test_trainer_smoke(tmp_path):
    cfg = _cfg(ckpt_dir=str(tmp_path), n_epoch=3)
    data = make_dataset(num_train=96, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    tr = Trainer(cfg, data, use_mesh=False)
    summary = tr.train()
    hist = summary["history"]
    assert len(hist) == 3
    assert np.isfinite(summary["test_loss"])
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert 0 <= summary["test_acc"] <= 1
    assert ckpt.checkpoint_exists(str(tmp_path), "best_model_MISA_mosei")


def test_trainer_compiled_epoch_matches_history_shape(tmp_path):
    cfg = _cfg(ckpt_dir=str(tmp_path), n_epoch=2, compiled_epoch=True,
               scan_chunk=2)
    data = make_dataset(num_train=80, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    tr = Trainer(cfg, data, use_mesh=False)
    summary = tr.train()
    # 80/16 = 5 steps/epoch -> 2 chunks of 2 + 1 remainder
    assert len(summary["history"]) == 2
    assert np.isfinite(summary["test_loss"])
    assert int(tr.state.step) == 10
    assert summary["history"][-1]["train_loss"] < summary["history"][0]["train_loss"] * 1.5


def test_trainer_dp_mesh_smoke(tmp_path):
    cfg = _cfg(ckpt_dir=str(tmp_path), n_epoch=1, batch_size=16)
    data = make_dataset(num_train=64, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    tr = Trainer(cfg, data, use_mesh=True)
    assert tr.mesh is not None and tr.mesh.shape["data"] == 8
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])


def test_trainer_deterministic_across_runs(tmp_path):
    """Same seed -> identical loss trajectory (threaded PRNG keys replace the
    reference's global torch/numpy seeding, src/train.py:45-51)."""
    data = make_dataset(num_train=64, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)

    def run(subdir):
        cfg = _cfg(ckpt_dir=str(tmp_path / subdir), n_epoch=2, seed=123)
        return Trainer(cfg, data, use_mesh=False).train()

    a, b = run("a"), run("b")
    for ha, hb in zip(a["history"], b["history"]):
        assert ha["train_loss"] == hb["train_loss"]
        assert ha["valid_loss"] == hb["valid_loss"]


def test_trainer_resume(tmp_path):
    cfg = _cfg(ckpt_dir=str(tmp_path), n_epoch=2)
    data = make_dataset(num_train=64, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    tr = Trainer(cfg, data, use_mesh=False)
    tr.train()
    step_before = int(tr.state.step)

    cfg2 = cfg.replace(resume=True, n_epoch=2)
    tr2 = Trainer(cfg2, data, use_mesh=False)
    assert int(tr2.state.step) == step_before  # restored full state


import pytest


@pytest.mark.parametrize("data_name", ["mosei", "mosi"])
def test_compiled_eval_epoch_matches_per_batch_eval(tmp_path, data_name):
    """The scanned eval epoch must aggregate to EXACTLY the same eval loss,
    accuracy, and prediction arrays as the per-batch path (they share the
    step body; this pins the stacking/grouping/index mapping) — for both the
    classification and regression tasks."""
    from mmda_tpu.data.synthetic import make_dataset

    data = make_dataset(num_train=48, num_dev=36, num_test=20, max_len=12,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    cfg = Config(hidden_size=16, visual_size=5, acoustic_size=6, vocab_size=64,
                 embedding_size=8, compute_dtype="float32", use_bert=False,
                 batch_size=8, bucket_sizes=(8, 12), max_seq_len=12,
                 n_epoch=1, log_sinks=(), data=data_name, name="eveq",
                 ckpt_dir=str(tmp_path), compiled_eval=True, scan_chunk=2)
    tr = Trainer(cfg, data, use_mesh=False)

    loss_c, acc_c, preds_c, truths_c = tr.evaluate("dev")
    assert tr.eval_epoch is not None
    tr.eval_epoch = None                 # force the per-batch path
    loss_b, acc_b, preds_b, truths_b = tr.evaluate("dev")

    assert loss_c == loss_b
    assert acc_c == acc_b
    np.testing.assert_array_equal(preds_c, preds_b)
    np.testing.assert_array_equal(truths_c, truths_b)
