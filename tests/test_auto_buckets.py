"""Padding-optimal auto bucketing (data/loader.py::auto_bucket_sizes,
`--bucket_sizes auto[,K]`, round 4)."""

import itertools

import numpy as np

from mmda_tpu.config import Config
from mmda_tpu.data.loader import auto_bucket_sizes, padded_token_fraction


def _brute_force(lengths, k):
    uniq = sorted(set(int(x) for x in lengths))
    best, best_b = float("inf"), None
    for combo in itertools.combinations(uniq, min(k, len(uniq))):
        if combo[-1] != uniq[-1]:
            continue
        b = np.asarray(combo)
        padded = b[np.searchsorted(b, lengths, side="left")]
        cost = padded.sum()
        if cost < best:
            best, best_b = cost, tuple(combo)
    return best_b, best


def test_dp_matches_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(5):
        lengths = rng.integers(1, 20, size=200)
        for k in (1, 2, 3):
            got = auto_bucket_sizes(lengths, k)
            want_b, want_cost = _brute_force(lengths, k)
            b = np.asarray(got)
            got_cost = b[np.searchsorted(b, lengths, side="left")].sum()
            assert got_cost == want_cost, (trial, k, got, want_b)
            assert got[-1] == lengths.max()


def test_auto_beats_default_on_skewed_lengths():
    """Gamma-distributed utterance lengths (the MOSEI-like shape used by the
    bucketing-drift study): the optimal-K boundaries waste measurably fewer
    padded tokens than the fixed default (16, 32, 64)."""
    rng = np.random.default_rng(1)
    lengths = np.clip(rng.gamma(4.0, 3.0, size=4000).astype(int), 1, 64)
    auto = auto_bucket_sizes(lengths, 3)
    f_auto = padded_token_fraction(lengths, auto)
    f_default = padded_token_fraction(lengths, (16, 32, 64))
    assert f_auto <= f_default - 0.02, (auto, f_auto, f_default)
    # more buckets monotonically reduce waste (same K -> same program count)
    f_auto6 = padded_token_fraction(lengths, auto_bucket_sizes(lengths, 6))
    assert f_auto6 <= f_auto


def test_trainer_resolves_auto_buckets(tmp_path):
    from mmda_tpu.data import make_dataset
    from mmda_tpu.train.loop import Trainer

    data = make_dataset(num_train=64, num_dev=32, num_test=32, max_len=12,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    cfg = Config(use_bert=False, batch_size=16, compute_dtype="float32",
                 hidden_size=16, visual_size=5, acoustic_size=6,
                 vocab_size=64, embedding_size=8, num_classes=6,
                 n_epoch=1, bucket_sizes=("auto", 2), max_seq_len=12,
                 name="autob", ckpt_dir=str(tmp_path), log_sinks=())
    with Trainer(cfg, data, use_mesh=False) as tr:
        resolved = tr.cfg.bucket_sizes
        assert all(isinstance(b, int) for b in resolved)
        assert len(resolved) <= 2
        assert max(resolved) == int(data["train"]["lengths"].max())
        summary = tr.train()
    assert np.isfinite(summary["test_loss"])
