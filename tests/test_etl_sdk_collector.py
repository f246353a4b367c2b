"""MOSI/MOSEI collector logic tested against a FAKE mmsdk implementing the
exact API surface the collector uses (mmdataset, align, standard_folds,
dict-style sequence access).  Covers: fold routing, misalignment drops,
sp-token stripping, label/feature fetch, z-norm - without the real SDK."""

import sys
import types

import numpy as np
import pytest

from mmda_tpu.data.etl.datasets import _collect_sdk_segments
from mmda_tpu.data.etl.vocab import Vocab

RNG = np.random.default_rng(17)

TEXT_F = "FAKE_TimestampedWords"
VIS_F = "FAKE_Visual"
ACO_F = "FAKE_COVAREP"
LAB_F = "FAKE_Labels"


class _FakeSeq:
    def __init__(self, data):
        self._data = data

    def keys(self):
        return self._data.keys()

    def __getitem__(self, k):
        return self._data[k]


class _FakeDataset:
    """Post-alignment view: segment -> {'features': array} per field."""

    def __init__(self, segments):
        # segments: {seg_id: {field: features}}
        self._segments = segments
        self.aligned_to = []

    def align(self, field, collapse_functions=None):
        self.aligned_to.append(field)

    def add_computational_sequences(self, recipe, destination=None):
        pass

    def __getitem__(self, field):
        return _FakeSeq({
            seg: {"features": fields[field]}
            for seg, fields in self._segments.items()
            if field in fields
        })


def _make_fake_md(segments, folds):
    md = types.SimpleNamespace()

    def mmdataset(recipe, dest=None):
        if isinstance(recipe, dict):
            return _FakeDataset(segments)
        raise RuntimeError("already downloaded")  # highlevel/raw/labels fetch

    md.mmdataset = mmdataset
    cfg = types.SimpleNamespace()
    cfg.highlevel = {}
    cfg.raw = {}
    cfg.labels = {}
    cfg.standard_folds = types.SimpleNamespace(
        standard_train_fold=folds[0],
        standard_valid_fold=folds[1],
        standard_test_fold=folds[2],
    )
    md.cmu_fake = cfg
    return md, cfg


def _segment(words, dv=3, da=4, label=None):
    n = len(words)
    return {
        TEXT_F: np.array([[w] for w in words], dtype=object),
        VIS_F: RNG.normal(size=(n, dv)),
        ACO_F: RNG.normal(size=(n, da)),
        LAB_F: label if label is not None else RNG.normal(size=(1, 7)),
    }


def test_sdk_collector_routing_and_semantics():
    segments = {
        "vidA[0]": _segment([b"hello", b"sp", b"world"]),
        "vidA[1]": _segment([b"more", b"words", b"here"]),
        "vidB[0]": _segment([b"dev", b"split"]),
        "vidC[0]": _segment([b"test", b"seg"]),
        "vidD[0]": _segment([b"unknown", b"video"]),   # not in any fold
    }
    # one misaligned segment: visual shorter than words
    bad = _segment([b"a", b"b", b"c"])
    bad[VIS_F] = bad[VIS_F][:2]
    segments["vidA[2]"] = bad

    md, cfg = _make_fake_md(segments, (["vidA"], ["vidB"], ["vidC"]))
    vocab = Vocab()
    out = _collect_sdk_segments(
        md, "/nonexistent", cfg, TEXT_F, VIS_F, ACO_F, LAB_F, vocab)

    assert len(out["train"]) == 2     # vidA[0], vidA[1]; vidA[2] dropped
    assert len(out["dev"]) == 1
    assert len(out["test"]) == 1

    seg0 = next(s for s in out["train"] if s.segment_id == "vidA[0]")
    assert seg0.actual_words == ["hello", "world"]   # sp stripped
    assert seg0.visual.shape == (2, 3)
    # z-norm applied (mean ~0 per feature across kept rows)
    np.testing.assert_allclose(seg0.visual.mean(0), 0.0, atol=1e-5)


def test_sdk_collector_aligns_words_then_labels():
    segments = {"vidA[0]": _segment([b"x", b"y"])}
    md, cfg = _make_fake_md(segments, (["vidA"], [], []))
    vocab = Vocab()
    ds_holder = {}

    orig = md.mmdataset

    def capture(recipe, dest=None):
        d = orig(recipe, dest)
        ds_holder["ds"] = d
        return d

    md.mmdataset = capture
    _collect_sdk_segments(md, "/nonexistent", cfg, TEXT_F, VIS_F, ACO_F, LAB_F, vocab)
    # reference order: align(text, collapse=avg) THEN align(labels)
    assert ds_holder["ds"].aligned_to == [TEXT_F, LAB_F]
