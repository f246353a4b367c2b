"""End-to-end UR_FUNNY ETL on synthetic pickle fixtures shaped exactly like
the SDK pickles (reference src/create_dataset.py:447-520), plus the mmsdk
import gate for MOSI/MOSEI."""

import os
import pickle

import numpy as np
import pytest

from mmda_tpu.data.etl.datasets import build_dataset, collect_ur_funny
from mmda_tpu.data.etl.vocab import Vocab

RNG = np.random.default_rng(42)


def _write_urfunny_pickles(path, n=12, dv=4, da=5):
    os.makedirs(path, exist_ok=True)
    keys = [f"utt{i}" for i in range(n)]
    folds = {"train": keys[: n - 4], "dev": keys[n - 4 : n - 2],
             "test": keys[n - 2 :]}
    word_list = ["hello", "world", "funny", "joke", "ha", "the"]
    openface, covarep, word_idx, humor = {}, {}, {}, {}
    for i, k in enumerate(keys):
        L = int(RNG.integers(2, 7))
        word_idx[k] = {"punchline_embedding_indexes":
                       RNG.integers(0, len(word_list), L)}
        openface[k] = {"punchline_features": RNG.normal(size=(L, dv))}
        covarep[k] = {"punchline_features": RNG.normal(size=(L, da))}
        humor[k] = int(i % 2)
    for name, obj in [("data_folds", folds),
                      ("openface_features_sdk", openface),
                      ("covarep_features_sdk", covarep),
                      ("word_embedding_indexes_sdk", word_idx),
                      ("word_list", word_list),
                      ("humor_label_sdk", humor)]:
        with open(os.path.join(path, f"{name}.pkl"), "wb") as f:
            pickle.dump(obj, f)


def test_collect_ur_funny(tmp_path):
    data_path = str(tmp_path / "UR_FUNNY")
    _write_urfunny_pickles(data_path)
    vocab = Vocab()
    splits = collect_ur_funny(data_path, vocab)
    assert len(splits["train"]) == 8
    assert len(splits["dev"]) == 2
    assert len(splits["test"]) == 2
    seg = splits["train"][0]
    assert seg.visual.shape[1] == 4 and seg.acoustic.shape[1] == 5
    assert seg.label.shape == (1, 1)


def test_build_dataset_ur_funny_end_to_end(tmp_path):
    data_dir = str(tmp_path)
    _write_urfunny_pickles(os.path.join(data_dir, "UR_FUNNY"))
    # GloVe file covering a couple of words
    glove = os.path.join(data_dir, "glove.txt")
    with open(glove, "w") as f:
        f.write("hello " + " ".join(["0.5"] * 300) + "\n")
        f.write("funny " + " ".join(["-0.5"] * 300) + "\n")

    splits = build_dataset("ur_funny", data_dir, word_emb_path=glove, max_len=8)
    out_dir = os.path.join(data_dir, "UR_FUNNY")
    assert os.path.exists(os.path.join(out_dir, "train.npz"))
    assert os.path.exists(os.path.join(out_dir, "vocab.tsv"))
    emb = np.load(os.path.join(out_dir, "glove_emb.npy"))
    assert emb.shape[1] == 300
    tr = splits["train"]
    assert tr["emo_label"].shape[1] == 1          # binary humor label
    assert set(np.unique(tr["emo_label"])) <= {0.0, 1.0}
    assert tr["text"].shape == (8, 8)

    # loadable by the standard path and trainable
    from mmda_tpu.data import load_splits

    loaded = load_splits(out_dir)
    np.testing.assert_array_equal(loaded["train"]["text"], tr["text"])


def test_mosi_requires_mmsdk(tmp_path):
    with pytest.raises(ImportError, match="mmsdk"):
        build_dataset("mosi", str(tmp_path))
