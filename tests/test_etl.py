"""ETL tests: segment processing (sp strip, z-norm, label split), WordPiece
tokenizer parity vs HF BertTokenizer on a local vocab, GloVe scan (native C++
vs Python fallback), fixed-shape packing."""

import os
import tempfile

import numpy as np
import pytest

from mmda_tpu.data.etl.segments import pack_split, process_segment, split_label, znorm
from mmda_tpu.data.etl.tokenizer import HashTokenizer, WordPieceTokenizer
from mmda_tpu.data.etl.vocab import PAD, UNK, Vocab, load_glove

RNG = np.random.default_rng(0)


def test_process_segment_strips_sp_and_znorms():
    vocab = Vocab()
    words = [b"hello", b"sp", b"world", b"sp", b"again"]
    visual = RNG.normal(size=(5, 3))
    acoustic = RNG.normal(size=(5, 4))
    label = np.array([[0.5, 1.0, 0.0, -1.0, 2.0, 0.0, 1.0]])
    seg = process_segment(vocab, words, visual, acoustic, label, "vid[1]")
    assert seg is not None
    assert seg.actual_words == ["hello", "world", "again"]
    assert len(seg.words) == 3
    # z-norm applied to the sp-stripped rows (reference order: strip THEN norm)
    kept = visual[[0, 2, 4]]
    want = (kept - kept.mean(0, keepdims=True)) / (1e-6 + kept.std(0, keepdims=True))
    np.testing.assert_allclose(seg.visual, want, rtol=1e-5, atol=1e-5)


def test_process_segment_drops_misaligned():
    vocab = Vocab()
    seg = process_segment(vocab, [b"a", b"b"], np.zeros((3, 2)), np.zeros((2, 2)),
                          np.zeros((1, 7)), "x[0]")
    assert seg is None


def test_vocab_unk_pad_and_freeze():
    v = Vocab()
    assert v["<unk>"] == UNK == 0
    assert v["<pad>"] == PAD == 1
    a = v["apple"]
    assert a == 2
    v.freeze()
    assert v["banana"] == UNK
    assert v["apple"] == a


def test_split_label_mosei_7dim():
    s, e = split_label(np.array([[1.5, 0.3, 0.0, -0.1, 2.0, 0.0, 0.7]]), 6)
    assert s == pytest.approx(1.5)
    np.testing.assert_array_equal(e, [1, 0, 0, 1, 0, 1])


def test_split_label_mosi_scalar_and_urfunny():
    s, e = split_label(np.array([[2.2]]), 6)
    assert s == pytest.approx(2.2, rel=1e-5)
    np.testing.assert_array_equal(e, np.zeros(6))
    s, e = split_label(np.array([[1.0]]), 1)
    np.testing.assert_array_equal(e, [1.0])


_VOCAB_WORDS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "over", "lazy",
    "dog", "don", "'", "t", ",", ".", "!", "un", "##affable", "##able", "run",
    "##ning", "hello", "world",
]


def _vocab_file(tmp_path):
    path = os.path.join(tmp_path, "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(_VOCAB_WORDS) + "\n")
    return path


@pytest.mark.parametrize("text", [
    "The quick brown fox jumps over the lazy dog",
    "Don't RUN, hello world!",
    "unaffable runner",          # wordpiece continuation + UNK
    "hello   world  .",
])
def test_wordpiece_matches_hf_bert_tokenizer(tmp_path, text):
    path = _vocab_file(str(tmp_path))
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=path, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(path)

    enc = hf.encode_plus(text, max_length=16, add_special_tokens=True,
                         padding="max_length", truncation=True)
    ids, types, mask = ours.encode(text, 16)
    assert ids.tolist() == enc["input_ids"]
    assert mask.tolist() == enc["attention_mask"]
    assert types.tolist() == enc["token_type_ids"]


def test_glove_scan_python_matches_native(tmp_path):
    glove = os.path.join(str(tmp_path), "glove.txt")
    dim = 4
    with open(glove, "w") as f:
        f.write("apple " + " ".join(["1.5"] * dim) + "\n")
        f.write("new york " + " ".join(["-2.0"] * dim) + "\n")
        f.write("zzz " + " ".join(["9.0"] * dim) + "\n")
    v = Vocab()
    v.add("apple")
    v.add("new york")
    v.add("missing")
    v.freeze()

    py = load_glove(v, glove, embedding_size=dim, seed=7, use_native=False)
    nat = load_glove(v, glove, embedding_size=dim, seed=7, use_native=True)
    np.testing.assert_allclose(py, nat, rtol=1e-6)
    np.testing.assert_allclose(py[v.word2id["apple"]], [1.5] * dim)
    np.testing.assert_allclose(py[v.word2id["new york"]], [-2.0] * dim)


def _mk_segments(n=7, dv=3, da=4):
    vocab = Vocab()
    segs = []
    for i in range(n):
        L = int(RNG.integers(2, 9))
        words = [f"w{int(x)}" for x in RNG.integers(0, 30, L)]
        seg = process_segment(
            vocab, words, RNG.normal(size=(L, dv)), RNG.normal(size=(L, da)),
            RNG.normal(size=(1, 7)), f"vid{i}[0]")
        segs.append(seg)
    return segs


@pytest.mark.parametrize("use_native", [False, True])
def test_pack_split_fixed_shapes(use_native):
    segs = _mk_segments()
    arrays = pack_split(segs, max_len=6, tokenizer=HashTokenizer(),
                        use_native=use_native)
    assert arrays["text"].shape == (7, 6)
    assert arrays["visual"].shape == (7, 6, 3)
    assert arrays["bert_ids"].shape == (7, 8)
    assert arrays["emo_label"].shape == (7, 6)
    assert (arrays["lengths"] <= 6).all() and (arrays["lengths"] >= 1).all()
    # pad id correct beyond length
    for i in range(7):
        L = arrays["lengths"][i]
        assert (arrays["text"][i, L:] == PAD).all()
        assert (arrays["visual"][i, L:] == 0).all()


def test_pack_split_native_matches_python():
    segs = _mk_segments(5)
    a = pack_split(segs, max_len=6, tokenizer=HashTokenizer(), use_native=False)
    b = pack_split(segs, max_len=6, tokenizer=HashTokenizer(), use_native=True)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6,
                                   err_msg=f"mismatch in {k}")
