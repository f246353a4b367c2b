"""C++ WordPiece fast path (native/mmda_native.cc) vs the pure-Python
tokenizer: byte-exact parity on ASCII, per-row Python fallback on non-ASCII.
The Python implementation is itself HF-parity tested (test_etl.py), so
native == Python implies native == transformers.BertTokenizer."""

import numpy as np
import pytest

from mmda_tpu.data.etl import native_bridge
from mmda_tpu.data.etl.tokenizer import WordPieceTokenizer

VOCAB = {w: i for i, w in enumerate([
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "quick", "brown", "fox",
    "jump", "##s", "##ed", "##ing", "over", "lazy", "dog", "!", ",", ".",
    "'", "don", "##'", "##t", "a", "##b", "##c", "un", "##believ", "##able",
])}

CORPUS = [
    "The quick brown fox jumps over the lazy dog!",
    "don't",
    "unbelievable",
    "jumping, jumped.  JUMPS",
    "",
    "   ",
    "xyzzy unknownword the",
    "a" * 150,                       # > max_chars_per_word -> UNK
    "the\tquick\nfox",               # control whitespace
    "!!!...",
]


@pytest.fixture(scope="module")
def lib():
    lib = native_bridge.load()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_native_matches_python_on_ascii(lib):
    py = WordPieceTokenizer(VOCAB, use_native=False)
    nat = WordPieceTokenizer(VOCAB, use_native=True)
    assert nat._native_handle() is not None
    for L in (8, 16, 48):
        ids_p, types_p, mask_p = py.encode_batch(CORPUS, L)
        ids_n, types_n, mask_n = nat.encode_batch(CORPUS, L)
        np.testing.assert_array_equal(ids_n, ids_p)
        np.testing.assert_array_equal(mask_n, mask_p)
        np.testing.assert_array_equal(types_n, types_p)


def test_non_ascii_rows_fall_back_to_python(lib):
    texts = ["the quick fox", "café déjà vu", "the 模型 fox", "naïve dog"]
    py = WordPieceTokenizer(VOCAB, use_native=False)
    nat = WordPieceTokenizer(VOCAB, use_native=True)
    handle = nat._native_handle()
    _, _, fallback = handle.encode_batch(texts, 16, True, 1, 2, 3, 0)
    assert fallback.tolist() == [False, True, True, True]
    ids_p, _, mask_p = py.encode_batch(texts, 16)
    ids_n, _, mask_n = nat.encode_batch(texts, 16)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_real_vocab_shapes(lib):
    # a bigger synthetic vocab exercises the hash map + greedy matching
    rng = np.random.default_rng(0)
    pieces = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    pieces += ["w%03d" % i for i in range(500)]
    pieces += ["##s%03d" % i for i in range(500)]
    vocab = {w: i for i, w in enumerate(pieces)}
    texts = [" ".join(rng.choice(pieces[4:504], size=10)) for _ in range(64)]
    py = WordPieceTokenizer(vocab, use_native=False)
    nat = WordPieceTokenizer(vocab, use_native=True)
    ids_p, _, _ = py.encode_batch(texts, 20)
    ids_n, _, _ = nat.encode_batch(texts, 20)
    np.testing.assert_array_equal(ids_n, ids_p)


def test_max_len_too_small_falls_back_and_python_raises(lib):
    nat = WordPieceTokenizer(VOCAB, use_native=True)
    handle = nat._native_handle()
    _, _, fallback = handle.encode_batch(["the fox"], 1, True, 1, 2, 3, 0)
    assert fallback.tolist() == [True]     # no room for [CLS]+[SEP]
    try:
        nat.encode_batch(["the fox"], 1)
        raised = False
    except ValueError:
        raised = True
    assert raised                          # Python path raises cleanly
