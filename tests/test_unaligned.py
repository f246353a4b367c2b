"""Unaligned-modality support (the reference's empty UnAlignedMoseiDataset
stub, src/data_loader.py:133-135): per-modality lengths through segments,
packing, loader, model, and a full training smoke."""

import numpy as np
import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.data.etl.segments import pack_split, process_segment
from mmda_tpu.data.etl.tokenizer import HashTokenizer
from mmda_tpu.data.etl.vocab import Vocab
from mmda_tpu.data.loader import ArrayLoader
from mmda_tpu.data.synthetic import SyntheticSpec, make_split
from mmda_tpu.models import get_model
from mmda_tpu.train.loop import Trainer

RNG = np.random.default_rng(9)


def test_process_segment_unaligned():
    vocab = Vocab()
    seg = process_segment(
        vocab, [b"hello", b"sp", b"world"],
        RNG.normal(size=(11, 3)),      # visual: own length
        RNG.normal(size=(23, 4)),      # acoustic: own length
        np.zeros((1, 7)), "v[0]", aligned=False)
    assert seg is not None
    assert len(seg.words) == 2
    assert seg.visual.shape == (11, 3)
    assert seg.acoustic.shape == (23, 4)


def test_pack_split_unaligned_shapes():
    vocab = Vocab()
    segs = []
    for i in range(5):
        L, Lv, La = RNG.integers(2, 7), RNG.integers(3, 15), RNG.integers(5, 20)
        segs.append(process_segment(
            vocab, [f"w{j}" for j in range(L)],
            RNG.normal(size=(Lv, 3)), RNG.normal(size=(La, 4)),
            RNG.normal(size=(1, 7)), f"v{i}[0]", aligned=False))
    arrays = pack_split(segs, max_len=6, tokenizer=HashTokenizer(),
                        aligned=False, max_len_visual=16, max_len_acoustic=24)
    assert arrays["visual"].shape == (5, 16, 3)
    assert arrays["acoustic"].shape == (5, 24, 4)
    assert "visual_lengths" in arrays and "acoustic_lengths" in arrays
    assert (arrays["visual_lengths"] <= 16).all()


def _unaligned_data(n_train=64, n_eval=32):
    def mk(n, seed):
        return make_split(SyntheticSpec(
            num_examples=n, max_len=8, visual_size=5, acoustic_size=6,
            vocab_size=64, bert_vocab_size=64, seed=seed, aligned=False))
    return {"train": mk(n_train, 0), "dev": mk(n_eval, 1), "test": mk(n_eval, 2)}


def test_loader_passes_modality_lengths():
    data = _unaligned_data()
    loader = ArrayLoader(data["train"], batch_size=16, shuffle=False, prefetch=0)
    b = next(iter(loader))
    assert b.visual_lengths is not None
    assert b.visual.shape[1] == 16   # 2*t, untouched by text buckets
    assert b.acoustic.shape[1] == 24
    assert b.text.shape[1] == 8


def test_unaligned_training_smoke(tmp_path):
    cfg = Config(
        hidden_size=16, visual_size=5, acoustic_size=6, vocab_size=64,
        embedding_size=8, compute_dtype="float32", use_bert=False,
        batch_size=16, learning_rate=3e-3, n_epoch=2, bucket_sizes=(8,),
        log_sinks=(), name="unal", ckpt_dir=str(tmp_path))
    tr = Trainer(cfg, _unaligned_data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    assert summary["history"][-1]["train_loss"] < summary["history"][0]["train_loss"] * 1.2


def test_unaligned_masking_correct():
    """Garbage beyond visual_lengths must not affect outputs."""
    cfg = Config(hidden_size=16, visual_size=5, acoustic_size=6, vocab_size=64,
                 embedding_size=8, compute_dtype="float32", use_bert=False,
                 batch_size=4)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    data = _unaligned_data(4, 4)["train"]
    from mmda_tpu.models import Batch

    keys = {k: jnp.asarray(v[:4]) for k, v in data.items()}
    batch = Batch(**keys)
    out1 = fwd_fn(params, cfg, batch)

    vis = np.array(keys["visual"])
    vl = np.array(keys["visual_lengths"])
    mask = np.arange(vis.shape[1])[None, :, None] >= vl[:, None, None]
    vis2 = vis + 999.0 * mask
    batch2 = batch._replace(visual=jnp.asarray(vis2))
    out2 = fwd_fn(params, cfg, batch2)
    np.testing.assert_allclose(np.asarray(out2.scores), np.asarray(out1.scores),
                               rtol=1e-5, atol=1e-6)
