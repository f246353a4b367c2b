"""MISA forward tests: shapes, output-struct invariants, jit, both text towers,
missing-modality adaptation."""

import numpy as np
import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import SyntheticSpec, make_split
from mmda_tpu.models import Batch, get_model
from mmda_tpu.models.bert import BertConfig


def _tiny_cfg(**kw):
    base = dict(
        hidden_size=16, num_classes=6, visual_size=7, acoustic_size=9,
        vocab_size=50, embedding_size=12, compute_dtype="float32",
        batch_size=4, max_seq_len=10,
    )
    base.update(kw)
    return Config(**base)


def _batch(cfg, n=4, t=10):
    spec = SyntheticSpec(
        num_examples=n, max_len=t, visual_size=cfg.visual_size,
        acoustic_size=cfg.acoustic_size, vocab_size=cfg.vocab_size,
        bert_vocab_size=64, num_classes=cfg.num_classes,
    )
    d = make_split(spec)
    return Batch(**{k: jnp.asarray(v) for k, v in d.items()})


def test_misa_forward_bert_tower():
    cfg = _tiny_cfg(use_bert=True)
    bert_cfg = BertConfig.tiny(vocab_size=64)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    batch = _batch(cfg)
    out = fwd_fn(params, cfg, batch, bert_cfg=bert_cfg)
    B, C, H = 4, 6, 16
    assert out.scores.shape == (B, C)
    assert out.labels.shape == (B, C)
    assert out.tcp.shape == (B, C)
    assert out.shared_t.shape == (B, H)
    assert out.recon_a.shape == (B, H)
    s = np.asarray(out.scores)
    assert ((s >= 0) & (s <= 1)).all()
    lb = np.asarray(out.labels)
    np.testing.assert_array_equal(lb, (s > cfg.threshold).astype(np.float32))
    assert out.domain_t is None  # use_cmd_sim default True


def test_misa_forward_glove_tower_and_domain():
    cfg = _tiny_cfg(use_bert=False, use_cmd_sim=False)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    assert params["embed"].shape == (50, 12)
    batch = _batch(cfg)
    out = fwd_fn(params, cfg, batch)
    assert out.domain_t.shape == (4, 3)
    assert np.isfinite(np.asarray(out.scores)).all()


def test_misa_jit_and_train_mode():
    cfg = _tiny_cfg(use_bert=False)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)

    @jax.jit
    def run(p, b, rng):
        return fwd_fn(p, cfg, b, deterministic=False, rng=rng)

    o1 = run(params, batch, jax.random.PRNGKey(1))
    o2 = run(params, batch, jax.random.PRNGKey(2))
    # dropout active in train mode -> different scores
    assert not np.allclose(np.asarray(o1.scores), np.asarray(o2.scores))


def test_missing_modality_zeroes_streams():
    cfg = _tiny_cfg(use_bert=False)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    keep_all = jnp.ones((4, 3))
    keep_nova = jnp.array([[1.0, 0.0, 0.0]] * 4)

    out_full = fwd_fn(params, cfg, batch, modality_keep=keep_all)
    out_drop = fwd_fn(params, cfg, batch, modality_keep=keep_nova)
    # visual/acoustic towers now see zeros -> different representations
    assert not np.allclose(np.asarray(out_full.orig_v), np.asarray(out_drop.orig_v))

    # zeroed-input forward equals forward on a batch with zeroed arrays
    batch_zeroed = batch._replace(
        visual=jnp.zeros_like(batch.visual), acoustic=jnp.zeros_like(batch.acoustic))
    out_manual = fwd_fn(params, cfg, batch_zeroed)
    np.testing.assert_allclose(
        np.asarray(out_drop.scores), np.asarray(out_manual.scores), rtol=1e-5, atol=1e-6)


def test_misa_transformer_extractor():
    """extractor='transformer' (reference exit-with-TODO at src/models.py:33-36,
    implemented here): same output shapes as the LSTM towers, trains."""
    cfg = _tiny_cfg(use_bert=False, extractor="transformer")
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    assert "layers" in params["visual_extractor"]   # transformer tree, not rnn
    batch = _batch(cfg)
    out = fwd_fn(params, cfg, batch)
    assert out.scores.shape == (4, 6)
    assert np.isfinite(np.asarray(out.scores)).all()

    g = jax.grad(lambda p: float(0) + jnp.sum(fwd_fn(p, cfg, batch).scores))(params)
    leaves = jax.tree_util.tree_leaves(g["visual_extractor"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    # padding invariance: garbage beyond each row's length must not change output
    bad = batch._replace(
        visual=batch.visual + 100.0 * (1 - np.asarray(
            (np.arange(batch.visual.shape[1])[None, :, None]
             < np.asarray(batch.lengths)[:, None, None]))))
    out2 = fwd_fn(params, cfg, bad)
    np.testing.assert_allclose(np.asarray(out2.orig_v), np.asarray(out.orig_v),
                               rtol=1e-4, atol=1e-5)


def test_misa_label_decoder():
    """Optional TAILOR-style label decoder (reference TODO src/models.py:144-147)."""
    cfg = _tiny_cfg(use_bert=False, use_label_decoder=True)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    assert params["label_decoder"]["embed"].shape == (6, 16)
    batch = _batch(cfg)
    out = fwd_fn(params, cfg, batch)
    assert out.scores.shape == (4, 6)
    s = np.asarray(out.scores)
    assert ((s >= 0) & (s <= 1)).all() and np.isfinite(s).all()
    g = jax.grad(lambda p: jnp.sum(fwd_fn(p, cfg, batch).scores))(params)
    assert float(jnp.abs(g["label_decoder"]["embed"]).sum()) > 0


def test_misa_gradients_flow_everywhere():
    cfg = _tiny_cfg(use_bert=False)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)

    def loss(p):
        out = fwd_fn(p, cfg, batch)
        return (
            jnp.sum(out.scores) + jnp.sum(out.tcp)
            + jnp.sum(out.recon_t) + jnp.sum(out.recon_v) + jnp.sum(out.recon_a)
            + jnp.sum(out.shared_v) + jnp.sum(out.sp_s)
        )

    g = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(g)
    zero_paths = [jax.tree_util.keystr(p) for p, l in flat
                  if float(jnp.abs(l).sum()) == 0.0]
    assert not zero_paths, f"no grad signal at: {zero_paths}"
