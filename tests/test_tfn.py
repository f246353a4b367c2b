"""TFN (full tensor fusion, Zadeh et al. EMNLP 2017) — 6th model family."""

import numpy as np
import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import make_dataset
from mmda_tpu.models import get_model
from mmda_tpu.train.loop import Trainer


def _cfg(**kw):
    base = dict(
        hidden_size=16, visual_size=5, acoustic_size=6, vocab_size=64,
        embedding_size=8, compute_dtype="float32", use_bert=False,
        batch_size=16, learning_rate=3e-3, n_epoch=2, bucket_sizes=(8,),
        log_sinks=(), model="TFN", tfn_post_dim=4,
    )
    base.update(kw)
    return Config(**base)


def _data(aligned=True):
    return make_dataset(num_train=64, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64, aligned=aligned)


def test_tfn_einsum_matches_naive_outer_product():
    """The einsum tensor fusion == the paper's per-example triple outer
    product (flattened in the same ijk order the fusion matmul consumes)."""
    B, D = 3, 4
    rng = np.random.default_rng(0)
    zt = jnp.array(rng.normal(size=(B, D + 1)).astype(np.float32))
    zv = jnp.array(rng.normal(size=(B, D + 1)).astype(np.float32))
    za = jnp.array(rng.normal(size=(B, D + 1)).astype(np.float32))

    tensor = jnp.einsum("bi,bj,bk->bijk", zt, zv, za).reshape(B, -1)
    for b in range(B):
        naive = np.einsum(
            "i,j,k->ijk", np.asarray(zt[b]), np.asarray(zv[b]),
            np.asarray(za[b])).reshape(-1)
        np.testing.assert_allclose(np.asarray(tensor[b]), naive, rtol=1e-6)


def test_tfn_trains_end_to_end(tmp_path):
    cfg = _cfg(data="mosei", name="tfn", ckpt_dir=str(tmp_path))
    summary = Trainer(cfg, _data(), use_mesh=False).train()
    assert np.isfinite(summary["test_loss"])
    hist = summary["history"]
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]

    # unaligned streams flow through the shared pooled encoders
    cfg_u = _cfg(data="mosei", name="tfnu", ckpt_dir=str(tmp_path), n_epoch=1)
    assert np.isfinite(
        Trainer(cfg_u, _data(aligned=False), use_mesh=False).train()["test_loss"])


def test_tfn_missing_modality_and_grads():
    cfg = _cfg()
    init_fn, fwd_fn = get_model("TFN")
    from mmda_tpu.models import Batch

    data = _data()["train"]
    arrays = {k: (jnp.asarray(v[:8]) if v is not None else None)
              for k, v in data.items() if k != "sample_weight"}
    batch = Batch(**arrays, sample_weight=jnp.ones(8))
    params = init_fn(jax.random.PRNGKey(0), cfg)
    out = fwd_fn(params, cfg, batch)
    assert out.scores.shape == (8, cfg.num_classes)
    assert np.isfinite(np.asarray(out.scores)).all()

    # zeroing a modality changes the output (interaction coordinates exist)
    keep0 = jnp.ones((8, 3)).at[:, 2].set(0.0)
    out0 = fwd_fn(params, cfg, batch, modality_keep=keep0)
    assert np.abs(np.asarray(out0.scores) - np.asarray(out.scores)).max() > 1e-6

    def loss(p):
        o = fwd_fn(p, cfg, batch, deterministic=False,
                   rng=jax.random.PRNGKey(1))
        return jnp.sum(o.scores ** 2)

    g = jax.grad(loss)(params)
    for name in ("post_t", "post_v", "post_a", "fusion", "head", "out"):
        total = sum(float(np.abs(np.asarray(l)).sum())
                    for l in jax.tree_util.tree_leaves(g[name]))
        assert total > 0, name
