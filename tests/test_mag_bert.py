"""MAG-BERT (multimodal adaptation gate, Rahman et al. ACL 2020) — 7th model
family.  Validates the gate math against the paper's per-example formula, the
token-grid alignment, end-to-end training, and the inject hook actually firing.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import make_dataset
from mmda_tpu.models import Batch, get_model
from mmda_tpu.models.bert import BertConfig
from mmda_tpu.models.mag_bert import _to_token_grid, mag_gate
from mmda_tpu.train.loop import Trainer


def _cfg(**kw):
    base = dict(
        hidden_size=16, visual_size=5, acoustic_size=6, vocab_size=64,
        embedding_size=8, compute_dtype="float32", use_bert=True,
        batch_size=16, learning_rate=1e-3, n_epoch=2, bucket_sizes=(8,),
        log_sinks=(), model="MAG_BERT", mag_inject_layer=1,
    )
    base.update(kw)
    return Config(**base)


def _data(aligned=True):
    return make_dataset(num_train=64, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64, aligned=aligned)


def test_mag_gate_matches_naive_formula():
    """mag_gate == the paper's eqs. 1-6 computed per example in numpy."""
    B, S, H, dv, da = 2, 5, 8, 3, 4
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    from mmda_tpu.models.common import linear_params, layer_norm_params

    ks = jax.random.split(key, 4)
    mp = {
        "gate_v": linear_params(ks[0], H + dv, H),
        "gate_a": linear_params(ks[1], H + da, H),
        "proj_v": linear_params(ks[2], dv, H),
        "proj_a": linear_params(ks[3], da, H),
        "ln": layer_norm_params(H),
    }
    h = jnp.array(rng.normal(size=(B, S, H)).astype(np.float32))
    v = jnp.array(rng.normal(size=(B, S, dv)).astype(np.float32))
    a = jnp.array(rng.normal(size=(B, S, da)).astype(np.float32))
    beta = 0.7

    got = np.asarray(mag_gate(mp, h, v, a, beta, 0.0, True, None))

    def lin(p, x):
        return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    for b in range(B):
        for s in range(S):
            hi, vi, ai = np.asarray(h[b, s]), np.asarray(v[b, s]), np.asarray(a[b, s])
            gv = np.maximum(lin(mp["gate_v"], np.concatenate([hi, vi])), 0.0)
            ga = np.maximum(lin(mp["gate_a"], np.concatenate([hi, ai])), 0.0)
            hm = gv * lin(mp["proj_v"], vi) + ga * lin(mp["proj_a"], ai)
            alpha = min(beta * np.linalg.norm(hi) / (np.linalg.norm(hm) + 1e-6), 1.0)
            out = hi + alpha * hm
            mu, var = out.mean(), out.var()
            out = (out - mu) / np.sqrt(var + 1e-5)
            np.testing.assert_allclose(got[b, s], out, rtol=2e-4, atol=2e-5)


def test_token_grid_alignment():
    """Shift-by-one past [CLS], truncate to S, zero masked positions."""
    B, T, D, S = 2, 6, 3, 5
    seq = jnp.arange(B * T * D, dtype=jnp.float32).reshape(B, T, D) + 1.0
    mask = jnp.ones((B, S), jnp.int32).at[1, 3:].set(0)
    grid = np.asarray(_to_token_grid(seq, S, mask))
    assert grid.shape == (B, S, D)
    np.testing.assert_array_equal(grid[0, 0], 0.0)          # [CLS] slot
    np.testing.assert_array_equal(grid[0, 1], np.asarray(seq[0, 0]))
    np.testing.assert_array_equal(grid[0, 4], np.asarray(seq[0, 3]))  # truncated at S
    np.testing.assert_array_equal(grid[1, 3:], 0.0)          # masked positions


def test_mag_bert_requires_bert():
    with pytest.raises(ValueError, match="use_bert"):
        init_fn, _ = get_model("MAG_BERT")
        init_fn(jax.random.PRNGKey(0), _cfg(use_bert=False))


def test_mag_bert_forward_inject_fires_and_grads_flow():
    cfg = _cfg()
    bert_cfg = BertConfig.tiny(vocab_size=64)
    init_fn, fwd_fn = get_model("MAG_BERT")

    data = _data()["train"]
    arrays = {k: (jnp.asarray(v[:8]) if v is not None else None)
              for k, v in data.items() if k != "sample_weight"}
    batch = Batch(**arrays, sample_weight=jnp.ones(8))
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    out = fwd_fn(params, cfg, batch, bert_cfg=bert_cfg)
    assert out.scores.shape == (8, cfg.num_classes)
    assert np.isfinite(np.asarray(out.scores)).all()

    # zeroing both nonverbal modalities changes the output (the gate fired)
    keep = jnp.ones((8, 3)).at[:, 1:].set(0.0)
    out0 = fwd_fn(params, cfg, batch, bert_cfg=bert_cfg, modality_keep=keep)
    assert np.abs(np.asarray(out0.scores) - np.asarray(out.scores)).max() > 1e-6

    def loss(p):
        o = fwd_fn(p, cfg, batch, bert_cfg=bert_cfg, deterministic=False,
                   rng=jax.random.PRNGKey(1))
        return jnp.sum(o.scores ** 2)

    g = jax.grad(loss)(params)
    for name in ("mag", "pooler", "classifier"):
        total = sum(float(np.abs(np.asarray(l)).sum())
                    for l in jax.tree_util.tree_leaves(g[name]))
        assert total > 0, name
    # gradients reach BERT layers BELOW the injection point too
    emb_g = sum(float(np.abs(np.asarray(l)).sum())
                for l in jax.tree_util.tree_leaves(g["bert"]["embeddings"]))
    assert emb_g > 0


def test_mag_bert_trains_end_to_end(tmp_path):
    cfg = _cfg(data="mosei", name="mag", ckpt_dir=str(tmp_path))
    bert_cfg = BertConfig.tiny(vocab_size=64)
    summary = Trainer(cfg, _data(), use_mesh=False, bert_cfg=bert_cfg).train()
    assert np.isfinite(summary["test_loss"])
    hist = summary["history"]
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]


def test_mag_inject_at_embedding_and_after_last_layer():
    """inject_layer=0 (embedding output) and >= num_layers (post-encoder) both
    execute the hook exactly once."""
    cfg0 = _cfg(mag_inject_layer=0)
    bert_cfg = BertConfig.tiny(vocab_size=64)
    init_fn, fwd_fn = get_model("MAG_BERT")
    data = _data()["train"]
    arrays = {k: (jnp.asarray(v[:4]) if v is not None else None)
              for k, v in data.items() if k != "sample_weight"}
    batch = Batch(**arrays, sample_weight=jnp.ones(4))
    params = init_fn(jax.random.PRNGKey(0), cfg0, bert_cfg=bert_cfg)

    s0 = np.asarray(fwd_fn(params, cfg0, batch, bert_cfg=bert_cfg).scores)
    cfg_last = _cfg(mag_inject_layer=bert_cfg.num_layers)
    s_last = np.asarray(fwd_fn(params, cfg_last, batch, bert_cfg=bert_cfg).scores)
    cfg_mid = _cfg(mag_inject_layer=1)
    s_mid = np.asarray(fwd_fn(params, cfg_mid, batch, bert_cfg=bert_cfg).scores)

    assert np.isfinite(s0).all() and np.isfinite(s_last).all()
    # different injection depths give different functions
    assert np.abs(s0 - s_mid).max() > 1e-7
    assert np.abs(s_last - s_mid).max() > 1e-7
