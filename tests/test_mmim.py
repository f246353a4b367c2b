"""MMIM (models/mmim.py): MI-term formula checks against naive
implementations, forward/aux-threading, training, and Trainer integration."""

import numpy as np
import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import SyntheticSpec, make_split
from mmda_tpu.models import Batch, get_model
from mmda_tpu.models.mmim import gaussian_nll, infonce

RNG = np.random.default_rng(3)


def test_infonce_matches_naive():
    B, D = 7, 5
    h = jnp.asarray(RNG.normal(size=(B, D)), jnp.float32)
    pred = jnp.asarray(RNG.normal(size=(B, D)), jnp.float32)
    got = float(infonce(h, pred))

    s = np.asarray(h) @ np.asarray(pred).T
    want = 0.0
    for j in range(B):
        col = s[:, j]
        want += -(col[j] - np.log(np.exp(col - col.max()).sum()) - col.max())
    want /= B
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_infonce_rewards_alignment():
    """Predictions aligned with their targets (positives dominate) must score
    a lower loss than shuffled predictions."""
    B, D = 16, 8
    h = jnp.asarray(RNG.normal(size=(B, D)), jnp.float32)
    aligned = float(infonce(h, 4.0 * h))
    shuffled = float(infonce(h, 4.0 * h[::-1]))
    assert aligned < np.log(B) < shuffled
    # perfect alignment beats the uniform-chance floor log(B)


def test_gaussian_nll_matches_naive():
    B, D = 6, 4
    mu = RNG.normal(size=(B, D)).astype(np.float32)
    logvar = RNG.normal(size=(B, D)).astype(np.float32)
    x = RNG.normal(size=(B, D)).astype(np.float32)
    got = float(gaussian_nll(jnp.asarray(mu), jnp.asarray(logvar),
                             jnp.asarray(x)))
    want = 0.5 * np.mean(logvar + (x - mu) ** 2 / np.exp(logvar))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _cfg(**kw):
    base = dict(model="MMIM", hidden_size=16, num_classes=6, visual_size=5,
                acoustic_size=6, vocab_size=64, embedding_size=8,
                compute_dtype="float32", use_bert=False, batch_size=16,
                learning_rate=3e-3)
    base.update(kw)
    return Config(**base)


def _data(cfg, n=64, t=8, seed=0):
    return make_split(SyntheticSpec(
        num_examples=n, max_len=t, visual_size=cfg.visual_size,
        acoustic_size=cfg.acoustic_size, vocab_size=cfg.vocab_size,
        bert_vocab_size=64, num_classes=cfg.num_classes, seed=seed))


def test_forward_shapes_and_aux():
    cfg = _cfg()
    init_fn, fwd_fn = get_model("MMIM")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    batch = Batch(**_data(cfg, n=16))
    out = jax.jit(lambda p, b: fwd_fn(p, cfg, b))(params, batch)
    assert out.scores.shape == (16, 6)
    assert set(out.model_aux) == {"total", "nll", "nce"}
    for v in out.model_aux.values():
        assert np.isfinite(float(v))
    # fresh random projections: CPC should start near the chance floor
    assert abs(float(out.model_aux["nce"]) / 3 - np.log(16)) < 1.0


def test_train_step_decreases_loss_and_threads_aux():
    from mmda_tpu.train.state import create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_step

    cfg = _cfg()
    init_fn, fwd_fn = get_model("MMIM")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, fwd_fn)
    data = _data(cfg)

    first = last = aux = None
    for epoch in range(6):
        for i in range(0, 64 - 16 + 1, 16):
            batch = Batch(**{k: jnp.asarray(v[i:i + 16])
                             for k, v in data.items()})
            state, losses = step(state, batch)
            if first is None:
                first = float(losses["total"])
            last = float(losses["total"])
            aux = float(losses["model_aux"])
    assert np.isfinite(last) and last < first * 0.8, (first, last)
    assert aux != 0.0 and np.isfinite(aux)


def test_trainer_end_to_end(tmp_path):
    from mmda_tpu.train.loop import Trainer

    cfg = _cfg(n_epoch=1, name="mmim_e2e", ckpt_dir=str(tmp_path),
               bucket_sizes=(8,))
    split = _data(cfg, n=32)
    data = {"train": split, "dev": split, "test": split}
    tr = Trainer(cfg, data, use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["best_valid_loss"])
