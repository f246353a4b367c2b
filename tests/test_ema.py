"""EMA shadow params (--ema_decay): step-level formula, Trainer eval/save."""

import numpy as np
import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import SyntheticSpec, make_split
from mmda_tpu.models import Batch, get_model
from mmda_tpu.train.state import create_train_state, make_optimizer
from mmda_tpu.train.step import make_train_step


def _cfg(**kw):
    base = dict(hidden_size=16, num_classes=6, visual_size=5, acoustic_size=6,
                vocab_size=64, embedding_size=8, compute_dtype="float32",
                use_bert=False, batch_size=8, data="synthetic",
                bucket_sizes=(8,))
    base.update(kw)
    return Config(**base)


def _batch(cfg, seed=0):
    split = make_split(SyntheticSpec(
        num_examples=8, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64, seed=seed))
    return Batch(**split), {"train": split, "dev": split, "test": split}


def test_ema_matches_manual_formula():
    cfg = _cfg(ema_decay=0.9)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1))
    assert state.ema_params is not None
    step = make_train_step(cfg, tx, fwd_fn, donate=False)
    batch, _ = _batch(cfg)

    leaf = lambda s: np.asarray(s["classifier"]["kernel"])
    ema_manual = leaf(state.params)
    s = state
    for _ in range(3):
        prev = s
        s, _ = step(s, batch)
        ema_manual = ema_manual * 0.9 + leaf(s.params) * 0.1
    np.testing.assert_allclose(leaf(s.ema_params), ema_manual,
                               rtol=1e-6, atol=1e-7)
    # ema lags the live params (different unless converged)
    assert not np.allclose(leaf(s.ema_params), leaf(s.params))


def test_ema_off_keeps_none():
    cfg = _cfg()          # ema_decay = 0
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1))
    assert state.ema_params is None
    step = make_train_step(cfg, make_optimizer(cfg), fwd_fn, donate=False)
    batch, _ = _batch(cfg)
    new_state, _ = step(state, batch)
    assert new_state.ema_params is None


def test_trainer_eval_and_best_ckpt_use_ema(tmp_path):
    from mmda_tpu.train import checkpoint as ckpt
    from mmda_tpu.train.loop import Trainer

    cfg = _cfg(ema_decay=0.5, n_epoch=1, name="ema_e2e",
               ckpt_dir=str(tmp_path))
    _, data = _batch(cfg, seed=2)
    tr = Trainer(cfg, data, use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["best_valid_loss"])

    # eval_params is the shadow, and the saved best artifact holds it
    ema_leaf = np.asarray(tr.state.ema_params["classifier"]["kernel"])
    live_leaf = np.asarray(tr.state.params["classifier"]["kernel"])
    assert not np.allclose(ema_leaf, live_leaf)
    np.testing.assert_array_equal(
        np.asarray(tr.eval_params["classifier"]["kernel"]), ema_leaf)
    saved = ckpt.load_checkpoint(cfg.ckpt_dir, ckpt.best_model_name(cfg),
                                 tr.state.params)
    # best-on-dev was epoch 0's EMA snapshot; just assert it is an EMA-side
    # artifact (not equal to the final live weights) and loads cleanly
    assert not np.allclose(
        np.asarray(saved["classifier"]["kernel"]), live_leaf)
