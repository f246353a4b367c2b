"""Regression tests for the round-4 ADVICE fixes:

  * pipeline dropout RNG table sized to the ACTIVE PRNG impl's key width
    (rbg keys are (4,) uint32; the old hardcoded reshape to (..., 2) crashed
    pp_size>1 training at trace time on TPU, where cfg.fast_rng selects rbg);
  * incremental checkpoints round-trip ema_params (the old delta dropped the
    EMA shadow, silently flipping a resumed run's eval to live params);
  * ExportedPredictor honors the overflow='error' -> RequestTooLongError
    contract instead of silently truncating long requests;
  * Trainer.close() removes the process-global encoder hooks (pp/sp/ep);
  * --config_json does not override a flag the user EXPLICITLY set to its
    default value.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config, get_config
from mmda_tpu.models import bert as jbert


# ---------------------------------------------------------------------------
# 1. pipeline RNG key width under rbg
# ---------------------------------------------------------------------------

def test_pipeline_dropout_rbg_key_width():
    from mmda_tpu.parallel import pipeline as pl

    prev = jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        key = jax.random.PRNGKey(0)
        assert key.shape == (4,)   # precondition: rbg keys are 4 words wide
        cfg = jbert.BertConfig(vocab_size=64, hidden_size=32, num_layers=4,
                               num_heads=2, intermediate_size=64,
                               max_position_embeddings=32)
        params = jbert.init_bert_params(jax.random.PRNGKey(1), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 64)
        mask = jnp.ones((8, 16), jnp.int32)
        mesh = pl.make_pipe_mesh(pp=4, dp=2)
        # the old code raised at trace time (reshape (M*L*3, 4) -> (..., 2))
        out = pl.pipeline_bert_encode(params, cfg, ids, mask, mesh,
                                      num_microbatches=4,
                                      deterministic=False, dropout_rng=key,
                                      compute_dtype=jnp.float32)
        assert np.isfinite(np.asarray(out)).all()
        # deterministic leg still traces with the width-sized dummy
        det = pl.pipeline_bert_encode(params, cfg, ids, mask, mesh,
                                      num_microbatches=4, deterministic=True,
                                      compute_dtype=jnp.float32)
        assert np.isfinite(np.asarray(det)).all()
    finally:
        jax.config.update("jax_default_prng_impl", prev)


# ---------------------------------------------------------------------------
# 2. incremental checkpoint keeps the EMA shadow
# ---------------------------------------------------------------------------

def _ema_state(tmp_path, ema_decay=0.9):
    from mmda_tpu.train.state import create_train_state, make_optimizer

    cfg = Config(compute_dtype="float32", log_sinks=(), ema_decay=ema_decay)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "encoder": {"kernel": jax.random.normal(ks[0], (8, 16))},
        "head": {"kernel": jax.random.normal(ks[1], (8, 4))},
    }
    frozen = {"encoder": {"kernel": True}, "head": {"kernel": False}}
    tx = make_optimizer(cfg, frozen)
    state = create_train_state(cfg, params, ks[2], frozen, tx=tx)
    return cfg, state, frozen, tx


def test_incremental_roundtrip_preserves_ema(tmp_path):
    import optax

    from mmda_tpu.train import checkpoint as ckpt

    cfg, state, frozen, tx = _ema_state(tmp_path)
    assert state.ema_params is not None
    # take one step so ema != params on the trainable leaf
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ema = jax.tree_util.tree_map(lambda e, p: 0.9 * e + 0.1 * p,
                                 state.ema_params, params)
    state = state._replace(step=state.step + 1, params=params,
                           opt_state=opt_state, ema_params=ema)

    ckpt.save_checkpoint_incremental(str(tmp_path), "t", state, frozen)
    # template with ema present
    loaded = ckpt.load_checkpoint_incremental(str(tmp_path), "t", state,
                                              frozen)
    assert loaded.ema_params is not None
    # trainable EMA leaf: stored in the delta, bit-exact
    np.testing.assert_array_equal(
        np.asarray(loaded.ema_params["head"]["kernel"]),
        np.asarray(state.ema_params["head"]["kernel"]))
    # frozen EMA leaf: reconstructed from the frozen base (the true EMA of a
    # frozen leaf equals the base up to fl(d*x)+fl((1-d)*x) rounding)
    np.testing.assert_allclose(
        np.asarray(loaded.ema_params["encoder"]["kernel"]),
        np.asarray(state.ema_params["encoder"]["kernel"]), rtol=1e-6)
    # template built WITHOUT ema (e.g. resume into a fresh process whose
    # initial state predates the first _ema_update) still restores it
    bare = state._replace(ema_params=None)
    loaded2 = ckpt.load_checkpoint_incremental(str(tmp_path), "t", bare,
                                               frozen)
    assert loaded2.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(loaded2.ema_params["head"]["kernel"]),
        np.asarray(state.ema_params["head"]["kernel"]))


def test_incremental_backcompat_no_ema(tmp_path):
    """Checkpoints written without EMA (or by older code whose meta lacks
    has_ema) load with ema_params=None, not an error."""
    from mmda_tpu.train import checkpoint as ckpt

    cfg, state, frozen, tx = _ema_state(tmp_path, ema_decay=0.0)
    assert state.ema_params is None
    ckpt.save_checkpoint_incremental(str(tmp_path), "noema", state, frozen)
    # simulate an older writer: strip the has_ema key from the meta
    meta_path = os.path.join(str(tmp_path), "noema.inc.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta.pop("has_ema", None)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    loaded = ckpt.load_checkpoint_incremental(str(tmp_path), "noema", state,
                                              frozen)
    assert loaded.ema_params is None
    np.testing.assert_array_equal(
        np.asarray(loaded.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]))


# ---------------------------------------------------------------------------
# 3. ExportedPredictor request-too-long contract
# ---------------------------------------------------------------------------

def test_exported_predictor_rejects_overlong_requests(tmp_path):
    from mmda_tpu.models import get_model
    from mmda_tpu.serving import RequestTooLongError
    from mmda_tpu.serving_export import ExportedPredictor, export_model

    cfg = Config(hidden_size=16, num_classes=6, visual_size=5,
                 acoustic_size=6, vocab_size=64, embedding_size=8,
                 compute_dtype="float32", use_bert=False, batch_size=8,
                 bucket_sizes=(4, 8), max_seq_len=8, log_sinks=(),
                 data="synthetic")
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    export_model(cfg, params, str(tmp_path), max_batch=8)

    rng = np.random.default_rng(4)

    def req(L):
        return {
            "text": rng.integers(2, 64, size=L).astype(np.int32),
            "visual": rng.normal(size=(L, 5)).astype(np.float32),
            "acoustic": rng.normal(size=(L, 6)).astype(np.float32),
            "bert_ids": rng.integers(3, 64, size=L + 2).astype(np.int32),
            "bert_type": np.zeros(L + 2, np.int32),
            "bert_mask": np.ones(L + 2, np.int32),
        }

    strict = ExportedPredictor(str(tmp_path))
    with pytest.raises(RequestTooLongError):
        strict([req(12)])                     # 12 > max bucket 8
    out = strict([req(7)])                    # within buckets: fine
    assert np.isfinite(out["scores"]).all()

    lax_pred = ExportedPredictor(str(tmp_path), overflow="truncate")
    out = lax_pred([req(12)])                 # opt-in truncation still works
    assert np.isfinite(out["scores"]).all()

    with pytest.raises(ValueError):
        ExportedPredictor(str(tmp_path), overflow="bogus")


# ---------------------------------------------------------------------------
# 4. Trainer.close() removes process-global hooks
# ---------------------------------------------------------------------------

def test_trainer_close_uninstalls_hooks(tmp_path):
    from mmda_tpu.data import make_dataset
    from mmda_tpu.train.loop import Trainer

    cfg = Config(use_bert=True, batch_size=16, compute_dtype="float32",
                 hidden_size=16, visual_size=5, acoustic_size=6,
                 vocab_size=64, embedding_size=8, num_classes=6,
                 n_epoch=1, bucket_sizes=(8,), name="close_smoke",
                 ckpt_dir=str(tmp_path), log_sinks=(),
                 dp_size=4, tp_size=2, sp=True)
    bert_cfg = jbert.BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                                num_heads=2, intermediate_size=64,
                                max_position_embeddings=64)
    data = make_dataset(num_train=32, num_dev=16, num_test=16, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    tr = Trainer(cfg, data, bert_cfg=bert_cfg)
    try:
        assert jbert._ACTIVATION_CONSTRAINT is not None
    finally:
        tr.close()
    assert jbert._ACTIVATION_CONSTRAINT is None
    tr.close()   # idempotent

    # context-manager form
    with Trainer(cfg, data, bert_cfg=bert_cfg) as tr2:
        assert jbert._ACTIVATION_CONSTRAINT is not None
    assert jbert._ACTIVATION_CONSTRAINT is None


# ---------------------------------------------------------------------------
# 5. --config_json vs explicitly-passed default values
# ---------------------------------------------------------------------------

def test_config_json_explicit_default_flag_wins(tmp_path):
    default_dropout = Config().dropout
    saved = {"dropout": 0.77, "hidden_size": 99}
    path = tmp_path / "run_config.json"
    with open(path, "w") as f:
        json.dump(saved, f)

    # unset flags take the saved values
    cfg = get_config(argv=["--config_json", str(path)])
    assert cfg.dropout == 0.77 and cfg.hidden_size == 99

    # a flag EXPLICITLY set to its default value must win over the file
    cfg = get_config(argv=["--config_json", str(path),
                           "--dropout", str(default_dropout)])
    assert cfg.dropout == default_dropout
    assert cfg.hidden_size == 99   # untouched flags still merge

    # a flag set to a non-default value wins too (unchanged behavior)
    cfg = get_config(argv=["--config_json", str(path), "--dropout", "0.11"])
    assert cfg.dropout == pytest.approx(0.11)
