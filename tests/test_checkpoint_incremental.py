"""Incremental (frozen-base + trainable-delta) checkpointing — VERDICT r2
weak #5: the full-TrainState path re-serialized frozen BERT weights on every
save (24-62 s each on this host).  These tests pin:

  * round-trip equivalence with the full-state path;
  * the frozen base is written once and content-addressed;
  * delta files exclude frozen bytes (size check);
  * Trainer resume works through the incremental AND orbax backends.
"""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.train import checkpoint as ckpt
from mmda_tpu.train.state import create_train_state, make_optimizer


def _tiny_state_with_frozen(seed=0, big_frozen=False):
    cfg = Config(compute_dtype="float32", log_sinks=())
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 4)
    n_frozen = 4096 if big_frozen else 16
    params = {
        "encoder": {"kernel": jax.random.normal(ks[0], (8, n_frozen)),
                    "bias": jnp.zeros(n_frozen)},
        "head": {"kernel": jax.random.normal(ks[1], (8, 4)),
                 "bias": jax.random.normal(ks[2], (4,))},
    }
    frozen = {
        "encoder": {"kernel": True, "bias": True},
        "head": {"kernel": False, "bias": False},
    }
    tx = make_optimizer(cfg, frozen)
    state = create_train_state(cfg, params, jax.random.PRNGKey(seed + 1),
                               frozen, tx=tx)
    return cfg, state, frozen, tx


def _step(state, tx):
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    import optax

    params = optax.apply_updates(state.params, updates)
    return state._replace(step=state.step + 1, params=params,
                          opt_state=opt_state)


def _assert_states_equal(a, b):
    assert int(a.step) == int(b.step)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_incremental_roundtrip_equals_full(tmp_path):
    _, state, frozen, tx = _tiny_state_with_frozen()
    state = _step(_step(state, tx), tx)

    d = str(tmp_path)
    ckpt.save_checkpoint(d, "full", state)
    ckpt.save_checkpoint_incremental(d, "inc", state, frozen)

    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    got_full = ckpt.load_checkpoint(d, "full", template)
    got_inc = ckpt.load_checkpoint_incremental(d, "inc", template, frozen)
    _assert_states_equal(got_full, state)
    _assert_states_equal(got_inc, state)
    _assert_states_equal(got_inc, got_full)


def test_incremental_base_written_once_and_delta_small(tmp_path):
    ckpt._base_digest_cache.clear()
    _, state, frozen, tx = _tiny_state_with_frozen(big_frozen=True)
    d = str(tmp_path)
    ckpt.save_checkpoint_incremental(d, "inc", state, frozen)
    bases = glob.glob(os.path.join(d, "frozen_base_*.msgpack"))
    assert len(bases) == 1
    base_mtime = os.path.getmtime(bases[0])

    state = _step(state, tx)
    ckpt.save_checkpoint_incremental(d, "inc", state, frozen)
    bases2 = glob.glob(os.path.join(d, "frozen_base_*.msgpack"))
    assert bases2 == bases                      # no second base
    assert os.path.getmtime(bases[0]) == base_mtime   # not rewritten

    # the delta must exclude the (large) frozen encoder: base holds the
    # 8x4096 table, the delta only head params + opt state + step/rng
    delta_size = os.path.getsize(os.path.join(d, "inc.inc.msgpack"))
    base_size = os.path.getsize(bases[0])
    assert delta_size < base_size / 10, (delta_size, base_size)

    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    got = ckpt.load_checkpoint_incremental(d, "inc", template, frozen)
    _assert_states_equal(got, state)


def _mini_data(rng, n):
    L, Dv, Da = 8, 5, 6
    return {
        "text": rng.integers(2, 64, size=(n, L)).astype(np.int32),
        "visual": rng.normal(size=(n, L, Dv)).astype(np.float32),
        "acoustic": rng.normal(size=(n, L, Da)).astype(np.float32),
        "lengths": rng.integers(2, L + 1, size=n).astype(np.int32),
        "bert_ids": rng.integers(3, 64, size=(n, L + 2)).astype(np.int32),
        "bert_type": np.zeros((n, L + 2), np.int32),
        "bert_mask": np.ones((n, L + 2), np.int32),
        "sentiment": rng.normal(size=n).astype(np.float32),
        "emo_label": (rng.random(size=(n, 6)) > 0.6).astype(np.float32),
    }


def _trainer_cfg(tmp_path, **kw):
    base = dict(hidden_size=16, embedding_size=8, compute_dtype="float32",
                use_bert=False, batch_size=8, bucket_sizes=(8,), max_seq_len=8,
                log_sinks=(), ckpt_dir=str(tmp_path), prefetch=0,
                freeze_embeddings=True, n_epoch=2)
    base.update(kw)
    return Config(**base)


def test_trainer_incremental_resume(tmp_path):
    """Train 2 epochs with the incremental backend (GloVe table frozen ->
    frozen mask exists), then resume: picks up at the saved step."""
    from mmda_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    data = {"train": _mini_data(rng, 32), "dev": _mini_data(rng, 16),
            "test": _mini_data(rng, 16)}
    emb = rng.normal(size=(64, 8)).astype(np.float32)

    cfg = _trainer_cfg(tmp_path, name="increso", ckpt_incremental=True)
    t1 = Trainer(cfg, data, pretrained_emb=emb, use_mesh=False)
    assert t1.frozen is not None
    t1.train()
    assert ckpt.incremental_checkpoint_exists(str(tmp_path), "last_increso")
    # the incremental path should NOT have produced a full last_* msgpack
    assert not ckpt.checkpoint_exists(str(tmp_path), "last_increso")

    steps_done = int(t1.state.step)
    t2 = Trainer(cfg.replace(resume=True, n_epoch=3), data,
                 pretrained_emb=emb, use_mesh=False)
    assert int(t2.state.step) == steps_done
    # frozen GloVe table restored bit-exactly from the base file
    np.testing.assert_array_equal(np.asarray(t2.state.params["embed"]), emb)
    summary = t2.train()   # one more epoch from the resumed state
    assert np.isfinite(summary["test_loss"])


def test_trainer_orbax_backend_resume(tmp_path):
    from mmda_tpu.train.loop import Trainer

    rng = np.random.default_rng(1)
    data = {"train": _mini_data(rng, 32), "dev": _mini_data(rng, 16),
            "test": _mini_data(rng, 16)}
    cfg = _trainer_cfg(tmp_path, name="orbres", ckpt_backend="orbax",
                       freeze_embeddings=False)
    t1 = Trainer(cfg, data, use_mesh=False)
    t1.train()
    assert os.path.isdir(os.path.join(str(tmp_path), "last_orbres.orbax"))

    steps_done = int(t1.state.step)
    t2 = Trainer(cfg.replace(resume=True), data, use_mesh=False)
    assert int(t2.state.step) == steps_done
