"""Serving predictor + LR schedule tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import SyntheticSpec, make_split
from mmda_tpu.models import get_model
from mmda_tpu.serving import Predictor
from mmda_tpu.train.state import (
    create_train_state, get_learning_rate, make_optimizer, set_learning_rate)

RNG = np.random.default_rng(4)


def _cfg(**kw):
    base = dict(
        hidden_size=16, visual_size=5, acoustic_size=6, vocab_size=64,
        embedding_size=8, compute_dtype="float32", use_bert=False,
        batch_size=8, bucket_sizes=(4, 8), max_seq_len=8, log_sinks=(),
    )
    base.update(kw)
    return Config(**base)


def test_predictor_ragged_requests():
    cfg = _cfg()
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    pred = Predictor(cfg, params=params, max_batch=8)

    def req(L):
        return {
            "text": RNG.integers(2, 64, size=L).astype(np.int32),
            "visual": RNG.normal(size=(L, 5)).astype(np.float32),
            "acoustic": RNG.normal(size=(L, 6)).astype(np.float32),
            "bert_ids": RNG.integers(3, 64, size=L + 2).astype(np.int32),
            "bert_type": np.zeros(L + 2, np.int32),
            "bert_mask": np.ones(L + 2, np.int32),
        }

    out = pred([req(3), req(7), req(2)])
    assert out["scores"].shape == (3, 6)
    assert out["hidden"].shape == (3, 6 * 16)
    assert np.isfinite(out["scores"]).all()
    assert pred.stats["utterances"] == 3

    # same request alone gives the same scores (padding rows don't leak)
    out1 = pred([req(3)])
    assert out1["scores"].shape == (1, 6)


def test_predictor_bertless_requests_without_bert_fields():
    """A pre-tokenized request with no bert_ids must work for use_bert=False
    models (placeholders synthesized, caller dict untouched) and must raise a
    clear ValueError — not a KeyError — for use_bert=True models (round-3
    verify finding)."""
    cfg = _cfg()
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    pred = Predictor(cfg, params=params, max_batch=8)
    r = {
        "text": np.arange(2, 6).astype(np.int32),
        "visual": RNG.normal(size=(4, 5)).astype(np.float32),
        "acoustic": RNG.normal(size=(4, 6)).astype(np.float32),
    }
    out = pred([dict(r)])
    assert np.isfinite(out["scores"]).all()
    assert "bert_ids" not in r

    # equal to the same request with explicit placeholder bert arrays
    r2 = dict(r, bert_ids=np.zeros(6, np.int32),
              bert_type=np.zeros(6, np.int32), bert_mask=np.ones(6, np.int32))
    np.testing.assert_allclose(out["scores"][0], pred([r2])["scores"][0],
                               rtol=1e-5, atol=1e-6)

    from mmda_tpu.models.bert import BertConfig
    import pytest

    cfg_b = _cfg(use_bert=True)
    bc = BertConfig.tiny(vocab_size=64)
    init_b, _ = get_model("MISA")
    params_b = init_b(jax.random.PRNGKey(0), cfg_b, bert_cfg=bc)
    pred_b = Predictor(cfg_b, params=params_b, bert_cfg=bc)
    with pytest.raises(ValueError, match="bert_ids"):
        pred_b([dict(r)])


def test_predictor_padding_invariance():
    cfg = _cfg()
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    pred = Predictor(cfg, params=params, max_batch=8)
    r = {
        "text": np.arange(2, 6).astype(np.int32),
        "visual": RNG.normal(size=(4, 5)).astype(np.float32),
        "acoustic": RNG.normal(size=(4, 6)).astype(np.float32),
        "bert_ids": RNG.integers(3, 64, size=6).astype(np.int32),
        "bert_type": np.zeros(6, np.int32),
        "bert_mask": np.ones(6, np.int32),
    }
    a = pred([r])["scores"][0]
    b = pred([r, r, r])["scores"][0]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_exponential_schedule_decays_updates():
    cfg = _cfg(lr_schedule="exponential", lr_decay_rate=0.5, learning_rate=1e-2)
    tx = make_optimizer(cfg, steps_per_epoch=2)
    params = {"w": jnp.ones(3)}
    st = tx.init(params)
    g = {"w": jnp.ones(3)}

    deltas = []
    p = params
    for _ in range(6):
        up, st = tx.update(g, st, p)
        deltas.append(float(jnp.abs(up["w"]).mean()))
    # Adam update magnitude ~lr; epochs of 2 steps halve it
    assert deltas[0] > deltas[2] > deltas[4]
    assert np.isclose(deltas[2] / deltas[0], 0.5, rtol=0.1)


def test_plateau_lr_mutation():
    cfg = _cfg(lr_schedule="plateau", learning_rate=1e-3)
    tx = make_optimizer(cfg)
    st = create_train_state(cfg, {"w": jnp.ones(3)}, jax.random.PRNGKey(0), tx=tx)
    assert np.isclose(get_learning_rate(st.opt_state), 1e-3)
    new_opt = set_learning_rate(st.opt_state, 5e-4)
    assert np.isclose(get_learning_rate(new_opt), 5e-4)
    # mutated state still usable
    up, _ = tx.update({"w": jnp.ones(3)}, new_opt, {"w": jnp.ones(3)})
    assert np.isfinite(np.asarray(up["w"])).all()


def test_trainer_plateau_runs(tmp_path):
    from mmda_tpu.data.synthetic import make_dataset
    from mmda_tpu.train.loop import Trainer

    cfg = _cfg(lr_schedule="plateau", lr_plateau_patience=0, n_epoch=3,
               batch_size=16, name="plat", ckpt_dir=str(tmp_path))
    data = make_dataset(num_train=32, num_dev=16, num_test=16, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    tr = Trainer(cfg, data, use_mesh=False)
    summary = tr.train()
    assert np.isfinite(summary["test_loss"])


# ---------------------------------------------------------------------------
# PredictionServer (serving_server.py): queueing / micro-batching / timeouts
# ---------------------------------------------------------------------------


def _make_request(L):
    return {
        "text": RNG.integers(2, 64, size=L).astype(np.int32),
        "visual": RNG.normal(size=(L, 5)).astype(np.float32),
        "acoustic": RNG.normal(size=(L, 6)).astype(np.float32),
        "bert_ids": RNG.integers(3, 64, size=L + 2).astype(np.int32),
        "bert_type": np.zeros(L + 2, np.int32),
        "bert_mask": np.ones(L + 2, np.int32),
    }


def _make_server(max_wait_ms=20.0, **kw):
    from mmda_tpu.serving_server import PredictionServer

    cfg = _cfg()
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    pred = Predictor(cfg, params=params, max_batch=8)
    return PredictionServer(pred, max_wait_ms=max_wait_ms, **kw), pred


def test_server_batches_and_matches_direct_calls():
    server, pred = _make_server()
    reqs = [_make_request(3) for _ in range(5)]
    futs = [server.submit(r) for r in reqs]
    got = [f.result(timeout=60) for f in futs]
    want = pred(reqs)
    for i, g in enumerate(got):
        np.testing.assert_allclose(g["scores"], want["scores"][i],
                                   rtol=1e-5, atol=1e-6)
        assert g["scores"].shape == (6,)
    server.close()


def test_server_concurrent_submitters_and_bucket_grouping():
    import threading

    server, _ = _make_server()
    results = {}

    def client(i, L):
        results[i] = server.predict(_make_request(L), timeout_s=60)

    threads = [threading.Thread(target=client, args=(i, 3 if i % 2 else 7))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8
    for r in results.values():
        assert np.isfinite(r["scores"]).all()
    server.close()


def test_server_timeout_and_close():
    server, _ = _make_server()
    # a deadline in the past must surface as TimeoutError, not wedge the queue
    fut = server.submit(_make_request(3), timeout_s=-1.0)
    try:
        fut.result(timeout=60)
        raised = False
    except TimeoutError:
        raised = True
    assert raised
    # the queue still works afterwards
    ok = server.predict(_make_request(3), timeout_s=60)
    assert np.isfinite(ok["scores"]).all()
    server.close()
    try:
        server.submit(_make_request(3))
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_server_warmup_compiles_buckets():
    server, pred = _make_server()
    server.warmup()
    assert pred.stats["requests"] >= 2  # one per bucket (4, 8)
    server.close()


def test_cosine_schedule_warms_up_then_decays():
    cfg = _cfg(lr_schedule="cosine", warmup_steps=3, learning_rate=1e-2,
               n_epoch=2)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones(3)}
    st = tx.init(params)
    g = {"w": jnp.ones(3)}
    deltas = []
    p = params
    for _ in range(20):
        up, st = tx.update(g, st, p)
        deltas.append(float(jnp.abs(up["w"]).max()))
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, up)
    assert deltas[0] < deltas[2]          # warming up
    assert deltas[3] > deltas[19]         # decaying after warmup
    assert deltas[19] > 0                 # never reaches zero (min_lr)


def test_cosine_schedule_through_trainer(tmp_path):
    from mmda_tpu.data.synthetic import make_dataset
    from mmda_tpu.train.loop import Trainer

    cfg = _cfg(lr_schedule="cosine", warmup_steps=2, n_epoch=2,
               data="mosei", name="cos", ckpt_dir=str(tmp_path),
               batch_size=8, bucket_sizes=(8,))
    data = make_dataset(num_train=32, num_dev=16, num_test=16, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    summary = Trainer(cfg, data, use_mesh=False).train()
    import numpy as np
    assert np.isfinite(summary["test_loss"])


def test_predictor_bf16_bert_weights_close_to_f32():
    """bert_weights_dtype='bfloat16' casts the tower's 2-D+ leaves once at
    load (serving HBM-traffic halving); scores stay within bf16 round-off of
    the f32-weight predictor and small params stay f32."""
    from mmda_tpu.models.bert import BertConfig

    cfg = _cfg(use_bert=True)
    bc = BertConfig.tiny(vocab_size=64)
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bc)
    pred32 = Predictor(cfg, params=params, bert_cfg=bc, max_batch=8)
    pred16 = Predictor(cfg, params=params, bert_cfg=bc, max_batch=8,
                       bert_weights_dtype="bfloat16")
    assert pred16.params["bert"]["layers"][0]["q"]["kernel"].dtype == jnp.bfloat16
    assert pred16.params["bert"]["layers"][0]["q"]["bias"].dtype == jnp.float32
    assert pred16.params["bert"]["layers"][0]["attn_ln"]["scale"].dtype == jnp.float32

    def req(L):
        return {
            "text": RNG.integers(2, 64, size=L).astype(np.int32),
            "visual": RNG.normal(size=(L, 5)).astype(np.float32),
            "acoustic": RNG.normal(size=(L, 6)).astype(np.float32),
            "bert_ids": RNG.integers(3, 64, size=L + 2).astype(np.int32),
            "bert_type": np.zeros(L + 2, np.int32),
            "bert_mask": np.ones(L + 2, np.int32),
        }

    reqs = [req(3), req(6)]
    s32 = np.asarray(pred32(reqs)["scores"][:2])
    s16 = np.asarray(pred16(reqs)["scores"][:2])
    np.testing.assert_allclose(s16, s32, atol=2e-2)
