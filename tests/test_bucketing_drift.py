"""Bucketing-drift quantification (VERDICT r2 next #9, SURVEY §7 hard-part #2).

The reference pads each batch to ITS OWN max length
(reference src/data_loader.py:70-72); the rebuild buckets to fixed sizes so
XLA compiles once per bucket.  With correct length masking, padded timesteps
are arithmetically invisible — what CAN move metrics is batch COMPOSITION:
bucketing groups similar-length utterances into the same batch, and the
objective contains batch-statistics losses (CMD moment matching, DiffLoss
batch-normalized correlations) that see different example groupings.

This experiment trains the SAME tiny MISA (same init, same data) under both
policies on a gamma-length distribution (the realistic MOSEI shape used by
benchmarks/bench_epoch.py), across multiple seeds, and asserts the
between-policy metric gap is within the seed-to-seed noise band.

Also pins the masking invariance directly: one batch evaluated padded-to-max
vs padded-to-bucket gives IDENTICAL outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.data.loader import ArrayLoader
from mmda_tpu.models import Batch, get_model
from mmda_tpu.train.objective import compute_losses
from mmda_tpu.train.state import TrainState, create_train_state, make_optimizer
from mmda_tpu.utils.metrics import get_accuracy, get_metrics

B, TMAX, DV, DA, VOCAB, C = 16, 48, 5, 6, 64, 6
N_TRAIN, N_EVAL = 256, 128
EPOCHS = 3
SEEDS = (0, 1, 2)


def _gamma_lengths(rng, n):
    # shape/scale chosen to mimic MOSEI's word-count distribution: mode ~7,
    # long right tail clipped at TMAX (same recipe as benchmarks/bench_epoch.py)
    return np.clip(rng.gamma(2.2, 5.0, size=n).astype(np.int64) + 2,
                   2, TMAX).astype(np.int32)


def _make_data(seed, n):
    rng = np.random.default_rng(seed)
    lengths = _gamma_lengths(rng, n)
    text = rng.integers(2, VOCAB, size=(n, TMAX)).astype(np.int32)
    visual = rng.normal(size=(n, TMAX, DV)).astype(np.float32)
    acoustic = rng.normal(size=(n, TMAX, DA)).astype(np.float32)
    for i, L in enumerate(lengths):
        text[i, L:] = 1
        visual[i, L:] = 0
        acoustic[i, L:] = 0
    # labels correlated with the features so training actually moves metrics
    w = rng.normal(size=(DV, C))
    logits = visual[:, :4].mean(axis=1) @ w + 0.5 * rng.normal(size=(n, C))
    emo = (logits > 0).astype(np.float32)
    return {
        "text": text, "visual": visual, "acoustic": acoustic,
        "lengths": lengths,
        "bert_ids": np.zeros((n, TMAX + 2), np.int32),
        "bert_type": np.zeros((n, TMAX + 2), np.int32),
        "bert_mask": np.ones((n, TMAX + 2), np.int32),
        "sentiment": np.zeros(n, np.float32),
        "emo_label": emo,
    }


def _cfg():
    return Config(use_bert=False, hidden_size=16, embedding_size=8,
                  num_classes=C, visual_size=DV, acoustic_size=DA,
                  vocab_size=VOCAB, compute_dtype="float32", dropout=0.0,
                  batch_size=B, max_seq_len=TMAX, learning_rate=2e-3,
                  log_sinks=())


def _trim_to(d, idx, t):
    out = {}
    for k, v in d.items():
        v = v[idx]
        if k in ("text", "visual", "acoustic"):
            v = v[:, :t]
        elif k in ("bert_ids", "bert_type", "bert_mask"):
            v = v[:, : t + 2]
        out[k] = v
    return out


def _batchify(arrays):
    return Batch(**{**{k: jnp.asarray(v) for k, v in arrays.items()},
                    "sample_weight": jnp.ones(len(arrays["lengths"]))})


def _train(policy, seed, train, test):
    """policy: 'bucketed' (16/32/48 fixed buckets via ArrayLoader) or
    'perbatchmax' (reference: shuffle, consecutive chunks, pad to batch max)."""
    cfg = _cfg()
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(100 + seed), cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, params, jax.random.PRNGKey(seed), tx=tx)

    def loss_fn(p, batch):
        out = fwd_fn(p, cfg, batch, deterministic=True)
        return compute_losses(cfg, out, batch)["total"]

    @jax.jit
    def step(state, batch):
        grads = jax.grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax

        return TrainState(step=state.step + 1,
                          params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state, rng=state.rng)

    rng = np.random.default_rng(1000 + seed)
    if policy == "bucketed":
        loader = ArrayLoader(train, batch_size=B, shuffle=True,
                             drop_last=True, bucket_sizes=(16, 32, 48),
                             seed=seed, prefetch=0)
        for _ in range(EPOCHS):
            for batch in loader:
                state = step(state, batch)
    else:
        n = len(train["lengths"])
        for _ in range(EPOCHS):
            order = rng.permutation(n)
            for i in range(0, n - B + 1, B):
                idx = order[i : i + B]
                t = int(train["lengths"][idx].max())
                state = step(state, _batchify(_trim_to(train, idx, t)))

    # fixed-shape eval for both policies (eval path is not under test)
    out = fwd_fn(state.params, cfg, _batchify(
        {k: v for k, v in test.items()}), deterministic=True)
    preds = np.asarray(out.labels)
    truth = test["emo_label"]
    m = get_metrics(truth, preds)
    m["acc"] = get_accuracy(truth, preds)
    return m


def test_masking_invariance_padding_is_invisible():
    """Same rows evaluated at bucket padding vs full TMAX padding -> scores
    IDENTICAL: padded timesteps are masked out of every code path."""
    cfg = _cfg()
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    data = _make_data(9, 16)
    data["lengths"] = np.minimum(data["lengths"], 16)
    full = fwd_fn(params, cfg, _batchify(data), deterministic=True)
    trimmed = fwd_fn(params, cfg, _batchify(
        _trim_to(data, np.arange(16), 16)), deterministic=True)
    np.testing.assert_allclose(np.asarray(trimmed.scores),
                               np.asarray(full.scores), rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_bucketing_vs_perbatchmax_metric_drift():
    test = _make_data(99, N_EVAL)
    rows = {"bucketed": [], "perbatchmax": []}
    for seed in SEEDS:
        train = _make_data(seed, N_TRAIN)
        for policy in rows:
            rows[policy].append(_train(policy, seed, train, test))

    report = {}
    for key in ("micro_f1", "acc"):
        b = np.array([m[key] for m in rows["bucketed"]])
        p = np.array([m[key] for m in rows["perbatchmax"]])
        gap = abs(b.mean() - p.mean())
        noise = max(b.std(), p.std(), 0.01)
        report[key] = (b.mean(), p.mean(), gap, noise)
        # the claim under test: bucketing does not move metrics beyond
        # seed-to-seed noise (2 sigma, floored at 1 pt)
        assert gap <= 2.0 * noise, (key, report[key])
    print("\npolicy drift (mean over seeds; gap vs noise):")
    for key, (mb, mp, gap, noise) in report.items():
        print(f"  {key:10s} bucketed={mb:.4f} perbatchmax={mp:.4f} "
              f"gap={gap:.4f} noise(sigma)={noise:.4f}")
