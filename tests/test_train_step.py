"""End-to-end train-step tests: loss decreases on synthetic data; optimizer
parity bits (clip, freezing); DP grad equivalence on the faked 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import SyntheticSpec, make_split
from mmda_tpu.models import Batch, get_model
from mmda_tpu.parallel import mesh as pmesh
from mmda_tpu.train.state import create_train_state, make_optimizer
from mmda_tpu.train.step import make_train_step, make_eval_step


def _cfg(**kw):
    base = dict(
        hidden_size=16, num_classes=6, visual_size=5, acoustic_size=6,
        vocab_size=64, embedding_size=8, compute_dtype="float32",
        use_bert=False, batch_size=16, learning_rate=3e-3,
    )
    base.update(kw)
    return Config(**base)


def _data(cfg, n=64, t=8, seed=0):
    spec = SyntheticSpec(
        num_examples=n, max_len=t, visual_size=cfg.visual_size,
        acoustic_size=cfg.acoustic_size, vocab_size=cfg.vocab_size,
        bert_vocab_size=64, num_classes=cfg.num_classes, seed=seed,
    )
    return make_split(spec)


def _batches(data, bs):
    n = len(data["lengths"])
    for i in range(0, n - bs + 1, bs):
        yield Batch(**{k: jnp.asarray(v[i : i + bs]) for k, v in data.items()})


def test_loss_decreases_on_synthetic():
    cfg = _cfg()
    init_fn, fwd_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, fwd_fn)

    data = _data(cfg)
    first, last = None, None
    for epoch in range(6):
        for batch in _batches(data, cfg.batch_size):
            state, losses = step(state, batch)
            if first is None:
                first = float(losses["total"])
            last = float(losses["total"])
    assert np.isfinite(last)
    assert last < first * 0.8, (first, last)


def test_eval_step_cls_loss_matches_objective():
    cfg = _cfg()
    init_fn, fwd_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg)
    batch = next(_batches(_data(cfg, n=16), 16))
    ev = make_eval_step(cfg, fwd_fn)
    out = ev(params, batch)
    assert out["scores"].shape == (16, 6)
    assert np.isfinite(float(out["cls_loss"]))
    np.testing.assert_array_equal(
        np.asarray(out["labels"]),
        (np.asarray(out["scores"]) > cfg.threshold).astype(np.float32),
    )


def test_frozen_params_do_not_move():
    cfg = _cfg()
    init_fn, fwd_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg)
    # freeze the whole acoustic extractor
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    frozen["acoustic_extractor"] = jax.tree_util.tree_map(
        lambda _: True, params["acoustic_extractor"])
    tx = make_optimizer(cfg, frozen)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen)
    step = make_train_step(cfg, tx, fwd_fn, donate=False)
    batch = next(_batches(_data(cfg, n=16), 16))
    new_state, _ = step(state, batch)

    before = jax.tree_util.tree_leaves(params["acoustic_extractor"])
    after = jax.tree_util.tree_leaves(new_state.params["acoustic_extractor"])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # and something else DID move
    assert not np.allclose(
        np.asarray(params["classifier"]["kernel"]),
        np.asarray(new_state.params["classifier"]["kernel"]),
    )


def test_dp_grads_match_single_device():
    """1-device grads == 8-device DP grads (allreduce equivalence over the
    faked CPU mesh; SURVEY.md §4.4)."""
    cfg = _cfg(batch_size=16)
    init_fn, fwd_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg)
    batch = next(_batches(_data(cfg, n=16), 16))

    from mmda_tpu.train.objective import compute_losses

    def loss_fn(p, b):
        out = fwd_fn(p, cfg, b, deterministic=True)
        return compute_losses(cfg, out, b)["total"]

    g_single = jax.jit(jax.grad(loss_fn))(params, batch)

    mesh = pmesh.make_mesh(dp=8, tp=1)
    sp = pmesh.shard_params(params, mesh)
    sb = pmesh.shard_batch(batch, mesh)
    g_dp = jax.jit(jax.grad(loss_fn))(sp, sb)

    flat_s = jax.tree_util.tree_leaves(g_single)
    flat_d = jax.tree_util.tree_leaves(g_dp)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_modality_dropout_train_step_runs():
    cfg = _cfg(missing_modality_prob=0.5)
    init_fn, fwd_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, fwd_fn)
    batch = next(_batches(_data(cfg, n=16), 16))
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["total"]))


def test_frozen_stop_gradient_prunes_but_preserves_updates():
    """The frozen-aware step (stop_gradient on frozen leaves, letting XLA DCE
    their weight-grad GEMMs) must produce IDENTICAL updates to the mask-only
    step for trainable params, and leave frozen params bit-identical."""
    cfg = _cfg(use_bert=True, batch_size=8)
    from mmda_tpu.models.bert import BertConfig, frozen_mask

    bert_cfg = BertConfig.tiny(vocab_size=64)
    init_fn, fwd_fn = get_model(cfg.model)
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=0)
    tx = make_optimizer(cfg, frozen)

    data = _data(cfg, n=8)
    batch = next(_batches(data, 8))

    s0 = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen)
    step_masked = make_train_step(cfg, tx, fwd_fn, bert_cfg, donate=False)
    step_pruned = make_train_step(cfg, tx, fwd_fn, bert_cfg, donate=False,
                                  frozen=frozen)
    s_m, l_m = step_masked(s0, batch)
    s_p, l_p = step_pruned(s0, batch)

    np.testing.assert_allclose(float(l_m["total"]), float(l_p["total"]),
                               rtol=1e-6)
    # trainable params: identical updates
    for tree_m, tree_p, f in zip(
        jax.tree_util.tree_leaves(s_m.params),
        jax.tree_util.tree_leaves(s_p.params),
        jax.tree_util.tree_leaves(frozen),
    ):
        np.testing.assert_array_equal(np.asarray(tree_m), np.asarray(tree_p))
    # frozen layer 0 params: bit-identical to init
    np.testing.assert_array_equal(
        np.asarray(s_p.params["bert"]["layers"][0]["q"]["kernel"]),
        np.asarray(params["bert"]["layers"][0]["q"]["kernel"]))
    # grad_norm under pruning reflects trainable grads only (smaller or equal)
    assert float(l_p["grad_norm"]) <= float(l_m["grad_norm"]) + 1e-6


@pytest.mark.slow
def test_adam_mu_dtype_bf16_state_and_trajectory():
    """cfg.adam_mu_dtype='bfloat16' stores Adam's first moment in bf16 (optax
    mu_dtype) while nu stays f32 (b2=0.999 increments underflow bf16's ulp —
    see the config knob's numerics note), and the short-horizon training
    trajectory tracks the f32-mu run closely."""
    import optax

    def run(mu_dtype):
        cfg = _cfg(adam_mu_dtype=mu_dtype)
        init_fn, fwd_fn = get_model(cfg.model)
        params = init_fn(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(cfg)
        state = create_train_state(cfg, params, jax.random.PRNGKey(1))
        step = make_train_step(cfg, tx, fwd_fn, donate=False)
        data = _data(cfg, n=32)
        losses = []
        for _ in range(3):
            for batch in _batches(data, cfg.batch_size):
                state, l = step(state, batch)
                losses.append(float(l["total"]))
        return state, losses

    s_bf16, l_bf16 = run("bfloat16")
    s_f32, l_f32 = run("float32")

    # the mu tree holds bf16 leaves, nu stays f32
    adam_states = [s for s in jax.tree_util.tree_leaves(
        s_bf16.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    assert adam_states, "no ScaleByAdamState found in opt_state"
    for st in adam_states:
        for mu in jax.tree_util.tree_leaves(st.mu):
            assert mu.dtype == jnp.bfloat16, mu.dtype
        for nu in jax.tree_util.tree_leaves(st.nu):
            assert nu.dtype == jnp.float32, nu.dtype

    # trajectory: same descent to within bf16 rounding accumulation
    assert np.isfinite(l_bf16[-1])
    assert abs(l_bf16[-1] - l_f32[-1]) < 0.05 * max(abs(l_f32[-1]), 1e-3), (
        l_bf16[-1], l_f32[-1])


def test_adam_mu_dtype_validation():
    import pytest

    with pytest.raises(ValueError):
        _cfg(adam_mu_dtype="float16")
