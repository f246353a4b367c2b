"""Fused residual+dropout+LayerNorm kernel (ops/pallas/layernorm.py)
equivalence vs the XLA reference, interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmda_tpu.ops.pallas import layernorm as pln

RNG = np.random.default_rng(11)


@pytest.fixture(autouse=True)
def _interpret_mode():
    pln.set_force_interpret(True)
    yield
    pln.set_force_interpret(False)


def _ref(x, y, g, b, keep, rate, eps):
    """XLA oracle with the SAME hash mask."""
    z = x + (y * keep * (1.0 / (1.0 - rate)) if rate > 0 else y)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
    return (z - mu) * jax.lax.rsqrt(var + eps) * g + b


@pytest.mark.parametrize("N,H", [(64, 32), (200, 128)])  # 200: padded rows
def test_fused_ln_deterministic_matches_xla(N, H):
    x = jnp.array(RNG.normal(size=(N, H)).astype(np.float32))
    y = jnp.array(RNG.normal(size=(N, H)).astype(np.float32))
    g = jnp.array(RNG.normal(size=H).astype(np.float32))
    b = jnp.array(RNG.normal(size=H).astype(np.float32))
    want = _ref(x, y, g, b, None, 0.0, 1e-12)
    got = pln.residual_dropout_layernorm(x, y, g, b, None, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("N,H", [(64, 32), (300, 128)])
def test_fused_ln_dropout_fwd_and_grads(N, H):
    rate, eps = 0.1, 1e-12
    seed = jnp.array([77], jnp.int32)
    x = jnp.array(RNG.normal(size=(N, H)).astype(np.float32))
    y = jnp.array(RNG.normal(size=(N, H)).astype(np.float32))
    g = jnp.array(RNG.normal(size=H).astype(np.float32))
    b = jnp.array(RNG.normal(size=H).astype(np.float32))
    dout = jnp.array(RNG.normal(size=(N, H)).astype(np.float32))

    # same hash, full-tensor (row0=0 per block matches the global offsets)
    keep = pln._keep_mask((N, H), rate, seed, 0)
    want = _ref(x, y, g, b, keep, rate, eps)
    got = pln.residual_dropout_layernorm(x, y, g, b, seed, rate, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(x, y, g, b):
        return jnp.sum(pln.residual_dropout_layernorm(
            x, y, g, b, seed, rate, eps) * dout)

    def loss_ref(x, y, g, b):
        return jnp.sum(_ref(x, y, g, b, keep, rate, eps) * dout)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, y, g, b)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, y, g, b)
    for a, c in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-4)


def test_fused_ln_keep_rate_and_seed_variation():
    rate = 0.3
    keeps = np.asarray(pln._keep_mask((512, 256), rate,
                                      jnp.array([5], jnp.int32), 0))
    assert abs(keeps.mean() - (1.0 - rate)) < 0.01
    x = jnp.array(RNG.normal(size=(64, 32)).astype(np.float32))
    y = jnp.array(RNG.normal(size=(64, 32)).astype(np.float32))
    g, b = jnp.ones(32), jnp.zeros(32)
    a = pln.residual_dropout_layernorm(x, y, g, b,
                                       jnp.array([1], jnp.int32), rate)
    c = pln.residual_dropout_layernorm(x, y, g, b,
                                       jnp.array([2], jnp.int32), rate)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_bert_layer_fused_ln_routing():
    """BertConfig.fused_ln_dropout routes both per-layer LN sites through
    the kernel: deterministic output matches the plain path exactly (kernel
    not engaged); training output is finite, differs from deterministic,
    and backprops finite grads through both sites."""
    import dataclasses

    from mmda_tpu.models.bert import BertConfig, bert_encode, init_bert_params

    cfg = BertConfig.tiny()
    fused = dataclasses.replace(cfg, fused_ln_dropout=True)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    B, S = 2, 12
    ids = jnp.array(RNG.integers(5, cfg.vocab_size, size=(B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)

    det_plain = bert_encode(params, cfg, ids, mask, deterministic=True,
                            compute_dtype=jnp.float32)
    det_fused = bert_encode(params, fused, ids, mask, deterministic=True,
                            compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(det_plain), np.asarray(det_fused))

    def run(p, rng):
        return bert_encode(p, fused, ids, mask, deterministic=False,
                           dropout_rng=rng, compute_dtype=jnp.float32)

    out = run(params, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(det_fused))
    grads = jax.grad(lambda p: jnp.sum(run(p, jax.random.PRNGKey(4)) ** 2))(
        params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # LN scale/bias receive gradient through the fused site
    assert float(np.abs(np.asarray(
        grads["layers"][0]["attn_ln"]["scale"])).sum()) > 0
