"""Fused short-sequence attention kernel (ops/pallas/short_attention.py):
forward + gradient equivalence vs the XLA path (interpret mode on CPU),
in-kernel dropout statistics/determinism, and bert_encode routing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmda_tpu.ops.pallas import short_attention as sa

RNG = np.random.default_rng(9)


@pytest.fixture(autouse=True)
def _interpret_mode():
    sa.set_force_interpret(True)
    yield
    sa.set_force_interpret(False)


def _inputs(B=3, nh=4, S=10, hd=8, masked=True):
    q = jnp.array(RNG.normal(size=(B, nh, S, hd)).astype(np.float32))
    k = jnp.array(RNG.normal(size=(B, nh, S, hd)).astype(np.float32))
    v = jnp.array(RNG.normal(size=(B, nh, S, hd)).astype(np.float32))
    mask = np.ones((B, S), np.float32)
    if masked:
        mask[0, S // 2:] = 0
        mask[-1, 3:] = 0
    bias = jnp.array((1.0 - mask) * -1e9)
    return q, k, v, bias, mask


def _xla_ref(q, k, v, bias):
    hd = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_forward_matches_xla():
    q, k, v, bias, mask = _inputs()
    seed = jnp.zeros((1,), jnp.int32)
    got = sa.short_attention(q, k, v, bias, seed, 0.0)
    want = _xla_ref(q, k, v, bias)
    real = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1, 3)[real],
                               np.asarray(want).transpose(0, 2, 1, 3)[real],
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_xla():
    q, k, v, bias, _ = _inputs(B=2, nh=2, S=6, hd=4)
    seed = jnp.zeros((1,), jnp.int32)
    tgt = jnp.array(RNG.normal(size=q.shape).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum((sa.short_attention(q, k, v, bias, seed, 0.0) - tgt) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum((_xla_ref(q, k, v, bias) - tgt) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dropout_statistics_and_determinism():
    q, k, v, bias, _ = _inputs(B=4, nh=2, S=12, hd=8, masked=False)
    rate = 0.5
    seed = jnp.array([123], jnp.int32)
    out1 = sa.short_attention(q, k, v, bias, seed, rate)
    out2 = sa.short_attention(q, k, v, bias, seed, rate)
    # deterministic per seed (bwd regenerates the identical mask)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # different seed -> different masks
    out3 = sa.short_attention(q, k, v, bias, jnp.array([77], jnp.int32), rate)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # unbiased in expectation: mean over many seeds approaches the
    # deterministic output (loose check)
    det = sa.short_attention(q, k, v, bias, seed, 0.0)
    acc = np.zeros_like(np.asarray(det))
    n = 24
    for s in range(n):
        acc += np.asarray(sa.short_attention(
            q, k, v, bias, jnp.array([1000 + s], jnp.int32), rate))
    np.testing.assert_allclose(acc / n, np.asarray(det), rtol=0.5, atol=0.35)


def test_dropout_gradient_is_consistent_with_its_forward():
    """The bwd kernel regenerates the fwd mask: grads must match numerical
    differentiation of the (fixed-seed) fused forward."""
    q, k, v, bias, _ = _inputs(B=1, nh=1, S=6, hd=4, masked=False)
    seed = jnp.array([5], jnp.int32)
    rate = 0.3

    def f(q):
        return jnp.sum(sa.short_attention(q, k, v, bias, seed, rate) ** 2)

    g = jax.grad(f)(q)
    eps = 1e-3
    flat = np.asarray(q).ravel()
    for idx in [0, 7, 13]:
        dq = np.zeros_like(flat)
        dq[idx] = eps
        dq = jnp.array(dq.reshape(q.shape))
        num = (float(f(q + dq)) - float(f(q - dq))) / (2 * eps)
        np.testing.assert_allclose(float(np.asarray(g).ravel()[idx]), num,
                                   rtol=5e-2, atol=1e-3)


def test_bert_encode_fused_routing_matches_xla():
    from mmda_tpu.models.bert import BertConfig, bert_encode, init_bert_params

    cfg = BertConfig.tiny()
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    B, S = 3, 12
    ids = jnp.array(RNG.integers(5, cfg.vocab_size, size=(B, S)), jnp.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 7:] = 0
    mask = jnp.array(mask)

    xla = bert_encode(params, cfg, ids, mask, deterministic=True,
                      compute_dtype=jnp.float32)
    fused = bert_encode(params, cfg, ids, mask, deterministic=True,
                        compute_dtype=jnp.float32, attn_impl="fused")
    real = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(fused)[real], np.asarray(xla)[real],
                               rtol=2e-4, atol=2e-4)
