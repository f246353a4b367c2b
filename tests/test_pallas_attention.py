"""Flash-attention Pallas kernel equivalence vs plain XLA attention
(interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmda_tpu.ops.pallas import attention as fa

RNG = np.random.default_rng(5)


@pytest.fixture(autouse=True)
def _interpret_mode():
    fa.set_force_interpret(True)
    yield
    fa.set_force_interpret(False)


@pytest.mark.parametrize("S", [16, 40])  # 40 exercises padding to block size
def test_flash_matches_xla(S):
    BH, D = 6, 8
    q = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    k = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    v = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    mask = np.ones((BH, S), np.float32)
    mask[1, S // 2:] = 0
    mask[3, 3:] = 0
    bias = jnp.array((1.0 - mask) * fa.NEG_INF)

    want = fa._xla_attention(q, k, v, bias)
    got = fa.flash_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_gradients_match_xla():
    BH, S, D = 2, 16, 4
    q = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    k = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    v = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    bias = jnp.zeros((BH, S))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, bias) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(fa._xla_attention(q, k, v, bias) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
