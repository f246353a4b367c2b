"""Pallas fused-LSTM kernel equivalence vs the XLA scan path (interpret mode
on CPU; compiled on real TPU by benchmarks/bench_kernels.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmda_tpu.models import bilstm
from mmda_tpu.ops.pallas import lstm as plstm

RNG = np.random.default_rng(11)


@pytest.fixture(autouse=True)
def _interpret_mode():
    plstm.set_force_interpret(True)
    yield
    plstm.set_force_interpret(False)


def _setup(B=4, T=6, F=5, H=4):
    params = bilstm.rnn_params(jax.random.PRNGKey(0), F, H, "lstm")
    x = jnp.array(RNG.normal(size=(B, T, F)).astype(np.float32))
    lengths = jnp.array([T, 2, 4, 1][:B])
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    return params, x, lengths, mask


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_matches_xla_scan(reverse):
    params, x, lengths, mask = _setup()
    p = params["fwd"]
    ys_x, h_x = bilstm._scan_direction(p, x, mask, "lstm", reverse, use_pallas=False)
    ys_p, h_p = bilstm._scan_direction(p, x, mask, "lstm", reverse, use_pallas=True)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_gradients_match_xla_scan(reverse):
    params, x, lengths, mask = _setup()
    p = params["fwd"]

    def loss(p, x, use_pallas):
        ys, h = bilstm._scan_direction(p, x, mask, "lstm", reverse, use_pallas=use_pallas)
        # weight outputs so both ys and final-state gradients are exercised
        return jnp.sum(ys ** 2) + 3.0 * jnp.sum(h * jnp.arange(h.size).reshape(h.shape))

    gx = jax.grad(loss, argnums=(0, 1))(p, x, False)
    gp = jax.grad(loss, argnums=(0, 1))(p, x, True)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)


def test_full_birnn_with_pallas_matches():
    params, x, lengths, mask = _setup()

    from mmda_tpu.ops import pallas as flags

    ys_x, h_x = bilstm.birnn(params, x, lengths, "lstm")
    flags.set_enabled(True)
    try:
        ys_p, h_p = bilstm.birnn(params, x, lengths, "lstm")
    finally:
        flags.set_enabled(False)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Lane-padded multi-direction kernel (ops/pallas/lstm_multi.py, round 2)
# ---------------------------------------------------------------------------


def test_multi_kernel_matches_pair_fallback():
    """extract_features_pair via the multi kernel == two extract_features."""
    kv, ka = jax.random.split(jax.random.PRNGKey(7))
    pv = bilstm.extractor_params(kv, 5, 5, "lstm")
    pa = bilstm.extractor_params(ka, 9, 9, "lstm")
    B, T = 4, 6
    xv = jnp.array(RNG.normal(size=(B, T, 5)).astype(np.float32))
    xa = jnp.array(RNG.normal(size=(B, T, 9)).astype(np.float32))
    lv = jnp.array([6, 2, 4, 1])
    la = jnp.array([3, 6, 1, 5])

    want_v, want_a = bilstm.extract_features_pair(
        pv, pa, xv, xa, lv, la, use_pallas_multi=False)
    got_v, got_a = bilstm.extract_features_pair(
        pv, pa, xv, xa, lv, la, use_pallas_multi=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=1e-5, atol=1e-5)


def test_multi_kernel_grads_match_fallback():
    kv, ka = jax.random.split(jax.random.PRNGKey(8))
    pv = bilstm.extractor_params(kv, 5, 5, "lstm")
    pa = bilstm.extractor_params(ka, 7, 7, "lstm")
    B, T = 3, 5
    xv = jnp.array(RNG.normal(size=(B, T, 5)).astype(np.float32))
    xa = jnp.array(RNG.normal(size=(B, T, 7)).astype(np.float32))
    lv = jnp.array([5, 2, 3])
    la = jnp.array([4, 5, 1])

    def loss(params, use_multi):
        v, a = bilstm.extract_features_pair(
            params["v"], params["a"], xv, xa, lv, la,
            use_pallas_multi=use_multi)
        return jnp.sum(v**2) + jnp.sum(jnp.tanh(a))

    params = {"v": pv, "a": pa}
    g_ref = jax.grad(loss)(params, False)
    g_multi = jax.grad(loss)(params, True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g_multi, g_ref)


@pytest.mark.parametrize("B", [6, 8])
def test_batch_blocked_grid_matches_xla_scan(B):
    """Round-3 batch-block grid (the unblocked bwd kernel OOMs scoped VMEM at
    B=128 on v5e): force a multi-block grid by monkeypatching the block
    picker, and pin fwd+grad equivalence across block boundaries."""
    params = bilstm.rnn_params(jax.random.PRNGKey(1), 5, 4, "lstm")
    p = params["fwd"]
    T = 6
    x = jnp.array(RNG.normal(size=(B, T, 5)).astype(np.float32))
    lengths = jnp.array(([T, 2, 4, 1, 3, 6, 5, 2])[:B])
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)

    orig = plstm._batch_block
    plstm._batch_block = lambda n, t, g: 2  # -> grid of B//2 blocks
    try:
        assert plstm._batch_block(B, T, 16) == 2

        def loss(p, x, use_pallas):
            ys, h = bilstm._scan_direction(p, x, mask, "lstm", False,
                                           use_pallas=use_pallas)
            return jnp.sum(ys ** 2) + 3.0 * jnp.sum(
                h * jnp.arange(h.size).reshape(h.shape))

        ys_x, h_x = bilstm._scan_direction(p, x, mask, "lstm", False,
                                           use_pallas=False)
        ys_p, h_p = bilstm._scan_direction(p, x, mask, "lstm", False,
                                           use_pallas=True)
        np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x),
                                   rtol=1e-5, atol=1e-5)
        gx = jax.grad(loss, argnums=(0, 1))(p, x, False)
        gp = jax.grad(loss, argnums=(0, 1))(p, x, True)
        for a, b in zip(jax.tree_util.tree_leaves(gx),
                        jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)
    finally:
        plstm._batch_block = orig


@pytest.mark.slow
def test_long_t_vmem_gate_and_fallback():
    """Round-4: the kernel holds full (T, BB, .) tensors in VMEM, so long-T
    shapes blow the 16 MiB scoped limit (T=512 towers faulted at 40 MiB on
    v5e).  fits_vmem() gates the routing: production shapes keep the kernel,
    off-budget shapes take the XLA scan — which must produce the same
    numbers (it IS the reference path)."""
    # gate decisions pinned against the measured compiles (lstm.py docstring)
    assert plstm.fits_vmem(48, 64, 4 * 74)       # headline towers: one block
    assert plstm.fits_vmem(48, 64, 4 * 35)
    assert plstm.fits_vmem(48, 128, 4 * 74)      # B=128: 32-row blocks
    assert plstm.fits_vmem(128, 64, 4 * 128)     # mid-T: 8-row blocks
    assert not plstm.fits_vmem(256, 64, 4 * 74)  # the faulting retry5 shape
                                                 # (bwd 20.12M at BB=8)
    assert not plstm.fits_vmem(512, 16, 4 * 128)
    assert not plstm.fits_vmem(512, 32, 4 * 74)  # the faulting retry4 shape

    # routing: use_pallas=True at an off-budget shape falls back to XLA
    B, T, F, H = 16, 512, 5, 128
    params = bilstm.rnn_params(jax.random.PRNGKey(2), F, H, "lstm")
    x = jnp.array(RNG.normal(size=(B, T, F)).astype(np.float32))
    lengths = jnp.array(RNG.integers(1, T + 1, size=B))
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    p = params["fwd"]
    ys_k, h_k = bilstm._scan_direction(p, x, mask, "lstm", False, use_pallas=True)
    ys_x, h_x = bilstm._scan_direction(p, x, mask, "lstm", False, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(ys_k), np.asarray(ys_x))
    np.testing.assert_array_equal(np.asarray(h_k), np.asarray(h_x))


@pytest.mark.slow
def test_small_block_grid_matches_xla_scan():
    """The new footprint-gated small-block geometry (BB=8 at T=128, grid>1)
    must stay numerically equal to the XLA scan across block boundaries."""
    B, T, F, H = 64, 128, 5, 128
    assert plstm._batch_block(B, T, 4 * H) == 8
    params = bilstm.rnn_params(jax.random.PRNGKey(3), F, H, "lstm")
    x = jnp.array(RNG.normal(size=(B, T, F)).astype(np.float32))
    lengths = jnp.array(RNG.integers(1, T + 1, size=B))
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    p = params["fwd"]
    ys_p, h_p = bilstm._scan_direction(p, x, mask, "lstm", False, use_pallas=True)
    ys_x, h_x = bilstm._scan_direction(p, x, mask, "lstm", False, use_pallas=False)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x), rtol=1e-5, atol=1e-5)
