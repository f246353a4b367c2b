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
    """Round-4: the whole-T kernel holds full (T, BB, .) tensors in VMEM, so
    long-T shapes blow the 16 MiB scoped limit (T=512 towers faulted at
    40 MiB on v5e).  fits_vmem() gates that path; round 5 adds the STREAMING
    kernel behind it, so a use_pallas long-T run now routes to the
    time-chunked kernel and must match the XLA scan numerically."""
    # gate decisions pinned against the measured compiles (lstm.py docstring)
    assert plstm.fits_vmem(48, 64, 4 * 74)       # headline towers: one block
    assert plstm.fits_vmem(48, 64, 4 * 35)
    assert plstm.fits_vmem(48, 128, 4 * 74)      # B=128: 32-row blocks
    assert plstm.fits_vmem(128, 64, 4 * 128)     # mid-T: 8-row blocks
    assert not plstm.fits_vmem(256, 64, 4 * 74)  # the faulting retry5 shape
                                                 # (bwd 20.12M at BB=8)
    assert not plstm.fits_vmem(512, 16, 4 * 128)
    assert not plstm.fits_vmem(512, 32, 4 * 74)  # the faulting retry4 shape

    # ...but all of those long-T shapes now stream (VERDICT r4 item 1)
    assert plstm.stream_geometry(256, 64, 4 * 74) is not None
    assert plstm.stream_geometry(512, 16, 4 * 128) is not None
    assert plstm.stream_geometry(512, 32, 4 * 74) is not None

    # routing: use_pallas=True at a whole-T-off-budget shape takes the
    # streaming kernel and matches the XLA scan
    B, T, F, H = 16, 512, 5, 128
    params = bilstm.rnn_params(jax.random.PRNGKey(2), F, H, "lstm")
    x = jnp.array(RNG.normal(size=(B, T, F)).astype(np.float32))
    lengths = jnp.array(RNG.integers(1, T + 1, size=B))
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    p = params["fwd"]
    ys_k, h_k = bilstm._scan_direction(p, x, mask, "lstm", False, use_pallas=True)
    ys_x, h_x = bilstm._scan_direction(p, x, mask, "lstm", False, use_pallas=False)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_x),
                               rtol=1e-5, atol=1e-5)


def test_prime_t_has_no_stream_geometry_and_falls_back():
    """T with no divisor in [8, T) cannot chunk — the XLA scan fallback must
    remain reachable (and exact, it IS the same code path)."""
    B, T, F, H = 16, 509, 5, 128            # 509 is prime
    assert not plstm.fits_vmem(T, B, 4 * H)
    assert plstm.stream_geometry(T, B, 4 * H) is None
    assert not plstm.kernelizable(T, B, 4 * H)
    params = bilstm.rnn_params(jax.random.PRNGKey(4), F, H, "lstm")
    x = jnp.array(RNG.normal(size=(B, T, F)).astype(np.float32))
    lengths = jnp.array(RNG.integers(1, T + 1, size=B))
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    p = params["fwd"]
    ys_k, h_k = bilstm._scan_direction(p, x, mask, "lstm", False, use_pallas=True)
    ys_x, h_x = bilstm._scan_direction(p, x, mask, "lstm", False, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(ys_k), np.asarray(ys_x))
    np.testing.assert_array_equal(np.asarray(h_k), np.asarray(h_x))


# ---------------------------------------------------------------------------
# Streaming (time-chunked) kernel — round 5 (VERDICT r4 item 1)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("reverse", [False, True])
def test_stream_matches_xla_scan(reverse):
    """Force the streaming path at a small 2-D grid (2 batch blocks x 3 time
    chunks) and pin fwd + grad equivalence across BOTH kinds of block
    boundary (the h/c carry across time chunks, the dw/db accumulation
    across batch blocks), with masking edges inside and across chunks."""
    B, T, F, H = 16, 12, 5, 4
    params = bilstm.rnn_params(jax.random.PRNGKey(5), F, H, "lstm")
    p = params["fwd"]
    x = jnp.array(RNG.normal(size=(B, T, F)).astype(np.float32))
    # lengths straddle every chunk boundary (chunks of 4): incl. full and 1
    lengths = jnp.array([12, 2, 4, 5, 8, 9, 1, 11, 12, 3, 4, 6, 7, 10, 12, 1])
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)

    plstm.set_force_stream((8, 4))           # grid (2, 3)
    try:
        def loss(p, x, use_pallas):
            ys, h = bilstm._scan_direction(p, x, mask, "lstm", reverse,
                                           use_pallas=use_pallas)
            return jnp.sum(ys ** 2) + 3.0 * jnp.sum(
                h * jnp.arange(h.size).reshape(h.shape))

        ys_x, h_x = bilstm._scan_direction(p, x, mask, "lstm", reverse,
                                           use_pallas=False)
        ys_p, h_p = bilstm._scan_direction(p, x, mask, "lstm", reverse,
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
        plstm.set_force_stream(None)


def test_stream_geometry_contract():
    """(BB, TC) picks: BB maximized first (batch blocks serialize the
    recurrence), TC the largest fitting divisor of T in [8, T); Mosaic tile
    rule respected for gridded sublane dims; tiny T never streams."""
    geom = plstm.stream_geometry(512, 32, 4 * 74)
    assert geom is not None and geom[0] == 32 and 512 % geom[1] == 0
    assert plstm.stream_geometry(8, 64, 4 * 74) is None      # T too short
    bb, tc = plstm.stream_geometry(512, 40, 4 * 296)          # non-pow2 B
    assert bb == 40 or bb % 8 == 0
    assert tc >= 8 and 512 % tc == 0


def test_training_vs_inference_kernel_routing():
    """VERDICT r4 item 5: the decision matrix for Pallas-vs-XLA recurrence
    routing.  Inference (deterministic fwd-only) takes the kernel ONLY at
    ungridded single-block geometries — the gridded GRU measured 2x slower
    on fwd-only at B=128 (benchmarks/RESULTS.md round-4 continuation)."""
    G = 4 * 74
    # training: whole-T (single and gridded) and streaming all kernelize
    assert bilstm._use_kernel("lstm", 48, 64, G, training=True)
    assert bilstm._use_kernel("lstm", 48, 128, G, training=True)
    assert bilstm._use_kernel("lstm", 512, 32, G, training=True)   # streams
    # inference: single-block only
    assert bilstm._use_kernel("lstm", 48, 64, G, training=False)
    assert not bilstm._use_kernel("lstm", 48, 128, G, training=False)
    assert not bilstm._use_kernel("lstm", 512, 32, G, training=False)
    # GRU mirrors the matrix
    G3 = 3 * 74
    assert bilstm._use_kernel("gru", 48, 64, G3, training=True)
    assert bilstm._use_kernel("gru", 48, 128, G3, training=True)
    assert bilstm._use_kernel("gru", 48, 64, G3, training=False)
    assert not bilstm._use_kernel("gru", 48, 128, G3, training=False)


def test_route_prefers_streaming_over_gridded_whole_at_long_t():
    """The round-5 GRU T=256 mis-route regression (RESULTS.md round-5): the
    3-gate GRU's whole-T kernel still 'fits' at T=256/B=32 with a GRIDDED
    bb=8 block, which serializes 4 batch blocks x 256 steps and measured
    10.4 ms where the XLA scan runs 5.7 (both variant orders).  _route must
    prefer the streaming kernel whenever T>=256 and streaming keeps a wider
    batch block — in BOTH cells — while leaving the measured short-T
    decisions untouched (ungridded whole at the headline shapes; gridded
    whole at B=128/T=48 where it won training by -13%)."""
    from mmda_tpu.ops.pallas import gru as pgru

    # the mis-routed shape: whole-T fits only gridded (bb=8) -> stream
    assert pgru._batch_block(32, 256, 3 * 35) not in (None, 32)
    mode, geom = pgru._route(256, 32, 3 * 35)
    assert mode == "stream" and geom[0] == 32, (mode, geom)
    # T=512: whole-T cannot fit at all -> stream (unchanged)
    assert pgru._route(512, 32, 3 * 74)[0] == "stream"
    # headline shapes: ungridded whole-T (unchanged)
    assert pgru._route(48, 64, 3 * 74) == ("whole", 64)
    # short-T gridded whole-T preserved (measured training win at B=128)
    mode, bb = pgru._route(48, 128, 3 * 35)
    assert mode == "whole" and bb < 128
    # LSTM: same preference code path (its footprint already streams at
    # these shapes, so only the T>=256 branches are reachable)
    assert plstm._route(256, 32, 4 * 35)[0] == "stream"
    assert plstm._route(48, 64, 4 * 74) == ("whole", 64)


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
