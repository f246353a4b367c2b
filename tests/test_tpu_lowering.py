"""Cross-lower every Pallas kernel (fwd + bwd) for the TPU platform.

Interpret-mode equivalence tests cannot catch Mosaic lowering errors — a
block spec whose last two dims violate the (8, 128) tiling rule passes
interpret and fails only when the kernel is first COMPILED for TPU.  That
class of bug burned two hardware runs in round 4 (fused-LN bwd partials and
the flash lse/bias layouts at num_blocks > 1, benchmarks/r4_tpu_logs/).

`jax.export.export(..., platforms=["tpu"])` runs the full MLIR + Mosaic
lowering pipeline on the CPU host with no TPU attached, so the tiling check
(`pallas/mosaic/lowering.py::_check_block_mappings`) runs here, in CI.
Shapes are chosen to exercise MULTI-block grids — single-block shapes are
exactly the ones that hid these bugs.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import export as jexport

from mmda_tpu.ops.pallas import attention as pattn
from mmda_tpu.ops.pallas import gru as pgru
from mmda_tpu.ops.pallas import layernorm as pln
from mmda_tpu.ops.pallas import lstm as plstm
from mmda_tpu.ops.pallas import lstm_multi as plstm_multi
from mmda_tpu.ops.pallas import short_attention as psattn

RNG = np.random.default_rng(17)


@pytest.fixture(autouse=True)
def _force_compile_path(monkeypatch):
    """Make every kernel take the pallas_call compile path (not interpret).
    lstm_multi/gru bind `_interpret` by name at import, so patch them too."""
    for mod in (pattn, pgru, pln, plstm, plstm_multi, psattn):
        monkeypatch.setattr(mod, "_interpret", lambda: False)


def _lowers(fn, *args):
    """Assert fn(*args) lowers for the tpu platform (trace + Mosaic only,
    no execution)."""
    jexport.export(jax.jit(fn), platforms=["tpu"])(*args)


def _f32(*shape):
    return jnp.asarray(RNG.normal(size=shape), jnp.float32)


SEED = jnp.zeros((1,), jnp.int32)


@pytest.mark.parametrize("S", [50, 512, 1024])
def test_flash_attention_lowers(S):
    BH, D = 8, 64
    q, k, v = _f32(BH, S, D), _f32(BH, S, D), _f32(BH, S, D)
    bias = jnp.zeros((BH, S), jnp.float32)

    def fwd_bwd(q, k, v):
        out, vjp = jax.vjp(
            lambda q, k, v: pattn.flash_attention(q, k, v, bias, SEED, 0.1),
            q, k, v)
        return out, vjp(out)

    _lowers(fwd_bwd, q, k, v)


@pytest.mark.parametrize("bq,bk", [(256, 256), (128, 512), (64, 128)])
def test_flash_attention_lowers_block_sweep(bq, bk, monkeypatch):
    """The MMDA_FLASH_BQ/BK env override (bench_gap_long.py block-size
    sweep) changes the lse/dsum sidecar and bias-block geometries — every
    sweep point must pass Mosaic lowering before TPU time is queued."""
    monkeypatch.setenv("MMDA_FLASH_BQ", str(bq))
    monkeypatch.setenv("MMDA_FLASH_BK", str(bk))
    BH, S, D = 8, 512, 64
    q, k, v = _f32(BH, S, D), _f32(BH, S, D), _f32(BH, S, D)
    bias = jnp.zeros((BH, S), jnp.float32)

    def fwd_bwd(q, k, v):
        out, vjp = jax.vjp(
            lambda q, k, v: pattn.flash_attention(q, k, v, bias, SEED, 0.1),
            q, k, v)
        return out, vjp(out)

    _lowers(fwd_bwd, q, k, v)


@pytest.mark.parametrize("bq,bk", [(128, 128), (64, 128)])
def test_flash_attention_lowers_bf16(bq, bk, monkeypatch):
    """bf16 operands (the round-5 mixed-precision kernel) change the Mosaic
    tile rules — bf16 minimum tile is (16, 128), not (8, 128) — and the
    dq/dk/dv out_shapes now carry the input dtype.  Multi-block S=512 at the
    shipped geometry and at the narrowest swept q-block must cross-lower
    BEFORE any TPU time is queued on the bf16 kernel (round-4 discipline)."""
    monkeypatch.setenv("MMDA_FLASH_BQ", str(bq))
    monkeypatch.setenv("MMDA_FLASH_BK", str(bk))
    BH, S, D = 8, 512, 64
    q = jnp.asarray(RNG.normal(size=(BH, S, D)), jnp.bfloat16)
    k = jnp.asarray(RNG.normal(size=(BH, S, D)), jnp.bfloat16)
    v = jnp.asarray(RNG.normal(size=(BH, S, D)), jnp.bfloat16)
    bias = jnp.zeros((BH, S), jnp.float32)

    def fwd_bwd(q, k, v):
        out, vjp = jax.vjp(
            lambda q, k, v: pattn.flash_attention(q, k, v, bias, SEED, 0.1),
            q, k, v)
        return out, vjp(out)

    _lowers(fwd_bwd, q, k, v)


def test_short_attention_lowers_headline_shape():
    B, nh, S, hd = 64, 12, 50, 64
    q, k, v = _f32(B, nh, S, hd), _f32(B, nh, S, hd), _f32(B, nh, S, hd)
    bias = jnp.zeros((B, S), jnp.float32)

    def fwd_bwd(q, k, v):
        out, vjp = jax.vjp(
            lambda q, k, v: psattn.short_attention(q, k, v, bias, SEED, 0.1),
            q, k, v)
        return out, vjp(out)

    _lowers(fwd_bwd, q, k, v)


def test_fused_layernorm_lowers_headline_rows():
    # B=64 x S=50 = 3200 rows -> 25 grid blocks at 128 rows/block: the
    # multi-block dg/db reduction that failed on hardware.
    N, H = 3200, 768
    x, y = _f32(N, H), _f32(N, H)
    g, b = _f32(H), _f32(H)

    def fwd_bwd(x, y, g, b):
        out, vjp = jax.vjp(
            lambda x, y, g, b: pln.residual_dropout_layernorm(
                x, y, g, b, SEED, 0.1),
            x, y, g, b)
        return out, vjp(out)

    _lowers(fwd_bwd, x, y, g, b)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_scan_lowers(reverse):
    T, B, H = 8, 16, 128
    x_proj = _f32(T, B, 4 * H)
    w_hh_t = _f32(H, 4 * H)
    mask = jnp.ones((T, B, 1), jnp.float32)

    def fwd_bwd(x_proj, w_hh_t):
        def loss(x_proj, w_hh_t):
            ys, h = plstm.lstm_scan(x_proj, w_hh_t, mask, reverse=reverse)
            return jnp.sum(ys) + jnp.sum(h)
        return jax.value_and_grad(loss, argnums=(0, 1))(x_proj, w_hh_t)

    _lowers(fwd_bwd, x_proj, w_hh_t)


def test_lstm_scan_multi_lowers():
    D, T, B, HP = 2, 8, 16, 128
    x_proj = _f32(D, T, B, 4 * HP)
    w_hh_t = _f32(D, HP, 4 * HP)
    mask = jnp.ones((D, T, B, 1), jnp.float32)

    def fwd(x_proj, w_hh_t):
        return plstm_multi.lstm_scan_multi(x_proj, w_hh_t, mask)

    _lowers(fwd, x_proj, w_hh_t)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_scan_lowers(reverse):
    # single-block geometry (the headline-tower analog)
    T, B, H = 8, 16, 128
    x_proj = _f32(T, B, 3 * H)
    w_hh_t = _f32(H, 3 * H)
    b_hh = _f32(1, 3 * H)
    mask = jnp.ones((T, B, 1), jnp.float32)

    def fwd_bwd(x_proj, w_hh_t, b_hh):
        def loss(x_proj, w_hh_t, b_hh):
            ys, h = pgru.gru_scan(x_proj, w_hh_t, b_hh, mask, reverse=reverse)
            return jnp.sum(ys) + jnp.sum(h)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(x_proj, w_hh_t, b_hh)

    _lowers(fwd_bwd, x_proj, w_hh_t, b_hh)


def test_gru_scan_lowers_multi_block_grid(monkeypatch):
    """Multi-block grid: the (H, G)/(1, G) dw/db shared output blocks are
    revisited across sequential programs — the exact pattern that was
    tile-illegal for (num_blocks, block)-shaped sidecars in round 4."""
    T, B, H = 64, 64, 128
    bb = pgru._batch_block(B, T, 3 * H)
    assert bb is not None and B // bb > 1, (bb, "expected a multi-block grid")
    x_proj = _f32(T, B, 3 * H)
    w_hh_t = _f32(H, 3 * H)
    b_hh = _f32(1, 3 * H)
    mask = jnp.ones((T, B, 1), jnp.float32)

    def fwd_bwd(x_proj, w_hh_t, b_hh):
        def loss(x_proj, w_hh_t, b_hh):
            ys, h = pgru.gru_scan(x_proj, w_hh_t, b_hh, mask, reverse=False)
            return jnp.sum(ys) + jnp.sum(h)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(x_proj, w_hh_t, b_hh)

    _lowers(fwd_bwd, x_proj, w_hh_t, b_hh)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_stream_lowers_production_geometry(reverse):
    """Streaming (time-chunked) kernel at the REAL long-seq tower shape the
    round-4 fallback abandoned: T=512, B=32, H=74 (the bench_t512 towers).
    The natural geometry must route to streaming and pass full Mosaic
    lowering (grid over time chunks, revisited h/c scratch carry, boundary
    blocks) before any TPU time is queued on it."""
    T, B, H = 512, 32, 74
    assert plstm._batch_block(B, T, 4 * H) is None          # whole-T cannot fit
    geom = plstm.stream_geometry(T, B, 4 * H)
    assert geom is not None and geom[1] < T, geom
    x_proj = _f32(T, B, 4 * H)
    w_hh_t = _f32(H, 4 * H)
    mask = jnp.ones((T, B, 1), jnp.float32)

    def fwd_bwd(x_proj, w_hh_t):
        def loss(x_proj, w_hh_t):
            ys, h = plstm.lstm_scan(x_proj, w_hh_t, mask, reverse=reverse)
            return jnp.sum(ys) + jnp.sum(h)
        return jax.value_and_grad(loss, argnums=(0, 1))(x_proj, w_hh_t)

    _lowers(fwd_bwd, x_proj, w_hh_t)


def test_lstm_stream_lowers_multi_batch_block(monkeypatch):
    """Streaming with BOTH grid dims > 1 (batch blocks x time chunks): the
    carry scratch must re-initialize per batch block and the dw shared
    output block must accumulate across the full 2-D sequential grid."""
    T, B, H = 64, 64, 128
    monkeypatch.setattr(plstm, "_FORCE_STREAM_GEOM", (32, 16))  # grid (2, 4)
    x_proj = _f32(T, B, 4 * H)
    w_hh_t = _f32(H, 4 * H)
    mask = jnp.ones((T, B, 1), jnp.float32)

    def fwd_bwd(x_proj, w_hh_t):
        def loss(x_proj, w_hh_t):
            ys, h = plstm.lstm_scan(x_proj, w_hh_t, mask, reverse=False)
            return jnp.sum(ys) + jnp.sum(h)
        return jax.value_and_grad(loss, argnums=(0, 1))(x_proj, w_hh_t)

    _lowers(fwd_bwd, x_proj, w_hh_t)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_stream_lowers(reverse, monkeypatch):
    """Streaming GRU at a 2-D grid (2 batch blocks x 4 time chunks) with the
    extra b_hh input and db shared output block."""
    T, B, H = 64, 64, 128
    monkeypatch.setattr(pgru, "_FORCE_STREAM_GEOM", (32, 16))
    x_proj = _f32(T, B, 3 * H)
    w_hh_t = _f32(H, 3 * H)
    b_hh = _f32(1, 3 * H)
    mask = jnp.ones((T, B, 1), jnp.float32)

    def fwd_bwd(x_proj, w_hh_t, b_hh):
        def loss(x_proj, w_hh_t, b_hh):
            ys, h = pgru.gru_scan(x_proj, w_hh_t, b_hh, mask, reverse=reverse)
            return jnp.sum(ys) + jnp.sum(h)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(x_proj, w_hh_t, b_hh)

    _lowers(fwd_bwd, x_proj, w_hh_t, b_hh)


def test_gru_stream_lowers_production_geometry():
    """Natural streaming routing at the long-T GRU tower shape (T=512, B=32,
    H=74 towers -> G=222)."""
    T, B, H = 512, 32, 74
    assert pgru._batch_block(B, T, 3 * H) is None
    geom = pgru.stream_geometry(T, B, 3 * H)
    assert geom is not None and geom[1] < T, geom
    x_proj = _f32(T, B, 3 * H)
    w_hh_t = _f32(H, 3 * H)
    b_hh = _f32(1, 3 * H)
    mask = jnp.ones((T, B, 1), jnp.float32)

    def fwd_bwd(x_proj, w_hh_t, b_hh):
        def loss(x_proj, w_hh_t, b_hh):
            ys, h = pgru.gru_scan(x_proj, w_hh_t, b_hh, mask, reverse=False)
            return jnp.sum(ys) + jnp.sum(h)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(x_proj, w_hh_t, b_hh)

    _lowers(fwd_bwd, x_proj, w_hh_t, b_hh)


@pytest.mark.parametrize("T,B", [(64, 64), (128, 64)])
def test_lstm_scan_lowers_long_t_small_blocks(T, B):
    """Round-4 footprint gate (_batch_block(B, T, G)) shrinks batch blocks
    as T grows (the kernel holds full (T, BB, .) tensors in VMEM) — these
    are the NEW 16/8-row multi-block geometries it can emit; they must pass
    full Mosaic lowering before any TPU time is queued on them."""
    H = 128
    bb = plstm._batch_block(B, T, 4 * H)
    assert bb in (8, 16) and B // bb > 1, (bb, "expected a new small-block grid")
    x_proj = _f32(T, B, 4 * H)
    w_hh_t = _f32(H, 4 * H)
    mask = jnp.ones((T, B, 1), jnp.float32)

    def fwd_bwd(x_proj, w_hh_t):
        def loss(x_proj, w_hh_t):
            ys, h = plstm.lstm_scan(x_proj, w_hh_t, mask, reverse=False)
            return jnp.sum(ys) + jnp.sum(h)
        return jax.value_and_grad(loss, argnums=(0, 1))(x_proj, w_hh_t)

    _lowers(fwd_bwd, x_proj, w_hh_t)


@pytest.mark.parametrize("S,dt", [(514, jnp.bfloat16), (514, jnp.float32),
                                  (1026, jnp.bfloat16), (258, jnp.bfloat16)])
def test_flash_attention_ragged_lowers(S, dt):
    """Ragged-Q mode (round 5) at the REAL bench shapes: S = T + 2 is never
    a multiple of the 128 block, so these are the shapes the kernels
    actually compile at on hardware.  Whole-(S8, D) blocks, the
    lanes-broadcast (S8, 8) stats layout, and the uneven static q chunks
    (incl. the 8-row tail) must all pass Mosaic BEFORE TPU time is queued
    (round-4 discipline)."""
    BH, D = 8, 64
    q = jnp.asarray(RNG.normal(size=(BH, S, D)), dt)
    k = jnp.asarray(RNG.normal(size=(BH, S, D)), dt)
    v = jnp.asarray(RNG.normal(size=(BH, S, D)), dt)
    bias = jnp.zeros((BH, S), jnp.float32)
    assert pattn._ragged_mode(S, D, 128, 128, q.dtype.itemsize)

    def fwd_bwd(q, k, v):
        out, vjp = jax.vjp(
            lambda q, k, v: pattn.flash_attention(q, k, v, bias, SEED, 0.1),
            q, k, v)
        return out, vjp(out)

    _lowers(fwd_bwd, q, k, v)
