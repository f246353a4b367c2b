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


@pytest.mark.parametrize("S", [16, 40, 300])  # 40 exercises padding to block
# size; 300 exercises the MULTI-K-block path (3 blocks of 128 + padding) —
# the path Mosaic rejected until the static unroll fix (bench_long_seq.py)
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


def test_bert_encode_flash_routing_matches_xla():
    """cfg.use_flash_attention routes bert_encode's attention core through the
    Pallas kernel; outputs must match the XLA path (VERDICT round-1 item #5:
    the kernel must be reachable from a config flag, not dead code)."""
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
    flash = bert_encode(params, cfg, ids, mask, deterministic=True,
                        compute_dtype=jnp.float32, use_flash_attention=True)
    real = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(flash)[real], np.asarray(xla)[real],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("S", [16, 300])   # 300: multi-block + padded rows
def test_flash_blockwise_backward_matches_xla(S):
    """Round 4: the custom_vjp backward is now the blockwise Pallas kernel
    pair (O(S) memory), no longer an XLA standard-attention recompute — the
    grads must still be the XLA reference's, including across block
    boundaries and with padded rows/cols masked."""
    BH, D = 4, 8
    q = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    k = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    v = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    mask = np.ones((BH, S), np.float32)
    mask[1, S // 2:] = 0
    bias = jnp.array((1.0 - mask) * fa.NEG_INF)
    g = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, bias) * g)

    def loss_xla(q, k, v):
        return jnp.sum(fa._xla_attention(q, k, v, bias) * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _reference_dropout_attention(q, k, v, bias, seed, rate):
    """XLA-style attention with the keep mask drawn from the SAME positional
    hash the kernel uses — the oracle for the in-kernel dropout path."""
    D = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(D)
    s = s + bias[:, None, :]
    p = jax.nn.softmax(s, axis=-1)
    S = q.shape[1]
    keep = jnp.stack([fa._keep_mask((S, S), rate, seed, bh, 0, 0)
                      for bh in range(q.shape[0])])
    p = p * keep * (1.0 / (1.0 - rate))
    return jnp.einsum("bqk,bkd->bqd", p, v,
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("S", [16, 200])   # 200: blocks + padding with masks
def test_flash_inkernel_dropout_fwd_and_grads(S):
    """In-kernel dropout (round 4): forward equals the reference computed
    with the same hash mask, and the backward (which REGENERATES the mask
    blockwise rather than saving it) produces the reference grads."""
    BH, D = 3, 8
    rate = 0.3
    seed = jnp.array([1234], jnp.int32)
    q = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    k = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    v = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    mask = np.ones((BH, S), np.float32)
    mask[0, S - 3:] = 0
    bias = jnp.array((1.0 - mask) * fa.NEG_INF)
    g = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))

    want = _reference_dropout_attention(q, k, v, bias, seed, rate)
    got = fa.flash_attention(q, k, v, bias, seed, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, bias, seed, rate) * g)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_dropout_attention(q, k, v, bias, seed,
                                                    rate) * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_flash_dropout_statistics_and_zero_rate():
    BH, S, D = 2, 64, 8
    rate = 0.25
    q = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    k = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    v = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    bias = jnp.zeros((BH, S))
    # keep-rate of the hash is ~1-rate
    keeps = np.asarray(fa._keep_mask((256, 256), rate,
                                     jnp.array([7], jnp.int32), 0, 0, 0))
    assert abs(keeps.mean() - (1.0 - rate)) < 0.01
    # rate=0 (with or without a seed) is exactly the deterministic kernel
    det = fa.flash_attention(q, k, v, bias)
    z = fa.flash_attention(q, k, v, bias, jnp.array([9], jnp.int32), 0.0)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(z))
    # different seeds draw different masks
    a = fa.flash_attention(q, k, v, bias, jnp.array([1], jnp.int32), rate)
    b = fa.flash_attention(q, k, v, bias, jnp.array([2], jnp.int32), rate)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_bert_flash_training_dropout_routes_inkernel():
    """attn_impl='flash' no longer falls back to XLA when training with
    attention dropout — the kernel path must run, differ from deterministic,
    and backprop finitely."""
    from mmda_tpu.models.bert import BertConfig, bert_encode, init_bert_params

    cfg = BertConfig.tiny()
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    B, S = 2, 12
    ids = jnp.array(RNG.integers(5, cfg.vocab_size, size=(B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)

    def run(p, rng):
        return bert_encode(p, cfg, ids, mask, deterministic=False,
                           dropout_rng=rng, compute_dtype=jnp.float32,
                           attn_impl="flash")

    out = run(params, jax.random.PRNGKey(3))
    det = bert_encode(params, cfg, ids, mask, deterministic=True,
                      compute_dtype=jnp.float32, attn_impl="flash")
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(det))

    g = jax.grad(lambda p: jnp.sum(run(p, jax.random.PRNGKey(4)) ** 2))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_misa_forward_flash_flag_matches():
    from mmda_tpu.config import Config
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import BertConfig
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split

    bert_cfg = BertConfig.tiny(vocab_size=64)
    B, T = 4, 8
    split = make_split(SyntheticSpec(
        num_examples=B, max_len=T, vocab_size=64, bert_vocab_size=64, seed=2))
    batch = Batch(**split)
    init_fn, fwd_fn = get_model("MISA")
    base = dict(use_bert=True, hidden_size=16, compute_dtype="float32",
                visual_size=35, acoustic_size=74)
    cfg0 = Config(**base)
    cfg1 = Config(use_flash_attention=True, **base)
    params = init_fn(jax.random.PRNGKey(0), cfg0, bert_cfg=bert_cfg)
    out0 = fwd_fn(params, cfg0, batch, bert_cfg=bert_cfg, deterministic=True)
    out1 = fwd_fn(params, cfg1, batch, bert_cfg=bert_cfg, deterministic=True)
    np.testing.assert_allclose(np.asarray(out1.scores), np.asarray(out0.scores),
                               rtol=2e-4, atol=2e-4)


def test_flash_bf16_operands_match_f32_oracle():
    """Round-5 mixed precision: bf16 q/k/v run the kernel's matmuls in bf16
    with f32 accumulation and f32 softmax stats (the T=512 trace showed the
    f32-operand kernels at 46.6% of the step; bf16 is the v5e MXU's native
    rate).  fwd and grads must match the f32 XLA oracle applied to the SAME
    bf16-rounded values within bf16 matmul round-off; the output stays f32
    and the grads come back in the bf16 input dtype (custom_vjp contract)."""
    BH, S, D = 4, 300, 8   # 300: multi-K-block path + padding
    q16 = jnp.array(RNG.normal(size=(BH, S, D)), jnp.bfloat16)
    k16 = jnp.array(RNG.normal(size=(BH, S, D)), jnp.bfloat16)
    v16 = jnp.array(RNG.normal(size=(BH, S, D)), jnp.bfloat16)
    mask = np.ones((BH, S), np.float32)
    mask[1, S // 2:] = 0
    bias = jnp.array((1.0 - mask) * fa.NEG_INF)
    g = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))

    q, k, v = (t.astype(jnp.float32) for t in (q16, k16, v16))
    want = fa._xla_attention(q, k, v, bias)
    got = fa.flash_attention(q16, k16, v16, bias)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)

    def loss16(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, bias) * g)

    def loss32(q, k, v):
        return jnp.sum(fa._xla_attention(q, k, v, bias) * g)

    g16 = jax.grad(loss16, argnums=(0, 1, 2))(q16, k16, v16)
    g32 = jax.grad(loss32, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g16, g32):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)


def test_flash_bf16_dropout_mask_matches_f32():
    """The in-kernel dropout keep mask is a pure function of (seed, bh,
    position) — it must select the SAME positions regardless of operand
    dtype, so the bf16 and f32 kernels agree to round-off with rate > 0."""
    BH, S, D = 3, 200, 8
    rate = 0.3
    seed = jnp.array([77], jnp.int32)
    q16 = jnp.array(RNG.normal(size=(BH, S, D)), jnp.bfloat16)
    k16 = jnp.array(RNG.normal(size=(BH, S, D)), jnp.bfloat16)
    v16 = jnp.array(RNG.normal(size=(BH, S, D)), jnp.bfloat16)
    bias = jnp.zeros((BH, S), jnp.float32)

    f32 = fa.flash_attention(*(t.astype(jnp.float32) for t in (q16, k16, v16)),
                             bias, seed, rate)
    b16 = fa.flash_attention(q16, k16, v16, bias, seed, rate)
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                               rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# Ragged-Q mode (round 5): S % block_q != 0 pads Q only to the 8-row sublane
# tile instead of the 128 block (BERT S = text_len + 2, data/loader.py:47 —
# EVERY real long-seq shape is ragged; the 128-pad wasted ~55% of the QK/PV
# FLOPs at T=512, benchmarks/RESULTS.md round-5).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("S", [130, 514])  # 130: 1 full + 8-row tail chunk;
# 514: the real T=512 bench shape (4 full q chunks + (512, 8) tail)
def test_flash_ragged_matches_xla(S):
    BH, D = 4, 64
    q = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    k = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    v = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    mask = np.ones((BH, S), np.float32)
    mask[1, S - 9:] = 0
    mask[2, 5:] = 0
    bias = jnp.array((1.0 - mask) * fa.NEG_INF)
    assert fa._ragged_mode(S, D, 128, 128, 4)

    got = fa.flash_attention(q, k, v, bias)
    want = fa._xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    ct = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    gf = jax.grad(lambda *a: jnp.sum(fa.flash_attention(*a, bias) * ct),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: jnp.sum(fa._xla_attention(*a, bias) * ct),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_flash_ragged_dropout_bit_identical_to_gridded(monkeypatch):
    """The in-kernel dropout mask is a pure function of absolute positions,
    so the ragged and gridded tilings must produce IDENTICAL outputs and
    grads at rate > 0 — this pins the (row0, col0) offsets of every ragged
    kernel (fwd qb=0, dkv row0=chunk start)."""
    BH, S, D = 4, 130, 64
    q = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    k = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    v = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))
    bias = jnp.zeros((BH, S), jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)
    ct = jnp.array(RNG.normal(size=(BH, S, D)).astype(np.float32))

    def run():
        o = fa.flash_attention(q, k, v, bias, seed, 0.1)
        g = jax.grad(
            lambda *a: jnp.sum(fa.flash_attention(*a, bias, seed, 0.1) * ct),
            argnums=(0, 1, 2))(q, k, v)
        return o, g

    o_r, g_r = run()
    monkeypatch.setenv("MMDA_FLASH_RAGGED", "0")
    o_g, g_g = run()
    assert np.array_equal(np.asarray(o_r), np.asarray(o_g))
    for a, b in zip(g_r, g_g):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_flash_ragged_mode_decision_matrix():
    """Pin the routing: block-aligned S stays gridded; ragged S engages at
    footprint-feasible shapes and falls back when whole-S residency exceeds
    the scoped-VMEM budget; MMDA_FLASH_RAGGED=0 forces gridded."""
    assert not fa._ragged_mode(512, 64, 128, 128, 2)   # aligned -> gridded
    assert not fa._ragged_mode(50, 64, 50, 50, 2)      # S < block -> whole
    assert fa._ragged_mode(514, 64, 128, 128, 2)       # T=512 bench shape
    assert fa._ragged_mode(1026, 64, 128, 128, 2)      # T=1024 bench shape
    assert not fa._ragged_mode(16386, 64, 128, 128, 4)  # footprint fallback
    import os
    os.environ["MMDA_FLASH_RAGGED"] = "0"
    try:
        assert not fa._ragged_mode(514, 64, 128, 128, 2)
    finally:
        del os.environ["MMDA_FLASH_RAGGED"]
