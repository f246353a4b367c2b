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
