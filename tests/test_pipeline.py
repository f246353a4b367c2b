"""Pipeline-parallel BERT encoder (parallel/pipeline.py) vs the dense
encoder: same math, scheduled over a 'pipe' mesh axis.

Runs on the faked 8-device CPU mesh (conftest.py).  The reference has no
parallelism at all (SURVEY.md §2.3); these tests pin that the framework's
PP schedule is numerically the same model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmda_tpu.models import bert as jbert
from mmda_tpu.parallel import pipeline as pl


def _setup(num_layers=4, B=8, S=16):
    cfg = jbert.BertConfig(vocab_size=64, hidden_size=32,
                           num_layers=num_layers, num_heads=2,
                           intermediate_size=64, max_position_embeddings=32)
    params = jbert.init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, 64)
    # ragged mask: real padding exercises the additive bias per microbatch
    lens = np.asarray([S, S - 3, S, S - 1, 5, S, S - 2, S][:B])
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None], jnp.int32)
    return cfg, params, ids, mask


def test_pipeline_matches_dense_dp_x_pp():
    cfg, params, ids, mask = _setup()
    dense = jbert.bert_encode(params, cfg, ids, mask, deterministic=True,
                              compute_dtype=jnp.float32)
    mesh = pl.make_pipe_mesh(pp=4, dp=2)
    piped = pl.pipeline_bert_encode(params, cfg, ids, mask, mesh,
                                    num_microbatches=4, deterministic=True,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(dense),
                               atol=1e-5)


def test_pipeline_matches_dense_pipe_only():
    cfg, params, ids, mask = _setup(num_layers=2)
    dense = jbert.bert_encode(params, cfg, ids, mask, deterministic=True,
                              compute_dtype=jnp.float32)
    mesh = pl.make_pipe_mesh(pp=2, dp=1, devices=jax.devices()[:2])
    piped = pl.pipeline_bert_encode(params, cfg, ids, mask, mesh,
                                    num_microbatches=2, deterministic=True,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(dense),
                               atol=1e-5)


def test_pipeline_grads_match_dense():
    cfg, params, ids, mask = _setup()
    mesh = pl.make_pipe_mesh(pp=4, dp=2)

    def loss_pl(p):
        out = pl.pipeline_bert_encode(p, cfg, ids, mask, mesh, 4,
                                      deterministic=True,
                                      compute_dtype=jnp.float32)
        return (out ** 2).mean()

    def loss_dense(p):
        out = jbert.bert_encode(p, cfg, ids, mask, deterministic=True,
                                compute_dtype=jnp.float32)
        return (out ** 2).mean()

    g1 = jax.grad(loss_pl)(params)
    g2 = jax.grad(loss_dense)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_pipeline_dropout_runs_and_varies_per_microbatch():
    cfg, params, ids, mask = _setup()
    mesh = pl.make_pipe_mesh(pp=4, dp=2)
    out1 = pl.pipeline_bert_encode(params, cfg, ids, mask, mesh, 4,
                                   deterministic=False,
                                   dropout_rng=jax.random.PRNGKey(7),
                                   compute_dtype=jnp.float32)
    out2 = pl.pipeline_bert_encode(params, cfg, ids, mask, mesh, 4,
                                   deterministic=False,
                                   dropout_rng=jax.random.PRNGKey(8),
                                   compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out1)).all()
    # different keys -> different masks
    assert float(jnp.abs(out1 - out2).max()) > 0


def test_pipeline_under_jit_and_stage_stacking_shapes():
    cfg, params, ids, mask = _setup()
    mesh = pl.make_pipe_mesh(pp=4, dp=2)
    f = jax.jit(lambda p: pl.pipeline_bert_encode(
        p, cfg, ids, mask, mesh, 2, deterministic=True,
        compute_dtype=jnp.float32))
    out = f(params)
    assert out.shape == (8, 16, 32)
    stacked = pl.stack_stage_params(params["layers"], 2)
    assert stacked["q"]["kernel"].shape == (2, 2, 32, 32)


def test_pipeline_validation_errors():
    cfg, params, ids, mask = _setup(num_layers=4)
    mesh = pl.make_pipe_mesh(pp=4, dp=2)
    with pytest.raises(ValueError):
        pl.stack_stage_params(params["layers"], 3)     # 4 layers % 3
    with pytest.raises(ValueError):
        pl.pipeline_bert_encode(params, cfg, ids, mask, mesh, 3)  # B=8 % 3
    with pytest.raises(ValueError):
        pl.make_pipe_mesh(pp=3, dp=2)                  # 6 != 8 devices
    from jax.sharding import Mesh
    nopipe = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    with pytest.raises(ValueError):
        pl.pipeline_bert_encode(params, cfg, ids, mask, nopipe, 4)
