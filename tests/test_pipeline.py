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


def _misa_setup():
    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model

    cfg = Config(use_bert=True, batch_size=16, compute_dtype="float32",
                 hidden_size=16, visual_size=5, acoustic_size=6)
    bert_cfg = jbert.BertConfig(vocab_size=64, hidden_size=32, num_layers=4,
                                num_heads=2, intermediate_size=64,
                                max_position_embeddings=64)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    split = make_split(SyntheticSpec(
        num_examples=16, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64))
    return cfg, bert_cfg, fwd_fn, params, Batch(**split)


def test_full_misa_forward_and_grads_under_pipeline():
    """The encode-override hook pipelines the tower inside the FULL MISA
    forward with zero model changes; deterministic scores and grads match
    the dense path."""
    cfg, bert_cfg, fwd_fn, params, batch = _misa_setup()

    def loss(p):
        out = fwd_fn(p, cfg, batch, bert_cfg=bert_cfg, deterministic=True)
        return (out.scores ** 2).mean()

    dense_l, dense_g = jax.value_and_grad(loss)(params)
    mesh = pl.make_pipe_mesh(pp=4, dp=2)
    with pl.pipelined_bert(mesh, num_microbatches=4):
        pl_l, pl_g = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(pl_l), float(dense_l), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(pl_g),
                    jax.tree_util.tree_leaves(dense_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_full_train_step_under_pipeline():
    """One full optimizer step (objective + grads + clip + Adam + freeze
    rules) with the tower pipelined over ('data','pipe'): finite loss,
    trainable layers move, frozen layer stays."""
    from mmda_tpu.models.bert import frozen_mask
    from mmda_tpu.train.state import create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_step

    cfg, bert_cfg, fwd_fn, params, batch = _misa_setup()
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=0)
    tx = make_optimizer(cfg, frozen)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen)
    step = make_train_step(cfg, tx, fwd_fn, bert_cfg, donate=False,
                           frozen=frozen)
    mesh = pl.make_pipe_mesh(pp=4, dp=2)
    with pl.pipelined_bert(mesh, num_microbatches=4):
        new_state, losses = step(state, batch)
        total = float(losses["total"])
    assert np.isfinite(total)
    k0 = np.asarray(state.params["bert"]["layers"][0]["q"]["kernel"])
    k0n = np.asarray(new_state.params["bert"]["layers"][0]["q"]["kernel"])
    np.testing.assert_array_equal(k0, k0n)
    k3 = np.asarray(state.params["bert"]["layers"][3]["q"]["kernel"])
    k3n = np.asarray(new_state.params["bert"]["layers"][3]["q"]["kernel"])
    assert not np.array_equal(k3, k3n)
    # the hook uninstalls on context exit
    assert jbert._ENCODE_OVERRIDE is None


def test_trainer_pp_smoke(tmp_path):
    """`--pp_size 2` from the CLI surface: Trainer builds the ('data','pipe')
    mesh, installs the pipelined encoder, and trains end-to-end."""
    from mmda_tpu.config import Config
    from mmda_tpu.data import make_dataset
    from mmda_tpu.train.loop import Trainer

    cfg = Config(use_bert=True, batch_size=16, compute_dtype="float32",
                 hidden_size=16, visual_size=5, acoustic_size=6,
                 vocab_size=64, embedding_size=8, num_classes=6,
                 learning_rate=3e-3, n_epoch=1, bucket_sizes=(8,),
                 name="pp_smoke", ckpt_dir=str(tmp_path), log_sinks=(),
                 pp_size=2)
    bert_cfg = jbert.BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                                num_heads=2, intermediate_size=64,
                                max_position_embeddings=64)
    data = make_dataset(num_train=64, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    try:
        tr = Trainer(cfg, data, bert_cfg=bert_cfg)
        assert tr.mesh is not None and tr.mesh.shape["pipe"] == 2
        assert jbert._ENCODE_OVERRIDE is not None
        summary = tr.train()
        assert np.isfinite(summary["test_loss"])
    finally:
        pl.uninstall_pipeline_encoder()


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


def test_pipeline_hlo_ring_permute_schedule():
    """The collective signature of the GPipe schedule (VERDICT r4 #6): the
    compiled forward must contain the stage-ring `collective-permute` (one
    hop per scan tick; the scan compiles to a while loop so it appears once
    textually with the FULL ring in source_target_pairs), the dense encoder
    must contain none, and the grad must additionally contain the INVERSE
    ring — ppermute's transpose IS the reverse schedule
    (parallel/pipeline.py docstring).  A regression that drops the shard_map
    (e.g. running all stages densely on every device) passes every
    equivalence test above while doing pp times the work; this pins the
    compiled evidence."""
    import re

    cfg, params, ids, mask = _setup()
    mesh = pl.make_pipe_mesh(pp=4, dp=2)

    def pairsets(txt):
        out = []
        for m in re.finditer(
                r"collective-permute[^\n]*source_target_pairs="
                r"(\{(?:\{\d+,\d+\},?)+\})", txt):
            out.append(frozenset(
                tuple(map(int, p.split(",")))
                for p in re.findall(r"\{(\d+,\d+)\}", m.group(1))))
        return out

    def loss_pl(p):
        out = pl.pipeline_bert_encode(p, cfg, ids, mask, mesh, 4,
                                      deterministic=True,
                                      compute_dtype=jnp.float32)
        return (out ** 2).mean()

    def loss_dense(p):
        out = jbert.bert_encode(p, cfg, ids, mask, deterministic=True,
                                compute_dtype=jnp.float32)
        return (out ** 2).mean()

    txt_dense = jax.jit(jax.grad(loss_dense)).lower(params).compile().as_text()
    assert "collective-permute" not in txt_dense

    txt_fwd = jax.jit(loss_pl).lower(params).compile().as_text()
    fwd_rings = pairsets(txt_fwd)
    assert fwd_rings, "pipelined forward lost its collective-permute"
    # the schedule hop is a single cycle covering every device: 8 edges,
    # in-degree == out-degree == 1
    ring = max(fwd_rings, key=len)
    assert len(ring) == 8, ring
    assert {s for s, _ in ring} == {t for _, t in ring} == set(range(8)), ring

    txt_grad = jax.jit(jax.grad(loss_pl)).lower(params).compile().as_text()
    grad_rings = pairsets(txt_grad)
    inverse = frozenset((t, s) for s, t in ring)
    assert ring in grad_rings, "grad lost the forward schedule hop"
    assert inverse in grad_rings, (
        "grad lost the transposed (reverse-schedule) hop")
