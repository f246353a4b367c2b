"""Sequence parallelism (parallel/sequence.py): the residual-stream
constraint must not change the math — TP+SP forward/grads == unsharded —
while XLA derives the Megatron-SP comm pattern from the annotation.

Runs on the faked 8-device CPU mesh (conftest.py)."""

import collections
import contextlib
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmda_tpu.models import bert as jbert
from mmda_tpu.parallel import mesh as pmesh
from mmda_tpu.parallel import sequence as sq


def _tp_shard(params, mesh):
    """TP-shard a bare BERT tree.  param_partition_specs keys the Megatron
    layer specs off a 'bert' entry (the MISA tree layout), so a raw tree
    passed straight to shard_params silently REPLICATES — wrap/unwrap."""
    sharded = pmesh.shard_params({"bert": params}, mesh, tp=True)["bert"]
    assert "model" in str(sharded["layers"][0]["q"]["kernel"].sharding.spec)
    return sharded


def _setup(B=8, S=16):
    cfg = jbert.BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                           num_heads=2, intermediate_size=64,
                           max_position_embeddings=32)
    params = jbert.init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, 64)
    lens = np.asarray([S, S - 3, S, S - 1, 5, S, S - 2, S][:B])
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None], jnp.int32)
    return cfg, params, ids, mask


def test_sp_forward_matches_unsharded():
    cfg, params, ids, mask = _setup()
    dense = jbert.bert_encode(params, cfg, ids, mask, deterministic=True,
                              compute_dtype=jnp.float32)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = _tp_shard(params, mesh)
    with sq.sequence_sharded_bert(mesh):
        out = jax.jit(lambda p: jbert.bert_encode(
            p, cfg, ids, mask, deterministic=True,
            compute_dtype=jnp.float32))(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)
    assert jbert._ACTIVATION_CONSTRAINT is None  # context exit uninstalls


def test_sp_grads_match_unsharded():
    cfg, params, ids, mask = _setup()

    def loss(p):
        out = jbert.bert_encode(p, cfg, ids, mask, deterministic=True,
                                compute_dtype=jnp.float32)
        return (out ** 2).mean()

    g_dense = jax.grad(loss)(params)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = _tp_shard(params, mesh)
    with sq.sequence_sharded_bert(mesh):
        g_sp = jax.jit(jax.grad(loss))(sharded)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_sp_full_misa_train_step():
    """Full optimizer step with TP-sharded weights + SP activations: finite
    loss, trainable layer moves, frozen layer pinned."""
    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import frozen_mask
    from mmda_tpu.train.state import TrainState, create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_step

    cfg = Config(use_bert=True, batch_size=16, compute_dtype="float32",
                 hidden_size=16, visual_size=5, acoustic_size=6)
    bert_cfg = jbert.BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                                num_heads=2, intermediate_size=64,
                                max_position_embeddings=64)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=0)
    tx = make_optimizer(cfg, frozen)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    state = TrainState(
        step=jax.device_put(state.step, pmesh.replicated(mesh)),
        params=pmesh.shard_params(state.params, mesh, tp=True),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, pmesh.replicated(mesh)),
            state.opt_state),
        rng=jax.device_put(state.rng, pmesh.replicated(mesh)),
    )
    split = make_split(SyntheticSpec(
        num_examples=16, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64))
    batch = pmesh.shard_batch(Batch(**split), mesh)
    step = make_train_step(cfg, tx, fwd_fn, bert_cfg, donate=False,
                           frozen=frozen)
    with sq.sequence_sharded_bert(mesh):
        new_state, losses = step(state, batch)
        total = float(losses["total"])
    assert np.isfinite(total)
    k0 = np.asarray(state.params["bert"]["layers"][0]["q"]["kernel"])
    k0n = np.asarray(new_state.params["bert"]["layers"][0]["q"]["kernel"])
    np.testing.assert_array_equal(k0, k0n)
    k1 = np.asarray(state.params["bert"]["layers"][1]["q"]["kernel"])
    k1n = np.asarray(new_state.params["bert"]["layers"][1]["q"]["kernel"])
    assert not np.array_equal(k1, k1n)


def test_trainer_sp_smoke(tmp_path):
    """`--tp_size 2 --sp True` from the CLI surface: Trainer installs the
    constraint and trains end-to-end on the faked 4x2 mesh."""
    from mmda_tpu.config import Config
    from mmda_tpu.data import make_dataset
    from mmda_tpu.train.loop import Trainer

    cfg = Config(use_bert=True, batch_size=16, compute_dtype="float32",
                 hidden_size=16, visual_size=5, acoustic_size=6,
                 vocab_size=64, embedding_size=8, num_classes=6,
                 learning_rate=3e-3, n_epoch=1, bucket_sizes=(8,),
                 name="sp_smoke", ckpt_dir=str(tmp_path), log_sinks=(),
                 dp_size=4, tp_size=2, sp=True)
    bert_cfg = jbert.BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                                num_heads=2, intermediate_size=64,
                                max_position_embeddings=64)
    data = make_dataset(num_train=64, num_dev=32, num_test=32, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    try:
        tr = Trainer(cfg, data, bert_cfg=bert_cfg)
        assert jbert._ACTIVATION_CONSTRAINT is not None
        summary = tr.train()
        assert np.isfinite(summary["test_loss"])
    finally:
        sq.uninstall_sequence_sharding()


def test_sp_hlo_replaces_allreduces_with_gathers():
    """The collective signature of Megatron-SP (clone of
    test_fsdp.py::test_fsdp_hlo_inserts_weight_allgathers, VERDICT r4 #6):
    with the residual-stream constraint installed, XLA must REPLACE most of
    pure TP's activation all-reduces with all-gather(+scatter) movements
    around the matmul blocks.  A dropped constraint silently re-replicates
    the LN/dropout regions — every equivalence test above still passes
    while the HBM saving the axis exists for is gone; this pins the
    compiled evidence.  Measured on the faked 4x2 mesh (jax 0.9):
    TP-only grad = 254 all-reduce / 42 all-gather, TP+SP = 72 / 84 —
    asserted relatively because absolute counts shift with XLA versions.
    NB: XLA may legalize reduce-scatter as all-reduce+slice at this scale,
    so the test keys on the all-reduce drop + all-gather rise rather than
    reduce-scatter presence."""
    cfg, params, ids, mask = _setup()
    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = _tp_shard(params, mesh)

    def loss(p):
        out = jbert.bert_encode(p, cfg, ids, mask, deterministic=True,
                                compute_dtype=jnp.float32)
        return (out ** 2).mean()

    def hist(sp: bool):
        ctx = (sq.sequence_sharded_bert(mesh) if sp
               else contextlib.nullcontext())
        with ctx:
            txt = jax.jit(jax.grad(loss)).lower(sharded).compile().as_text()
        return collections.Counter(re.findall(
            r"(all-gather|reduce-scatter|all-reduce)", txt))

    h_tp = hist(sp=False)
    h_sp = hist(sp=True)
    # the TP baseline really communicates (sharded weights were used)
    assert h_tp["all-reduce"] >= 10, dict(h_tp)
    # SP converts activation all-reduces into gather/scatter pairs
    assert h_sp["all-reduce"] < h_tp["all-reduce"], (dict(h_tp), dict(h_sp))
    assert (h_sp["all-gather"] + h_sp["reduce-scatter"]
            > h_tp["all-gather"] + h_tp["reduce-scatter"]), (
        dict(h_tp), dict(h_sp))


def test_sp_requires_model_axis():
    import numpy as onp
    from jax.sharding import Mesh

    nomodel = Mesh(onp.asarray(jax.devices()).reshape(8), ("data",))
    with pytest.raises(ValueError):
        sq.install_sequence_sharding(nomodel)
    assert sq.activation_spec(pmesh.make_mesh(dp=4, tp=2)) == \
        jax.sharding.PartitionSpec("data", "model", None)
