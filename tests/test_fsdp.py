"""ZeRO-3/FSDP-style parameter+optimizer sharding over the DP 'data' axis
(parallel/mesh.py::fsdp_param_specs, round 4 — VERDICT r3 next-steps #7).

ZeRO-1 (tests/test_zero1.py) shards Adam m/v only; FSDP also shards the
params and lets XLA SPMD derive the all-gather-on-use + grad reduce-scatter.
These tests pin: spec composition with TP, numerics equality with the
replicated layout, the per-device memory drop (measured from the actual
addressable shards), Trainer integration, and the validated-error edges."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import SyntheticSpec, make_split
from mmda_tpu.models import Batch, get_model
from mmda_tpu.models.bert import BertConfig
from mmda_tpu.parallel import mesh as pmesh
from mmda_tpu.train.state import TrainState, create_train_state, make_optimizer
from mmda_tpu.train.step import make_train_step


def _setup():
    cfg = Config(use_bert=True, batch_size=16, compute_dtype="float32",
                 hidden_size=16, visual_size=5, acoustic_size=6)
    bert_cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1))
    split = make_split(SyntheticSpec(
        num_examples=16, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64))
    step = make_train_step(cfg, tx, fwd_fn, bert_cfg, donate=False)
    return state, split, step


def _place(state, mesh, fsdp):
    if fsdp:
        params = pmesh.shard_params_fsdp(state.params, mesh)
        opt = pmesh.shard_opt_state_fsdp(state.opt_state, mesh)
    else:
        params = pmesh.shard_params(state.params, mesh)
        opt = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, pmesh.replicated(mesh)),
            state.opt_state)
    return TrainState(
        step=jax.device_put(state.step, pmesh.replicated(mesh)),
        params=params,
        opt_state=opt,
        rng=jax.device_put(state.rng, pmesh.replicated(mesh)),
    )


def test_fsdp_specs_compose_with_tp():
    mesh = pmesh.make_mesh(dp=4, tp=2)
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                     num_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    from mmda_tpu.models.bert import init_bert_params

    params = {"bert": init_bert_params(jax.random.PRNGKey(0), cfg),
              "classifier": {"kernel": jnp.ones((128, 64)),
                             "bias": jnp.ones(64)}}
    # min_size=0: the tiny test tower's kernels are below the production
    # cutoff (2048 elements); the composition RULES are what's under test
    specs = pmesh.fsdp_param_specs(params, mesh, tp=True, min_size=0)
    l0 = specs["bert"]["layers"][0]
    # TP axis kept, 'data' added on the free dim
    assert l0["q"]["kernel"] == P("data", "model")
    assert l0["ffn_out"]["kernel"] == P("model", "data")
    # big non-BERT leaves shard over 'data' too
    assert specs["classifier"]["kernel"] == P("data", None)
    # big embedding table sharded on its vocab dim
    assert specs["bert"]["embeddings"]["word"] == P("data", None)
    # at the production cutoff, tiny leaves stay at their base spec
    # (gather latency > memory win)
    prod = pmesh.fsdp_param_specs(params, mesh, tp=True)
    assert prod["bert"]["layers"][0]["q"]["kernel"] == P(None, "model")
    assert prod["classifier"]["kernel"] == P("data", None)   # 8192 elements
    assert prod["classifier"]["bias"] == P()


def test_fsdp_step_matches_replicated_and_sheds_memory():
    """Two optimizer steps with FSDP-sharded params+opt produce the same
    params as the replicated layout (sharding is a layout choice, not a
    numerics choice), and the per-device param bytes really drop ~1/dp for
    the shardable leaves — measured from the actual addressable shards."""
    state, split, step = _setup()
    mesh = pmesh.make_mesh(dp=8, tp=1)
    batch = pmesh.shard_batch(Batch(**split), mesh)

    s_rep = _place(state, mesh, fsdp=False)
    s_fsdp = _place(state, mesh, fsdp=True)

    def shard_bytes(tree):
        total = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "addressable_shards"):
                total += leaf.addressable_shards[0].data.nbytes
            else:
                total += getattr(leaf, "nbytes", 0)
        return total

    full = shard_bytes(s_rep.params)
    shed = shard_bytes(s_fsdp.params)
    assert shed < 0.45 * full, (shed, full)   # most bytes are 1/8-sharded

    for _ in range(2):
        s_rep, l_rep = step(s_rep, batch)
        s_fsdp, l_fsdp = step(s_fsdp, batch)
    np.testing.assert_allclose(float(l_fsdp["total"]), float(l_rep["total"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_fsdp.params),
                    jax.tree_util.tree_leaves(s_rep.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # the updated params keep their FSDP layout (no silent re-replication)
    k = s_fsdp.params["bert"]["layers"][0]["ffn_in"]["kernel"]
    assert "data" in str(k.sharding.spec)


def test_fsdp_composes_with_tp_step():
    state, split, step = _setup()
    mesh = pmesh.make_mesh(dp=4, tp=2)
    batch = pmesh.shard_batch(Batch(**split), mesh)
    s_rep = TrainState(
        step=jax.device_put(state.step, pmesh.replicated(mesh)),
        params=pmesh.shard_params(state.params, mesh, tp=True),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, pmesh.replicated(mesh)),
            state.opt_state),
        rng=jax.device_put(state.rng, pmesh.replicated(mesh)))
    s_f = TrainState(
        step=s_rep.step,
        params=pmesh.shard_params_fsdp(state.params, mesh, tp=True),
        opt_state=pmesh.shard_opt_state_fsdp(state.opt_state, mesh),
        rng=s_rep.rng)
    _, l_rep = step(s_rep, batch)
    _, l_f = step(s_f, batch)
    np.testing.assert_allclose(float(l_f["total"]), float(l_rep["total"]),
                               rtol=1e-6)


def test_trainer_fsdp_smoke(tmp_path):
    from mmda_tpu.data import make_dataset
    from mmda_tpu.train.loop import Trainer

    cfg = Config(use_bert=True, batch_size=16, compute_dtype="float32",
                 hidden_size=16, visual_size=5, acoustic_size=6,
                 vocab_size=64, embedding_size=8, num_classes=6,
                 n_epoch=1, bucket_sizes=(8,), name="fsdp_smoke",
                 ckpt_dir=str(tmp_path), log_sinks=(), fsdp=True)
    bert_cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    data = make_dataset(num_train=32, num_dev=16, num_test=16, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    with Trainer(cfg, data, bert_cfg=bert_cfg) as tr:
        assert "data" in str(
            tr.state.params["bert"]["layers"][0]["ffn_in"]["kernel"]
            .sharding.spec)
        summary = tr.train()
    assert np.isfinite(summary["test_loss"])


def test_fsdp_validated_errors(tmp_path):
    from mmda_tpu.data import make_dataset
    from mmda_tpu.train.loop import Trainer

    data = make_dataset(num_train=32, num_dev=16, num_test=16, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    bert_cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    base = dict(use_bert=True, batch_size=16, compute_dtype="float32",
                hidden_size=16, visual_size=5, acoustic_size=6,
                vocab_size=64, embedding_size=8, num_classes=6,
                n_epoch=1, bucket_sizes=(8,), ckpt_dir=str(tmp_path),
                log_sinks=(), fsdp=True)
    with pytest.raises(ValueError, match="fsdp does not compose"):
        Trainer(Config(name="f1", pp_size=2, **base), data,
                bert_cfg=bert_cfg)
    with pytest.raises(ValueError, match="needs a mesh"):
        Trainer(Config(name="f2", **base), data, bert_cfg=bert_cfg,
                use_mesh=False)


def test_fsdp_hlo_inserts_weight_allgathers():
    """The collective signature of FSDP: the compiled step must contain
    all-gather ops (weights gathered on use) that the replicated-params
    step does not — evidence SPMD actually derived the FSDP schedule
    rather than silently re-replicating (measured: 35 all-gathers at dp=8
    on this tiny tower, 0 replicated)."""
    import collections
    import re

    state, split, step = _setup()
    mesh = pmesh.make_mesh(dp=8, tp=1)
    batch = pmesh.shard_batch(Batch(**split), mesh)

    def hist(s):
        txt = jax.jit(step).lower(s, batch).compile().as_text()
        return collections.Counter(
            re.findall(r"(all-gather|reduce-scatter|all-reduce)", txt))

    h_rep = hist(_place(state, mesh, fsdp=False))
    h_f = hist(_place(state, mesh, fsdp=True))
    # strictly more gathers under FSDP (0 vs 35 in isolation; compared
    # relatively because XLA's partitioner makes a few layout-dependent
    # gather choices that shift with process-global config from earlier
    # tests in the file)
    assert h_f["all-gather"] > h_rep["all-gather"], (dict(h_rep), dict(h_f))
    assert h_f["all-gather"] >= 10, dict(h_f)
    # DP's gradient reduction is present in both layouts
    assert h_rep["all-reduce"] > 0 and h_f["all-reduce"] > 0


def test_aborted_trainer_constructor_uninstalls_hooks(tmp_path):
    """Round-4 full-suite failure: the fsdp x pp validated error fires AFTER
    Trainer.__init__ installs the pipeline encode-override hook; an aborted
    constructor must uninstall it, or every later bert_encode in the process
    routes through a pipelined path bound to a dead mesh."""
    from mmda_tpu.data import make_dataset
    from mmda_tpu.models import bert as jbert
    from mmda_tpu.train.loop import Trainer

    data = make_dataset(num_train=32, num_dev=16, num_test=16, max_len=8,
                        visual_size=5, acoustic_size=6, vocab_size=64,
                        bert_vocab_size=64)
    bert_cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    cfg = Config(name="abort", use_bert=True, batch_size=16,
                 compute_dtype="float32", hidden_size=16, visual_size=5,
                 acoustic_size=6, vocab_size=64, embedding_size=8,
                 num_classes=6, n_epoch=1, bucket_sizes=(8,),
                 ckpt_dir=str(tmp_path), log_sinks=(), fsdp=True, pp_size=2)
    with pytest.raises(ValueError, match="fsdp does not compose"):
        Trainer(cfg, data, bert_cfg=bert_cfg)
    assert jbert._ENCODE_OVERRIDE is None, (
        "aborted constructor leaked the pipeline encode-override hook")
