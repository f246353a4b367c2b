"""ZeRO-1 optimizer-state sharding (parallel/mesh.py::zero1_opt_specs)."""

import numpy as np
import jax
import jax.numpy as jnp

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


def _place(state, mesh, zero1):
    if zero1:
        opt = pmesh.shard_opt_state_zero1(state.opt_state, mesh)
    else:
        opt = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, pmesh.replicated(mesh)),
            state.opt_state)
    return TrainState(
        step=jax.device_put(state.step, pmesh.replicated(mesh)),
        params=pmesh.shard_params(state.params, mesh),
        opt_state=opt,
        rng=jax.device_put(state.rng, pmesh.replicated(mesh)),
    )


def test_zero1_step_matches_replicated():
    """Two optimizer steps with ZeRO-1-sharded Adam state produce the same
    params as with replicated state (the sharding is a layout choice, not a
    numerics choice), and the big m/v leaves really are 'data'-sharded."""
    state, split, step = _setup()
    mesh = pmesh.make_mesh(dp=8, tp=1)
    batch = pmesh.shard_batch(Batch(**split), mesh)

    s_rep = _place(state, mesh, zero1=False)
    s_z1 = _place(state, mesh, zero1=True)

    # the word-embedding mirror (vocab 64 % 8 == 0) must be sharded
    mu = s_z1.opt_state[0].mu if hasattr(s_z1.opt_state[0], "mu") else None
    if mu is not None:
        leaf = mu["bert"]["embeddings"]["word"]
        assert "data" in str(leaf.sharding.spec), leaf.sharding

    for _ in range(2):
        s_rep, l_rep = step(s_rep, batch)
        s_z1, l_z1 = step(s_z1, batch)
    np.testing.assert_allclose(float(l_z1["total"]), float(l_rep["total"]),
                               rtol=1e-6)
    a = np.asarray(s_rep.params["bert"]["layers"][0]["q"]["kernel"])
    b = np.asarray(s_z1.params["bert"]["layers"][0]["q"]["kernel"])
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)


def test_zero1_specs_leave_indivisible_leaves_replicated():
    mesh = pmesh.make_mesh(dp=8, tp=1)
    tree = {"big": jnp.zeros((16, 4)), "odd": jnp.zeros((3, 4)),
            "scalar": jnp.zeros(())}
    specs = pmesh.zero1_opt_specs(tree, mesh)
    assert specs["big"] == jax.sharding.PartitionSpec("data", None)
    assert specs["odd"] == jax.sharding.PartitionSpec()
    assert specs["scalar"] == jax.sharding.PartitionSpec()


def test_trainer_zero1_trains(tmp_path):
    from mmda_tpu.train.loop import Trainer

    split = make_split(SyntheticSpec(
        num_examples=16, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64, seed=4))
    data = {"train": split, "dev": split, "test": split}
    cfg = Config(use_bert=True, batch_size=16, n_epoch=1,
                 compute_dtype="float32", hidden_size=16, visual_size=5,
                 acoustic_size=6, zero1=True, name="z1",
                 ckpt_dir=str(tmp_path), bucket_sizes=(8,))
    bert_cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    tr = Trainer(cfg, data, bert_cfg=bert_cfg)
    assert tr.mesh is not None
    summary = tr.train()
    assert np.isfinite(summary["best_valid_loss"])


def test_zero1_resume_replaces_on_mesh(tmp_path):
    """Resume must re-place the loaded host state on the mesh: the ZeRO-1
    opt-state sharding survives a save/restart cycle instead of silently
    degrading to replicated."""
    from mmda_tpu.train.loop import Trainer

    split = make_split(SyntheticSpec(
        num_examples=16, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64, seed=5))
    data = {"train": split, "dev": split, "test": split}
    kw = dict(use_bert=True, batch_size=16, n_epoch=1, data="synthetic",
              compute_dtype="float32", hidden_size=16, visual_size=5,
              acoustic_size=6, zero1=True, name="z1r",
              ckpt_dir=str(tmp_path), bucket_sizes=(8,))
    bert_cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    Trainer(Config(**kw), data, bert_cfg=bert_cfg).train()

    tr2 = Trainer(Config(**kw, resume=True), data, bert_cfg=bert_cfg)
    assert int(tr2.state.step) > 0          # actually resumed
    adams = jax.tree_util.tree_leaves(
        tr2.state.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
    adams = [a for a in adams if hasattr(a, "mu")]
    assert adams, "no ScaleByAdamState found in the optimizer chain"
    leaf = adams[0].mu["bert"]["embeddings"]["word"]
    assert "data" in str(leaf.sharding.spec), leaf.sharding


def test_zero1_cuts_per_device_opt_bytes():
    """The point of ZeRO-1: per-device optimizer bytes drop to ~1/dp.
    Measured from the actual addressable shards on the faked 8-device mesh."""
    state, _, _ = _setup()
    mesh = pmesh.make_mesh(dp=8, tp=1)

    def device0_bytes(opt):
        total = 0
        for leaf in jax.tree_util.tree_leaves(opt):
            if hasattr(leaf, "addressable_shards"):
                shard = leaf.addressable_shards[0]
                total += int(np.prod(shard.data.shape)) * leaf.dtype.itemsize
        return total

    rep = device0_bytes(_place(state, mesh, zero1=False).opt_state)
    z1 = device0_bytes(_place(state, mesh, zero1=True).opt_state)
    # bert-tiny + MISA heads: most leaves divide by 8; a few odd first dims
    # stay replicated, so the ratio lands between 1/8 and ~1/3
    assert z1 < rep * 0.35, (z1, rep)
