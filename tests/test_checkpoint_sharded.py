"""Sharded (orbax) checkpointing: save under one mesh shape, restore under a
DIFFERENT one (elastic restore), values and shardings preserved.  Runs on the
faked 8-device CPU mesh (tests/conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmda_tpu.config import Config
from mmda_tpu.models import get_model
from mmda_tpu.models.bert import BertConfig
from mmda_tpu.parallel import mesh as pmesh
from mmda_tpu.train import checkpoint_sharded as cs
from mmda_tpu.train.state import create_train_state, make_optimizer


@pytest.fixture(scope="module")
def state_and_cfg():
    cfg = Config(use_bert=True, hidden_size=16, compute_dtype="float32",
                 visual_size=5, acoustic_size=6, vocab_size=64,
                 embedding_size=8)
    bert_cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1), tx=tx)
    return state, cfg


def test_save_dp8_restore_dp4tp2(tmp_path, state_and_cfg):
    state, _ = state_and_cfg
    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs 8 faked devices")

    # save under a pure-DP mesh (params replicated)
    mesh8 = pmesh.make_mesh(dp=8, tp=1)
    src = cs.state_template(state, mesh8,
                            pmesh.param_partition_specs(state.params, tp=False))
    src = jax.tree_util.tree_map(
        lambda t, v: jax.device_put(v, t.sharding) if isinstance(v, jax.Array) else v,
        src, state)
    path = str(tmp_path / "ckpt_dp8")
    cs.save_sharded(path, src)

    # restore under a 4x2 dp x tp mesh with Megatron TP on the BERT tower
    mesh42 = pmesh.make_mesh(dp=4, tp=2)
    target = cs.state_template(state, mesh42,
                               pmesh.param_partition_specs(state.params, tp=True))
    restored = cs.restore_sharded(path, target)

    # values identical...
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...and the BERT qkv kernels actually carry the TP sharding
    q = restored.params["bert"]["layers"][0]["q"]["kernel"]
    assert q.sharding.spec == P(None, pmesh.MODEL_AXIS)
    assert int(restored.step) == int(state.step)


def test_async_save_roundtrip(tmp_path, state_and_cfg):
    state, _ = state_and_cfg
    path = str(tmp_path / "ckpt_async")
    cs.save_sharded(path, state, use_async=True)
    cs.wait_for_saves()
    restored = cs.restore_sharded(path, state)
    np.testing.assert_array_equal(
        np.asarray(restored.params["classifier"]["kernel"]),
        np.asarray(state.params["classifier"]["kernel"]))
