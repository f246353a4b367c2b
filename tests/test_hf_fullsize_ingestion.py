"""Full-size (bert-base, ~110M param) HF checkpoint ingestion — VERDICT r2
next #6: the tiny-checkpoint tests prove the mapping, but the 110M-param
layout path had never been exercised end-to-end.  This test writes a full
bert-base-uncased-SHAPED random checkpoint to disk (safetensors, the exact
key schema transformers emits), ingests it via load_hf_weights, and runs ONE
MISA train step on it under the mosei freeze rule — proving shapes, key
mapping, transposes, freezing and the optimizer all hold at real scale.

Marked slow-ish: ~1-2 min on the 1-core host (440 MB write + one bf16->fp32
train step).  Reference analog: src/models.py:44-45 (BertModel.from_pretrained).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmda_tpu.models.bert import BertConfig, load_hf_weights


def _write_fullsize_checkpoint(d: str, cfg: BertConfig, seed=0):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd = {
        "embeddings.word_embeddings.weight": w(V, H),
        "embeddings.position_embeddings.weight": w(cfg.max_position_embeddings, H),
        "embeddings.token_type_embeddings.weight": w(2, H),
        "embeddings.LayerNorm.weight": np.ones(H, np.float32),
        "embeddings.LayerNorm.bias": np.zeros(H, np.float32),
        "pooler.dense.weight": w(H, H),
        "pooler.dense.bias": np.zeros(H, np.float32),
    }
    for i in range(cfg.num_layers):
        b = f"encoder.layer.{i}."
        for name, shape in (
            ("attention.self.query", (H, H)),
            ("attention.self.key", (H, H)),
            ("attention.self.value", (H, H)),
            ("attention.output.dense", (H, H)),
            ("intermediate.dense", (I, H)),
            ("output.dense", (H, I)),
        ):
            sd[b + name + ".weight"] = w(*shape)
            sd[b + name + ".bias"] = np.zeros(shape[0], np.float32)
        for ln in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[b + ln + ".weight"] = np.ones(H, np.float32)
            sd[b + ln + ".bias"] = np.zeros(H, np.float32)
    # transformers prefixes with "bert." in full-model exports; exercise that
    sd = {"bert." + k: v for k, v in sd.items()}
    os.makedirs(d, exist_ok=True)
    save_file(sd, os.path.join(d, "model.safetensors"))
    return sd


def test_fullsize_bert_base_ingest_and_train_step(tmp_path):
    pytest.importorskip("safetensors")
    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import frozen_mask
    from mmda_tpu.train.state import create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_step

    bert_cfg = BertConfig.base()
    assert bert_cfg.hidden_size == 768 and bert_cfg.num_layers == 12
    d = str(tmp_path / "bert-base-uncased")
    sd = _write_fullsize_checkpoint(d, bert_cfg)

    params_bert = load_hf_weights(d, bert_cfg)
    # ~110M params, exact bert-base count: 12 layers + embeddings + pooler
    n = sum(x.size for x in jax.tree_util.tree_leaves(params_bert))
    assert n == 109_482_240, n
    # spot-check the transpose convention on a full-size kernel
    np.testing.assert_array_equal(
        np.asarray(params_bert["layers"][7]["ffn_in"]["kernel"]),
        sd["bert.encoder.layer.7.intermediate.dense.weight"].T)

    # one full MISA train step from the ingested weights (mosei freeze rule)
    cfg = Config(use_bert=True, batch_size=2, compute_dtype="float32",
                 hidden_size=32, data="mosei", log_sinks=())
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg,
                     bert_params=params_bert)
    # the ingested tree IS the model's text tower (same object, not a copy)
    assert params["bert"] is params_bert
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    frozen["bert"] = frozen_mask(params["bert"], max_frozen_layer=8)
    tx = make_optimizer(cfg, frozen)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1), frozen,
                               tx=tx)
    split = make_split(SyntheticSpec(num_examples=2, max_len=8,
                                     bert_vocab_size=bert_cfg.vocab_size))
    step = make_train_step(cfg, tx, fwd_fn, bert_cfg, donate=False,
                           frozen=frozen)
    new_state, losses = step(state, Batch(**split))
    assert np.isfinite(float(losses["total"]))
    # frozen layer 8 untouched, trainable layer 11 moved
    k8 = params["bert"]["layers"][8]["q"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(new_state.params["bert"]["layers"][8]["q"]["kernel"]),
        np.asarray(k8))
    k11_new = np.asarray(new_state.params["bert"]["layers"][11]["q"]["kernel"])
    assert not np.array_equal(k11_new, np.asarray(
        params["bert"]["layers"][11]["q"]["kernel"]))
