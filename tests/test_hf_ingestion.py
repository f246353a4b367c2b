"""Real-file HF weight ingestion (VERDICT round-1, next-round item #6).

Writes an actual tiny HuggingFace BERT checkpoint to disk - BOTH storage
branches load_hf_weights supports (model.safetensors and pytorch_model.bin) -
loads it through our mapping (models/bert.py::load_hf_weights), and asserts
the resulting forward matches `transformers.BertModel` loading the same file.
The reference loads real pretrained weights at src/models.py:44-45; this test
executes the identical disk->params path without network access.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mmda_tpu.models.bert import BertConfig, bert_encode, load_hf_weights

transformers = pytest.importorskip("transformers")


def _tiny_hf_model():
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(11)
    return transformers.BertModel(hf_cfg).eval()


def _assert_forward_parity(model_dir, hf_model):
    cfg = BertConfig.tiny()
    params = load_hf_weights(str(model_dir), cfg)

    rng = np.random.default_rng(3)
    B, S = 4, 10
    ids = rng.integers(5, 128, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 6:] = 0
    mask[3, 3:] = 0
    ids[mask == 0] = 0
    types = np.zeros((B, S), np.int32)

    ours = bert_encode(params, cfg, jnp.array(ids), jnp.array(mask),
                       jnp.array(types), deterministic=True,
                       compute_dtype=jnp.float32)
    with torch.no_grad():
        theirs = hf_model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            token_type_ids=torch.tensor(types.astype(np.int64)),
        ).last_hidden_state.numpy()

    real = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(ours)[real], theirs[real], rtol=2e-4, atol=2e-4)


def test_load_hf_weights_safetensors_branch(tmp_path):
    hf = _tiny_hf_model()
    d = tmp_path / "st"
    hf.save_pretrained(d, safe_serialization=True)
    assert (d / "model.safetensors").exists()
    _assert_forward_parity(d, hf)


def test_load_hf_weights_pytorch_bin_branch(tmp_path):
    hf = _tiny_hf_model()
    d = tmp_path / "bin"
    hf.save_pretrained(d, safe_serialization=False)
    assert (d / "pytorch_model.bin").exists()
    _assert_forward_parity(d, hf)


def test_load_hf_weights_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="no bert weights"):
        load_hf_weights(str(tmp_path / "nope"), BertConfig.tiny())
