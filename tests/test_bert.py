"""BERT encoder parity vs HuggingFace torch BertModel (random-init tiny config;
no network needed).  Validates the full architecture: embeddings, attention,
FFN, post-LN, masking, and the masked-mean pooling the reference applies at
src/models.py:193-196."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from mmda_tpu.models import bert as jbert
from mmda_tpu.ops.functions import masked_mean

RNG = np.random.default_rng(3)


def _torch_tiny():
    from transformers import BertConfig as HFConfig, BertModel

    hf_cfg = HFConfig(
        vocab_size=99,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = BertModel(hf_cfg)
    model.eval()
    return model, hf_cfg


def _port_weights(model, cfg: jbert.BertConfig):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    def g(n):
        return jnp.asarray(sd[n])

    params = {
        "embeddings": {
            "word": g("embeddings.word_embeddings.weight"),
            "position": g("embeddings.position_embeddings.weight"),
            "token_type": g("embeddings.token_type_embeddings.weight"),
            "ln": {"scale": g("embeddings.LayerNorm.weight"),
                   "bias": g("embeddings.LayerNorm.bias")},
        },
        "layers": [],
        "pooler": {"kernel": g("pooler.dense.weight").T, "bias": g("pooler.dense.bias")},
    }
    m = jbert._HF_LAYER_MAP
    for i in range(cfg.num_layers):
        b = f"encoder.layer.{i}."
        lp = {o: {"kernel": g(b + t + ".weight").T, "bias": g(b + t + ".bias")}
              for o, t in m.items()}
        lp["attn_ln"] = {"scale": g(b + "attention.output.LayerNorm.weight"),
                         "bias": g(b + "attention.output.LayerNorm.bias")}
        lp["ffn_ln"] = {"scale": g(b + "output.LayerNorm.weight"),
                        "bias": g(b + "output.LayerNorm.bias")}
        params["layers"].append(lp)
    return params


def test_bert_encode_matches_hf_torch():
    model, _ = _torch_tiny()
    cfg = jbert.BertConfig(vocab_size=99, hidden_size=32, num_layers=2,
                           num_heads=2, intermediate_size=64,
                           max_position_embeddings=64)
    params = _port_weights(model, cfg)

    B, S = 3, 10
    ids = RNG.integers(0, 99, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 6:] = 0
    mask[2, 3:] = 0
    types = np.zeros((B, S), np.int32)

    with torch.no_grad():
        out_t = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(types, dtype=torch.long),
        ).last_hidden_state.numpy()

    out_j = jbert.bert_encode(
        params, cfg, jnp.array(ids), jnp.array(mask), jnp.array(types),
        deterministic=True, compute_dtype=jnp.float32,
    )
    # compare only at unmasked positions (masked positions are unconstrained)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out_j)[m], out_t[m], rtol=5e-4, atol=5e-4)

    # reference pooling parity (src/models.py:193-196)
    mt = torch.tensor(mask, dtype=torch.float32)
    masked_out = torch.mul(mt.unsqueeze(2), torch.tensor(out_t))
    want_pool = (masked_out.sum(1) / mt.sum(1, keepdim=True)).numpy()
    got_pool = np.asarray(masked_mean(out_j, jnp.array(mask)))
    np.testing.assert_allclose(got_pool, want_pool, rtol=5e-4, atol=5e-4)


def test_bert_random_init_runs_bf16():
    cfg = jbert.BertConfig.tiny()
    params = jbert.init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array(RNG.integers(0, cfg.vocab_size, size=(2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    out = jbert.bert_encode(params, cfg, ids, mask, compute_dtype=jnp.bfloat16)
    assert out.shape == (2, 8, cfg.hidden_size)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_bert_dropout_rngs_are_distinct():
    cfg = jbert.BertConfig.tiny()
    params = jbert.init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array(RNG.integers(0, cfg.vocab_size, size=(2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    a = jbert.bert_encode(params, cfg, ids, mask, deterministic=False,
                          dropout_rng=jax.random.PRNGKey(1), compute_dtype=jnp.float32)
    b = jbert.bert_encode(params, cfg, ids, mask, deterministic=False,
                          dropout_rng=jax.random.PRNGKey(2), compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_frozen_mask_boundary():
    cfg = jbert.BertConfig(vocab_size=10, hidden_size=8, num_layers=12,
                           num_heads=2, intermediate_size=16)
    params = jbert.init_bert_params(jax.random.PRNGKey(0), cfg)
    mask = jbert.frozen_mask(params, max_frozen_layer=8)
    assert all(jax.tree_util.tree_leaves(mask["layers"][8]))       # layer 8 frozen
    assert not any(jax.tree_util.tree_leaves(mask["layers"][9]))   # layer 9 trains
    assert not any(jax.tree_util.tree_leaves(mask["embeddings"]))  # embeddings train
