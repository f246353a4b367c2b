"""Shared pooled-modality encoder used by the non-sequential fusion families
(LF_DNN, LMF): masked-mean pooling per modality (BERT-pooled or GloVe-mean
text) followed by a 2-layer MLP + LayerNorm encoder, with missing-modality
zeroing.  Factored out so a semantics fix lands in one place for both
families."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.models import bert as jbert
from mmda_tpu.models.common import (
    layer_norm,
    layer_norm_params,
    linear,
    linear_params,
)
from mmda_tpu.models.misa import Batch
from mmda_tpu.ops.functions import length_mask, masked_mean


def encoder_params(key, d_in: int, hidden: int) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"l1": linear_params(k1, d_in, hidden),
            "l2": linear_params(k2, hidden, hidden),
            "ln": layer_norm_params(hidden)}


def init_pooled_params(
    keys,
    cfg: Config,
    visual_size: Optional[int],
    acoustic_size: Optional[int],
    vocab_size: Optional[int],
    bert_cfg: Optional[jbert.BertConfig],
    bert_params: Optional[Dict],
    pretrained_emb,
) -> Dict:
    """Text tower (bert/embed) + the three per-modality encoders.
    keys: four PRNG keys (text tower, enc_t, enc_v, enc_a)."""
    dv = visual_size or cfg.visual_size
    da = acoustic_size or cfg.acoustic_size
    vocab = vocab_size or cfg.vocab_size
    H = cfg.hidden_size
    params: Dict = {}
    if cfg.use_bert:
        bert_cfg = bert_cfg or jbert.BertConfig.base()
        params["bert"] = (bert_params if bert_params is not None
                          else jbert.init_bert_params(keys[0], bert_cfg))
        text_in = bert_cfg.hidden_size
    else:
        params["embed"] = (
            jnp.asarray(pretrained_emb, jnp.float32) if pretrained_emb is not None
            else jax.random.normal(keys[0], (vocab, cfg.embedding_size),
                                   jnp.float32))
        text_in = cfg.embedding_size
    params["enc_t"] = encoder_params(keys[1], text_in, H)
    params["enc_v"] = encoder_params(keys[2], dv, H)
    params["enc_a"] = encoder_params(keys[3], da, H)
    return params


def pooled_modality_encodings(
    params: Dict,
    cfg: Config,
    batch: Batch,
    act,
    bert_cfg: Optional[jbert.BertConfig],
    deterministic: bool,
    bert_rng,
    modality_keep,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[Dict]]:
    """(ht, hv, ha, moe_aux): masked-mean pooled, modality-dropped,
    MLP-encoded per-modality vectors, each (B, hidden_size) f32; moe_aux is
    the BERT tower's Switch router losses (None unless moe_experts > 0)."""
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    v_len = batch.visual_lengths if batch.visual_lengths is not None else batch.lengths
    a_len = batch.acoustic_lengths if batch.acoustic_lengths is not None else batch.lengths

    moe_aux = None
    if cfg.use_bert:
        bert_cfg = bert_cfg or jbert.BertConfig.base()
        hidden = jbert.bert_encode(
            params["bert"], bert_cfg, batch.bert_ids, batch.bert_mask,
            batch.bert_type, deterministic=deterministic, dropout_rng=bert_rng,
            compute_dtype=compute_dtype,
            attn_impl=cfg.resolved_attn_impl(
                training=not deterministic, seq_len=batch.bert_ids.shape[1]))
        if bert_cfg.moe_experts > 0:
            hidden, moe_aux = hidden
        pooled_t = masked_mean(hidden.astype(jnp.float32), batch.bert_mask)
    else:
        emb = params["embed"][batch.text].astype(jnp.float32)
        tmask = length_mask(batch.lengths, batch.text.shape[1])
        pooled_t = masked_mean(emb, tmask)

    vmask = length_mask(v_len, batch.visual.shape[1])
    amask = length_mask(a_len, batch.acoustic.shape[1])
    pooled_v = masked_mean(batch.visual.astype(jnp.float32), vmask)
    pooled_a = masked_mean(batch.acoustic.astype(jnp.float32), amask)

    if modality_keep is not None:
        mk = modality_keep.astype(jnp.float32)
        pooled_t = pooled_t * mk[:, 0][:, None]
        pooled_v = pooled_v * mk[:, 1][:, None]
        pooled_a = pooled_a * mk[:, 2][:, None]

    def enc(p, x):
        h = act(linear(p["l1"], x))
        return layer_norm(p["ln"], act(linear(p["l2"], h)))

    return (enc(params["enc_t"], pooled_t),
            enc(params["enc_v"], pooled_v),
            enc(params["enc_a"], pooled_a),
            moe_aux)
