"""LMF: Low-rank Multimodal Fusion (5th model family).

Liu et al., ACL 2018 ("Efficient Low-rank Multimodal Fusion with
Modality-Specific Factors"): instead of the full outer-product tensor fusion
(TFN's (d_t+1)(d_v+1)(d_a+1)-sized tensor), the fusion weight tensor is
factorized into per-modality rank-R factors:

    y = sum_{i=1..R}  (W_t^i [h_t;1]) * (W_v^i [h_v;1]) * (W_a^i [h_a;1])

— three small matmuls and an elementwise product per rank, which is exactly
the shape of computation the MXU + VPU like (one batched (R, d_m+1, H)
dot_general per modality; no giant materialized tensor).

Encoders follow this zoo's conventions (masked mean pooling + 2-layer MLP per
modality; BERT-pooled or GloVe-mean text), so LMF slots into the same
registry/losses/trainer/serving stack and supports unaligned streams and
missing-modality adaptation like LF_DNN.  MISA-only losses (diff/sim/recon)
see None fields and stay inert.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.models import bert as jbert
from mmda_tpu.models.common import (
    dropout,
    layer_norm,
    layer_norm_params,
    linear,
    linear_params,
)
from mmda_tpu.models.misa import Batch, MISAOutput
from mmda_tpu.ops.functions import binarize, get_activation, length_mask, masked_mean


def init_lmf_params(
    key,
    cfg: Config,
    visual_size: Optional[int] = None,
    acoustic_size: Optional[int] = None,
    vocab_size: Optional[int] = None,
    bert_cfg: Optional[jbert.BertConfig] = None,
    bert_params: Optional[Dict] = None,
    pretrained_emb=None,
) -> Dict:
    dv = visual_size or cfg.visual_size
    da = acoustic_size or cfg.acoustic_size
    vocab = vocab_size or cfg.vocab_size
    H = cfg.hidden_size
    R = cfg.lmf_rank
    C = cfg.num_classes
    ks = jax.random.split(key, 10)
    params: Dict = {}

    if cfg.use_bert:
        bert_cfg = bert_cfg or jbert.BertConfig.base()
        params["bert"] = (bert_params if bert_params is not None
                          else jbert.init_bert_params(ks[0], bert_cfg))
        text_in = bert_cfg.hidden_size
    else:
        params["embed"] = (
            jnp.asarray(pretrained_emb, jnp.float32) if pretrained_emb is not None
            else jax.random.normal(ks[0], (vocab, cfg.embedding_size),
                                   jnp.float32))
        text_in = cfg.embedding_size

    def enc(k, d_in):
        k1, k2 = jax.random.split(k)
        return {"l1": linear_params(k1, d_in, H), "l2": linear_params(k2, H, H),
                "ln": layer_norm_params(H)}

    params["enc_t"] = enc(ks[1], text_in)
    params["enc_v"] = enc(ks[2], dv)
    params["enc_a"] = enc(ks[3], da)

    # rank-R factors: (R, H+1, H) per modality (Xavier-ish scale), fused bias
    def factor(k):
        return jax.random.normal(k, (R, H + 1, H), jnp.float32) / jnp.sqrt(H + 1)

    params["factor_t"] = factor(ks[4])
    params["factor_v"] = factor(ks[5])
    params["factor_a"] = factor(ks[6])
    params["fusion_bias"] = jnp.zeros((H,), jnp.float32)
    params["out"] = linear_params(ks[7], H, C)
    params["confidence"] = linear_params(ks[8], H, C)
    return params


def lmf_forward(
    params: Dict,
    cfg: Config,
    batch: Batch,
    bert_cfg: Optional[jbert.BertConfig] = None,
    deterministic: bool = True,
    rng=None,
    modality_keep=None,
) -> MISAOutput:
    act = get_activation(cfg.activation)
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_bert, r_drop = jax.random.split(rng)

    v_len = batch.visual_lengths if batch.visual_lengths is not None else batch.lengths
    a_len = batch.acoustic_lengths if batch.acoustic_lengths is not None else batch.lengths

    if cfg.use_bert:
        bert_cfg = bert_cfg or jbert.BertConfig.base()
        hidden = jbert.bert_encode(
            params["bert"], bert_cfg, batch.bert_ids, batch.bert_mask,
            batch.bert_type, deterministic=deterministic, dropout_rng=r_bert,
            compute_dtype=compute_dtype,
            attn_impl=cfg.resolved_attn_impl())
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

    ht = enc(params["enc_t"], pooled_t)
    hv = enc(params["enc_v"], pooled_v)
    ha = enc(params["enc_a"], pooled_a)

    # low-rank fusion: append the constant-1 slot (keeps each modality's
    # unimodal contribution, as in the paper), then one batched
    # (B, H+1) x (R, H+1, H) -> (R, B, H) matmul per modality
    ones = jnp.ones((ht.shape[0], 1), jnp.float32)
    dn = (((1,), (1,)), ((), ()))   # (B, H+1) . (R, H+1, H) -> (B, R, H)

    def project(z, w):
        return jax.lax.dot_general(
            jnp.concatenate([z, ones], axis=1), w, dn,
            preferred_element_type=jnp.float32)

    fused = jnp.sum(
        project(ht, params["factor_t"])
        * project(hv, params["factor_v"])
        * project(ha, params["factor_a"]),
        axis=1,
    ) + params["fusion_bias"]                       # (B, H)
    fused = dropout(r_drop, fused, cfg.dropout, deterministic)

    tcp = jax.nn.sigmoid(linear(params["confidence"], fused))
    logits = linear(params["out"], fused).astype(jnp.float32)

    if cfg.resolved_task() == "regression":
        scores = logits
        labels = scores
    else:
        scores = jax.nn.sigmoid(logits)
        labels = binarize(scores, cfg.threshold)

    none = None
    return MISAOutput(
        scores=scores, labels=labels, tcp=tcp,
        shared_t=none, shared_v=none, shared_a=none,
        private_t=none, private_v=none, private_a=none,
        orig_t=none, orig_v=none, orig_a=none,
        recon_t=none, recon_v=none, recon_a=none,
        domain_t=none, domain_v=none, domain_a=none,
        sp_p_t=none, sp_p_v=none, sp_p_a=none, sp_s=none,
        fusion_attn=none,
    )
