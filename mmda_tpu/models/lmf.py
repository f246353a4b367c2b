"""LMF: Low-rank Multimodal Fusion (5th model family).

Liu et al., ACL 2018 ("Efficient Low-rank Multimodal Fusion with
Modality-Specific Factors"): instead of the full outer-product tensor fusion
(TFN's (d_t+1)(d_v+1)(d_a+1)-sized tensor), the fusion weight tensor is
factorized into per-modality rank-R factors:

    y = sum_{i=1..R}  (W_t^i [h_t;1]) * (W_v^i [h_v;1]) * (W_a^i [h_a;1])

— three small matmuls and an elementwise product per rank, which is exactly
the shape of computation the MXU + VPU like (one batched (R, d_m+1, H)
dot_general per modality; no giant materialized tensor).

Encoders are the shared pooled-modality stack (models/pooled.py, also used by
LF_DNN), so LMF slots into the same registry/losses/trainer/serving stack and
supports unaligned streams and missing-modality adaptation.  MISA-only losses
(diff/sim/recon) see None fields and stay inert.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.models import bert as jbert
from mmda_tpu.models import pooled
from mmda_tpu.models.common import dropout, linear, linear_params
from mmda_tpu.models.misa import Batch, MISAOutput
from mmda_tpu.ops.functions import binarize, get_activation


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
    H = cfg.hidden_size
    R = cfg.lmf_rank
    C = cfg.num_classes
    ks = jax.random.split(key, 9)
    params = pooled.init_pooled_params(
        ks[:4], cfg, visual_size, acoustic_size, vocab_size,
        bert_cfg, bert_params, pretrained_emb)

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
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_bert, r_drop = jax.random.split(rng)

    ht, hv, ha, moe_aux = pooled.pooled_modality_encodings(
        params, cfg, batch, act, bert_cfg, deterministic, r_bert,
        modality_keep)

    # low-rank fusion: append the constant-1 slot (keeps each modality's
    # unimodal contribution, as in the paper), then one batched
    # (B, H+1) x (R, H+1, H) -> (B, R, H) matmul per modality
    ones = jnp.ones((ht.shape[0], 1), jnp.float32)
    dn = (((1,), (1,)), ((), ()))

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
        fusion_attn=none, moe_aux=moe_aux,
    )
