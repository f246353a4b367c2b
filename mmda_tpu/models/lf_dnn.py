"""LF_DNN: late-fusion DNN baseline (third model family).

Classic multimodal-sentiment baseline: each modality is mean-pooled over its
valid timesteps, encoded by a small MLP, and the encodings are concatenated
into MLP heads.  No recurrence at all - the cheapest member of the zoo and a
useful ablation against MISA/EF_LSTM.  Works with BERT (pooled) or GloVe
(mean-pooled embeddings) text towers and with unaligned modalities
(per-modality lengths).
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


def init_lf_dnn_params(
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
    C = cfg.num_classes
    ks = jax.random.split(key, 8)
    # shared pooled-modality encoder stack (models/pooled.py, same key order
    # as the original inline version, so initialization is unchanged)
    params = pooled.init_pooled_params(
        ks[:4], cfg, visual_size, acoustic_size, vocab_size,
        bert_cfg, bert_params, pretrained_emb)
    params["head1"] = linear_params(ks[4], 3 * H, H)
    params["head2"] = linear_params(ks[5], H, C)
    params["confidence"] = linear_params(ks[6], 3 * H, C)
    return params


def lf_dnn_forward(
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
    r_bert, r_cls = jax.random.split(rng)

    ht, hv, ha, moe_aux = pooled.pooled_modality_encodings(
        params, cfg, batch, act, bert_cfg, deterministic, r_bert,
        modality_keep)
    fused = jnp.concatenate([ht, hv, ha], axis=-1)

    tcp = jax.nn.sigmoid(linear(params["confidence"], fused))
    h = act(linear(params["head1"], fused))
    logits = linear(params["head2"], h)
    logits = dropout(r_cls, logits, cfg.dropout, deterministic)

    if cfg.resolved_task() == "regression":
        scores = logits.astype(jnp.float32)
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
