"""TFN: Tensor Fusion Network (6th model family).

Zadeh et al., EMNLP 2017 ("Tensor Fusion Network for Multimodal Sentiment
Analysis"): fuse modalities with the FULL triple outer product

    z = [h_t; 1] (x) [h_v; 1] (x) [h_a; 1]   in R^{(D+1)^3}

so every unimodal, bimodal and trimodal interaction gets an explicit
coordinate (the appended 1-slots carry the lower-order terms), followed by a
2-layer inference head.  LMF (models/lmf.py) is the low-rank factorization of
exactly this tensor — together they complete the tensor-fusion family.

TPU-first shape choices:
  * modalities come from the shared pooled encoder stack (models/pooled.py -
    same encoders as LF_DNN/LMF, so TFN inherits unaligned streams and
    missing-modality adaptation for free);
  * each (B, H) encoding is first projected to a small post-fusion dim D
    (cfg.tfn_post_dim, paper-style) so the fused tensor is (B, (D+1)^3) -
    at the default D=16, 4,913 coordinates: one einsum + one (4913, H) MXU
    matmul, no giant materialization;
  * the outer product is a single einsum('bi,bj,bk->bijk') XLA fuses with
    the flatten + fusion matmul.

Reference parity note: the reference repo names no tensor-fusion model; this
family is net-new surface (like MULT/LMF) validated against the naive
per-example formula in tests/test_tfn.py.
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


def init_tfn_params(
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
    D = cfg.tfn_post_dim
    C = cfg.num_classes
    ks = jax.random.split(key, 11)
    params = pooled.init_pooled_params(
        ks[:4], cfg, visual_size, acoustic_size, vocab_size,
        bert_cfg, bert_params, pretrained_emb)

    params["post_t"] = linear_params(ks[4], H, D)
    params["post_v"] = linear_params(ks[5], H, D)
    params["post_a"] = linear_params(ks[6], H, D)
    params["fusion"] = linear_params(ks[7], (D + 1) ** 3, H)
    params["head"] = linear_params(ks[8], H, H)
    params["out"] = linear_params(ks[9], H, C)
    params["confidence"] = linear_params(ks[10], H, C)
    return params


def tfn_forward(
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
    r_bert, r_drop1, r_drop2 = jax.random.split(rng, 3)

    ht, hv, ha, moe_aux = pooled.pooled_modality_encodings(
        params, cfg, batch, act, bert_cfg, deterministic, r_bert,
        modality_keep)

    B = ht.shape[0]
    ones = jnp.ones((B, 1), jnp.float32)

    def post(z, name):
        return jnp.concatenate(
            [act(linear(params[name], z)).astype(jnp.float32), ones], axis=1)

    zt, zv, za = post(ht, "post_t"), post(hv, "post_v"), post(ha, "post_a")

    # full tensor fusion: (B, D+1, D+1, D+1) — every uni/bi/tri-modal
    # interaction coordinate (the 1-slots carry the lower-order terms)
    tensor = jnp.einsum("bi,bj,bk->bijk", zt, zv, za)
    fused = linear(params["fusion"], tensor.reshape(B, -1))
    fused = act(fused)
    fused = dropout(r_drop1, fused, cfg.dropout, deterministic)
    h = act(linear(params["head"], fused))
    h = dropout(r_drop2, h, cfg.dropout, deterministic)

    tcp = jax.nn.sigmoid(linear(params["confidence"], h))
    logits = linear(params["out"], h).astype(jnp.float32)

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
