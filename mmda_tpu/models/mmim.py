"""MMIM: hierarchical Mutual Information Maximization (8th model family).

Han, Chen, Poria — EMNLP 2021, "Improving Multimodal Fusion with Hierarchical
Mutual Information Maximization for Multimodal Sentiment Analysis".  Built
from the paper's math (no torch source consulted; the reference repo
SoyeonHH/MMDA has no MI-based model at all — net-new zoo breadth):

  1. unimodal encoders: BERT text tower (masked mean, as the MISA tower
     consumes it) + the framework's rnn/transformer towers for audio/visual;
  2. **low-level MI** between text and each nonverbal modality via the
     Barber–Agakov lower bound: a diagonal-Gaussian predictor q(h_m | h_t),
     trained by NLL — maximizing E[log q] lower-bounds I(t; m);
  3. **high-level MI** between the fusion representation Z and every
     unimodal representation via CPC / InfoNCE with in-batch negatives:
     score(i, j) = h_m_i · g_m(z_j), loss = -mean_j log softmax_i(S)[j, j];
  4. fusion: concat [t, v, a] -> MLP -> Z -> regression/classification head.

Total objective (train/objective.py): task loss + model_aux, where
model_aux = mmim_alpha * (NLL_ta + NLL_tv) + mmim_beta * (NCE_t+NCE_v+NCE_a)
is computed here (the model owns its weighting; the objective adds and logs
it).  Documented divergences from the paper's released recipe: one optimizer
for everything (the paper trains the MI estimators with a separate lr); the
framework's standard towers (bi-directional, 4x-width features) instead of
the paper's single-layer rnn final states — same role; and the BA predictors
see stop-gradient TARGETS (estimator-style: h_t still receives gradient
through mu/logvar, but h_v/h_a cannot collapse toward predictability — a
deliberate anti-collapse choice, BYOL-style).  tests/test_mmim.py checks the
MI bounds against naive formulas.

TPU notes: every term is batched matmuls + elementwise (MXU/VPU shaped);
InfoNCE's (B, B) score matrices are tiny; everything jits into the one
donated train step like every other family.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.models import bert as jbert
from mmda_tpu.models import bilstm
from mmda_tpu.models.common import (
    dropout,
    layer_norm,
    layer_norm_params,
    linear,
    linear_params,
)
from mmda_tpu.models.extractors import make_tower_params, tower_extract
from mmda_tpu.models.misa import Batch, MISAOutput
from mmda_tpu.ops.functions import binarize, get_activation, masked_mean


# ---------------------------------------------------------------------------
# MI terms (module-level so the tests can check them against naive formulas)
# ---------------------------------------------------------------------------


def gaussian_nll(mu: jnp.ndarray, logvar: jnp.ndarray,
                 x: jnp.ndarray) -> jnp.ndarray:
    """Mean diagonal-Gaussian negative log-likelihood (constant dropped).
    Minimizing this maximizes the Barber–Agakov bound E[log q(x|·)]."""
    return 0.5 * jnp.mean(logvar + (x - mu) ** 2 / jnp.exp(logvar))


def infonce(h: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """CPC/InfoNCE with in-batch negatives.  h (B, D) are the targets,
    pred (B, D) the predictions g(z); positives are the diagonal."""
    scores = h @ pred.T                                  # (B, B): s[i, j]
    return -jnp.mean(jnp.diagonal(jax.nn.log_softmax(scores, axis=0)))


def _mlp_params(key, d_in, d_hidden, d_out):
    k1, k2 = jax.random.split(key)
    return {"l1": linear_params(k1, d_in, d_hidden),
            "l2": linear_params(k2, d_hidden, d_out)}


def _mlp(p, x, act):
    return linear(p["l2"], act(linear(p["l1"], x)))


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def init_mmim_params(
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
    C = cfg.num_classes
    ks = jax.random.split(key, 16)
    params: Dict[str, Any] = {}

    if cfg.use_bert:
        bert_cfg = bert_cfg or jbert.BertConfig.base()
        params["bert"] = (bert_params if bert_params is not None
                          else jbert.init_bert_params(ks[0], bert_cfg))
        text_feat = bert_cfg.hidden_size
    else:
        emb = (jnp.asarray(pretrained_emb, jnp.float32)
               if pretrained_emb is not None
               else jax.random.normal(ks[0], (vocab, cfg.embedding_size),
                                      jnp.float32))
        params["embed"] = emb
        params["text_extractor"] = make_tower_params(ks[1], cfg,
                                                     cfg.embedding_size)
        text_feat = 4 * cfg.embedding_size

    params["visual_extractor"] = make_tower_params(ks[2], cfg, dv)
    params["acoustic_extractor"] = make_tower_params(ks[3], cfg, da)

    # project every modality to H (+LN, like the MISA projections)
    def proj(k, d_in):
        return {"linear": linear_params(k, d_in, H), "ln": layer_norm_params(H)}

    params["proj_t"] = proj(ks[4], text_feat)
    params["proj_v"] = proj(ks[5], 4 * dv)
    params["proj_a"] = proj(ks[6], 4 * da)

    # low-level MI: diagonal-Gaussian predictors q(h_v | h_t), q(h_a | h_t)
    params["lld_tv"] = {"mu": _mlp_params(ks[7], H, H, H),
                        "logvar": _mlp_params(ks[8], H, H, H)}
    params["lld_ta"] = {"mu": _mlp_params(ks[9], H, H, H),
                        "logvar": _mlp_params(ks[10], H, H, H)}

    # fusion MLP + high-level CPC projections g_m(Z)
    params["fusion"] = _mlp_params(ks[11], 3 * H, 2 * H, H)
    params["cpc_t"] = linear_params(ks[12], H, H)
    params["cpc_v"] = linear_params(ks[13], H, H)
    params["cpc_a"] = linear_params(ks[14], H, H)

    k_out, k_conf = jax.random.split(ks[15])
    params["out"] = linear_params(k_out, H, C)
    params["confidence"] = linear_params(k_conf, H, C)
    return params


def mmim_forward(
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

    visual = batch.visual.astype(compute_dtype)
    acoustic = batch.acoustic.astype(compute_dtype)
    if modality_keep is not None:
        mk = modality_keep.astype(compute_dtype)
        visual = visual * mk[:, 1][:, None, None]
        acoustic = acoustic * mk[:, 2][:, None, None]

    moe_aux = None
    if cfg.use_bert:
        bert_cfg = bert_cfg or jbert.BertConfig.base()
        hidden = jbert.bert_encode(
            params["bert"], bert_cfg, batch.bert_ids, batch.bert_mask,
            batch.bert_type, deterministic=deterministic, dropout_rng=r_bert,
            compute_dtype=compute_dtype,
            attn_impl=cfg.resolved_attn_impl(
                training=not deterministic, seq_len=batch.bert_ids.shape[1]))
        if bert_cfg.moe_experts > 0:
            hidden, moe_aux = hidden
        utt_t = masked_mean(hidden.astype(jnp.float32), batch.bert_mask)
    else:
        emb = params["embed"][batch.text].astype(compute_dtype)
        if modality_keep is not None:
            emb = emb * modality_keep.astype(compute_dtype)[:, 0][:, None, None]
        utt_t = tower_extract(params["text_extractor"], cfg, emb,
                              batch.lengths, training=not deterministic)

    v_len = (batch.visual_lengths if batch.visual_lengths is not None
             else batch.lengths)
    a_len = (batch.acoustic_lengths if batch.acoustic_lengths is not None
             else batch.lengths)
    if cfg.extractor == "transformer":
        utt_v = tower_extract(params["visual_extractor"], cfg, visual, v_len,
                              training=not deterministic)
        utt_a = tower_extract(params["acoustic_extractor"], cfg, acoustic,
                              a_len, training=not deterministic)
    else:
        utt_v, utt_a = bilstm.extract_features_pair(
            params["visual_extractor"], params["acoustic_extractor"],
            visual, acoustic, v_len, a_len, cfg.rnncell,
            training=not deterministic)

    def project(p, x):
        return layer_norm(p["ln"], act(linear(p["linear"],
                                              x.astype(jnp.float32))))

    h_t = project(params["proj_t"], utt_t)               # (B, H)
    h_v = project(params["proj_v"], utt_v)
    h_a = project(params["proj_a"], utt_a)

    # ---- low-level MI (Barber–Agakov): maximize E[log q(h_m | h_t)] -------
    def lld(p, target):
        mu = _mlp(p["mu"], h_t, act)
        # tanh-bounded logvar keeps exp() sane early in training
        logvar = jnp.tanh(_mlp(p["logvar"], h_t, act)) * 3.0
        # the bound tightens q toward p(h_m|h_t); h_m is the TARGET, not a
        # function being regularized — stop_gradient matches the estimator
        # role (the encoders learn from the task + CPC terms)
        return gaussian_nll(mu, logvar, jax.lax.stop_gradient(target))

    nll = lld(params["lld_tv"], h_v) + lld(params["lld_ta"], h_a)

    # ---- fusion ------------------------------------------------------------
    z = _mlp(params["fusion"], jnp.concatenate([h_t, h_v, h_a], axis=1), act)
    z = dropout(r_drop, z, cfg.dropout, deterministic)

    # ---- high-level MI (CPC): fusion Z must stay predictive of each h_m ---
    nce = (infonce(h_t, linear(params["cpc_t"], z))
           + infonce(h_v, linear(params["cpc_v"], z))
           + infonce(h_a, linear(params["cpc_a"], z)))

    model_aux = {"total": cfg.mmim_alpha * nll + cfg.mmim_beta * nce,
                 "nll": nll, "nce": nce}

    tcp = jax.nn.sigmoid(linear(params["confidence"], z))
    logits = linear(params["out"], z).astype(jnp.float32)
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
        fusion_attn=none, moe_aux=moe_aux, model_aux=model_aux,
    )
