"""EF_LSTM: early-fusion LSTM baseline (second model family).

The reference's model registry has exactly one entry ("one of {MISA, }",
src/config.py:157-158); this adds the classic multimodal-sentiment baseline to
demonstrate the zoo: per-timestep concat of (GloVe embedding, visual,
acoustic) -> one 2-layer masked bi-LSTM -> MLP heads.  Requires word-aligned
data (streams share timestamps) and use_bert=False.

Returns a MISAOutput with the factorization fields set to None; the objective
skips diff/sim/recon for models without shared/private structure.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.models import bilstm
from mmda_tpu.models.common import dropout, linear, linear_params
from mmda_tpu.models.misa import Batch, MISAOutput
from mmda_tpu.ops.functions import binarize, get_activation


def init_ef_lstm_params(
    key,
    cfg: Config,
    visual_size: Optional[int] = None,
    acoustic_size: Optional[int] = None,
    vocab_size: Optional[int] = None,
    bert_cfg=None,
    bert_params=None,
    pretrained_emb=None,
) -> Dict:
    if cfg.use_bert:
        raise ValueError("EF_LSTM is a GloVe-based early-fusion model; "
                         "run with --use_bert False")
    dv = visual_size or cfg.visual_size
    da = acoustic_size or cfg.acoustic_size
    vocab = vocab_size or cfg.vocab_size
    d_in = cfg.embedding_size + dv + da
    H = cfg.hidden_size
    C = cfg.num_classes
    k_emb, k_rnn, k_h1, k_h2, k_conf = jax.random.split(key, 5)
    emb = (jnp.asarray(pretrained_emb, jnp.float32) if pretrained_emb is not None
           else jax.random.normal(k_emb, (vocab, cfg.embedding_size), jnp.float32))
    return {
        "embed": emb,
        "fused_extractor": bilstm.extractor_params(k_rnn, d_in, H, cfg.rnncell),
        "head1": linear_params(k_h1, 4 * H, H),
        "head2": linear_params(k_h2, H, C),
        "confidence": linear_params(k_conf, 4 * H, C),
    }


def ef_lstm_forward(
    params: Dict,
    cfg: Config,
    batch: Batch,
    bert_cfg=None,
    deterministic: bool = True,
    rng=None,
    modality_keep=None,
) -> MISAOutput:
    act = get_activation(cfg.activation)
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    emb = params["embed"][batch.text].astype(compute_dtype)
    visual = batch.visual.astype(compute_dtype)
    acoustic = batch.acoustic.astype(compute_dtype)
    if modality_keep is not None:
        mk = modality_keep.astype(compute_dtype)
        emb = emb * mk[:, 0][:, None, None]
        visual = visual * mk[:, 1][:, None, None]
        acoustic = acoustic * mk[:, 2][:, None, None]

    if visual.shape[1] != emb.shape[1] or acoustic.shape[1] != emb.shape[1]:
        raise ValueError("EF_LSTM needs word-aligned modalities")
    x = jnp.concatenate([emb, visual, acoustic], axis=-1)
    utt = bilstm.extract_features(
        params["fused_extractor"], x, batch.lengths, cfg.rnncell,
        training=not deterministic)  # (B, 4H)

    h = act(linear(params["head1"], utt.astype(jnp.float32)))
    logits = linear(params["head2"], h)
    logits = dropout(rng, logits, cfg.dropout, deterministic)
    tcp = jax.nn.sigmoid(linear(params["confidence"], utt.astype(jnp.float32)))

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
        fusion_attn=none,
    )
