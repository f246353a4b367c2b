"""MAG-BERT: Multimodal Adaptation Gate injected into BERT (7th model family).

Rahman et al., ACL 2020 ("Integrating Multimodal Information in Large
Pretrained Transformers"): instead of fusing pooled utterance vectors, shift
BERT's token-level hidden states with a gated nonverbal displacement at one
encoder layer

    g_v = ReLU(W_gv [h; v])            per-token visual gate      (B, S, H)
    g_a = ReLU(W_ga [h; a])            per-token acoustic gate
    H_m = g_v * (W_v v) + g_a * (W_a a)          nonverbal shift
    alpha = min(beta * ||h|| / ||H_m||, 1)       per-token trust scalar
    h'  = LayerNorm(h + dropout(alpha * H_m))

then classify from the [CLS] pooler as ordinary BERT fine-tuning.

TPU-first design:
  * the gate is NOT a separate module wrapping a torch BertModel (the official
    implementation monkey-patches the HF encoder); here it is a closure passed
    through `bert_encode`'s generic `inject_layer`/`inject_fn` hook
    (models/bert.py) — the whole gated encoder stays one jit'd function, XLA
    fuses the gate's matmuls into the surrounding layer, and every existing
    BERT feature (Pallas/flash attention, fast dropout, remat, HF weight
    loading, TP sharding specs, freeze masks on params["bert"]) composes
    unchanged;
  * word-aligned visual/acoustic streams are laid onto the WordPiece grid by
    a static shift-by-one placement (position 0 is [CLS]); zero rows where the
    grid has no aligned frame make the gate a no-op there (ReLU gates of a
    zero shift scale a zero vector).

Reference parity note: the reference repo (SoyeonHH/MMDA) has no MAG model;
this family is net-new surface (like MULT/LMF/TFN), validated against the
paper's per-example formula in tests/test_mag_bert.py.  It reuses the
reference's BERT text path (src/models.py:186-198) as its backbone.
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
from mmda_tpu.ops.functions import binarize


def init_mag_bert_params(
    key,
    cfg: Config,
    visual_size: Optional[int] = None,
    acoustic_size: Optional[int] = None,
    vocab_size: Optional[int] = None,
    bert_cfg: Optional[jbert.BertConfig] = None,
    bert_params: Optional[Dict] = None,
    pretrained_emb=None,
) -> Dict:
    if not cfg.use_bert:
        raise ValueError("MAG_BERT requires use_bert=True (the gate shifts "
                         "BERT hidden states; there is no GloVe variant)")
    bert_cfg = bert_cfg or jbert.BertConfig.base()
    Hb = bert_cfg.hidden_size
    dv = visual_size or cfg.visual_size
    da = acoustic_size or cfg.acoustic_size
    C = cfg.num_classes

    ks = jax.random.split(key, 8)
    params: Dict = {
        "bert": bert_params if bert_params is not None
        else jbert.init_bert_params(ks[0], bert_cfg),
        "mag": {
            "gate_v": linear_params(ks[1], Hb + dv, Hb),
            "gate_a": linear_params(ks[2], Hb + da, Hb),
            "proj_v": linear_params(ks[3], dv, Hb),
            "proj_a": linear_params(ks[4], da, Hb),
            "ln": layer_norm_params(Hb),
        },
        "pooler": linear_params(ks[5], Hb, Hb),
        "classifier": linear_params(ks[6], Hb, C),
        "confidence": linear_params(ks[7], Hb, C),
    }
    return params


def _to_token_grid(seq: jnp.ndarray, S: int, mask: jnp.ndarray) -> jnp.ndarray:
    """Lay a word-aligned (B, T, D) feature stream onto the (B, S) WordPiece
    grid: shift by one past [CLS], truncate/zero-pad to S, zero padded
    positions.  Static shapes throughout (T and S are trace-time constants).
    """
    B, T, D = seq.shape
    n = min(T, S - 1)
    grid = jnp.zeros((B, S, D), seq.dtype)
    grid = jax.lax.dynamic_update_slice(grid, seq[:, :n, :], (0, 1, 0))
    return grid * mask.astype(seq.dtype)[:, :, None]


def mag_gate(mag_params: Dict, h: jnp.ndarray, vis: jnp.ndarray,
             aco: jnp.ndarray, beta: float, drop_rate: float,
             deterministic: bool, rng, eps: float = 1e-6) -> jnp.ndarray:
    """The adaptation gate itself (paper eqs. 1-6), fp32 for the norm ratio."""
    hf = h.astype(jnp.float32)
    gv = jax.nn.relu(linear(mag_params["gate_v"],
                            jnp.concatenate([hf, vis], axis=-1)))
    ga = jax.nn.relu(linear(mag_params["gate_a"],
                            jnp.concatenate([hf, aco], axis=-1)))
    h_m = gv * linear(mag_params["proj_v"], vis) \
        + ga * linear(mag_params["proj_a"], aco)

    norm_h = jnp.linalg.norm(hf, axis=-1, keepdims=True)
    norm_m = jnp.linalg.norm(h_m, axis=-1, keepdims=True)
    alpha = jnp.minimum(beta * norm_h / (norm_m + eps), 1.0)

    shift = dropout(rng, alpha * h_m, drop_rate, deterministic)
    return layer_norm(mag_params["ln"], hf + shift)


def mag_bert_forward(
    params: Dict,
    cfg: Config,
    batch: Batch,
    bert_cfg: Optional[jbert.BertConfig] = None,
    deterministic: bool = True,
    rng=None,
    modality_keep=None,
) -> MISAOutput:
    bert_cfg = bert_cfg or jbert.BertConfig.base()
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_bert, r_mag, r_cls = jax.random.split(rng, 3)

    visual = batch.visual.astype(jnp.float32)
    acoustic = batch.acoustic.astype(jnp.float32)
    if modality_keep is not None:
        mk = modality_keep.astype(jnp.float32)
        visual = visual * mk[:, 1][:, None, None]
        acoustic = acoustic * mk[:, 2][:, None, None]

    S = batch.bert_ids.shape[1]
    vis = _to_token_grid(visual, S, batch.bert_mask)
    aco = _to_token_grid(acoustic, S, batch.bert_mask)

    def inject(h):
        return mag_gate(params["mag"], h, vis, aco, cfg.mag_beta,
                        cfg.mag_dropout, deterministic, r_mag)

    hidden = jbert.bert_encode(
        params["bert"], bert_cfg, batch.bert_ids, batch.bert_mask,
        batch.bert_type, deterministic=deterministic, dropout_rng=r_bert,
        compute_dtype=compute_dtype,
        attn_impl=cfg.resolved_attn_impl(
            training=not deterministic, seq_len=batch.bert_ids.shape[1]),
        inject_layer=cfg.mag_inject_layer, inject_fn=inject,
    )
    moe_aux = None
    if bert_cfg.moe_experts > 0:
        hidden, moe_aux = hidden

    # [CLS] pooler -> dropout -> heads (ordinary BERT fine-tuning readout)
    pooled = jnp.tanh(linear(params["pooler"],
                             hidden[:, 0].astype(jnp.float32)))
    pooled = dropout(r_cls, pooled, cfg.dropout, deterministic)

    tcp = jax.nn.sigmoid(linear(params["confidence"], pooled))
    logits = linear(params["classifier"], pooled).astype(jnp.float32)

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
