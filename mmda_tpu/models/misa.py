"""MISA model (shared/private multimodal factorization), pure-functional.

TPU-native rebuild of the reference `class MISA(nn.Module)`
(reference src/models.py:15-285).  Differences by design:

  * Pure function of (params, inputs) -> `MISAOutput`.  The reference stashes
    intermediate representations on `self` and the Solver reads them back for
    losses (src/models.py:265-279, src/solver.py:394-462); here every tensor the
    objective needs is returned in one output struct (SURVEY.md §2.1 item 10).
  * One jit-able forward: LSTM towers are masked scans (models/bilstm.py), BERT
    is the functional encoder (models/bert.py), everything else is fused
    matmul+activation+LayerNorm chains XLA maps onto the MXU.
  * Missing-modality dynamic adaptation (the capability the repo title promises
    but never implements - SURVEY.md global facts) is first-class: a per-example
    `modality_keep` (B, 3) multiplier zeroes text/visual/acoustic input streams
    at train or eval time.

Computation graph parity map (reference file:line):
  text tower (BERT masked-mean)          src/models.py:186-198
  text tower (GloVe + 2x bi-LSTM)        src/models.py:199-203
  visual/acoustic towers                 src/models.py:207-213
  projections -> private/shared          src/models.py:61-104, 265-279
  adversarial discriminator              src/models.py:119-127, 219-231
  sp discriminator                       src/models.py:132-133, 234-237
  reconstruction                         src/models.py:110-115, 254-262
  6-token transformer fusion             src/models.py:160-161, 242-245
  confidence + classifier + binarize     src/models.py:138-153, 247-249
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.models import bert as jbert
from mmda_tpu.models import bilstm
from mmda_tpu.models.extractors import tower_extract
from mmda_tpu.models.common import (
    dropout,
    layer_norm,
    layer_norm_params,
    linear,
    linear_params,
    transformer_layer,
    transformer_layer_params,
)
from mmda_tpu.ops.functions import binarize, get_activation, masked_mean, reverse_grad


class MISAOutput(NamedTuple):
    """Everything the training objective consumes (replaces the reference's
    model-attribute side channel, src/solver.py:394-462)."""

    scores: jnp.ndarray          # (B, C) sigmoid scores
    labels: jnp.ndarray          # (B, C) binarized at threshold
    tcp: jnp.ndarray             # (B, C) ConfidNet confidence
    shared_t: jnp.ndarray
    shared_v: jnp.ndarray
    shared_a: jnp.ndarray
    private_t: jnp.ndarray
    private_v: jnp.ndarray
    private_a: jnp.ndarray
    orig_t: jnp.ndarray          # projected originals (utt_*_orig)
    orig_v: jnp.ndarray
    orig_a: jnp.ndarray
    recon_t: jnp.ndarray
    recon_v: jnp.ndarray
    recon_a: jnp.ndarray
    domain_t: Optional[jnp.ndarray]   # (B, 3) or None when use_cmd_sim
    domain_v: Optional[jnp.ndarray]
    domain_a: Optional[jnp.ndarray]
    sp_p_t: jnp.ndarray          # sp-discriminator logits (vestigial loss in ref)
    sp_p_v: jnp.ndarray
    sp_p_a: jnp.ndarray
    sp_s: jnp.ndarray
    fusion_attn: Optional[jnp.ndarray] = None  # (B, nh, 6, 6) fusion
                                 # self-attention scores - implements the
                                 # reference's TODO at src/models.py:159
    moe_aux: Optional[Dict] = None  # Switch router aux losses
                                 # ({'balance','router_z'}, ops/moe.py) when
                                 # the BERT tower runs with moe_experts > 0
    model_aux: Optional[Dict] = None  # model-family-specific auxiliary
                                 # objective, pre-weighted by the model under
                                 # key 'total' (+ raw components for
                                 # inspection); e.g. MMIM's MI terms
                                 # (models/mmim.py).  The objective adds and
                                 # logs 'total' generically.


class Batch(NamedTuple):
    """Fixed-shape device batch (the collate output, reference
    src/data_loader.py:122, re-cut for XLA static shapes).

    visual_lengths/acoustic_lengths support UNALIGNED data (per-modality
    sequence lengths - the reference's empty UnAlignedMoseiDataset stub,
    src/data_loader.py:133-135); for word-aligned data they equal `lengths`.
    """

    text: jnp.ndarray            # (B, T) int32 GloVe vocab ids
    visual: jnp.ndarray          # (B, Tv, Dv) float
    acoustic: jnp.ndarray        # (B, Ta, Da) float
    lengths: jnp.ndarray         # (B,) int32 text lengths
    bert_ids: jnp.ndarray        # (B, S) int32
    bert_type: jnp.ndarray       # (B, S) int32
    bert_mask: jnp.ndarray       # (B, S) int32
    sentiment: jnp.ndarray       # (B,) float
    emo_label: jnp.ndarray       # (B, C) float {0,1}
    sample_weight: jnp.ndarray   # (B,) 1.0 real / 0.0 padding row
    visual_lengths: Optional[jnp.ndarray] = None   # (B,) int32; None -> lengths
    acoustic_lengths: Optional[jnp.ndarray] = None


def init_misa_params(
    key,
    cfg: Config,
    visual_size: Optional[int] = None,
    acoustic_size: Optional[int] = None,
    vocab_size: Optional[int] = None,
    bert_cfg: Optional[jbert.BertConfig] = None,
    bert_params: Optional[Dict] = None,
    pretrained_emb=None,
) -> Dict:
    """Build the MISA parameter tree.  Sizes mirror the reference
    (src/models.py:17-161): tower hidden == modality input size, utterance dim
    = 4*input_size, projection -> cfg.hidden_size."""
    dv = visual_size or cfg.visual_size
    da = acoustic_size or cfg.acoustic_size
    vocab = vocab_size or cfg.vocab_size
    H = cfg.hidden_size
    C = cfg.num_classes

    ks = jax.random.split(key, 24)
    params: Dict[str, Any] = {}

    from mmda_tpu.models.extractors import make_tower_params

    if cfg.use_bert:
        bert_cfg = bert_cfg or jbert.BertConfig.base()
        params["bert"] = bert_params if bert_params is not None else jbert.init_bert_params(ks[0], bert_cfg)
        text_feat = bert_cfg.hidden_size
    else:
        emb = (
            jnp.asarray(pretrained_emb, jnp.float32)
            if pretrained_emb is not None
            else jax.random.normal(ks[0], (vocab, cfg.embedding_size), jnp.float32)
        )
        params["embed"] = emb
        params["text_extractor"] = make_tower_params(ks[1], cfg, cfg.embedding_size)
        text_feat = 4 * cfg.embedding_size

    params["visual_extractor"] = make_tower_params(ks[2], cfg, dv)
    params["acoustic_extractor"] = make_tower_params(ks[3], cfg, da)

    def proj(k, d_in):
        kl, _ = jax.random.split(k)
        return {"linear": linear_params(kl, d_in, H), "ln": layer_norm_params(H)}

    params["project_t"] = proj(ks[4], text_feat)
    params["project_v"] = proj(ks[5], 4 * dv)
    params["project_a"] = proj(ks[6], 4 * da)

    params["private_t"] = linear_params(ks[7], H, H)
    params["private_v"] = linear_params(ks[8], H, H)
    params["private_a"] = linear_params(ks[9], H, H)
    params["shared"] = linear_params(ks[10], H, H)

    params["recon_t"] = linear_params(ks[11], H, H)
    params["recon_v"] = linear_params(ks[12], H, H)
    params["recon_a"] = linear_params(ks[13], H, H)

    if not cfg.use_cmd_sim:
        params["discriminator"] = {
            "l1": linear_params(ks[14], H, H),
            "l2": linear_params(ks[15], H, 3),
        }

    params["sp_discriminator"] = linear_params(ks[16], H, 4)
    params["confidence"] = linear_params(ks[17], H * 6, C)
    params["classifier"] = linear_params(ks[18], H * 6, C)
    params["fusion"] = transformer_layer_params(ks[19], H)

    if cfg.use_label_decoder:
        # label-attention decoder (reference TODO src/models.py:144-147):
        # label embeddings (C, H) query the 6 fused tokens; per-label context
        # is scored by a per-label output vector.
        k_le, k_lw = jax.random.split(ks[20])
        params["label_decoder"] = {
            "embed": jax.random.normal(k_le, (C, H), jnp.float32) * 0.02,
            "out_w": jax.random.normal(k_lw, (C, H), jnp.float32) * 0.02,
            "out_b": jnp.zeros((C,), jnp.float32),
        }
    return params


def misa_forward(
    params: Dict,
    cfg: Config,
    batch: Batch,
    bert_cfg: Optional[jbert.BertConfig] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    modality_keep: Optional[jnp.ndarray] = None,   # (B, 3) in {0,1}: t, v, a
) -> MISAOutput:
    act = get_activation(cfg.activation)
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    H = cfg.hidden_size

    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_bert, r_fusion, r_cls, r_disc = jax.random.split(rng, 4)

    visual = batch.visual.astype(compute_dtype)
    acoustic = batch.acoustic.astype(compute_dtype)

    if modality_keep is not None:
        mk = modality_keep.astype(compute_dtype)
        visual = visual * mk[:, 1][:, None, None]
        acoustic = acoustic * mk[:, 2][:, None, None]

    # ---- text tower -------------------------------------------------------
    moe_aux = None
    if cfg.use_bert:
        bert_cfg = bert_cfg or jbert.BertConfig.base()
        hidden = jbert.bert_encode(
            params["bert"], bert_cfg, batch.bert_ids, batch.bert_mask,
            batch.bert_type, deterministic=deterministic, dropout_rng=r_bert,
            compute_dtype=compute_dtype,
            attn_impl=cfg.resolved_attn_impl(
                training=not deterministic, seq_len=batch.bert_ids.shape[1]),
        )
        if bert_cfg.moe_experts > 0:
            hidden, moe_aux = hidden
        utt_text = masked_mean(hidden.astype(jnp.float32), batch.bert_mask)
    else:
        emb = params["embed"][batch.text].astype(compute_dtype)
        if modality_keep is not None:
            emb = emb * modality_keep.astype(compute_dtype)[:, 0][:, None, None]
        utt_text = tower_extract(params["text_extractor"], cfg, emb,
                                 batch.lengths, training=not deterministic)

    # ---- visual / acoustic towers ----------------------------------------
    v_len = batch.visual_lengths if batch.visual_lengths is not None else batch.lengths
    a_len = batch.acoustic_lengths if batch.acoustic_lengths is not None else batch.lengths
    if cfg.extractor == "transformer":
        utt_video = tower_extract(params["visual_extractor"], cfg, visual,
                                  v_len, training=not deterministic)
        utt_audio = tower_extract(params["acoustic_extractor"], cfg, acoustic,
                                  a_len, training=not deterministic)
    else:
        # both RNN towers through one path: with cfg.use_pallas on (TPU) the
        # recurrences run in the fused per-direction Pallas kernel, otherwise
        # in the fused-direction XLA scan (both measured winners,
        # benchmarks/bench_towers.py)
        utt_video, utt_audio = bilstm.extract_features_pair(
            params["visual_extractor"], params["acoustic_extractor"],
            visual, acoustic, v_len, a_len, cfg.rnncell,
            training=not deterministic,
        )

    # ---- shared/private (src/models.py:265-279) ---------------------------
    def project(p, x):
        return layer_norm(p["ln"], act(linear(p["linear"], x.astype(jnp.float32))))

    orig_t = project(params["project_t"], utt_text)
    orig_v = project(params["project_v"], utt_video)
    orig_a = project(params["project_a"], utt_audio)

    private_t = jax.nn.sigmoid(linear(params["private_t"], orig_t))
    private_v = jax.nn.sigmoid(linear(params["private_v"], orig_v))
    private_a = jax.nn.sigmoid(linear(params["private_a"], orig_a))

    shared_t = jax.nn.sigmoid(linear(params["shared"], orig_t))
    shared_v = jax.nn.sigmoid(linear(params["shared"], orig_v))
    shared_a = jax.nn.sigmoid(linear(params["shared"], orig_a))

    # ---- adversarial domain discriminator (src/models.py:219-231) ---------
    if not cfg.use_cmd_sim:
        def disc(x, key):
            h = act(linear(params["discriminator"]["l1"], x))
            h = dropout(key, h, cfg.dropout, deterministic)
            return linear(params["discriminator"]["l2"], h)

        kd = jax.random.split(r_disc, 3)
        domain_t = disc(reverse_grad(shared_t, cfg.reverse_grad_weight), kd[0])
        domain_v = disc(reverse_grad(shared_v, cfg.reverse_grad_weight), kd[1])
        domain_a = disc(reverse_grad(shared_a, cfg.reverse_grad_weight), kd[2])
    else:
        domain_t = domain_v = domain_a = None

    # ---- shared-private discriminator (src/models.py:234-237) -------------
    sp_p_t = linear(params["sp_discriminator"], private_t)
    sp_p_v = linear(params["sp_discriminator"], private_v)
    sp_p_a = linear(params["sp_discriminator"], private_a)
    sp_s = linear(params["sp_discriminator"], (shared_t + shared_v + shared_a) / 3.0)

    # ---- reconstruction (src/models.py:254-262) ---------------------------
    recon_t = linear(params["recon_t"], private_t + shared_t)
    recon_v = linear(params["recon_v"], private_v + shared_v)
    recon_a = linear(params["recon_a"], private_a + shared_a)

    # ---- 6-token transformer fusion (src/models.py:242-245) ---------------
    h = jnp.stack([private_t, private_v, private_a, shared_t, shared_v, shared_a],
                  axis=1)                                    # (B, 6, H)
    h, fusion_attn = transformer_layer(params["fusion"], h, num_heads=2,
                                       dropout_rate=0.1,
                                       deterministic=deterministic,
                                       rng=r_fusion, return_attn=True)
    h_tokens = h                                              # (B, 6, H)
    h = h.reshape(h.shape[0], 6 * H)                          # concat of the 6

    # ---- heads (src/models.py:247-249) -------------------------------------
    tcp = jax.nn.sigmoid(linear(params["confidence"], h))
    if cfg.use_label_decoder:
        # per-label attention over the 6 fused tokens (h_tokens kept pre-flatten)
        ld = params["label_decoder"]
        q = ld["embed"].astype(jnp.float32)               # (C, H)
        att = jnp.einsum("ch,bsh->bcs", q, h_tokens.astype(jnp.float32),
                         preferred_element_type=jnp.float32) / jnp.sqrt(float(H))
        att = jax.nn.softmax(att, axis=-1)
        ctx = jnp.einsum("bcs,bsh->bch", att, h_tokens.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        logits = jnp.sum(ctx * ld["out_w"], axis=-1) + ld["out_b"]
    else:
        logits = linear(params["classifier"], h)
    logits = dropout(r_cls, logits, cfg.dropout, deterministic)
    if cfg.resolved_task() == "regression":
        # sentiment regression head: raw linear output, no binarization
        # (reference criterion_dict 'mosi': L1Loss, src/config.py:34-38)
        scores = logits.astype(jnp.float32)
        labels = scores
    else:
        scores = jax.nn.sigmoid(logits)
        labels = binarize(scores, cfg.threshold)

    return MISAOutput(
        scores=scores, labels=labels, tcp=tcp,
        shared_t=shared_t, shared_v=shared_v, shared_a=shared_a,
        private_t=private_t, private_v=private_v, private_a=private_a,
        orig_t=orig_t, orig_v=orig_v, orig_a=orig_a,
        recon_t=recon_t, recon_v=recon_v, recon_a=recon_a,
        domain_t=domain_t, domain_v=domain_v, domain_a=domain_a,
        sp_p_t=sp_p_t, sp_p_v=sp_p_v, sp_p_a=sp_p_a, sp_s=sp_s,
        fusion_attn=fusion_attn, moe_aux=moe_aux,
    )
