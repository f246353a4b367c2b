"""MulT: Multimodal Transformer (4th model family) — cross-modal attention
for ALIGNED and UNALIGNED sequences.

The reference names "unaligned MOSEI" as a feature but ships an empty Dataset
stub (reference src/data_loader.py:133-135) and no model that could consume
unaligned streams.  MulT (Tsai et al., ACL 2019, "Multimodal Transformer for
Unaligned Multimodal Language Sequences") is the canonical architecture for
exactly that: each target modality attends directly to the other modalities'
unaligned low-level features through cross-modal attention, so no word-level
alignment is needed.

Structure (faithful to the paper; pure-functional JAX):

  1. per-modality temporal Conv1d projection to a common d (no bias);
  2. sinusoidal positions + sqrt(d) embedding scale, embedding dropout;
  3. 6 cross-modal transformer stacks (pre-LN): target stream Q attends to a
     SOURCE modality's conv features as K/V at every layer (the paper's
     "low-level feature" choice), e.g. T<-V, T<-A, V<-T, V<-A, A<-T, A<-V;
  4. per target modality: concat its two cross-modal streams (2d) ->
     self-attention transformer stack -> state at the last VALID timestep;
  5. concat the 3 utterance vectors (6d) -> residual MLP head -> scores.

TPU-first notes: fixed shapes throughout (bucketed padding upstream);
attention is plain XLA einsum at these sizes (d=40, T<=64 — the S≈50
flash-attention rejection in benchmarks/RESULTS.md applies a fortiori);
everything jits into the one donated train step.  Unlike the original
implementation, source-side PADDING IS MASKED in every attention (the paper
code attends to padding; with bucketed batches that would leak zeros), and
"last timestep" means each sequence's true last valid step — both divergences
documented here deliberately.

Wired into the same registry/losses/trainer/serving stack as MISA/EF_LSTM/
LF_DNN: cls (+ optional conf) losses apply; diff/sim/recon are MISA-only and
skip None fields (train/objective.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

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
from mmda_tpu.ops.functions import binarize, length_mask

_NEG = -1e9


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


def _conv1d_params(key, d_in: int, d_out: int, width: int) -> Dict:
    # torch Conv1d default init: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / np.sqrt(d_in * width)
    return {"kernel": jax.random.uniform(
        key, (width, d_in, d_out), jnp.float32, -bound, bound)}


def _conv1d(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F) -> (B, T, d), SAME padding, no bias (paper: bias=False).

    Runs in f32: mixing preferred_element_type with low-precision operands
    breaks conv_general_dilated's vjp (bf16/f32 mismatch in the transpose
    call), and a width-3 conv is a negligible share of the step anyway."""
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["kernel"],
        window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ).astype(x.dtype)


def _sinusoid(T: int, d: int) -> jnp.ndarray:
    pos = np.arange(T)[:, None]
    i = np.arange(d // 2)[None, :]
    ang = pos / np.power(10000.0, 2.0 * i / d)
    out = np.zeros((T, d), np.float32)
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return jnp.asarray(out)


def _xattn_layer_params(key, d: int) -> Dict:
    kq, kk, kv, ko, k1, k2 = jax.random.split(key, 6)
    return {
        "q": linear_params(kq, d, d),
        "k": linear_params(kk, d, d),
        "v": linear_params(kv, d, d),
        "out": linear_params(ko, d, d),
        "ln_q": layer_norm_params(d),
        "ln_kv": layer_norm_params(d),
        "ln_ffn": layer_norm_params(d),
        "ffn1": linear_params(k1, d, 4 * d),
        "ffn2": linear_params(k2, 4 * d, d),
    }


def _xattn_layer(
    p: Dict,
    x: jnp.ndarray,            # (B, Tq, d) target stream
    src: jnp.ndarray,          # (B, Tk, d) source features (pre-LN'd here)
    src_bias: jnp.ndarray,     # (B, Tk) additive key bias (0 / -1e9 padding)
    num_heads: int,
    drop: float,
    deterministic: bool,
    rng,
) -> jnp.ndarray:
    """Pre-LN cross-modal block: x + MHA(LN(x), LN(src)); x + FFN(LN(x))."""
    B, Tq, D = x.shape
    Tk = src.shape[1]
    hd = D // num_heads
    if not deterministic:
        r_attn, r_res, r_ffn1, r_ffn2 = jax.random.split(rng, 4)
    else:
        r_attn = r_res = r_ffn1 = r_ffn2 = None

    xq = layer_norm(p["ln_q"], x)
    xk = layer_norm(p["ln_kv"], src)
    q = linear(p["q"], xq).reshape(B, Tq, num_heads, hd)
    k = linear(p["k"], xk).reshape(B, Tk, num_heads, hd)
    v = linear(p["v"], xk).reshape(B, Tk, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    logits = logits + src_bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    probs = dropout(r_attn, probs, drop, deterministic)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(x.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    attn = linear(p["out"], ctx.reshape(B, Tq, D))
    x = x + dropout(r_res, attn, drop, deterministic)

    h = layer_norm(p["ln_ffn"], x)
    h = jax.nn.relu(linear(p["ffn1"], h))
    h = dropout(r_ffn1, h, drop, deterministic)
    h = linear(p["ffn2"], h)
    x = x + dropout(r_ffn2, h, drop, deterministic)
    return x


def _stack_params(key, d: int, layers: int) -> Dict:
    ks = jax.random.split(key, layers)
    return {"layers": [_xattn_layer_params(k, d) for k in ks],
            "ln_final": layer_norm_params(d)}


def _run_cross_stack(p, x, src, src_bias, heads, drop, deterministic, rng):
    """Cross-modal: every layer attends to the SAME low-level source (paper)."""
    for i, lp in enumerate(p["layers"]):
        r = jax.random.fold_in(rng, i) if rng is not None else None
        x = _xattn_layer(lp, x, src, src_bias, heads, drop, deterministic, r)
    return layer_norm(p["ln_final"], x)


def _run_self_stack(p, x, bias, heads, drop, deterministic, rng):
    for i, lp in enumerate(p["layers"]):
        r = jax.random.fold_in(rng, i) if rng is not None else None
        x = _xattn_layer(lp, x, x, bias, heads, drop, deterministic, r)
    return layer_norm(p["ln_final"], x)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def init_mult_params(
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
    d = cfg.mult_d
    L = cfg.mult_layers
    C = cfg.num_classes
    ks = jax.random.split(key, 16)
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

    w = cfg.mult_conv_kernel
    params["proj_t"] = _conv1d_params(ks[1], text_in, d, w)
    params["proj_v"] = _conv1d_params(ks[2], dv, d, w)
    params["proj_a"] = _conv1d_params(ks[3], da, d, w)

    # 6 cross-modal stacks + 3 self-attention stacks over the 2d concat
    for i, name in enumerate(("tv", "ta", "vt", "va", "at", "av")):
        params[f"cross_{name}"] = _stack_params(ks[4 + i], d, L)
    for i, name in enumerate(("t", "v", "a")):
        params[f"self_{name}"] = _stack_params(ks[10 + i], 2 * d,
                                               max(L - 1, 1))

    D6 = 6 * d
    params["proj1"] = linear_params(ks[13], D6, D6)
    params["proj2"] = linear_params(ks[14], D6, D6)
    ko, kc = jax.random.split(ks[15])
    params["out"] = linear_params(ko, D6, C)
    params["confidence"] = linear_params(kc, D6, C)
    return params


def mult_forward(
    params: Dict,
    cfg: Config,
    batch: Batch,
    bert_cfg: Optional[jbert.BertConfig] = None,
    deterministic: bool = True,
    rng=None,
    modality_keep=None,
) -> MISAOutput:
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    d = cfg.mult_d
    heads = cfg.mult_heads
    drop = cfg.dropout if not deterministic else 0.0
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_bert, r_emb, r_stacks, r_head = jax.random.split(rng, 4)

    v_len = batch.visual_lengths if batch.visual_lengths is not None else batch.lengths
    a_len = batch.acoustic_lengths if batch.acoustic_lengths is not None else batch.lengths

    # ---- raw per-modality feature streams -------------------------------
    moe_aux = None
    if cfg.use_bert:
        bert_cfg = bert_cfg or jbert.BertConfig.base()
        feat_t = jbert.bert_encode(
            params["bert"], bert_cfg, batch.bert_ids, batch.bert_mask,
            batch.bert_type, deterministic=deterministic, dropout_rng=r_bert,
            compute_dtype=compute_dtype,
            attn_impl=cfg.resolved_attn_impl(
                training=not deterministic, seq_len=batch.bert_ids.shape[1]))
        if bert_cfg.moe_experts > 0:
            feat_t, moe_aux = feat_t
        mask_t = batch.bert_mask.astype(jnp.float32)
        len_t = jnp.sum(batch.bert_mask, axis=-1).astype(jnp.int32)
    else:
        feat_t = params["embed"][batch.text].astype(compute_dtype)
        mask_t = length_mask(batch.lengths, batch.text.shape[1])
        len_t = batch.lengths
    feat_v = batch.visual.astype(compute_dtype)
    feat_a = batch.acoustic.astype(compute_dtype)
    mask_v = length_mask(v_len, feat_v.shape[1])
    mask_a = length_mask(a_len, feat_a.shape[1])

    if modality_keep is not None:
        mk = modality_keep.astype(compute_dtype)
        feat_t = feat_t * mk[:, 0][:, None, None]
        feat_v = feat_v * mk[:, 1][:, None, None]
        feat_a = feat_a * mk[:, 2][:, None, None]

    # ---- conv projection + positions + embed dropout --------------------
    def project(pname, x, mask, r):
        # mask BEFORE the conv: with kernel width > 1 the last valid position
        # convolves one step into the padding, so garbage there must be zero
        x = x * mask[..., None].astype(x.dtype)
        h = _conv1d(params[pname], x) * np.sqrt(d)
        h = h + _sinusoid(x.shape[1], d)[None].astype(h.dtype)
        h = h * mask[..., None].astype(h.dtype)     # zero padded positions
        return dropout(r, h, drop, deterministic)

    re1, re2, re3 = jax.random.split(r_emb, 3)
    ht = project("proj_t", feat_t, mask_t, re1)
    hv = project("proj_v", feat_v, mask_v, re2)
    ha = project("proj_a", feat_a, mask_a, re3)

    bias_t = (1.0 - mask_t) * _NEG
    bias_v = (1.0 - mask_v) * _NEG
    bias_a = (1.0 - mask_a) * _NEG

    # ---- 6 cross-modal stacks -------------------------------------------
    rs = jax.random.split(r_stacks, 9)

    def cross(name, x, src, src_bias, r):
        return _run_cross_stack(params[f"cross_{name}"], x, src, src_bias,
                                heads, drop, deterministic,
                                r if not deterministic else None)

    z_tv = cross("tv", ht, hv, bias_v, rs[0])
    z_ta = cross("ta", ht, ha, bias_a, rs[1])
    z_vt = cross("vt", hv, ht, bias_t, rs[2])
    z_va = cross("va", hv, ha, bias_a, rs[3])
    z_at = cross("at", ha, ht, bias_t, rs[4])
    z_av = cross("av", ha, hv, bias_v, rs[5])

    # ---- per-target self-attention over the 2d concat -------------------
    def fuse(name, za, zb, bias, lengths, r):
        z = jnp.concatenate([za, zb], axis=-1)
        z = _run_self_stack(params[f"self_{name}"], z, bias, heads, drop,
                            deterministic, r if not deterministic else None)
        # state at each sequence's true last valid timestep
        idx = jnp.clip(lengths - 1, 0, z.shape[1] - 1).astype(jnp.int32)
        return z[jnp.arange(z.shape[0]), idx]

    u_t = fuse("t", z_tv, z_ta, bias_t, len_t, rs[6])
    u_v = fuse("v", z_vt, z_va, bias_v, v_len, rs[7])
    u_a = fuse("a", z_at, z_av, bias_a, a_len, rs[8])

    fused = jnp.concatenate([u_t, u_v, u_a], axis=-1).astype(jnp.float32)

    # ---- residual MLP head (paper: proj2(dropout(relu(proj1))) + x) ------
    rh1 = r_head
    h = jax.nn.relu(linear(params["proj1"], fused))
    h = dropout(rh1, h, drop, deterministic)
    h = linear(params["proj2"], h) + fused
    # no dropout on the output logits: the paper applies dropout only inside
    # the residual head (above); zeroing logits would corrupt the regression
    # target in particular (MISA's logit dropout is that model's reference
    # quirk, not this one's)
    logits = linear(params["out"], h).astype(jnp.float32)

    tcp = jax.nn.sigmoid(linear(params["confidence"], fused))

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
