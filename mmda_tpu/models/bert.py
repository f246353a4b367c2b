"""Functional BERT encoder (bert-base-uncased architecture), TPU-first.

Replaces the reference's HuggingFace PyTorch `BertModel`
(reference src/models.py:44-45,187-196).  Pure-JAX implementation:

  * post-LayerNorm transformer encoder, GELU FFN, learned absolute positions -
    the exact bert-base-uncased computation (hidden 768, 12 layers, 12 heads,
    FFN 3072, vocab 30522, max_pos 512);
  * everything is batched matmuls/einsums that XLA tiles onto the MXU;
    sequence lengths here are tiny (<= max word count + 2), so plain fused
    attention IS the speed-of-light kernel - no flash attention needed for this
    workload (SURVEY.md §2.9); a Pallas flash-attention kernel is still provided
    in ops/pallas/attention.py for long-sequence configs;
  * weights load from a HuggingFace PyTorch checkpoint directory when available
    (`load_hf_weights`), else random init with the BERT initializer (trunc
    normal 0.02);
  * layer freezing (reference src/solver.py:69-73: encoder layers <= 8 frozen
    for mosei) is expressed as an optax mask produced by `frozen_mask` - frozen
    params skip optimizer state entirely.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    gelu_exact: bool = True       # erf GELU (HF parity); False = tanh approx
    ln_fp32: bool = True          # LayerNorm statistics in fp32 (parity);
                                  # False computes in the activation dtype
    dropout_recompute: bool = False  # custom-vjp dropout: save only the PRNG
                                  # key and REGENERATE the mask in the
                                  # backward instead of materializing ~80 MB
                                  # of masks per step as autodiff residuals
                                  # (identical numerics - same key, same mask)
    dropout_bits: int = 32        # random bits per dropout draw.  8 draws a
                                  # uint8 per element (4x fewer PRNG words -
                                  # mask GENERATION measured at ~6 ms/step of
                                  # the B=64/T=48 step, bench_bwd_parts.py);
                                  # keep probability quantizes to k/256 and
                                  # the scale uses the EXACT realized k/256,
                                  # so expectation stays unbiased
    fused_ln_dropout: bool = False  # route the 24 per-layer
                                  # LN(x + dropout(h)) sites through the
                                  # fused Pallas kernel with IN-KERNEL mask
                                  # drawing (ops/pallas/layernorm.py): the
                                  # mask/dropout-output/normalized tensors
                                  # never exist in HBM.  Hash-based draws
                                  # (statistically equivalent, not
                                  # bit-identical to jax.random).  Off until
                                  # the TPU A/B accepts it.
    remat: bool = False           # jax.checkpoint each encoder layer:
                                  # recompute the layer forward during the
                                  # backward instead of saving activations
                                  # (trades ~1/3 more FLOPs for HBM traffic)
    attn_probs_bf16_dropout: bool = False  # cast attention probs to the
                                  # compute dtype BEFORE their dropout, so the
                                  # dropped (B*nh,S,S) tensor materializes in
                                  # bf16 instead of fp32 (half the bytes; the
                                  # probs@v matmul consumed bf16 anyway)
    embed_grad_matmul: bool = False  # word-embedding backward as a one-hot
                                  # MXU matmul (one_hot(ids)^T @ d_emb)
                                  # instead of XLA's scatter-add into the
                                  # (30522, 768) table — scatters serialize
                                  # on TPU; measured in bench_bwd_parts.py
    moe_experts: int = 0          # > 0 replaces every layer's dense FFN with
                                  # a Switch-style top-1 MoE of this many
                                  # experts (ops/moe.py); bert_encode then
                                  # returns (hidden, aux_losses).  Net-new
                                  # scale-out capability (no ref counterpart)
    moe_capacity_factor: float = 1.25  # per-expert token capacity multiplier
    moe_top_k: int = 1            # 1 = Switch top-1 routing; 2 = GShard
                                  # top-2 (normalized gates, second choice
                                  # queues after first-choice tokens)
    moe_group_by_example: bool = True  # GShard dispatch grouping: route each
                                  # example's S tokens as an independent
                                  # group (capacity per example; cuts the
                                  # dispatch-einsum FLOPs by B).  False =
                                  # one global group over all B*S tokens.

    @staticmethod
    def base() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def tiny(vocab_size: int = 128) -> "BertConfig":
        """Small config for unit tests."""
        return BertConfig(
            vocab_size=vocab_size, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=64,
        )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _dense(key, d_in, d_out, std):
    kw, _ = jax.random.split(key)
    return {
        "kernel": jax.random.truncated_normal(kw, -2, 2, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _ln(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_bert_params(key, cfg: BertConfig) -> Dict:
    std = cfg.initializer_range
    H = cfg.hidden_size
    keys = jax.random.split(key, cfg.num_layers + 4)
    k_emb, k_pos, k_typ, k_pool = keys[:4]
    params: Dict[str, Any] = {
        "embeddings": {
            "word": jax.random.truncated_normal(k_emb, -2, 2, (cfg.vocab_size, H), jnp.float32) * std,
            "position": jax.random.truncated_normal(k_pos, -2, 2, (cfg.max_position_embeddings, H), jnp.float32) * std,
            "token_type": jax.random.truncated_normal(k_typ, -2, 2, (cfg.type_vocab_size, H), jnp.float32) * std,
            "ln": _ln(H),
        },
        "layers": [],
        "pooler": _dense(k_pool, H, H, std),
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[4 + i], 6)
        layer = {
            "q": _dense(k[0], H, H, std),
            "k": _dense(k[1], H, H, std),
            "v": _dense(k[2], H, H, std),
            "attn_out": _dense(k[3], H, H, std),
            "attn_ln": _ln(H),
            "ffn_ln": _ln(H),
        }
        if cfg.moe_experts > 0:
            from mmda_tpu.ops.moe import init_moe_ffn_params

            layer["moe"] = init_moe_ffn_params(
                k[4], H, cfg.intermediate_size, cfg.moe_experts, std)
        else:
            layer["ffn_in"] = _dense(k[4], H, cfg.intermediate_size, std)
            layer["ffn_out"] = _dense(k[5], cfg.intermediate_size, H, std)
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(p, x, eps, fp32: bool = True):
    xf = x.astype(jnp.float32) if fp32 else x
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    scale = p["scale"] if fp32 else p["scale"].astype(x.dtype)
    bias = p["bias"] if fp32 else p["bias"].astype(x.dtype)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def _apply_dense(p, x, compute_dtype):
    if "kernel_q" in p:
        # int8 weight-only quantized dense (serving path, quantize_bert_int8):
        # per-OUTPUT-channel symmetric scales distribute over matmul columns,
        # so dequant is one post-matmul row-vector multiply and the weight
        # HBM read is half of bf16 / a quarter of f32
        y = jnp.dot(x, p["kernel_q"].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        return (y * p["scale"].astype(jnp.float32)).astype(compute_dtype) \
            + p["bias"].astype(compute_dtype)
    return jnp.dot(
        x, p["kernel"].astype(compute_dtype), preferred_element_type=jnp.float32
    ).astype(compute_dtype) + p["bias"].astype(compute_dtype)


def _dropout(key, x, rate, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout_recompute(key, x, rate):
    """Dropout whose backward REGENERATES the mask from the key instead of
    saving it: autodiff of plain _dropout keeps the (B,S,H)/(B*nh,S,S) bool
    mask of every one of the 36 dropout sites as a residual (~80 MB written
    in the forward and re-read in the backward per step at B=64/T=48).  The
    PRNG is deterministic, so the residual can be 2 ints instead.  Numerics
    are IDENTICAL to _dropout (same key -> same mask)."""
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _dropout_recompute_fwd(key, x, rate):
    return _dropout_recompute(key, x, rate), key


def _dropout_recompute_bwd(rate, key, g):
    keep = jax.random.bernoulli(key, 1.0 - rate, g.shape)
    return (None, jnp.where(keep, g / (1.0 - rate), 0.0).astype(g.dtype))


_dropout_recompute.defvjp(_dropout_recompute_fwd, _dropout_recompute_bwd)


def _dropout_u8_mask(key, shape, rate):
    """uint8-draw keep mask + its exact inverse-keep-probability scale.
    k = round(256*(1-rate)) of the 256 uint8 values keep; scaling by 256/k
    (not 1/(1-rate)) keeps E[dropout(x)] == x exactly.

    Measured-rejected alternative (benchmarks/RESULTS.md round-3 set 4):
    bitcasting each uint32 PRNG word into FOUR mask bytes (true 4x fewer
    generator words) ran SLOWER than this per-element draw (24.78 vs
    23.46 ms/step) — the dropout cost is the apply/materialization
    structure, not generator throughput."""
    k = int(round((1.0 - rate) * 256))
    k = min(max(k, 1), 255)
    bits = jax.random.bits(key, shape, jnp.uint8)
    return bits < jnp.uint8(k), 256.0 / k


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout_u8_recompute(key, x, rate):
    keep, scale = _dropout_u8_mask(key, x.shape, rate)
    return jnp.where(keep, x * scale, 0.0).astype(x.dtype)


def _dropout_u8_recompute_fwd(key, x, rate):
    return _dropout_u8_recompute(key, x, rate), key


def _dropout_u8_recompute_bwd(rate, key, g):
    keep, scale = _dropout_u8_mask(key, g.shape, rate)
    return (None, jnp.where(keep, g * scale, 0.0).astype(g.dtype))


_dropout_u8_recompute.defvjp(_dropout_u8_recompute_fwd,
                             _dropout_u8_recompute_bwd)


@jax.custom_vjp
def _embed_lookup_matmul_grad(table, ids):
    """Gather whose BACKWARD builds d_table as one_hot(ids)^T @ g on the MXU
    instead of XLA's scatter-add (BertConfig.embed_grad_matmul)."""
    return table[ids]


def _embed_lookup_fwd(table, ids):
    return table[ids], (ids, table.shape[0])


def _embed_lookup_bwd(res, g):
    ids, vocab = res
    h = g.shape[-1]
    # bf16 one-hot (0/1 are exact) and bf16 cotangent, fp32 accumulation on
    # the MXU: half the one-hot HBM bytes vs fp32 at ~3-digit grad rounding
    flat_g = g.reshape(-1, h).astype(jnp.bfloat16)
    onehot = jax.nn.one_hot(ids.reshape(-1), vocab, dtype=jnp.bfloat16)
    dtab = jnp.dot(onehot.T, flat_g, preferred_element_type=jnp.float32)
    return dtab, None


_embed_lookup_matmul_grad.defvjp(_embed_lookup_fwd, _embed_lookup_bwd)


def _make_dropout(cfg: "BertConfig"):
    if cfg.dropout_bits == 8:
        if cfg.dropout_recompute:
            def drop8r(key, x, rate, deterministic):
                if deterministic or rate == 0.0:
                    return x
                return _dropout_u8_recompute(key, x, rate)

            return drop8r

        def drop8(key, x, rate, deterministic):
            if deterministic or rate == 0.0:
                return x
            keep, scale = _dropout_u8_mask(key, x.shape, rate)
            return jnp.where(keep, x * scale, 0.0).astype(x.dtype)

        return drop8
    if cfg.dropout_recompute:
        def drop(key, x, rate, deterministic):
            if deterministic or rate == 0.0:
                return x
            return _dropout_recompute(key, x, rate)

        return drop
    return _dropout


def bert_embed(
    params: Dict,
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    *,
    deterministic: bool = True,
    embed_dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
):
    """Embedding prefix of bert_encode: word + position + token-type lookups,
    embedding LayerNorm, and the embedding-output dropout.

    Returns (x, dropout) where `dropout` is the cfg-selected dropout callable
    (shared with the per-layer calls so pipeline stages and the dense encoder
    apply identical dropout math).  Module-level so the pipeline-parallel
    encoder (parallel/pipeline.py) reuses it as stage 0's prefix."""
    B, S = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)

    word_tab = params["embeddings"]["word"]
    word_emb = (_embed_lookup_matmul_grad(word_tab, input_ids)
                if cfg.embed_grad_matmul else word_tab[input_ids])
    emb = (
        word_emb
        + params["embeddings"]["position"][jnp.arange(S)][None, :, :]
        + params["embeddings"]["token_type"][token_type_ids]
    )
    x = _layer_norm(params["embeddings"]["ln"], emb, cfg.layer_norm_eps,
                    cfg.ln_fp32).astype(compute_dtype)

    dropout = _make_dropout(cfg)
    if not deterministic:
        x = dropout(embed_dropout_rng, x, cfg.hidden_dropout, deterministic)
    return x, dropout


def attention_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, S) {0,1} mask -> (B, 1, 1, S) additive bias: 0 for real tokens,
    -1e9 (bf16-safe large negative) for pads."""
    neg = jnp.asarray(-1e9, jnp.float32)
    return (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * neg


# Encoder override hook: parallel/pipeline.py installs a pipelined encoder
# here so model forwards (MISA etc.) transparently run the BERT tower
# pipeline-parallel without knowing about meshes.  None = dense path.
_ENCODE_OVERRIDE = None


def set_encode_override(fn) -> None:
    """fn(params, cfg, input_ids, attention_mask, token_type_ids,
    deterministic, dropout_rng, compute_dtype) -> (B, S, H), or None to
    restore the dense encoder."""
    global _ENCODE_OVERRIDE
    _ENCODE_OVERRIDE = fn


# Residual-stream sharding hook: parallel/sequence.py installs a
# with_sharding_constraint closure here so the (B, S, H) activations between
# encoder layers carry a sequence-parallel annotation (S sharded over the TP
# 'model' axis) — XLA SPMD then derives the Megatron-SP all-gather /
# reduce-scatter pattern from the constraint + the TP weight shardings.
# None = no constraint (single-device / plain TP).
_ACTIVATION_CONSTRAINT = None


def set_activation_constraint(fn) -> None:
    """fn(x: (B, S, H)) -> x with a sharding constraint applied, or None."""
    global _ACTIVATION_CONSTRAINT
    _ACTIVATION_CONSTRAINT = fn


def bert_encode(
    params: Dict,
    cfg: BertConfig,
    input_ids: jnp.ndarray,         # (B, S) int32
    attention_mask: jnp.ndarray,    # (B, S) 1 for real tokens
    token_type_ids: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    use_flash_attention: bool = False,
    attn_impl: Optional[str] = None,   # "xla" (default) | "flash" | "skip"
                                       # ("skip" = ablation: ctx := x, for
                                       # attention-cost attribution in
                                       # benchmarks/bench_fwd_parts.py)
    inject_layer: Optional[int] = None,  # run inject_fn on the hidden states
    inject_fn=None,                      # entering encoder layer
                                         # `inject_layer` (0 = on the
                                         # embedding output).  Generic hook;
                                         # models/mag_bert.py uses it for the
                                         # multimodal adaptation gate.
) -> jnp.ndarray:
    """Return the last hidden state (B, S, H) - what the reference consumes as
    bert_output[0] (src/models.py:191).  When cfg.moe_experts > 0 the return
    is `(hidden, aux)` where aux carries the layer-averaged Switch router
    losses ({'balance', 'router_z'}, ops/moe.py) for the training objective.

    use_flash_attention routes the attention core through the Pallas blockwise
    kernel (ops/pallas/attention.py) - O(S) memory, wins at long S; the XLA
    path is optimal at MOSEI lengths (benchmarks/RESULTS.md)."""
    if _ENCODE_OVERRIDE is not None and inject_layer is None:
        # pipelined encoder (parallel/pipeline.py).  The MAG-BERT injection
        # hook stays on the dense path: the gate touches one specific layer
        # boundary, which a stage-stacked scan cannot express.
        if cfg.moe_experts > 0:
            raise ValueError(
                "moe_experts > 0 does not compose with the pipelined encoder "
                "(pp_size > 1): the stage-stacked scan cannot thread the "
                "per-layer router aux losses")
        return _ENCODE_OVERRIDE(
            params, cfg, input_ids, attention_mask, token_type_ids,
            deterministic, dropout_rng, compute_dtype)

    B, S = input_ids.shape
    H = cfg.hidden_size
    nh = cfg.num_heads
    hd = H // nh
    if attn_impl is None:
        attn_impl = "flash" if use_flash_attention else "xla"
    if attn_impl in ("fused", "flash") and jax.default_backend() != "tpu":
        # Pallas kernels only interpret-run off TPU (slow); fall back unless a
        # test explicitly forced interpreter mode
        from mmda_tpu.ops.pallas import attention as _fa
        from mmda_tpu.ops.pallas import short_attention as _sa

        forced = {"fused": _sa._FORCE_INTERPRET,
                  "flash": _fa._FORCE_INTERPRET}[attn_impl]
        if not forced:
            attn_impl = "xla"

    x, dropout = bert_embed(params, cfg, input_ids, token_type_ids,
                            deterministic=deterministic,
                            embed_dropout_rng=(
                                None if deterministic
                                else jax.random.split(dropout_rng, 3 * cfg.num_layers + 1)[0]),
                            compute_dtype=compute_dtype)
    if not deterministic:
        rngs = jax.random.split(dropout_rng, 3 * cfg.num_layers + 1)

    attn_bias = attention_bias(attention_mask)

    def one_layer(x, lp, layer_rngs):
        return bert_layer(x, lp, layer_rngs, cfg=cfg, attn_bias=attn_bias,
                          dropout=dropout, deterministic=deterministic,
                          compute_dtype=compute_dtype, attn_impl=attn_impl)

    # remat: recompute each layer's forward inside the backward instead of
    # saving its activations (BertConfig.remat; measured in
    # benchmarks/bench_bwd_parts.py before any default change)
    layer_fn = jax.checkpoint(one_layer) if cfg.remat else one_layer
    moe = cfg.moe_experts > 0
    aux_acc = []
    if _ACTIVATION_CONSTRAINT is not None:
        x = _ACTIVATION_CONSTRAINT(x)
    for i, lp in enumerate(params["layers"]):
        if inject_layer is not None and i == inject_layer:
            x = inject_fn(x).astype(compute_dtype)
        layer_rngs = (
            (rngs[3 * i + 1], rngs[3 * i + 2], rngs[3 * i + 3])
            if not deterministic else (None, None, None))
        out = layer_fn(x, lp, layer_rngs)
        if moe:
            x, layer_aux = out
            aux_acc.append(layer_aux)
        else:
            x = out
        if _ACTIVATION_CONSTRAINT is not None:
            x = _ACTIVATION_CONSTRAINT(x)
    if inject_layer is not None and inject_layer >= cfg.num_layers:
        x = inject_fn(x).astype(compute_dtype)

    if moe:
        # mean over layers keeps the aux-loss scale independent of depth
        # (Switch Transformer convention)
        aux = {k: jnp.mean(jnp.stack([a[k] for a in aux_acc]))
               for k in aux_acc[0]}
        return x, aux
    return x


def bert_layer(x, lp, layer_rngs, *, cfg: BertConfig, attn_bias, dropout,
               deterministic: bool, compute_dtype, attn_impl: str):
    """One post-norm BERT encoder layer (attention + FFN, residuals + LNs).

    Module-level (rather than a closure inside bert_encode) so the
    pipeline-parallel encoder (parallel/pipeline.py) applies EXACTLY the same
    math per stage — pipeline-vs-dense equivalence is bit-exact, not
    approximate.  `dropout` is the dropout callable from _make_dropout(cfg);
    `attn_bias` is the (B, 1, 1, S) additive mask."""
    B, S, H = x.shape
    nh = cfg.num_heads
    hd = H // nh
    scale = 1.0 / np.sqrt(hd)

    r_attn, r_post, r_ffn = layer_rngs
    # fused QKV: one (B*S, H) x (H, 3H) MXU matmul instead of three.
    # Params stay separate (HF-load / freezing / TP-spec compatibility);
    # the concat is a cheap per-layer weight reshape XLA hoists.  Per-column
    # int8 scales concatenate the same way (quantize_bert_int8 serving path).
    qkv_bias = jnp.concatenate(
        [lp["q"]["bias"], lp["k"]["bias"], lp["v"]["bias"]])
    if "kernel_q" in lp["q"]:
        qkv = _apply_dense({
            "kernel_q": jnp.concatenate(
                [lp["q"]["kernel_q"], lp["k"]["kernel_q"],
                 lp["v"]["kernel_q"]], axis=1),
            "scale": jnp.concatenate(
                [lp["q"]["scale"], lp["k"]["scale"], lp["v"]["scale"]]),
            "bias": qkv_bias}, x, compute_dtype)
    else:
        qkv_kernel = jnp.concatenate(
            [lp["q"]["kernel"], lp["k"]["kernel"], lp["v"]["kernel"]], axis=1)
        qkv = _apply_dense({"kernel": qkv_kernel, "bias": qkv_bias}, x,
                           compute_dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # flatten (batch, heads) into one leading batch dim: explicit batched
    # dot_general lays out ~1.4x faster on the MXU than the 4-D einsum at
    # these sizes (measured; benchmarks/RESULTS.md)
    def heads(t):
        return t.reshape(B, S, nh, hd).transpose(0, 2, 1, 3).reshape(B * nh, S, hd)

    if attn_impl == "skip":
        ctx = x                                       # ablation only
    elif attn_impl == "transpose_only":               # ablation only
        ctx = heads(q)
        ctx = ctx.reshape(B, nh, S, hd).transpose(0, 2, 1, 3).reshape(B, S, H)
    elif attn_impl == "xla_pad64" and S <= 64:
        # pad the sequence axis to the 64-sublane boundary INSIDE the
        # attention core only (FFN/projection row counts unchanged)
        pad = 64 - S
        qp, kp, vp = (jnp.pad(heads(t), ((0, 0), (0, pad), (0, 0)))
                      for t in (q, k, v))
        bias_p = jnp.pad(jnp.repeat(attn_bias[:, 0], nh, axis=0),
                         ((0, 0), (0, 0), (0, pad)),
                         constant_values=-1e9)
        logits = jax.lax.dot_general(
            qp, kp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        logits = logits + bias_p
        probs = jax.nn.softmax(logits, axis=-1)
        if not deterministic:
            probs = dropout(r_attn, probs, cfg.attention_dropout,
                            deterministic)
        ctx = jax.lax.dot_general(
            probs.astype(compute_dtype), vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(compute_dtype)[:, :S]
        ctx = ctx.reshape(B, nh, S, hd).transpose(0, 2, 1, 3).reshape(B, S, H)
    elif attn_impl == "fused":
        from mmda_tpu.ops.pallas.short_attention import short_attention

        def headed(t):
            return t.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)

        rate = 0.0 if deterministic else cfg.attention_dropout
        if rate > 0.0:
            seed = jax.random.randint(
                r_attn, (1,), 0, np.iinfo(np.int32).max,
                dtype=jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        key_bias = attn_bias[:, 0, 0]                 # (B, S) additive
        ctx = short_attention(headed(q), headed(k), headed(v),
                              key_bias, seed, rate)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
    elif attn_impl == "flash":
        from mmda_tpu.ops.pallas.attention import flash_attention

        # in-kernel attention-probs dropout (round 4): the (B*nh, S, S) mask
        # the XLA path materializes never exists — the kernel draws the keep
        # mask from a positional hash and the blockwise backward regenerates
        # it (ops/pallas/attention.py)
        rate = 0.0 if deterministic else cfg.attention_dropout
        if rate > 0.0:
            seed = jax.random.randint(r_attn, (1,), 0,
                                      np.iinfo(np.int32).max, dtype=jnp.int32)
        else:
            seed = None
        q, k, v = heads(q), heads(k), heads(v)
        key_bias = jnp.repeat(attn_bias[:, 0, 0], nh, axis=0)  # (B*nh, S)
        # q/k/v go in at compute_dtype (bf16 on TPU): the kernel's matmuls
        # run in the operand dtype with f32 accumulation, so bf16 operands
        # use the MXU at native throughput — the f32 upcast that used to sit
        # here made the flash kernels 46.6% of the T=512 step (round-5
        # device trace, benchmarks/RESULTS.md).  MMDA_FLASH_F32=1 restores
        # the upcast for the A/B ablation (bench_gap_long.py; trace time).
        if os.environ.get("MMDA_FLASH_F32"):
            q, k, v = (t.astype(jnp.float32) for t in (q, k, v))
        ctx = flash_attention(q, k, v, key_bias, seed, rate).astype(
            compute_dtype)
        ctx = ctx.reshape(B, nh, S, hd).transpose(0, 2, 1, 3).reshape(B, S, H)
    else:
        q, k, v = heads(q), heads(k), heads(v)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (B*nh, S, S)
        logits = logits + jnp.repeat(attn_bias[:, 0], nh, axis=0)
        probs = jax.nn.softmax(logits, axis=-1)
        if cfg.attn_probs_bf16_dropout:
            probs = probs.astype(compute_dtype)
        if not deterministic:
            probs = dropout(r_attn, probs, cfg.attention_dropout,
                            deterministic)
        ctx = jax.lax.dot_general(
            probs.astype(compute_dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(compute_dtype)
        ctx = ctx.reshape(B, nh, S, hd).transpose(0, 2, 1, 3).reshape(B, S, H)
    attn = _apply_dense(lp["attn_out"], ctx, compute_dtype)

    def _residual_ln(x, h, ln, rng):
        """LN(x + dropout(h)) — fused Pallas site when cfg.fused_ln_dropout
        (mask drawn in-kernel, regenerated in the backward), else the
        reference-faithful jax.random path."""
        if (cfg.fused_ln_dropout and not deterministic
                and cfg.hidden_dropout > 0.0 and cfg.ln_fp32):
            from mmda_tpu.ops.pallas.layernorm import (
                residual_dropout_layernorm)

            seed = jax.random.randint(rng, (1,), 0,
                                      np.iinfo(np.int32).max, dtype=jnp.int32)
            out = residual_dropout_layernorm(
                x.reshape(B * S, H), h.reshape(B * S, H),
                ln["scale"], ln["bias"], seed,
                cfg.hidden_dropout, cfg.layer_norm_eps)
            return out.reshape(B, S, H).astype(compute_dtype)
        if not deterministic:
            h = dropout(rng, h, cfg.hidden_dropout, deterministic)
        return _layer_norm(ln, x + h, cfg.layer_norm_eps,
                           cfg.ln_fp32).astype(compute_dtype)

    x = _residual_ln(x, attn, lp["attn_ln"], r_post)

    if cfg.moe_experts > 0:
        from mmda_tpu.ops.moe import switch_ffn

        h2, moe_aux = switch_ffn(
            lp["moe"], x.reshape(B * S, H),
            capacity_factor=cfg.moe_capacity_factor,
            gelu_exact=cfg.gelu_exact, compute_dtype=compute_dtype,
            groups=B if cfg.moe_group_by_example else 1,
            top_k=cfg.moe_top_k)
        h = h2.reshape(B, S, H).astype(compute_dtype)
    else:
        h = _apply_dense(lp["ffn_in"], x, compute_dtype)
        if cfg.gelu_exact:
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
        else:
            h = jax.nn.gelu(h, approximate=True)
        h = _apply_dense(lp["ffn_out"], h.astype(compute_dtype), compute_dtype)
    x = _residual_ln(x, h, lp["ffn_ln"], r_ffn)
    # static branch on the config: MoE layers report their router aux losses
    return (x, moe_aux) if cfg.moe_experts > 0 else x


# ---------------------------------------------------------------------------
# HF weight ingestion + freezing
# ---------------------------------------------------------------------------

_HF_LAYER_MAP = {
    "q": "attention.self.query",
    "k": "attention.self.key",
    "v": "attention.self.value",
    "attn_out": "attention.output.dense",
    "ffn_in": "intermediate.dense",
    "ffn_out": "output.dense",
}


def bert_config_for(cfg) -> Optional["BertConfig"]:
    """BertConfig.base() with the main Config's BERT-tower knobs applied
    (currently the Switch-MoE ones).  One construction point shared by
    serving/infer so a MoE-trained checkpoint loads with a matching tree."""
    import dataclasses

    if not cfg.use_bert:
        return None
    bc = BertConfig.base()
    if getattr(cfg, "moe_experts", 0) > 0:
        bc = dataclasses.replace(bc, moe_experts=cfg.moe_experts,
                                 moe_capacity_factor=cfg.moe_capacity_factor,
                                 moe_top_k=getattr(cfg, "moe_top_k", 1))
    if getattr(cfg, "fused_ln_dropout", False):
        bc = dataclasses.replace(bc, fused_ln_dropout=True)
    return bc


_QUANT_DENSE_NAMES = ("q", "k", "v", "attn_out", "ffn_in", "ffn_out")


def quantize_bert_int8(bert_params: Dict) -> Dict:
    """Weight-only int8 quantization of the encoder-layer dense kernels
    (serving path; reached via Predictor(bert_weights_dtype='int8')).

    Per-output-channel symmetric: s_j = max_i |w_ij| / 127, w_q = round(w/s).
    Because the scale is per COLUMN it distributes over the matmul, so
    _apply_dense dequantizes with one post-matmul row-vector multiply — the
    kernel read from HBM is int8 (the serving forward at MOSEI shapes is
    weight-traffic-bound).  Embeddings/LayerNorms/pooler stay as loaded
    (lookups and per-element params — no matmul traffic to save).  Training
    never sees this representation (weight-only, no QAT)."""

    def quant(p):
        w = p["kernel"]
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-8)
        wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return {"kernel_q": wq, "scale": s.astype(jnp.float32),
                "bias": p["bias"]}

    out = dict(bert_params)
    out["layers"] = [
        {name: (quant(sub) if name in _QUANT_DENSE_NAMES else sub)
         for name, sub in layer.items()}
        for layer in bert_params["layers"]]
    return out


def load_hf_weights(model_dir: str, cfg: Optional[BertConfig] = None) -> Dict:
    """Load a local HuggingFace PyTorch bert checkpoint into our param tree.

    Accepts a directory containing pytorch_model.bin or model.safetensors.
    torch is used only for deserialization (no torch compute).
    """
    cfg = cfg or BertConfig.base()
    sd = None
    st_path = os.path.join(model_dir, "model.safetensors")
    pt_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = {k: np.asarray(v) for k, v in load_file(st_path).items()}
    elif os.path.exists(pt_path):
        import torch

        # weights_only: a pytorch_model.bin is a pickle — without this flag,
        # loading an untrusted checkpoint is arbitrary code execution.
        sd = {k: v.numpy() for k, v in
              torch.load(pt_path, map_location="cpu", weights_only=True).items()}
    else:
        raise FileNotFoundError(f"no bert weights under {model_dir}")

    def g(name):
        for prefix in ("bert.", ""):
            if prefix + name in sd:
                return jnp.asarray(sd[prefix + name])
        raise KeyError(name)

    params: Dict[str, Any] = {
        "embeddings": {
            "word": g("embeddings.word_embeddings.weight"),
            "position": g("embeddings.position_embeddings.weight"),
            "token_type": g("embeddings.token_type_embeddings.weight"),
            "ln": {"scale": g("embeddings.LayerNorm.weight"),
                   "bias": g("embeddings.LayerNorm.bias")},
        },
        "layers": [],
        "pooler": {"kernel": g("pooler.dense.weight").T, "bias": g("pooler.dense.bias")},
    }
    for i in range(cfg.num_layers):
        base = f"encoder.layer.{i}."
        lp = {}
        for ours, theirs in _HF_LAYER_MAP.items():
            lp[ours] = {"kernel": g(base + theirs + ".weight").T,
                        "bias": g(base + theirs + ".bias")}
        lp["attn_ln"] = {"scale": g(base + "attention.output.LayerNorm.weight"),
                         "bias": g(base + "attention.output.LayerNorm.bias")}
        lp["ffn_ln"] = {"scale": g(base + "output.LayerNorm.weight"),
                        "bias": g(base + "output.LayerNorm.bias")}
        if cfg.moe_experts > 0:
            # sparse upcycling (Komatsuzaki et al.): every expert starts as a
            # copy of the dense checkpoint's FFN; the router starts near-zero
            # (deterministic key — loading is reproducible)
            E = cfg.moe_experts
            k_g = jax.random.fold_in(jax.random.PRNGKey(0), i)
            ffn_in, ffn_out = lp.pop("ffn_in"), lp.pop("ffn_out")
            lp["moe"] = {
                "gate": {"kernel": jax.random.truncated_normal(
                    k_g, -2, 2, (cfg.hidden_size, E), jnp.float32) * 0.02},
                "w_in": jnp.tile(ffn_in["kernel"][None], (E, 1, 1)),
                "b_in": jnp.tile(ffn_in["bias"][None], (E, 1)),
                "w_out": jnp.tile(ffn_out["kernel"][None], (E, 1, 1)),
                "b_out": jnp.tile(ffn_out["bias"][None], (E, 1)),
            }
        params["layers"].append(lp)
    return params


def frozen_mask(params: Dict, max_frozen_layer: int = 8) -> Dict:
    """Pytree of bools: True where the param is FROZEN.

    Mirrors the reference freeze rule (src/solver.py:69-73): encoder layers with
    index <= max_frozen_layer are frozen; embeddings and later layers train.
    """

    def layer_mask(i, layer):
        frozen = i <= max_frozen_layer
        return jax.tree_util.tree_map(lambda _: frozen, layer)

    return {
        "embeddings": jax.tree_util.tree_map(lambda _: False, params["embeddings"]),
        "layers": [layer_mask(i, l) for i, l in enumerate(params["layers"])],
        "pooler": jax.tree_util.tree_map(lambda _: False, params["pooler"]),
    }
