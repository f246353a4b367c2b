"""Shared layer primitives with torch-default initialization parity.

torch nn.Linear init: weight kaiming_uniform(a=sqrt(5)) == uniform(-1/sqrt(fan_in),
1/sqrt(fan_in)); bias uniform with the same bound.  Reproduced so random-init
training runs land in the same regime as the reference.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def linear_params(key, d_in: int, d_out: int) -> Dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    return {
        "kernel": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound),
    }


def linear(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def dropout(key: Optional[jax.Array], x: jnp.ndarray, rate: float,
            deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def layer_norm_params(dim: int) -> Dict:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: Dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Fusion transformer encoder layer (torch nn.TransformerEncoderLayer parity:
# post-norm, MHA -> dropout -> add -> LN -> FFN(relu, dropout) -> add -> LN).
# Reference uses d_model=hidden_size(128), nhead=2, num_layers=1, defaults
# dim_feedforward=2048, dropout=0.1 (src/models.py:160-161).  Sequence length
# is 6 (the stacked private/shared vectors) - plain XLA einsums are the optimal
# kernel at this size.
# ---------------------------------------------------------------------------


def transformer_layer_params(key, d_model: int, dim_feedforward: int = 2048) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # torch MHA: in_proj xavier_uniform, in_proj_bias zeros, out_proj bias zeros
    bound = np.sqrt(6.0 / (d_model + 3 * d_model))
    in_proj = jax.random.uniform(k1, (d_model, 3 * d_model), jnp.float32, -bound, bound)
    out_proj = linear_params(k2, d_model, d_model)
    out_proj["bias"] = jnp.zeros_like(out_proj["bias"])
    return {
        "in_proj": {"kernel": in_proj, "bias": jnp.zeros((3 * d_model,), jnp.float32)},
        "out_proj": out_proj,
        "ln1": layer_norm_params(d_model),
        "ln2": layer_norm_params(d_model),
        "ffn1": linear_params(k3, d_model, dim_feedforward),
        "ffn2": linear_params(k4, dim_feedforward, d_model),
    }


def transformer_layer(
    p: Dict,
    x: jnp.ndarray,               # (B, S, D)
    num_heads: int,
    dropout_rate: float = 0.1,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    return_attn: bool = False,
    attn_bias: Optional[jnp.ndarray] = None,   # (B, S) additive key bias
):
    B, S, D = x.shape
    hd = D // num_heads
    if not deterministic:
        r_attn, r1, r_ffn, r2 = jax.random.split(rng, 4)
    qkv = linear(p["in_proj"], x)                     # (B, S, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, num_heads, hd)
    k = k.reshape(B, S, num_heads, hd)
    v = v.reshape(B, S, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    if attn_bias is not None:
        logits = logits + attn_bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    if not deterministic:
        probs = dropout(r_attn, probs, dropout_rate, deterministic)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(x.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    attn = linear(p["out_proj"], ctx.reshape(B, S, D))
    if not deterministic:
        attn = dropout(r1, attn, dropout_rate, deterministic)
    x = layer_norm(p["ln1"], x + attn)

    h = jax.nn.relu(linear(p["ffn1"], x))
    if not deterministic:
        h = dropout(r_ffn, h, dropout_rate, deterministic)
    h = linear(p["ffn2"], h)
    if not deterministic:
        h = dropout(r2, h, dropout_rate, deterministic)
    out = layer_norm(p["ln2"], x + h)
    if return_attn:
        return out, probs   # (B, S, D), (B, nh, S, S)
    return out
