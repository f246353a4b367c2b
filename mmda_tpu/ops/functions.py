"""Core pure ops: activation registry, gradient reversal, binarizer, masked mean.

TPU-native replacements for the reference's torch helpers:
  * activation_dict (reference src/config.py:25-27) -> `ACTIVATION_FNS`
  * ReverseLayerF autograd Function (src/utils/functions.py:9-21) -> `reverse_grad`
    via `jax.custom_vjp`
  * getBinaryTensor (src/utils/functions.py:112-115) -> `binarize`
  * BERT masked-mean pooling (src/models.py:193-196) -> `masked_mean`
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Activations.  PyTorch-default hyper-parameters are reproduced so numerics
# match the reference (e.g. LeakyReLU negative_slope=0.01, ELU alpha=1.0).
# PReLU/RReLU carry learnable/random slopes in torch; for the registry we use
# their deterministic-inference forms (slope 0.25, the torch init/eval value).
# ---------------------------------------------------------------------------


def _hardshrink(x, lambd=0.5):
    return jnp.where(jnp.abs(x) > lambd, x, 0.0)


def _hardtanh(x, min_val=-1.0, max_val=1.0):
    return jnp.clip(x, min_val, max_val)


ACTIVATION_FNS = {
    "elu": jax.nn.elu,
    "hardshrink": _hardshrink,
    "hardtanh": _hardtanh,
    "leakyrelu": functools.partial(jax.nn.leaky_relu, negative_slope=0.01),
    "prelu": functools.partial(jax.nn.leaky_relu, negative_slope=0.25),
    "relu": jax.nn.relu,
    "rrelu": functools.partial(jax.nn.leaky_relu, negative_slope=(1 / 8 + 1 / 3) / 2),
    "tanh": jnp.tanh,
}


def get_activation(name: str):
    try:
        return ACTIVATION_FNS[name]
    except KeyError:
        raise KeyError(f"unknown activation {name!r}; known: {sorted(ACTIVATION_FNS)}")


# ---------------------------------------------------------------------------
# Gradient reversal (domain-adversarial training).
# Forward: identity.  Backward: -p * g.  Reference src/utils/functions.py:9-21.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def reverse_grad(x, p):
    del p
    return x


def _reverse_grad_fwd(x, p):
    return x, p


def _reverse_grad_bwd(p, g):
    return (-p * g, None)


reverse_grad.defvjp(_reverse_grad_fwd, _reverse_grad_bwd)


# ---------------------------------------------------------------------------
# Misc pure ops
# ---------------------------------------------------------------------------


def binarize(scores, threshold: float = 0.35):
    """1.0 where score > threshold else 0.0 (reference getBinaryTensor,
    src/utils/functions.py:112-115; strict >)."""
    return jnp.where(scores > threshold, 1.0, 0.0).astype(scores.dtype)


def masked_mean(x, mask, axis=1):
    """Mask-weighted mean over `axis`.

    Matches the reference BERT pooling exactly (src/models.py:193-196):
    sum(mask[..., None] * x, axis) / sum(mask, axis)  -- NO epsilon, since the
    BERT mask always contains the CLS/SEP tokens (mask sum >= 2).
    """
    mask = mask.astype(x.dtype)
    num = jnp.sum(x * jnp.expand_dims(mask, -1), axis=axis)
    den = jnp.sum(mask, axis=axis, keepdims=False)[..., None]
    return num / den


def length_mask(lengths, max_len: int, dtype=jnp.float32):
    """(B,) lengths -> (B, T) mask of 1.0 for t < length."""
    t = jnp.arange(max_len)[None, :]
    return (t < lengths[:, None]).astype(dtype)
