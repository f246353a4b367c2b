"""Tower feature extractors: RNN (lstm/gru) and transformer.

The reference exposes `--extractor {lstm, transformer}` but the transformer
branch is an exit-with-TODO stub (reference src/models.py:33-36,
src/config.py:145-146).  Implemented here:

  * `extractor='lstm'` (default): two stacked bi-RNNs with packed-sequence
    semantics (models/bilstm.py), cell chosen by cfg.rnncell.
  * `extractor='transformer'`: input projection -> learned positions ->
    2 post-LN transformer layers with length masking -> masked-mean pooling.
    Output dim is 4*input_size so every downstream shape (projections, heads)
    matches the LSTM towers exactly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mmda_tpu.models import bilstm
from mmda_tpu.models.common import (
    layer_norm,
    layer_norm_params,
    linear,
    linear_params,
    transformer_layer,
    transformer_layer_params,
)
from mmda_tpu.ops.functions import masked_mean

_NEG = -1e9
_MAX_POS = 512


def transformer_extractor_params(key, input_size: int, num_layers: int = 2) -> Dict:
    d = 4 * input_size                       # match the bi-LSTM utterance dim
    # heads must divide d; d = 4*input is divisible by 4
    keys = jax.random.split(key, num_layers + 2)
    return {
        "in_proj": linear_params(keys[0], input_size, d),
        "pos": jax.random.normal(keys[1], (_MAX_POS, d), jnp.float32) * 0.02,
        "ln": layer_norm_params(d),
        "layers": [
            transformer_layer_params(keys[2 + i], d, dim_feedforward=2 * d)
            for i in range(num_layers)
        ],
    }


def transformer_extract(params: Dict, x: jnp.ndarray, lengths: jnp.ndarray,
                        num_heads: int = 4) -> jnp.ndarray:
    """(B, T, F) + lengths -> (B, 4F) utterance vector."""
    B, T, _ = x.shape
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    h = linear(params["in_proj"], x.astype(jnp.float32))
    h = h + params["pos"][:T][None, :, :]
    h = layer_norm(params["ln"], h)
    bias = (1.0 - mask) * _NEG
    for lp in params["layers"]:
        h = transformer_layer(lp, h, num_heads=num_heads, deterministic=True,
                              attn_bias=bias)
    return masked_mean(h, mask)


def make_tower_params(key, cfg, input_size: int) -> Dict:
    if cfg.extractor == "transformer":
        return transformer_extractor_params(key, input_size)
    return bilstm.extractor_params(key, input_size, input_size, cfg.rnncell)


def tower_extract(params: Dict, cfg, x: jnp.ndarray, lengths: jnp.ndarray,
                  training: bool = True) -> jnp.ndarray:
    if cfg.extractor == "transformer":
        return transformer_extract(params, x, lengths)
    return bilstm.extract_features(params, x, lengths, cfg.rnncell,
                                   training=training)
