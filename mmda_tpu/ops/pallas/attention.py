"""Blockwise flash attention (Pallas TPU kernel), for the BERT tower.

At MOSEI utterance lengths (<= ~66 tokens) plain XLA attention IS optimal -
the (S, S) logits fit trivially in VMEM and XLA fuses the softmax (SURVEY.md
§2.9 row 5).  This kernel exists for long-sequence configurations: blockwise
online-softmax over K/V tiles so memory is O(S) instead of O(S^2).

Forward-only custom_vjp: the backward recomputes standard attention under XLA
(flash backward pays off only at sequence lengths this framework's datasets
never reach; the flag keeps the XLA path the default).
Equivalence tested in tests/test_pallas_attention.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int, scale: float):
    """Grid: (batch*heads, q_blocks).  q/k/v/o blocks carry a leading
    singleton batch dim: q (1, Bq, D), k/v (1, S, D), o (1, Bq, D).  The
    bias arrives as a (1, num_kb, block_k) per-program block (reshaped in
    _flash_forward) so EVERY in-kernel index below is static.

    Static Python unroll over K blocks (num_kb is a trace-time constant):
    a lax.fori_loop / program-id-indexed bias here makes slice offsets
    dynamic, and Mosaic rejects "dynamic load with unaligned indices" —
    caught the first time the kernel was actually COMPILED at S=256 on
    hardware (benchmarks/bench_long_seq.py; the S<=64 single-block shapes
    it had been measured at never exercised the loop).  Trip counts are
    tiny (S/128: 4 at S=512)."""
    q = q_ref[0] * scale                              # (Bq, D)
    S = k_ref.shape[1]
    Bq, D = q.shape

    m = jnp.full((Bq, 1), NEG_INF, jnp.float32)       # running max
    l = jnp.zeros((Bq, 1), jnp.float32)               # running denom
    acc = jnp.zeros((Bq, D), jnp.float32)

    num_kb = S // block_k

    for i in range(num_kb):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]  # (Bk, D)
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        b = bias_ref[0, i, :]                          # (Bk,)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + b[None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        m = m_new
    o_ref[0] = acc / l


def _flash_forward(q, k, v, bias, block_q: int = 128, block_k: int = 128):
    """q,k,v: (BH, S, D) fp32; bias: (BH, S) additive key mask (0 or -inf-ish).
    Returns (BH, S, D)."""
    BH, S, D = q.shape
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    # pad S to multiples of blocks
    Sq = -(-S // block_q) * block_q
    Sk = -(-S // block_k) * block_k
    if Sq != S or Sk != S:
        pad_q = Sq - S
        pad_k = Sk - S
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_k)), constant_values=NEG_INF)

    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               scale=1.0 / np.sqrt(D))
    num_kb = Sk // block_k
    # (BH, num_kb, block_k): per-program (1, num_kb, block_k) blocks whose
    # trailing two dims are WHOLE — tile-legal at any S, and the kernel
    # indexes it with static offsets only (see _flash_kernel docstring)
    bias_blocks = bias.reshape(BH, num_kb, block_k)
    out = pl.pallas_call(
        kernel,
        grid=(BH, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_kb, block_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), jnp.float32),
        interpret=_interpret(),
    )(q, k, v, bias_blocks)
    return out[:, :S, :]


def _xla_attention(q, k, v, bias):
    D = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(D)
    s = s + bias[:, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v, preferred_element_type=jnp.float32)


@jax.custom_vjp
def flash_attention(q, k, v, bias):
    """Non-causal attention with additive key bias.  q,k,v: (BH, S, D) fp32;
    bias: (BH, S)."""
    return _flash_forward(q, k, v, bias)


def _fa_fwd(q, k, v, bias):
    return _flash_forward(q, k, v, bias), (q, k, v, bias)


def _fa_bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(_xla_attention, q, k, v, bias)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)


_FORCE_INTERPRET = False


def _interpret() -> bool:
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() not in ("tpu",)


def set_force_interpret(value: bool) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value
