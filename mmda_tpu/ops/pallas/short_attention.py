"""Fused short-sequence multi-head attention (Pallas TPU, fwd + bwd).

Motivation (benchmarks/RESULTS.md round-2 attention anatomy): at MOSEI sizes
(S=50, hd=64, B*nh=768) the XLA path spends ~2.6 ms/fwd in the attention core
- not in MXU FLOPs (~0.25 GFLOP) but in materializing the (B*nh, S, S) fp32
logits/probs in HBM between the matmul and softmax kernels, with every (50,50)
tile padded to (64,128) lanes.  Flash attention makes this WORSE here (12.4 vs
8.7 ms/fwd): its blocking machinery pays off only at long S.

This kernel instead holds one batch item's full attention in VMEM: grid (B,),
per program a python-unrolled loop over heads runs logits -> bias -> softmax
-> (optional dropout) -> context without touching HBM, letting mosaic overlap
head h's VPU softmax with head h+1's MXU matmul.  Layout (B, nh, S, hd): the
last two block dims equal the array dims, so any S is legal (no 8/128
constraint), and head indexing is a major-dim slice (no lane shuffles).

Dropout uses a counter-based stateless hash mask (`_dropout_mask`) keyed on
(seed, batch item, head, position): the backward kernel regenerates the same
masks by construction while recomputing probs (nothing but q/k/v/bias is
saved), and the same code path runs compiled and in interpreter mode.  The
bias input is (B, S) additive key bias (0 or -1e9); it gets no gradient (it
is a function of the attention mask).

Equivalence vs the XLA path: tests/test_short_attention.py (interpret on CPU,
compiled on TPU via benchmarks/bench_fwd_parts.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dropout_mask(shape, rate: float, seed, b, h: int):
    """Counter-based dropout keep-mask: a stateless integer hash of
    (seed, batch item, head, position).  Pure function -> the backward kernel
    regenerates the identical mask by construction, and it runs both compiled
    (mosaic) and in interpreter mode (pltpu.prng_* has no CPU lowering)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (rows * jnp.uint32(shape[1]) + cols
         + seed.astype(jnp.uint32) * jnp.uint32(2654435761)
         + jnp.uint32(b).astype(jnp.uint32) * jnp.uint32(40503)
         + jnp.uint32(h * 51329))
    # xorshift-multiply finalizer (splitmix-style avalanche)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    # >>8 leaves 24 bits -> exact in int32/float32 (mosaic has no uint32->f32)
    u = (x >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                *, scale: float, rate: float):
    nh = q_ref.shape[1]
    b = pl.program_id(0)
    bias = bias_ref[b][None, :]                          # (1, S)
    seed = seed_ref[0]
    for h in range(nh):
        q = q_ref[0, h].astype(jnp.float32) * scale      # (S, hd)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _dropout_mask(p.shape, rate, seed, b, h)
            p = p * keep * (1.0 / (1.0 - rate))
        o_ref[0, h] = jnp.dot(p, v, preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, rate: float):
    nh = q_ref.shape[1]
    b = pl.program_id(0)
    bias = bias_ref[b][None, :]
    seed = seed_ref[0]
    for h in range(nh):
        q = q_ref[0, h].astype(jnp.float32) * scale
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)       # pre-dropout probs
        if rate > 0.0:
            keep = (_dropout_mask(p.shape, rate, seed, b, h)
                    * (1.0 / (1.0 - rate)))
            pd = p * keep                                # dropped probs
        else:
            keep = None
            pd = p
        # dv = pd^T @ do ; dpd = do @ v^T
        dv_ref[0, h] = jnp.dot(pd.T, do, preferred_element_type=jnp.float32
                               ).astype(dv_ref.dtype)
        dpd = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        dp = dpd * keep if keep is not None else dpd
        # softmax backward: ds = p * (dp - sum(dp * p))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_ref[0, h] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                        * scale).astype(dq_ref.dtype)
        dk_ref[0, h] = (jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
                        ).astype(dk_ref.dtype)  # q already carries `scale`


def _specs(B, nh, S, hd):
    blk = pl.BlockSpec((1, nh, S, hd), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((B, S), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return blk, bias


def _fwd_call(seed, q, k, v, bias, rate: float):
    B, nh, S, hd = q.shape
    blk, bias_spec = _specs(B, nh, S, hd)
    kernel = functools.partial(_fwd_kernel, scale=1.0 / np.sqrt(hd), rate=rate)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk, blk, blk, bias_spec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(seed, q, k, v, bias)


def _bwd_call(seed, q, k, v, bias, do, rate: float):
    B, nh, S, hd = q.shape
    blk, bias_spec = _specs(B, nh, S, hd)
    kernel = functools.partial(_bwd_kernel, scale=1.0 / np.sqrt(hd), rate=rate)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk, blk, blk, bias_spec, blk],
        out_specs=(blk, blk, blk),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),) * 3,
        interpret=_interpret(),
    )(seed, q, k, v, bias, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def short_attention(q, k, v, bias, seed, rate: float = 0.0):
    """Fused multi-head attention for short sequences.

    q, k, v: (B, nh, S, hd); bias: (B, S) additive key bias (0 / -1e9);
    seed: (1,) int32 dropout seed (ignored when rate == 0); rate: attention
    dropout probability (in-kernel PRNG mask, regenerated in the backward).
    Returns (B, nh, S, hd) context.
    """
    return _fwd_call(seed, q, k, v, bias, rate)


def _sa_fwd(q, k, v, bias, seed, rate):
    return _fwd_call(seed, q, k, v, bias, rate), (q, k, v, bias, seed)


def _sa_bwd(rate, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv = _bwd_call(seed, q, k, v, bias, g, rate)
    return dq, dk, dv, None, None


short_attention.defvjp(_sa_fwd, _sa_bwd)


_FORCE_INTERPRET = False


def _interpret() -> bool:
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() not in ("tpu",)


def set_force_interpret(value: bool) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value
