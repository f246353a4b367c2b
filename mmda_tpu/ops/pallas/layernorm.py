"""Fused residual + dropout + LayerNorm (Pallas TPU kernel, fwd + bwd).

Target: the hidden-dropout term of the train step.  Round-3 decomposition
(benchmarks/RESULTS.md set 3) measured the 25 hidden dropout sites at
~2.8 ms/step fwd+bwd, and five mitigations that kept the mask materialized
in the XLA graph were measured-rejected (u8 draws, recompute, packed words,
bf16 probs, emb one-hot) — the conclusion was "the cost is the
apply/materialization structure, not generator throughput".  This kernel
changes the structure for the 24 per-layer sites, which are all exactly
`x = LN(x + dropout(h))` (models/bert.py bert_layer): one kernel computes
the whole site with the keep mask drawn from a counter-based positional
hash IN KERNEL, and the backward regenerates the mask + recomputes the LN
statistics from the saved (x, y) — so the mask tensor, the dropout output,
and the normalized intermediate never exist in HBM.

Dropout distribution matches the attention kernel precedent
(ops/pallas/short_attention.py): a splitmix-style integer hash of
(seed, global row, column) with 24-bit uniform resolution — statistically
equivalent to jax.random draws, not bit-identical (bit-exact torch-style
draws remain available by turning the flag off).

Gated by BertConfig.fused_ln_dropout (off by default until the TPU A/B —
accept or reject on measurement like every kernel in this tree).
Equivalence tests: tests/test_pallas_layernorm.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 128   # half-size blocks: gridded Pallas double-buffers every
                    # in/out block (CLAUDE.md round-3 VMEM lesson)


def _keep_mask(shape, rate: float, seed, row0):
    """Keep mask over a (rows, H) tile whose first global row is row0.
    Pure function of (seed, absolute position) -> the backward regenerates
    the identical mask.  Same avalanche as the attention kernels."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (rows * jnp.uint32(2654435761)
         + cols * jnp.uint32(0x9E3779B9)
         + seed.astype(jnp.uint32) * jnp.uint32(40503))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    u = (x >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32)


def _fwd_kernel(seed_ref, x_ref, y_ref, g_ref, b_ref, o_ref,
                *, rate: float, eps: float, block_rows: int):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    y = y_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(y.shape, rate, seed_ref[0], i * block_rows)
        y = y * keep * (1.0 / (1.0 - rate))
    z = x + y
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
    zhat = (z - mu) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (zhat * g_ref[...].astype(jnp.float32)
                  + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, y_ref, g_ref, do_ref,
                dx_ref, dy_ref, dg_ref, db_ref,
                *, rate: float, eps: float, block_rows: int):
    """Per block: recompute z/mu/rstd (and the mask), emit dx, dy and
    ACCUMULATE the (1, H) dg/db sums into a revisited output block (constant
    index map; the TPU grid is sequential, so read-modify-write across grid
    steps is the standard Pallas reduction pattern).  A (nb, H) partials
    array with (1, H) blocks is NOT tile-legal on TPU (second-to-last block
    dim must be divisible by 8 or equal to the array dim) — caught on
    hardware, benchmarks/r4_tpu_logs/bench_fused_ln.log."""
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    y = y_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(y.shape, rate, seed_ref[0],
                          i * block_rows) * (1.0 / (1.0 - rate))
        z = x + y * keep
    else:
        keep = None
        z = x + y
    H = z.shape[-1]
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    zhat = (z - mu) * rstd

    dzhat = do * g
    m1 = jnp.mean(dzhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dzhat * zhat, axis=-1, keepdims=True)
    dz = rstd * (dzhat - m1 - zhat * m2)
    dx_ref[...] = dz.astype(dx_ref.dtype)
    dy_ref[...] = (dz * keep if keep is not None else dz).astype(dy_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = jnp.zeros((1, H), jnp.float32)
        db_ref[...] = jnp.zeros((1, H), jnp.float32)

    dg_ref[...] += jnp.sum(do * zhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(do, axis=0, keepdims=True)


def _pad_rows(a, n_pad):
    return jnp.pad(a, ((0, n_pad), (0, 0))) if n_pad else a


def _fwd_call(seed, x, y, g, b, rate, eps):
    N, H = x.shape
    R = min(_BLOCK_ROWS, N)
    n_pad = (-N) % R
    xp, yp = _pad_rows(x, n_pad), _pad_rows(y, n_pad)
    grid = (xp.shape[0] // R,)
    row_blk = pl.BlockSpec((R, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, eps=eps, block_rows=R),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  row_blk, row_blk, vec, vec],
        out_specs=row_blk,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=_interpret(),
    )(seed, xp, yp, g.reshape(1, H), b.reshape(1, H))
    return out[:N]


def _bwd_call(seed, x, y, g, do, rate, eps):
    N, H = x.shape
    R = min(_BLOCK_ROWS, N)
    n_pad = (-N) % R
    # padded rows carry do = 0 -> zero dx/dy and zero dg/db contributions
    xp, yp, dop = _pad_rows(x, n_pad), _pad_rows(y, n_pad), _pad_rows(do, n_pad)
    nb = xp.shape[0] // R
    row_blk = pl.BlockSpec((R, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx, dy, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, eps=eps, block_rows=R),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  row_blk, row_blk, vec, row_blk],
        out_specs=(row_blk, row_blk, acc, acc),
        out_shape=(jax.ShapeDtypeStruct(xp.shape, x.dtype),
                   jax.ShapeDtypeStruct(yp.shape, y.dtype),
                   jax.ShapeDtypeStruct((1, H), jnp.float32),
                   jax.ShapeDtypeStruct((1, H), jnp.float32)),
        interpret=_interpret(),
    )(seed, xp, yp, g.reshape(1, H), dop)
    return (dx[:N], dy[:N],
            dg[0].astype(g.dtype),
            db[0].astype(g.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def residual_dropout_layernorm(x, y, scale, bias, seed,
                               rate: float = 0.0, eps: float = 1e-12):
    """LN(x + dropout(y)) * scale + bias, fused, with in-kernel dropout.

    x, y: (N, H) (flatten (B, S, H) to rows first); scale/bias: (H,);
    seed: (1,) int32 (ignored when rate == 0).  LN statistics in fp32
    regardless of input dtype (matches _layer_norm's fp32=True path).
    """
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return _fwd_call(seed, x, y, scale, bias, rate, eps)


def _rdl_fwd(x, y, scale, bias, seed, rate, eps):
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    out = _fwd_call(seed, x, y, scale, bias, rate, eps)
    return out, (x, y, scale, seed)


def _rdl_bwd(rate, eps, res, dout):
    x, y, scale, seed = res
    dx, dy, dg, db = _bwd_call(seed, x, y, scale, dout, rate, eps)
    return dx, dy, dg, db, None


residual_dropout_layernorm.defvjp(_rdl_fwd, _rdl_bwd)


_FORCE_INTERPRET = False


def _interpret() -> bool:
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() not in ("tpu",)


def set_force_interpret(value: bool) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value
