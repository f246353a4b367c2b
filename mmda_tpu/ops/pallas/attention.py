"""Blockwise flash attention (Pallas TPU kernel), for the BERT tower.

At MOSEI utterance lengths (<= ~66 tokens) plain XLA attention IS optimal -
the (S, S) logits fit trivially in VMEM and XLA fuses the softmax (SURVEY.md
§2.9 row 5).  This kernel exists for long-sequence configurations: blockwise
online-softmax over K/V tiles so memory is O(S) instead of O(S^2).

Round 4 additions (VERDICT r3 next-steps #2/#8):

  * **In-kernel dropout** — a counter-based stateless hash keyed on
    (seed, batch*head, global row, global col) draws the attention-probs
    keep mask inside the kernel, so the (B*nh, S, S) mask tensor the XLA
    path materializes (measured 2.6 ms/step of the MOSEI headline,
    benchmarks/RESULTS.md round-3 set 3) never exists.  The backward
    regenerates the identical mask by construction.
  * **True blockwise backward** — dq and dk/dv kernels recompute the probs
    per (q-block, k-block) tile from the saved logsumexp, so training memory
    is O(S) too (the previous custom_vjp fell back to XLA standard attention,
    which re-materialized the S^2 probs exactly where the kernel claimed to
    avoid them).  Uses the standard flash-bwd identity
    D_i = rowsum(do * o) = sum_k dP_ik P_ik (valid with dropout as well,
    since o already carries the dropped probs).

Equivalence tested in tests/test_pallas_attention.py (interpret mode):
fwd + grads vs the XLA reference, multi-block and padded shapes, with and
without dropout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Per-row stats (lse, dsum) are stored as (BH, num_qb * _STAT_SUB, block_q)
# with (1, _STAT_SUB, block_q) blocks: a (BH, num_qb, block_q) layout with
# (1, 1, block_q) blocks only lowers when num_qb == 1 (the second-to-last
# block dim must be divisible by 8 or equal to the array dim), which is why
# the kernel compiled at S <= 256 but failed at S = 512/1024 — caught on
# hardware, benchmarks/r4_tpu_logs/bench_long_seq.log.  Row 0 of each
# 8-row group is the data; the rest is broadcast padding (~KBs of HBM).
_STAT_SUB = 8


def _keep_mask(shape, rate: float, seed, bh, row0, col0):
    """Counter-based dropout keep-mask over a (rows, cols) tile whose global
    position is (row0, col0).  Pure function of (seed, bh, absolute position)
    -> every kernel (fwd, dq, dk/dv) regenerates the identical mask for the
    same tile regardless of grid decomposition.  splitmix-style avalanche;
    >>8 keeps 24 bits, exact in int32->float32 (mosaic has no uint32->f32)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(col0)
    x = (rows * jnp.uint32(2654435761)
         + cols * jnp.uint32(0x9E3779B9)
         + seed.astype(jnp.uint32) * jnp.uint32(40503)
         + jnp.asarray(bh, jnp.int32).astype(jnp.uint32) * jnp.uint32(51329))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    u = (x >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32)


def _flash_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                  *, block_k: int, block_q: int, scale: float, rate: float):
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
    tiny (S/128: 4 at S=512).

    With rate > 0 the accumulator uses DROPPED probs while the softmax
    denominator keeps the raw probs (dropout applies to normalized probs,
    exactly like the XLA path's post-softmax mask).  lse = m + log(l) is
    written per row for the backward's probs recomputation.

    Matmul operands stay in the INPUT dtype (bf16 from the model on TPU —
    the v5e MXU is bf16-native; the round-5 T=512 device trace put these
    kernels at 46.6% of the step with f32 operands); accumulation, softmax
    stats, and the running max/denom are always f32
    (preferred_element_type), and probs are cast back to the operand dtype
    only at the PV matmul — the standard flash mixed-precision split.
    Scaling moved AFTER the QK^T dot so bf16 q is never pre-scaled."""
    q = q_ref[0]                                      # (Bq, D), input dtype
    S = k_ref.shape[1]
    Bq, D = q.shape
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    seed = seed_ref[0]

    m = jnp.full((Bq, 1), NEG_INF, jnp.float32)       # running max
    l = jnp.zeros((Bq, 1), jnp.float32)               # running denom
    acc = jnp.zeros((Bq, D), jnp.float32)

    num_kb = S // block_k

    for i in range(num_kb):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]  # (Bk, D)
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        b = bias_ref[0, i, :]                          # (Bk,)
        s = (jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
             + b[None, :])
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, bh,
                              qb * block_q, i * block_k)
            pd = p * keep * (1.0 / (1.0 - rate))
        else:
            pd = p
        acc = acc * alpha + jnp.dot(pd.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        m = m_new
    o_ref[0] = acc / l
    lse_ref[0] = jnp.broadcast_to((m + jnp.log(l))[:, 0][None, :],
                                  (_STAT_SUB, Bq))


def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                   dsum_ref, dq_ref, *, block_k: int, block_q: int,
                   scale: float, rate: float):
    """Grid (BH, num_qb): one dq block per program, static loop over K
    blocks recomputing probs from lse.  dsum is D_i = rowsum(do * o).
    Matmul operands in the input dtype, f32 accumulation (see
    _flash_kernel); ds is cast to the operand dtype only at the dq dot."""
    q = q_ref[0]                                      # (Bq, D), input dtype
    do = do_ref[0]                                    # (Bq, D), input dtype
    lse = lse_ref[0, 0][:, None]                      # (Bq, 1)
    dsum = dsum_ref[0, 0][:, None]                    # (Bq, 1)
    S = k_ref.shape[1]
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    seed = seed_ref[0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    dq = jnp.zeros(q.shape, jnp.float32)
    for i in range(S // block_k):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        b = bias_ref[0, i, :]
        s = (jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
             + b[None, :])
        p = jnp.exp(s - lse)                           # true probs tile
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, bh,
                              qb * block_q, i * block_k) * inv
            dp = dp * keep
        ds = p * (dp - dsum)
        dq = dq + jnp.dot(ds.astype(k.dtype), k,
                          preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                    dsum_ref, dk_ref, dv_ref, *, block_k: int, block_q: int,
                    scale: float, rate: float):
    """Grid (BH, num_kb): one (dk, dv) block per program, static loop over Q
    blocks.  Padded q rows carry do = 0, so they contribute nothing.
    Matmul operands in the input dtype, f32 accumulation (see
    _flash_kernel); probs/ds cast to the operand dtype only at the dots."""
    k = k_ref[0]                                       # (Bk, D), input dtype
    v = v_ref[0]
    b = bias_ref[0, 0, :]                              # (Bk,) — row 0 of the
    # (1, _STAT_SUB, Bk) per-k-block bias group (see _flash_backward)
    Sq = q_ref.shape[1]
    bh = pl.program_id(0)
    kb = pl.program_id(1)
    seed = seed_ref[0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)
    for j in range(Sq // block_q):
        q = q_ref[0, pl.ds(j * block_q, block_q), :]
        do = do_ref[0, pl.ds(j * block_q, block_q), :]
        lse = lse_ref[0, j * _STAT_SUB, :][:, None]    # (Bq, 1)
        dsum = dsum_ref[0, j * _STAT_SUB, :][:, None]
        s = (jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
             + b[None, :])
        p = jnp.exp(s - lse)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, bh,
                              j * block_q, kb * block_k) * inv
            pd = p * keep
        else:
            keep = None
            pd = p
        dv = dv + jnp.dot(pd.astype(do.dtype).T, do,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - dsum)
        dk = dk + jnp.dot(ds.astype(q.dtype).T, q,
                          preferred_element_type=jnp.float32)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Ragged-Q variants (round 5).  BERT sequences are text_len + 2 specials
# (data/loader.py:47), so every real long-seq shape (S = 514, 1026, ...) is
# NOT a multiple of the 128 flash block: the gridded kernels above pad BOTH
# sides to the block (514 -> 640), wasting ~55% of the QK/PV FLOPs and
# ~15.8 ms/step of pad/slice HLOs at T=512 (round-5 device trace,
# benchmarks/RESULTS.md).  The ragged kernels pad the Q side only to the
# 8-row sublane tile (514 -> 520; block dim == array dim is always
# tile-legal) and keep the uniform 128-wide K chunks, so the waste drops to
# the K side's tail block.  Three layout rules make this Mosaic-legal:
#   * whole-(S8, D) blocks per program; every in-kernel slice is on the
#     SUBLANE dim with 8-aligned static offsets (lane slicing is never
#     attempted);
#   * lse/dsum move to a lanes-broadcast (BH, S8, 8) layout, read back with
#     a lane-min reduction instead of a lane slice;
#   * the bias keeps the gridded layouts ((BH, num_kb, block_k) fwd/dq,
#     sublane-8 grouped for dkv), indexed by scalar sublane rows.
# Routing: engaged when S % block_q != 0 and the whole-S residency fits the
# scoped-VMEM budget; MMDA_FLASH_RAGGED=0 forces the gridded path (hardware
# A/B ablation).  Replaces the cuDNN-style fixed-tile attention of the
# reference (/root/reference/src/models.py bert encoder) in the regime the
# reference never kernelized.
# ---------------------------------------------------------------------------

_RAGGED_LANE = 8  # lse/dsum lane width in ragged mode (broadcast copies)


def _ceil8(n: int) -> int:
    return -(-n // 8) * 8


def _q_chunks(S8: int, block_q: int):
    """Static (start, size) partition of the padded-Q extent: uniform
    block_q rows with an 8-aligned ragged tail (S8 is a multiple of 8, so
    every start/size is sublane-aligned)."""
    chunks, s = [], 0
    while s < S8:
        sz = min(block_q, S8 - s)
        chunks.append((s, sz))
        s += sz
    return tuple(chunks)


def _ragged_fits(S: int, D: int, block_q: int, block_k: int,
                 itemsize: int) -> bool:
    """Scoped-VMEM estimate of the binding ragged kernel (dq: whole q, k,
    v, do, dq resident + the (S8, block_k) f32 tiles).  Blocked refs are
    double-buffered across the (BH,) grid.  Same 15.5 MiB budget as the
    recurrence kernels (ops/pallas/lstm.py::_VMEM_BUDGET rationale)."""
    S8 = _ceil8(S)
    Sk = -(-S // block_k) * block_k
    ins = (2 * S8 * D * itemsize        # q, do
           + 2 * Sk * D * itemsize      # k, v
           + Sk * 4                     # bias blocks (f32)
           + 2 * S8 * _RAGGED_LANE * 4)  # lse, dsum
    outs = S8 * D * 4                   # dq / o (f32-width worst case)
    tiles = 3 * S8 * max(block_k, block_q) * 4   # s, p, keep working set
    acc = S8 * D * 4                    # f32 accumulator (fwd acc / dq)
    return 2 * (ins + outs) + tiles + acc <= int(15.5 * 2**20)


def _ragged_mode(S: int, D: int, block_q: int, block_k: int,
                 itemsize: int) -> bool:
    import os

    if os.environ.get("MMDA_FLASH_RAGGED", "1") == "0":
        return False
    return (S % block_q != 0
            and _ragged_fits(S, D, block_q, block_k, itemsize))


def _flash_kernel_ragged(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                         lse_ref, *, block_k: int, scale: float,
                         rate: float):
    """Grid (BH,): whole-(S8, D) q per program, static loop over uniform K
    chunks.  Identical math to _flash_kernel with qb == 0 (the dropout mask
    is a pure function of absolute positions, so any tiling reproduces
    it)."""
    q = q_ref[0]                                      # (S8, D), input dtype
    Sk = k_ref.shape[1]
    S8, D = q.shape
    bh = pl.program_id(0)
    seed = seed_ref[0]

    m = jnp.full((S8, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((S8, 1), jnp.float32)
    acc = jnp.zeros((S8, D), jnp.float32)
    for i in range(Sk // block_k):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        b = bias_ref[0, i, :]
        s = (jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
             + b[None, :])
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, bh, 0, i * block_k)
            pd = p * keep * (1.0 / (1.0 - rate))
        else:
            pd = p
        acc = acc * alpha + jnp.dot(pd.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        m = m_new
    o_ref[0] = acc / l
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (S8, _RAGGED_LANE))


def _bwd_dq_kernel_ragged(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                          lse_ref, dsum_ref, dq_ref, *, block_k: int,
                          scale: float, rate: float):
    """Grid (BH,): whole-(S8, D) dq per program, static loop over K chunks.
    lse/dsum arrive lanes-broadcast (S8, _RAGGED_LANE); a lane-min recovers
    the column (all lanes are identical copies)."""
    q = q_ref[0]
    do = do_ref[0]
    lse = jnp.min(lse_ref[0], axis=1, keepdims=True)   # (S8, 1)
    dsum = jnp.min(dsum_ref[0], axis=1, keepdims=True)
    Sk = k_ref.shape[1]
    bh = pl.program_id(0)
    seed = seed_ref[0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    dq = jnp.zeros(q.shape, jnp.float32)
    for i in range(Sk // block_k):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        b = bias_ref[0, i, :]
        s = (jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
             + b[None, :])
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, bh, 0, i * block_k) * inv
            dp = dp * keep
        ds = p * (dp - dsum)
        dq = dq + jnp.dot(ds.astype(k.dtype), k,
                          preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_ragged(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                           lse_ref, dsum_ref, dk_ref, dv_ref, *,
                           q_chunks, block_k: int, scale: float,
                           rate: float):
    """Grid (BH, num_kb): one (dk, dv) block per program (as the gridded
    kernel), static loop over the UNEVEN q chunks of the whole-(S8, D)
    q/do refs (sublane slices, 8-aligned by _q_chunks).  Padded q rows
    carry do = 0 and dsum = 0, so they contribute nothing."""
    k = k_ref[0]                                       # (Bk, D)
    v = v_ref[0]
    b = bias_ref[0, 0, :]                              # (Bk,) row 0 of the
    # sublane-8 grouped per-k-block bias (see _flash_backward)
    bh = pl.program_id(0)
    kb = pl.program_id(1)
    seed = seed_ref[0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)
    for (c0, cs) in q_chunks:
        q = q_ref[0, pl.ds(c0, cs), :]
        do = do_ref[0, pl.ds(c0, cs), :]
        lse = jnp.min(lse_ref[0, pl.ds(c0, cs), :], axis=1, keepdims=True)
        dsum = jnp.min(dsum_ref[0, pl.ds(c0, cs), :], axis=1, keepdims=True)
        s = (jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
             + b[None, :])
        p = jnp.exp(s - lse)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, bh,
                              c0, kb * block_k) * inv
            pd = p * keep
        else:
            keep = None
            pd = p
        dv = dv + jnp.dot(pd.astype(do.dtype).T, do,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - dsum)
        dk = dk + jnp.dot(ds.astype(q.dtype).T, q,
                          preferred_element_type=jnp.float32)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_inputs(q, k, v, bias, block_q, block_k):
    BH, S, D = q.shape
    Sq = -(-S // block_q) * block_q
    Sk = -(-S // block_k) * block_k
    if Sq != S:
        q = jnp.pad(q, ((0, 0), (0, Sq - S), (0, 0)))
    if Sk != S:
        k = jnp.pad(k, ((0, 0), (0, Sk - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sk - S), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, Sk - S)), constant_values=NEG_INF)
    return q, k, v, bias, Sq, Sk


def _flash_blocks() -> tuple:
    """Default (block_q, block_k) = (128, 128) — the shipped geometry.
    MMDA_FLASH_BQ / MMDA_FLASH_BK env overrides exist for the block-size
    sweep (benchmarks/bench_gap_long.py); read at trace time."""
    import os

    return (int(os.environ.get("MMDA_FLASH_BQ", "128")),
            int(os.environ.get("MMDA_FLASH_BK", "128")))


def _flash_forward(q, k, v, bias, seed, rate: float,
                   block_q: int = 0, block_k: int = 0):
    """q,k,v: (BH, S, D) f32 or bf16 (matmuls run in the input dtype with
    f32 accumulation); bias: (BH, S) f32 additive key mask (0 or -inf-ish).
    Returns ((BH, S, D) f32 out, (BH, num_qb * _STAT_SUB, block_q) f32 lse
    over padded rows — row 8*i of the middle dim holds q-block i's stats)."""
    BH, S, D = q.shape
    dq_, dk_ = _flash_blocks()
    block_q = min(block_q or dq_, S)
    block_k = min(block_k or dk_, S)

    if _ragged_mode(S, D, block_q, block_k, q.dtype.itemsize):
        S8 = _ceil8(S)
        Sk = -(-S // block_k) * block_k
        num_kb = Sk // block_k
        if S8 != S:
            q = jnp.pad(q, ((0, 0), (0, S8 - S), (0, 0)))
        if Sk != S:
            k = jnp.pad(k, ((0, 0), (0, Sk - S), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, Sk - S), (0, 0)))
            bias = jnp.pad(bias, ((0, 0), (0, Sk - S)),
                           constant_values=NEG_INF)
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel_ragged, block_k=block_k,
                              scale=1.0 / np.sqrt(D), rate=rate),
            grid=(BH,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, S8, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, num_kb, block_k), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, S8, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S8, _RAGGED_LANE), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(jax.ShapeDtypeStruct((BH, S8, D), jnp.float32),
                       jax.ShapeDtypeStruct((BH, S8, _RAGGED_LANE),
                                            jnp.float32)),
            interpret=_interpret(),
        )(seed, q, k, v, bias.reshape(BH, num_kb, block_k))
        return out[:, :S, :], lse

    q, k, v, bias, Sq, Sk = _pad_inputs(q, k, v, bias, block_q, block_k)

    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               block_q=block_q, scale=1.0 / np.sqrt(D),
                               rate=rate)
    num_kb = Sk // block_k
    num_qb = Sq // block_q
    # (BH, num_kb, block_k): per-program (1, num_kb, block_k) blocks whose
    # trailing two dims are WHOLE — tile-legal at any S, and the kernel
    # indexes it with static offsets only (see _flash_kernel docstring)
    bias_blocks = bias.reshape(BH, num_kb, block_k)
    out, lse = pl.pallas_call(
        kernel,
        grid=(BH, num_qb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_kb, block_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STAT_SUB, block_q), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((BH, Sq, D), jnp.float32),
                   jax.ShapeDtypeStruct((BH, num_qb * _STAT_SUB, block_q),
                                        jnp.float32)),
        interpret=_interpret(),
    )(seed, q, k, v, bias_blocks)
    return out[:, :S, :], lse


def _flash_backward(q, k, v, bias, seed, lse, o, do, rate: float,
                    block_q: int = 0, block_k: int = 0):
    BH, S, D = q.shape
    dq_, dk_ = _flash_blocks()
    block_q = min(block_q or dq_, S)
    block_k = min(block_k or dk_, S)

    if _ragged_mode(S, D, block_q, block_k, q.dtype.itemsize):
        # lse arrived from the ragged forward as (BH, S8, _RAGGED_LANE) —
        # the mode decision is a pure function of (shape, blocks, env), all
        # identical at trace time, so fwd and bwd always agree.
        return _flash_backward_ragged(q, k, v, bias, seed, lse, o, do, rate,
                                      block_q, block_k)

    # D_i = rowsum(do * o) in f32 BEFORE do drops to the operand dtype: one
    # cheap fused elementwise+reduce under XLA, laid out like lse
    # ((BH, num_qb * _STAT_SUB, block_q), see _STAT_SUB)
    dsum = jnp.sum(do.astype(jnp.float32) * o, axis=-1)
    # zero-pad do so padded q rows contribute nothing to dk/dv; the kernels
    # take do in the q/k/v operand dtype (bf16 on TPU — see _flash_kernel)
    do = jnp.pad(do.astype(q.dtype),
                 ((0, 0), (0, -(-S // block_q) * block_q - S), (0, 0)))
    q, k, v, bias, Sq, Sk = _pad_inputs(q, k, v, bias, block_q, block_k)
    num_kb = Sk // block_k
    num_qb = Sq // block_q
    bias_blocks = bias.reshape(BH, num_kb, block_k)

    dsum = jnp.pad(dsum, ((0, 0), (0, Sq - S)))
    dsum = jnp.broadcast_to(
        dsum.reshape(BH, num_qb, 1, block_q),
        (BH, num_qb, _STAT_SUB, block_q),
    ).reshape(BH, num_qb * _STAT_SUB, block_q)

    scale = 1.0 / np.sqrt(D)
    common = dict(block_k=block_k, block_q=block_q, scale=scale, rate=rate)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec((1, Sq, D), lambda b, i: (b, 0, 0),   # noqa: E731
                                memory_space=pltpu.VMEM)
    fullk = lambda: pl.BlockSpec((1, Sk, D), lambda b, i: (b, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    qblk = lambda: pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    rows_all = lambda: pl.BlockSpec((1, num_qb * _STAT_SUB, block_q),  # noqa: E731
                                    lambda b, i: (b, 0, 0),
                                    memory_space=pltpu.VMEM)
    rows_blk = lambda: pl.BlockSpec((1, _STAT_SUB, block_q),           # noqa: E731
                                    lambda b, i: (b, i, 0),
                                    memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(BH, num_qb),
        in_specs=[smem, qblk(), fullk(), fullk(),
                  pl.BlockSpec((1, num_kb, block_k), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  qblk(), rows_blk(), rows_blk()],
        out_specs=qblk(),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
        interpret=_interpret(),
    )(seed, q, k, v, bias_blocks, do, lse, dsum)

    # per-k-block bias for the dkv grid, sublane-8 padded like the stats
    # (a (1, 1, block_k) block is tile-illegal whenever num_kb > 1)
    bias8 = jnp.broadcast_to(
        bias_blocks[:, :, None, :], (BH, num_kb, _STAT_SUB, block_k),
    ).reshape(BH, num_kb * _STAT_SUB, block_k)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid=(BH, num_kb),
        in_specs=[smem, full(),
                  pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _STAT_SUB, block_k), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  full(), rows_all(), rows_all()],
        out_specs=(pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((BH, Sk, D), k.dtype),
                   jax.ShapeDtypeStruct((BH, Sk, D), v.dtype)),
        interpret=_interpret(),
    )(seed, q, k, v, bias8, do, lse, dsum)

    return dq[:, :S, :], dk[:, :S, :], dv[:, :S, :]


def _flash_backward_ragged(q, k, v, bias, seed, lse, o, do, rate: float,
                           block_q: int, block_k: int):
    """Ragged-Q backward: dq on a (BH,) grid with whole-(S8, D) blocks,
    dk/dv on the (BH, num_kb) grid with uneven static q chunks.  See the
    ragged-variants comment block for the layout rules."""
    BH, S, D = q.shape
    S8 = _ceil8(S)
    Sk = -(-S // block_k) * block_k
    num_kb = Sk // block_k
    q_chunks = _q_chunks(S8, block_q)

    # D_i = rowsum(do * o) in f32, then lanes-broadcast like lse
    dsum = jnp.sum(do.astype(jnp.float32) * o, axis=-1)          # (BH, S)
    if S8 != S:
        dsum = jnp.pad(dsum, ((0, 0), (0, S8 - S)))
        q = jnp.pad(q, ((0, 0), (0, S8 - S), (0, 0)))
        do = jnp.pad(do.astype(q.dtype), ((0, 0), (0, S8 - S), (0, 0)))
    else:
        do = do.astype(q.dtype)
    dsum = jnp.broadcast_to(dsum[:, :, None], (BH, S8, _RAGGED_LANE))
    if Sk != S:
        k = jnp.pad(k, ((0, 0), (0, Sk - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sk - S), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, Sk - S)), constant_values=NEG_INF)
    bias_blocks = bias.reshape(BH, num_kb, block_k)

    scale = 1.0 / np.sqrt(D)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    whole_q = lambda: pl.BlockSpec((1, S8, D), lambda b: (b, 0, 0),   # noqa: E731
                                   memory_space=pltpu.VMEM)
    whole_k = lambda: pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0),   # noqa: E731
                                   memory_space=pltpu.VMEM)
    stats = lambda: pl.BlockSpec((1, S8, _RAGGED_LANE),               # noqa: E731
                                 lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_ragged, block_k=block_k,
                          scale=scale, rate=rate),
        grid=(BH,),
        in_specs=[smem, whole_q(), whole_k(), whole_k(),
                  pl.BlockSpec((1, num_kb, block_k), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  whole_q(), stats(), stats()],
        out_specs=whole_q(),
        out_shape=jax.ShapeDtypeStruct((BH, S8, D), q.dtype),
        interpret=_interpret(),
    )(seed, q, k, v, bias_blocks, do, lse, dsum)

    # sublane-8 grouped per-k-block bias, exactly as the gridded dkv path
    bias8 = jnp.broadcast_to(
        bias_blocks[:, :, None, :], (BH, num_kb, _STAT_SUB, block_k),
    ).reshape(BH, num_kb * _STAT_SUB, block_k)

    whole_q2 = lambda: pl.BlockSpec((1, S8, D), lambda b, i: (b, 0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    stats2 = lambda: pl.BlockSpec((1, S8, _RAGGED_LANE),                 # noqa: E731
                                  lambda b, i: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
    kblk = lambda: pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_ragged, q_chunks=q_chunks,
                          block_k=block_k, scale=scale, rate=rate),
        grid=(BH, num_kb),
        in_specs=[smem, whole_q2(), kblk(), kblk(),
                  pl.BlockSpec((1, _STAT_SUB, block_k), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  whole_q2(), stats2(), stats2()],
        out_specs=(kblk(), kblk()),
        out_shape=(jax.ShapeDtypeStruct((BH, Sk, D), k.dtype),
                   jax.ShapeDtypeStruct((BH, Sk, D), v.dtype)),
        interpret=_interpret(),
    )(seed, q, k, v, bias8, do, lse, dsum)

    return dq[:, :S, :], dk[:, :S, :], dv[:, :S, :]


def _xla_attention(q, k, v, bias):
    """Plain XLA attention — the equivalence oracle for tests."""
    D = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(D)
    s = s + bias[:, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v, preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attention(q, k, v, bias, seed=None, rate: float = 0.0):
    """Non-causal attention with additive key bias and optional in-kernel
    attention-probs dropout.  q,k,v: (BH, S, D) f32 or bf16 (bf16 operands
    run the MXU at native throughput; accumulation and softmax stats are
    always f32, output is f32); bias: (BH, S) f32; seed: (1,) int32
    (ignored when rate == 0); rate: dropout probability.  O(S) memory
    forward AND backward (blockwise probs recomputation).  Grads match the
    q/k/v input dtypes."""
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return _flash_forward(q, k, v, bias, seed, rate)[0]


def _fa_fwd(q, k, v, bias, seed, rate):
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    o, lse = _flash_forward(q, k, v, bias, seed, rate)
    return o, (q, k, v, bias, seed, lse, o)


def _fa_bwd(rate, res, g):
    q, k, v, bias, seed, lse, o = res
    dq, dk, dv = _flash_backward(q, k, v, bias, seed, lse, o, g, rate)
    return dq, dk, dv, None, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)


_FORCE_INTERPRET = False


def _interpret() -> bool:
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() not in ("tpu",)


def set_force_interpret(value: bool) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value
