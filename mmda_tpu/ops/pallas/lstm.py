"""Fused masked-LSTM recurrence as a Pallas TPU kernel (fwd + BPTT bwd).

The north-star kernel deliverable (SURVEY.md §2.9): replaces the cuDNN packed
bi-LSTM.  Design:

  * The big input projection x @ W_ih^T (most FLOPs) stays OUTSIDE in XLA -
    one large MXU matmul (models/bilstm.py hoists it).  The kernel fuses the
    sequential part: the whole T-step loop runs in ONE kernel launch with h/c
    held in VMEM, one small (B,H)x(H,4H) MXU matmul + gate elementwise per
    step.  Under lax.scan XLA issues per-step kernels; fusing the loop removes
    the per-step dispatch/HBM round-trips for h and c.
  * Packed-sequence masking (t >= length holds the carry) is fused in.
  * Full custom_vjp: the backward kernel runs BPTT in one launch, recomputing
    gates from saved (h, c) sequences (no gate storage), accumulating dW_hh in
    a VMEM scratch.
  * fp32 throughout the recurrence (LSTM numerics; SURVEY.md hard part #1).

Equivalence vs the XLA scan path is tested in tests/test_pallas_lstm.py
(interpret mode on CPU; compiled on TPU in bench_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Cell math (shared by the whole-T and streaming kernels)
# ---------------------------------------------------------------------------


def _cell_fwd(xp, m, h, c, w):
    """One masked LSTM step: gates from x_proj + h@w, carry-held at m==0."""
    H = h.shape[-1]
    gates = xp + jnp.dot(h, w, preferred_element_type=jnp.float32)
    ig = jax.nn.sigmoid(gates[:, :H])
    fg = jax.nn.sigmoid(gates[:, H:2 * H])
    gg = jnp.tanh(gates[:, 2 * H:3 * H])
    og = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = fg * c + ig * gg
    h_new = og * jnp.tanh(c_new)
    h = m * h_new + (1.0 - m) * h
    c = m * c_new + (1.0 - m) * c
    return h, c


def _cell_bwd(xp, m, h_prev, c_prev, w, dh, dc):
    """One BPTT step (gates recomputed).  Returns (dgates, dh_prev, dc_prev)
    where dgates is the pre-activation gradient (== dx_proj at this step)."""
    H = h_prev.shape[-1]
    gates = xp + jnp.dot(h_prev, w, preferred_element_type=jnp.float32)
    ig = jax.nn.sigmoid(gates[:, :H])
    fg = jax.nn.sigmoid(gates[:, H:2 * H])
    gg = jnp.tanh(gates[:, 2 * H:3 * H])
    og = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = fg * c_prev + ig * gg
    tanh_c = jnp.tanh(c_new)

    # unmask: forward did h_t = m*h_new + (1-m)*h_prev
    dh_new = m * dh
    dc_new = m * dc
    dh_pass = (1.0 - m) * dh              # straight-through to h_prev
    dc_pass = (1.0 - m) * dc

    dc_new = dc_new + dh_new * og * (1.0 - tanh_c * tanh_c)
    d_og = dh_new * tanh_c
    d_ig = dc_new * gg
    d_fg = dc_new * c_prev
    d_gg = dc_new * ig
    dc_prev = dc_new * fg + dc_pass

    dgates = jnp.concatenate(
        [
            d_ig * ig * (1.0 - ig),
            d_fg * fg * (1.0 - fg),
            d_gg * (1.0 - gg * gg),
            d_og * og * (1.0 - og),
        ],
        axis=1,
    )                                      # (B, G)
    # dh_prev = dgates @ W_hh  == dgates @ w^T  (w is (H, G))
    dh_prev = jnp.dot(dgates, w.T, preferred_element_type=jnp.float32) + dh_pass
    return dgates, dh_prev, dc_prev


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_proj_ref, w_hh_t_ref, mask_ref, ys_ref, cs_ref,
                h_fin_ref, c_fin_ref, *, reverse: bool):
    T, B, G = x_proj_ref.shape
    H = G // 4
    w = w_hh_t_ref[:]                     # (H, G)

    def step(i, carry):
        h, c = carry
        t = (T - 1 - i) if reverse else i
        h, c = _cell_fwd(x_proj_ref[t], mask_ref[t], h, c, w)
        ys_ref[t] = h
        cs_ref[t] = c
        return (h, c)

    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    hT, cT = jax.lax.fori_loop(0, T, step, (h0, c0))
    h_fin_ref[:] = hT
    c_fin_ref[:] = cT


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


_VMEM_BUDGET = int(15.5 * 2**20)   # of the 16 MiB scoped-VMEM limit


def _kernel_bytes(T: int, BB: int, G: int, n_blocks: int) -> int:
    """Scoped-VMEM footprint estimate of one (T, BB, .) batch block:
    f32 rows of lane-padded G (x_proj) + 2x lane-padded H (ys, cs) + a
    128-lane mask row, resident for the whole T extent; gridded launches
    (n_blocks > 1) double-buffer every blocked ref.

    The BACKWARD is the binding kernel (x_proj + dx rows at lane-padded G;
    ys/cs/dys at lane-padded H).  Calibrated against the observed compiles
    (v5e, 16 MiB scoped limit; MISA tower hidden == modality input size, so
    the headline towers are H=74/G=296 and H=35/G=140 — misa.py:127):
      - T=256/BB=8/G=296 bwd, grid=8: model 21.0M, compiler 20.12M -> OOM
        (the retry5 bench_t256 fault; the reject is correct)
      - T=48/B=64/G=296 single block: model 15.0M -> runs (the headline,
        just under the limit — consistent with it never having faulted)
      - T=48/BB=32/G=296 bwd, grid=4 (B=128): model 15.0M -> runs
        (round-3 adopted geometry)
      - T=512/B=32/G=296 fwd: fwd-only resident set (G + 2H + mask) gives
        40.3M vs the compiler's 40.11M; the bwd model rejects it harder."""
    H = G // 4
    per_row = 2 * _pad128(G) + 3 * _pad128(H) + 128
    b = 4 * T * max(BB, 8) * per_row
    return b * 2 if n_blocks > 1 else b


def _batch_block(B: int, T: int, G: int) -> Optional[int]:
    """Largest batch block that fits scoped VMEM, or None if none does.

    B<=64 at short T (the production shape) stays ONE block (grid=1,
    bit-identical to the ungridded round-2 kernel, no pipeline buffering).
    Larger batches cap at 32-row blocks (round-3 measurement: with a grid,
    Mosaic double-buffers every in/out block, so 64-row blocks blew the
    limit at B=128).  Long T shrinks the block further — the kernel holds
    full (T, BB, .) tensors in VMEM, so its footprint is linear in T; when
    even the smallest divisor block does not fit (e.g. T=512 towers),
    return None and the caller falls back to the XLA scan."""
    cap = B if B <= 64 else 32
    for bb in range(cap, 0, -1):
        if B % bb:
            continue
        # a gridded (BB, .) block whose sublane dim is not a multiple of 8
        # (and not the full array dim) is Mosaic tile-illegal — e.g. B=40 at
        # long T must not pick bb=20 (ADVICE r4)
        if bb != B and bb % 8:
            continue
        if _kernel_bytes(T, bb, G, B // bb) <= _VMEM_BUDGET:
            return bb
    return None


def fits_vmem(T: int, B: int, G: int) -> bool:
    """True if the whole-T fused kernel can run this shape inside scoped
    VMEM.  bilstm consults this (and `stream_geometry` below) before routing
    to the Pallas path (off-budget shapes take the XLA scan — correct at
    any T)."""
    return _batch_block(B, T, G) is not None


def single_block(T: int, B: int, G: int) -> bool:
    """True when the whole-T kernel runs ungridded (one batch block, no
    double-buffering).  Inference-only forwards should prefer the XLA scan
    at gridded geometries: the gridded Pallas GRU measured 2x slower on
    fwd-only at B=128 (benchmarks/RESULTS.md round-4 continuation)."""
    return _batch_block(B, T, G) == B


def _divisors_desc(n: int):
    return (d for d in range(n, 0, -1) if n % d == 0)


def _stream_overhead(BB: int, G: int, ngates: int) -> int:
    """Fixed streaming-kernel VMEM beyond the chunked blocks: h/c (or dh/dc)
    carry scratch + double-buffered boundary and final-state (BB, H) blocks
    (~8 rows of lane-padded H), plus w / dw_acc / dw at (H, lane-padded G)."""
    H = G // ngates
    return 4 * (8 * max(BB, 8) * _pad128(H) + 4 * H * _pad128(G))


def stream_geometry(T: int, B: int, G: int,
                    bytes_fn=None, ngates: int = 4) -> Optional[tuple]:
    """Geometry (BB, TC) for the STREAMING (time-chunked) kernel, or None.

    Used for long-T shapes where the whole-T kernel cannot hold the full
    (T, BB, .) tensors in scoped VMEM (the T>=256 towers that fell back to
    the XLA scan through round 4).  The grid is (B//BB, T//TC) with time as
    the minor — sequential — dimension; h/c are carried across time chunks
    in VMEM scratch, so only one (TC, BB, .) chunk of every tensor is
    resident (double-buffered: Mosaic prefetches chunk j+1's x_proj/dys
    while chunk j computes — the recurrence is sequential in compute but
    its HBM traffic pipelines).

    BB is maximized first: batch blocks run serially on the sequential TPU
    grid, so total recurrence latency scales with (B/BB)*T cell steps.  TC
    then takes the largest divisor of T that fits the double-buffered
    budget (min 8 to amortize per-chunk pipeline overhead; TC == T is the
    whole-T kernel's job).
    """
    bytes_fn = bytes_fn or _kernel_bytes
    if T < 16:
        return None
    for bb in _divisors_desc(B):
        if bb != B and bb % 8:
            continue  # Mosaic tile rule (gridded sublane dim)
        for tc in _divisors_desc(T):
            if tc >= T or tc < 8:
                continue
            # n_blocks=2 applies the gridded double-buffer factor
            if (bytes_fn(tc, bb, G, 2) + _stream_overhead(bb, G, ngates)
                    <= _VMEM_BUDGET):
                return bb, tc
    return None


def _require_block(B: int, T: int, G: int) -> int:
    bb = _batch_block(B, T, G)
    if bb is None:
        raise ValueError(
            f"Pallas LSTM kernel cannot fit (T={T}, B={B}, G={G}) in scoped "
            f"VMEM at any batch block; callers must gate on fits_vmem() and "
            f"take the XLA scan path")
    return bb


def _whole_fwd_call(x_proj, w_hh_t, mask, reverse: bool):
    T, B, G = x_proj.shape
    H = G // 4
    BB = _require_block(B, T, G)
    kernel = functools.partial(_fwd_kernel, reverse=reverse)
    return pl.pallas_call(
        kernel,
        grid=(B // BB,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),   # ys
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),   # cs
            jax.ShapeDtypeStruct((B, H), jnp.float32),      # h_final
            jax.ShapeDtypeStruct((B, H), jnp.float32),      # c_final
        ),
        in_specs=[
            pl.BlockSpec((T, BB, G), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, BB, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(x_proj, w_hh_t, mask)


# ---------------------------------------------------------------------------
# Backward kernel (BPTT)
# ---------------------------------------------------------------------------


def _bwd_kernel(x_proj_ref, w_hh_t_ref, mask_ref, ys_ref, cs_ref,
                dys_ref, dh_fin_ref, dc_fin_ref,
                dx_ref, dw_ref, dw_acc, *, reverse: bool):
    T, B, G = x_proj_ref.shape
    H = G // 4
    w = w_hh_t_ref[:]                     # (H, G);  dh_prev = dgates @ (H,G)^T

    dw_acc[:] = jnp.zeros_like(dw_acc)

    def step(i, carry):
        dh, dc = carry                    # grads wrt h_t, c_t (post-mask)
        # iterate in REVERSE temporal order of the forward pass
        t = i if reverse else (T - 1 - i)
        prev_t = (t + 1) if reverse else (t - 1)
        first = (t == (T - 1)) if reverse else (t == 0)

        dh = dh + dys_ref[t]

        # jnp.where evaluates BOTH branches: prev_t must be clamped in range
        # or the boundary step reads ys_ref[-1]/ys_ref[T] out of bounds —
        # on real hardware that is a kernel fault that kills the TPU worker
        # (interpret mode silently wraps, which is why CPU tests pass).
        prev_t = jnp.clip(prev_t, 0, T - 1)
        h_prev = jnp.where(first, jnp.zeros((B, H), jnp.float32), ys_ref[prev_t])
        c_prev = jnp.where(first, jnp.zeros((B, H), jnp.float32), cs_ref[prev_t])

        dgates, dh_prev, dc_prev = _cell_bwd(
            x_proj_ref[t], mask_ref[t], h_prev, c_prev, w, dh, dc)
        dx_ref[t] = dgates
        # dW_hh^T accumulation: (H, G) += h_prev^T @ dgates
        dw_acc[:] += jnp.dot(h_prev.T, dgates, preferred_element_type=jnp.float32)
        return (dh_prev, dc_prev)

    dh0 = dh_fin_ref[:]
    dc0 = dc_fin_ref[:]
    jax.lax.fori_loop(0, T, step, (dh0, dc0))

    # dw is one shared output block across the (sequential) batch-block grid:
    # zero it on the first program, accumulate each block's contribution.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw_ref[:] += dw_acc[:]


def _whole_bwd_call(x_proj, w_hh_t, mask, ys, cs, dys, dh_fin, dc_fin,
                    reverse: bool):
    T, B, G = x_proj.shape
    H = G // 4
    BB = _require_block(B, T, G)
    kernel = functools.partial(_bwd_kernel, reverse=reverse)

    def bslice3(i):
        return (0, i, 0)

    return pl.pallas_call(
        kernel,
        grid=(B // BB,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, G), jnp.float32),   # dx_proj
            jax.ShapeDtypeStruct((H, G), jnp.float32),      # dw_hh_t
        ),
        in_specs=[
            pl.BlockSpec((T, BB, G), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, 1), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, H), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, H), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, H), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, BB, G), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((H, G), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, w_hh_t, mask, ys, cs, dys, dh_fin, dc_fin)


# ---------------------------------------------------------------------------
# Streaming (time-chunked) kernels — the long-T path
# ---------------------------------------------------------------------------
#
# The whole-T kernel holds full (T, BB, .) tensors in VMEM, so its footprint
# is linear in T and T>=256 towers fell back to the XLA scan through round 4
# (VERDICT r4 weak #2).  The streaming variant grids over (B//BB, T//TC) with
# time as the MINOR (sequential) grid dim and carries h/c across time chunks
# in VMEM scratch — the same revisited-block technique as the LayerNorm
# stats accumulator.  Only one (TC, BB, .) chunk of every tensor is resident
# (double-buffered: Mosaic prefetches chunk j+1 while chunk j computes, so
# the recurrence's HBM traffic pipelines even though compute is sequential).
# Replaces the cuDNN packed LSTM at long T (reference src/models.py:163-180).


def _stream_fwd_kernel(x_proj_ref, w_hh_t_ref, mask_ref, ys_ref, cs_ref,
                       h_fin_ref, c_fin_ref, h_scr, c_scr, *, reverse: bool):
    TC, BB, G = x_proj_ref.shape
    H = G // 4
    w = w_hh_t_ref[:]

    # first time chunk of this batch block: reset the carried state
    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    def step(i, carry):
        h, c = carry
        t = (TC - 1 - i) if reverse else i
        h, c = _cell_fwd(x_proj_ref[t], mask_ref[t], h, c, w)
        ys_ref[t] = h
        cs_ref[t] = c
        return (h, c)

    hT, cT = jax.lax.fori_loop(0, TC, step, (h_scr[:], c_scr[:]))
    h_scr[:] = hT
    c_scr[:] = cT
    # revisited (BB, H) output blocks: the final flush (last chunk of this
    # batch block) leaves the true final state in HBM
    h_fin_ref[:] = hT
    c_fin_ref[:] = cT


def _stream_fwd_call(x_proj, w_hh_t, mask, reverse: bool, BB: int, TC: int):
    T, B, G = x_proj.shape
    H = G // 4
    ntc = T // TC
    kernel = functools.partial(_stream_fwd_kernel, reverse=reverse)

    # chunk visit order follows the forward temporal processing order:
    # reverse=False walks chunks 0..ntc-1, reverse=True walks ntc-1..0
    if reverse:
        def tmap(i, j):
            return (ntc - 1 - j, i, 0)
    else:
        def tmap(i, j):
            return (j, i, 0)

    return pl.pallas_call(
        kernel,
        grid=(B // BB, ntc),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),   # ys
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),   # cs
            jax.ShapeDtypeStruct((B, H), jnp.float32),      # h_final
            jax.ShapeDtypeStruct((B, H), jnp.float32),      # c_final
        ),
        in_specs=[
            pl.BlockSpec((TC, BB, G), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, 1), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TC, BB, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((BB, H), jnp.float32),
                        pltpu.VMEM((BB, H), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, w_hh_t, mask)


def _stream_bwd_kernel(x_proj_ref, w_hh_t_ref, mask_ref, ys_ref, cs_ref,
                       hb_ref, cb_ref, dys_ref, dh_fin_ref, dc_fin_ref,
                       dx_ref, dw_ref, dw_acc, dh_scr, dc_scr,
                       *, reverse: bool):
    TC, BB, G = x_proj_ref.shape
    H = G // 4
    w = w_hh_t_ref[:]

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    # first processed chunk of this batch block: seed the BPTT carries from
    # the incoming final-state cotangents
    @pl.when(pl.program_id(1) == 0)
    def _():
        dh_scr[:] = dh_fin_ref[:]
        dc_scr[:] = dc_fin_ref[:]

    dw_acc[:] = jnp.zeros_like(dw_acc)

    def step(i, carry):
        dh, dc = carry
        # local step in REVERSE of the forward temporal processing order
        t = i if reverse else (TC - 1 - i)
        prev_t = (t + 1) if reverse else (t - 1)
        boundary = (t == (TC - 1)) if reverse else (t == 0)

        dh = dh + dys_ref[t]

        # clamp: jnp.where evaluates both branches (hardware-fault lesson)
        prev_tc = jnp.clip(prev_t, 0, TC - 1)
        # at the chunk edge the previous state lives in the NEIGHBOR chunk —
        # it arrives via the hb/cb boundary inputs (gathered in XLA from the
        # saved ys/cs; zeros at the sequence edge)
        h_prev = jnp.where(boundary, hb_ref[0], ys_ref[prev_tc])
        c_prev = jnp.where(boundary, cb_ref[0], cs_ref[prev_tc])

        dgates, dh_prev, dc_prev = _cell_bwd(
            x_proj_ref[t], mask_ref[t], h_prev, c_prev, w, dh, dc)
        dx_ref[t] = dgates
        dw_acc[:] += jnp.dot(h_prev.T, dgates,
                             preferred_element_type=jnp.float32)
        return (dh_prev, dc_prev)

    dh, dc = jax.lax.fori_loop(0, TC, step, (dh_scr[:], dc_scr[:]))
    dh_scr[:] = dh
    dc_scr[:] = dc
    dw_ref[:] += dw_acc[:]


def _stream_bwd_call(x_proj, w_hh_t, mask, ys, cs, dys, dh_fin, dc_fin,
                     reverse: bool, BB: int, TC: int):
    T, B, G = x_proj.shape
    H = G // 4
    ntc = T // TC
    kernel = functools.partial(_stream_bwd_kernel, reverse=reverse)

    # BPTT walks chunks in REVERSE of the forward processing order
    if reverse:
        def tmap(i, j):
            return (j, i, 0)

        def kmap(i, j):
            return (j, i, 0)
    else:
        def tmap(i, j):
            return (ntc - 1 - j, i, 0)

        def kmap(i, j):
            return (ntc - 1 - j, i, 0)

    hb, cb = _chunk_boundaries(ys, cs, TC, reverse)

    def bmap(i, j):
        return (i, 0)

    return pl.pallas_call(
        kernel,
        grid=(B // BB, ntc),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, G), jnp.float32),   # dx_proj
            jax.ShapeDtypeStruct((H, G), jnp.float32),      # dw_hh_t
        ),
        in_specs=[
            pl.BlockSpec((TC, BB, G), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, 1), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bmap, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TC, BB, G), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((H, G), jnp.float32),
                        pltpu.VMEM((BB, H), jnp.float32),
                        pltpu.VMEM((BB, H), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, w_hh_t, mask, ys, cs, hb, cb, dys, dh_fin, dc_fin)


def _chunk_boundaries(ys, cs, tc: int, reverse: bool):
    """Per-chunk previous states for the streaming backward, gathered in XLA
    from the saved state sequences (cheap static strided slices — no extra
    kernel outputs).  hb[k]/cb[k] = the state entering chunk k in forward
    temporal processing order; zeros at the sequence edge."""
    zero = jnp.zeros((1,) + ys.shape[1:], ys.dtype)
    if reverse:
        # forward processed t = T-1..0: chunk k's first step t=(k+1)*tc-1
        # consumed the state after step (k+1)*tc
        hb = jnp.concatenate([ys[tc::tc], zero], axis=0)
        cb = jnp.concatenate([cs[tc::tc], zero], axis=0)
    else:
        # chunk k's first step t=k*tc consumed the state after step k*tc-1
        hb = jnp.concatenate([zero, ys[tc - 1:-1:tc]], axis=0)
        cb = jnp.concatenate([zero, cs[tc - 1:-1:tc]], axis=0)
    return hb, cb


# ---------------------------------------------------------------------------
# Dispatch (whole-T kernel when it fits, streaming at long T)
# ---------------------------------------------------------------------------

# Testing hook: force the streaming path with an explicit (BB, TC) geometry
# so equivalence tests can exercise it at small interpret-friendly shapes.
_FORCE_STREAM_GEOM: Optional[tuple] = None


def set_force_stream(geom: Optional[tuple]) -> None:
    global _FORCE_STREAM_GEOM
    _FORCE_STREAM_GEOM = geom


def _route(T: int, B: int, G: int):
    """('whole', BB) | ('stream', (BB, TC)).  Raises when neither fits —
    callers must gate on kernelizable() and take the XLA scan path.

    Preference order (every branch hardware-measured, RESULTS.md round-5):
      1. whole-T UNGRIDDED (bb == B) — best at short T (headline shapes).
      2. at long T (>=256): streaming when it keeps a WIDER batch block
         than the gridded whole-T kernel.  Gridded whole-T serializes
         B/bb batch blocks on the sequential grid, each a full T-step
         scan — B/bb times the recurrence latency.  This mis-route was
         found by the round-5 GRU T=256 "anomaly": whole-T bb=8 measured
         10.4 ms where the XLA scan runs 5.7 (both variant orders agreed);
         T=512, where whole-T no longer fits and streaming engages, won
         by -53%.
      3. gridded whole-T (bb < B) — still the measured TRAINING win at
         short T (B=128/T=48: -13% vs the XLA scan, round-4 continuation);
         kept for T < 256 pending a streaming A/B at that shape.
    """
    if _FORCE_STREAM_GEOM is not None:
        return ("stream", _FORCE_STREAM_GEOM)
    bb = _batch_block(B, T, G)
    if bb == B:
        return ("whole", bb)
    geom = stream_geometry(T, B, G)
    if geom is not None and T >= 256 and (bb is None or geom[0] > bb):
        return ("stream", geom)
    if bb is not None:
        return ("whole", bb)
    if geom is not None:
        return ("stream", geom)
    raise ValueError(
        f"Pallas LSTM kernel cannot fit (T={T}, B={B}, G={G}) in scoped "
        f"VMEM as whole-T or time-chunked; callers must gate on "
        f"kernelizable() and take the XLA scan path")


def kernelizable(T: int, B: int, G: int) -> bool:
    """True if ANY Pallas LSTM path (whole-T or streaming) can run this
    shape.  The training-path routing gate in models/bilstm.py."""
    if _FORCE_STREAM_GEOM is not None:
        return True
    return fits_vmem(T, B, G) or stream_geometry(T, B, G) is not None


def _fwd_call(x_proj, w_hh_t, mask, reverse: bool):
    T, B, G = x_proj.shape
    mode, geom = _route(T, B, G)
    if mode == "whole":
        return _whole_fwd_call(x_proj, w_hh_t, mask, reverse)
    return _stream_fwd_call(x_proj, w_hh_t, mask, reverse, *geom)


def _bwd_call(x_proj, w_hh_t, mask, ys, cs, dys, dh_fin, dc_fin,
              reverse: bool):
    T, B, G = x_proj.shape
    mode, geom = _route(T, B, G)
    if mode == "whole":
        return _whole_bwd_call(x_proj, w_hh_t, mask, ys, cs, dys,
                               dh_fin, dc_fin, reverse)
    return _stream_bwd_call(x_proj, w_hh_t, mask, ys, cs, dys,
                            dh_fin, dc_fin, reverse, *geom)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_scan(x_proj, w_hh_t, mask, reverse: bool = False):
    """Masked LSTM recurrence over time-major inputs.

    Args:
      x_proj: (T, B, 4H) precomputed x@W_ih^T + b_ih + b_hh, fp32.
      w_hh_t: (H, 4H) recurrent weight, TRANSPOSED (hidden-major), fp32.
      mask:   (T, B, 1) fp32 validity mask.
      reverse: process t = T-1..0 (backward direction of a bi-LSTM).
    Returns:
      ys: (T, B, H) hidden states (carry-held at masked steps).
      h_final: (B, H) state at each sequence's true length.
    """
    ys, cs, h_fin, c_fin = _fwd_call(x_proj, w_hh_t, mask, reverse)
    return ys, h_fin


def _lstm_scan_fwd(x_proj, w_hh_t, mask, reverse):
    ys, cs, h_fin, c_fin = _fwd_call(x_proj, w_hh_t, mask, reverse)
    return (ys, h_fin), (x_proj, w_hh_t, mask, ys, cs)


def _lstm_scan_bwd(reverse, res, grads):
    x_proj, w_hh_t, mask, ys, cs = res
    dys, dh_fin = grads
    dc_fin = jnp.zeros_like(dh_fin)
    dx, dw = _bwd_call(x_proj, w_hh_t, mask, ys, cs, dys, dh_fin, dc_fin, reverse)
    return dx, dw, None


lstm_scan.defvjp(_lstm_scan_fwd, _lstm_scan_bwd)


# ---------------------------------------------------------------------------
# Enable/interpret plumbing
# ---------------------------------------------------------------------------

_FORCE_INTERPRET = False


def _interpret() -> bool:
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() not in ("tpu",)


def set_force_interpret(value: bool) -> None:
    """Testing hook: run kernels in interpreter mode even off-TPU."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value
