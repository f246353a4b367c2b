"""Fused masked-GRU recurrence as a Pallas TPU kernel (fwd + BPTT bwd).

Extends the Pallas recurrence family (ops/pallas/lstm.py) to the other
`cfg.rnncell` choice: the reference supports GRU towers via the same cuDNN
stack it uses for LSTM (reference src/models.py:39-55 picks nn.GRU when
rnncell != 'lstm'); here the same hoisted-matmul split applies — the big
x @ W_ih^T projection stays outside in XLA, and this kernel fuses the
sequential part (one launch for the whole T loop, h held in VMEM).

torch GRU semantics (the parity contract, tests/test_bilstm.py):
    r = sigmoid(x_r + h @ W_hr^T + b_hr)
    z = sigmoid(x_z + h @ W_hz^T + b_hz)
    n = tanh  (x_n + r * (h @ W_hn^T + b_hn))
    h' = (1 - z) * n + z * h
Unlike the LSTM, b_hh cannot be folded into x_proj (it sits inside the
r * (.) gate), so the kernel takes it separately and emits its gradient.

The backward recomputes the gates from the saved h sequence (no gate
storage), mirroring the LSTM BPTT kernel; dW_hh^T and db_hh accumulate in
VMEM scratch across the (sequential) batch-block grid.

Equivalence vs the XLA scan path: tests/test_pallas_gru.py (interpret mode
on CPU); Mosaic-lowering legality: tests/test_tpu_lowering.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmda_tpu.ops.pallas.lstm import (_interpret, _pad128, _VMEM_BUDGET,
                                      stream_geometry as _lstm_stream_geometry)


# ---------------------------------------------------------------------------
# Cell math (shared by the whole-T and streaming kernels)
# ---------------------------------------------------------------------------


def _cell_fwd(xp, m, h, w, b):
    """One masked GRU step (torch gate order [r, z, n]; b_hh applied inside
    the r gate).  Carry-held at m==0."""
    H = h.shape[-1]
    hh = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
    r = jax.nn.sigmoid(xp[:, :H] + hh[:, :H])
    z = jax.nn.sigmoid(xp[:, H:2 * H] + hh[:, H:2 * H])
    n = jnp.tanh(xp[:, 2 * H:] + r * hh[:, 2 * H:])
    h_new = (1.0 - z) * n + z * h
    return m * h_new + (1.0 - m) * h


def _cell_bwd(xp, m, h_prev, w, b, dh):
    """One BPTT step (gates recomputed).  Returns (dgx, dgh, dh_prev): the
    x_proj pre-activation grad, the h@W_hh+b_hh pre-activation grad (r-scaled
    in the n lane), and the carry grad."""
    H = h_prev.shape[-1]
    hh = jnp.dot(h_prev, w, preferred_element_type=jnp.float32) + b
    hn = hh[:, 2 * H:]
    r = jax.nn.sigmoid(xp[:, :H] + hh[:, :H])
    z = jax.nn.sigmoid(xp[:, H:2 * H] + hh[:, H:2 * H])
    n = jnp.tanh(xp[:, 2 * H:] + r * hn)

    # unmask: forward did h_t = m*h_new + (1-m)*h_prev
    dh_new = m * dh
    dh_pass = (1.0 - m) * dh

    # h_new = (1-z)*n + z*h_prev
    dz = dh_new * (h_prev - n)
    dn = dh_new * (1.0 - z)
    dpre_n = dn * (1.0 - n * n)           # grad at tanh pre-activation
    dr = dpre_n * hn
    dhn = dpre_n * r                      # grad at h@W_hn + b_hn
    dpre_r = dr * r * (1.0 - r)
    dpre_z = dz * z * (1.0 - z)

    # x_proj receives the raw pre-activation grads [r, z, n]
    dgx = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=1)   # (B, G)
    # hh receives the same for r/z but r-scaled for n
    dgh = jnp.concatenate([dpre_r, dpre_z, dhn], axis=1)      # (B, G)

    dh_prev = (jnp.dot(dgh, w.T, preferred_element_type=jnp.float32)
               + dh_new * z + dh_pass)
    return dgx, dgh, dh_prev


# ---------------------------------------------------------------------------
# VMEM footprint gate (same calibrated model as lstm.py, GRU resident set)
# ---------------------------------------------------------------------------


def _kernel_bytes(T: int, BB: int, G: int, n_blocks: int) -> int:
    """Scoped-VMEM footprint of one (T, BB, .) batch block.  The binding
    BACKWARD holds x_proj + dx at lane-padded G and ys + dys at lane-padded
    H (= G/3) plus a 128-lane mask row for the whole T extent; gridded
    launches double-buffer every blocked ref (lstm.py calibration notes)."""
    H = G // 3
    per_row = 2 * _pad128(G) + 2 * _pad128(H) + 128
    b = 4 * T * max(BB, 8) * per_row
    return b * 2 if n_blocks > 1 else b


def _batch_block(B: int, T: int, G: int) -> Optional[int]:
    cap = B if B <= 64 else 32
    for bb in range(cap, 0, -1):
        if B % bb:
            continue
        # Mosaic tile rule: gridded sublane dims must be multiples of 8
        # unless they equal the array dim (ADVICE r4; see lstm._batch_block)
        if bb != B and bb % 8:
            continue
        if _kernel_bytes(T, bb, G, B // bb) <= _VMEM_BUDGET:
            return bb
    return None


def fits_vmem(T: int, B: int, G: int) -> bool:
    """True if the fused GRU kernel fits scoped VMEM at this shape; callers
    (bilstm._scan_direction / birnn) fall back to the XLA scan otherwise."""
    return _batch_block(B, T, G) is not None


def _require_block(B: int, T: int, G: int) -> int:
    bb = _batch_block(B, T, G)
    if bb is None:
        raise ValueError(
            f"Pallas GRU kernel cannot fit (T={T}, B={B}, G={G}) in scoped "
            f"VMEM at any batch block; callers must gate on fits_vmem() and "
            f"take the XLA scan path")
    return bb


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_proj_ref, w_hh_t_ref, b_hh_ref, mask_ref,
                ys_ref, h_fin_ref, *, reverse: bool):
    T, B, G = x_proj_ref.shape
    H = G // 3
    w = w_hh_t_ref[:]                     # (H, G)
    b = b_hh_ref[:]                       # (1, G)

    def step(i, h):
        t = (T - 1 - i) if reverse else i
        h = _cell_fwd(x_proj_ref[t], mask_ref[t], h, w, b)
        ys_ref[t] = h
        return h

    h0 = jnp.zeros((B, H), jnp.float32)
    hT = jax.lax.fori_loop(0, T, step, h0)
    h_fin_ref[:] = hT


def _whole_fwd_call(x_proj, w_hh_t, b_hh, mask, reverse: bool):
    T, B, G = x_proj.shape
    H = G // 3
    BB = _require_block(B, T, G)
    kernel = functools.partial(_fwd_kernel, reverse=reverse)
    return pl.pallas_call(
        kernel,
        grid=(B // BB,),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),   # ys
            jax.ShapeDtypeStruct((B, H), jnp.float32),      # h_final
        ),
        in_specs=[
            pl.BlockSpec((T, BB, G), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, BB, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(x_proj, w_hh_t, b_hh, mask)


# ---------------------------------------------------------------------------
# Backward kernel (BPTT)
# ---------------------------------------------------------------------------


def _bwd_kernel(x_proj_ref, w_hh_t_ref, b_hh_ref, mask_ref, ys_ref,
                dys_ref, dh_fin_ref,
                dx_ref, dw_ref, db_ref, dw_acc, db_acc, *, reverse: bool):
    T, B, G = x_proj_ref.shape
    H = G // 3
    w = w_hh_t_ref[:]                     # (H, G)
    b = b_hh_ref[:]                       # (1, G)

    dw_acc[:] = jnp.zeros_like(dw_acc)
    db_acc[:] = jnp.zeros_like(db_acc)

    def step(i, dh):
        # iterate in REVERSE temporal order of the forward pass
        t = i if reverse else (T - 1 - i)
        prev_t = (t + 1) if reverse else (t - 1)
        first = (t == (T - 1)) if reverse else (t == 0)

        dh = dh + dys_ref[t]

        # jnp.where evaluates BOTH branches: clamp prev_t or the boundary
        # step reads ys_ref out of bounds (hardware kernel fault; interpret
        # mode wraps silently — lstm.py learned this on real TPUs).
        prev_t = jnp.clip(prev_t, 0, T - 1)
        h_prev = jnp.where(first, jnp.zeros((B, H), jnp.float32),
                           ys_ref[prev_t])

        dgx, dgh, dh_prev = _cell_bwd(
            x_proj_ref[t], mask_ref[t], h_prev, w, b, dh)
        dx_ref[t] = dgx
        dw_acc[:] += jnp.dot(h_prev.T, dgh, preferred_element_type=jnp.float32)
        db_acc[:] += jnp.sum(dgh, axis=0, keepdims=True)
        return dh_prev

    dh0 = dh_fin_ref[:]
    jax.lax.fori_loop(0, T, step, dh0)

    # dw/db are shared output blocks across the (sequential) batch-block
    # grid: zero on the first program, accumulate each block's contribution.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] += dw_acc[:]
    db_ref[:] += db_acc[:]


def _whole_bwd_call(x_proj, w_hh_t, b_hh, mask, ys, dys, dh_fin,
                    reverse: bool):
    T, B, G = x_proj.shape
    H = G // 3
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
            jax.ShapeDtypeStruct((1, G), jnp.float32),      # db_hh
        ),
        in_specs=[
            pl.BlockSpec((T, BB, G), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, 1), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, H), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BB, H), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, BB, G), bslice3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((H, G), jnp.float32),
                        pltpu.VMEM((1, G), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, w_hh_t, b_hh, mask, ys, dys, dh_fin)


# ---------------------------------------------------------------------------
# Streaming (time-chunked) kernels — the long-T path (see lstm.py notes)
# ---------------------------------------------------------------------------


def _stream_fwd_kernel(x_proj_ref, w_hh_t_ref, b_hh_ref, mask_ref,
                       ys_ref, h_fin_ref, h_scr, *, reverse: bool):
    TC, BB, G = x_proj_ref.shape
    w = w_hh_t_ref[:]
    b = b_hh_ref[:]

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    def step(i, h):
        t = (TC - 1 - i) if reverse else i
        h = _cell_fwd(x_proj_ref[t], mask_ref[t], h, w, b)
        ys_ref[t] = h
        return h

    hT = jax.lax.fori_loop(0, TC, step, h_scr[:])
    h_scr[:] = hT
    h_fin_ref[:] = hT


def _stream_fwd_call(x_proj, w_hh_t, b_hh, mask, reverse: bool,
                     BB: int, TC: int):
    T, B, G = x_proj.shape
    H = G // 3
    ntc = T // TC
    kernel = functools.partial(_stream_fwd_kernel, reverse=reverse)

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
            jax.ShapeDtypeStruct((B, H), jnp.float32),      # h_final
        ),
        in_specs=[
            pl.BlockSpec((TC, BB, G), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, 1), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TC, BB, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((BB, H), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, w_hh_t, b_hh, mask)


def _stream_bwd_kernel(x_proj_ref, w_hh_t_ref, b_hh_ref, mask_ref, ys_ref,
                       hb_ref, dys_ref, dh_fin_ref,
                       dx_ref, dw_ref, db_ref, dw_acc, db_acc, dh_scr,
                       *, reverse: bool):
    TC, BB, G = x_proj_ref.shape
    w = w_hh_t_ref[:]
    b = b_hh_ref[:]

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dh_scr[:] = dh_fin_ref[:]

    dw_acc[:] = jnp.zeros_like(dw_acc)
    db_acc[:] = jnp.zeros_like(db_acc)

    def step(i, dh):
        # local step in REVERSE of the forward temporal processing order
        t = i if reverse else (TC - 1 - i)
        prev_t = (t + 1) if reverse else (t - 1)
        boundary = (t == (TC - 1)) if reverse else (t == 0)

        dh = dh + dys_ref[t]

        prev_tc = jnp.clip(prev_t, 0, TC - 1)  # both where-branches evaluate
        h_prev = jnp.where(boundary, hb_ref[0], ys_ref[prev_tc])

        dgx, dgh, dh_prev = _cell_bwd(
            x_proj_ref[t], mask_ref[t], h_prev, w, b, dh)
        dx_ref[t] = dgx
        dw_acc[:] += jnp.dot(h_prev.T, dgh,
                             preferred_element_type=jnp.float32)
        db_acc[:] += jnp.sum(dgh, axis=0, keepdims=True)
        return dh_prev

    dh = jax.lax.fori_loop(0, TC, step, dh_scr[:])
    dh_scr[:] = dh
    dw_ref[:] += dw_acc[:]
    db_ref[:] += db_acc[:]


def _stream_bwd_call(x_proj, w_hh_t, b_hh, mask, ys, dys, dh_fin,
                     reverse: bool, BB: int, TC: int):
    T, B, G = x_proj.shape
    H = G // 3
    ntc = T // TC
    kernel = functools.partial(_stream_bwd_kernel, reverse=reverse)

    # BPTT walks chunks in REVERSE of the forward processing order
    if reverse:
        def tmap(i, j):
            return (j, i, 0)
    else:
        def tmap(i, j):
            return (ntc - 1 - j, i, 0)

    from mmda_tpu.ops.pallas.lstm import _chunk_boundaries
    hb, _ = _chunk_boundaries(ys, ys, TC, reverse)

    return pl.pallas_call(
        kernel,
        grid=(B // BB, ntc),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, G), jnp.float32),   # dx_proj
            jax.ShapeDtypeStruct((H, G), jnp.float32),      # dw_hh_t
            jax.ShapeDtypeStruct((1, G), jnp.float32),      # db_hh
        ),
        in_specs=[
            pl.BlockSpec((TC, BB, G), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, 1), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, BB, H), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TC, BB, G), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((H, G), jnp.float32),
                        pltpu.VMEM((1, G), jnp.float32),
                        pltpu.VMEM((BB, H), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, w_hh_t, b_hh, mask, ys, hb, dys, dh_fin)


# ---------------------------------------------------------------------------
# Dispatch (whole-T kernel when it fits, streaming at long T)
# ---------------------------------------------------------------------------

_FORCE_STREAM_GEOM: Optional[tuple] = None


def set_force_stream(geom: Optional[tuple]) -> None:
    """Testing hook: force the streaming path with an explicit (BB, TC)."""
    global _FORCE_STREAM_GEOM
    _FORCE_STREAM_GEOM = geom


def stream_geometry(T: int, B: int, G: int) -> Optional[tuple]:
    """(BB, TC) for the streaming GRU kernel, or None (lstm.py docs)."""
    return _lstm_stream_geometry(T, B, G, bytes_fn=_kernel_bytes, ngates=3)


def single_block(T: int, B: int, G: int) -> bool:
    """True when the whole-T kernel runs ungridded — the geometry where the
    Pallas GRU wins on inference-only forward too (see lstm.single_block)."""
    return _batch_block(B, T, G) == B


def kernelizable(T: int, B: int, G: int) -> bool:
    """True if ANY Pallas GRU path (whole-T or streaming) fits this shape."""
    if _FORCE_STREAM_GEOM is not None:
        return True
    return fits_vmem(T, B, G) or stream_geometry(T, B, G) is not None


def _route(T: int, B: int, G: int):
    """Same preference order as lstm._route (see its docstring): ungridded
    whole-T first; at T>=256 prefer streaming over a NARROWER gridded
    whole-T block (the round-5 GRU T=256 mis-route: whole-T bb=8 serialized
    4 batch blocks x 256 steps and measured 10.4 ms vs the XLA scan's 5.7 —
    the GRU's 3-gate footprint let whole-T 'fit' where the LSTM's would
    not, which is why only the GRU hit this); gridded whole-T otherwise."""
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
        f"Pallas GRU kernel cannot fit (T={T}, B={B}, G={G}) in scoped "
        f"VMEM as whole-T or time-chunked; callers must gate on "
        f"kernelizable() and take the XLA scan path")


def _fwd_call(x_proj, w_hh_t, b_hh, mask, reverse: bool):
    T, B, G = x_proj.shape
    mode, geom = _route(T, B, G)
    if mode == "whole":
        return _whole_fwd_call(x_proj, w_hh_t, b_hh, mask, reverse)
    return _stream_fwd_call(x_proj, w_hh_t, b_hh, mask, reverse, *geom)


def _bwd_call(x_proj, w_hh_t, b_hh, mask, ys, dys, dh_fin, reverse: bool):
    T, B, G = x_proj.shape
    mode, geom = _route(T, B, G)
    if mode == "whole":
        return _whole_bwd_call(x_proj, w_hh_t, b_hh, mask, ys, dys,
                               dh_fin, reverse)
    return _stream_bwd_call(x_proj, w_hh_t, b_hh, mask, ys, dys,
                            dh_fin, reverse, *geom)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_scan(x_proj, w_hh_t, b_hh, mask, reverse: bool = False):
    """Masked GRU recurrence over time-major inputs.

    Args:
      x_proj: (T, B, 3H) precomputed x@W_ih^T + b_ih (b_hh NOT folded), fp32.
      w_hh_t: (H, 3H) recurrent weight, TRANSPOSED (hidden-major), fp32.
      b_hh:   (1, 3H) recurrent bias (enters inside the r gate), fp32.
      mask:   (T, B, 1) fp32 validity mask.
      reverse: process t = T-1..0 (backward direction of a bi-GRU).
    Returns:
      ys: (T, B, H) hidden states (carry-held at masked steps).
      h_final: (B, H) state at each sequence's true length.
    """
    ys, h_fin = _fwd_call(x_proj, w_hh_t, b_hh, mask, reverse)
    return ys, h_fin


def _gru_scan_fwd(x_proj, w_hh_t, b_hh, mask, reverse):
    ys, h_fin = _fwd_call(x_proj, w_hh_t, b_hh, mask, reverse)
    return (ys, h_fin), (x_proj, w_hh_t, b_hh, mask, ys)


def _gru_scan_bwd(reverse, res, grads):
    x_proj, w_hh_t, b_hh, mask, ys = res
    dys, dh_fin = grads
    dx, dw, db = _bwd_call(x_proj, w_hh_t, b_hh, mask, ys, dys, dh_fin,
                           reverse)
    return dx, dw, db, None


gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)
