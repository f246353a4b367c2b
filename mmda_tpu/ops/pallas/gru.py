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

from mmda_tpu.ops.pallas.lstm import _interpret, _pad128, _VMEM_BUDGET


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
        xp = x_proj_ref[t]                # (B, G): x@W_ih^T + b_ih
        m = mask_ref[t]                   # (B, 1)
        hh = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        r = jax.nn.sigmoid(xp[:, :H] + hh[:, :H])
        z = jax.nn.sigmoid(xp[:, H:2 * H] + hh[:, H:2 * H])
        n = jnp.tanh(xp[:, 2 * H:] + r * hh[:, 2 * H:])
        h_new = (1.0 - z) * n + z * h
        h = m * h_new + (1.0 - m) * h
        ys_ref[t] = h
        return h

    h0 = jnp.zeros((B, H), jnp.float32)
    hT = jax.lax.fori_loop(0, T, step, h0)
    h_fin_ref[:] = hT


def _fwd_call(x_proj, w_hh_t, b_hh, mask, reverse: bool):
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
        m = mask_ref[t]                   # (B, 1)

        # jnp.where evaluates BOTH branches: clamp prev_t or the boundary
        # step reads ys_ref out of bounds (hardware kernel fault; interpret
        # mode wraps silently — lstm.py learned this on real TPUs).
        prev_t = jnp.clip(prev_t, 0, T - 1)
        h_prev = jnp.where(first, jnp.zeros((B, H), jnp.float32),
                           ys_ref[prev_t])

        # recompute gates at step t
        xp = x_proj_ref[t]
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
        dpre_n = dn * (1.0 - n * n)       # grad at tanh pre-activation
        dr = dpre_n * hn
        dhn = dpre_n * r                  # grad at h@W_hn + b_hn
        dpre_r = dr * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)

        # x_proj receives the raw pre-activation grads [r, z, n]
        dgx = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=1)   # (B, G)
        # hh receives the same for r/z but r-scaled for n
        dgh = jnp.concatenate([dpre_r, dpre_z, dhn], axis=1)      # (B, G)

        dx_ref[t] = dgx
        dh_prev = (jnp.dot(dgh, w.T, preferred_element_type=jnp.float32)
                   + dh_new * z + dh_pass)
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


def _bwd_call(x_proj, w_hh_t, b_hh, mask, ys, dys, dh_fin, reverse: bool):
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
