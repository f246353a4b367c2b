"""Lane-padded multi-direction LSTM recurrence as ONE Pallas TPU kernel.

Round-2 revisit of the fused LSTM (VERDICT.md next-round item #7).  The
round-1 kernel (ops/pallas/lstm.py) ran one direction per launch at the raw
hidden sizes (H=35/74), whose (B,H)x(H,4H) per-step matmuls land on awful
MXU lane geometry; it measured 0.4-0.9x vs the XLA scan.  This kernel fixes
both structural problems:

  * **Lane padding**: H is padded to 128 (one full MXU tile), so the per-step
    recurrence matmul is (B,128)x(128,512) — perfectly tiled.  Padded hidden
    units are provably inert: their gate pre-activations are 0 (zero-padded
    w_ih rows / w_hh rows+cols / biases), so i=f=o=0.5, g=0, giving
    c_pad = 0.5*c_pad -> stays 0 and h_pad = 0.5*tanh(0) = 0 forever; zero
    w_hh pad->real columns mean they never touch real units.
  * **Direction batching**: all D directional scans (2 towers x 2 directions
    at MISA sizes, reference src/models.py:48-55) run in one kernel launch as
    a grid over D, each program holding h/c in VMEM for its whole T loop —
    no per-step dispatch, no HBM round-trips for the carries.

Reverse directions are handled by the CALLER time-flipping x_proj and mask
(identical trick to models/bilstm.py::_birnn_fused — masked pad steps sit at
the front of the flipped sequence holding the zero carry), so the kernel
itself only ever scans t = 0..T-1.

Full custom_vjp: the backward kernel replays BPTT per direction in one
launch, recomputing gates from the saved (h, c) sequences and accumulating
dW_hh in VMEM scratch.  fp32 recurrence throughout (SURVEY.md hard part #1).

Equivalence is tested in interpret mode on CPU (tests/test_pallas_lstm.py);
TPU timing in benchmarks/bench_towers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmda_tpu.ops.pallas.lstm import _interpret

HP = 128            # padded hidden size: one full MXU tile
GP = 4 * HP


def _fwd_kernel(x_proj_ref, w_hh_t_ref, mask_ref, ys_ref, cs_ref, h_fin_ref):
    _, T, B, _ = x_proj_ref.shape
    w = w_hh_t_ref[0]                         # (HP, GP)

    def step(t, carry):
        h, c = carry
        gates = x_proj_ref[0, t] + jnp.dot(
            h, w, preferred_element_type=jnp.float32)
        ig = jax.nn.sigmoid(gates[:, :HP])
        fg = jax.nn.sigmoid(gates[:, HP:2 * HP])
        gg = jnp.tanh(gates[:, 2 * HP:3 * HP])
        og = jax.nn.sigmoid(gates[:, 3 * HP:])
        c_new = fg * c + ig * gg
        h_new = og * jnp.tanh(c_new)
        m = mask_ref[0, t]                    # (B, 1)
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        ys_ref[0, t] = h
        cs_ref[0, t] = c
        return (h, c)

    h0 = jnp.zeros((B, HP), jnp.float32)
    hT, _ = jax.lax.fori_loop(0, T, step, (h0, h0))
    h_fin_ref[0] = hT


def _bwd_kernel(x_proj_ref, w_hh_t_ref, mask_ref, ys_ref, cs_ref,
                dys_ref, dh_fin_ref, dx_ref, dw_ref, dw_acc):
    _, T, B, _ = x_proj_ref.shape
    w = w_hh_t_ref[0]                         # (HP, GP)
    dw_acc[:] = jnp.zeros_like(dw_acc)

    def step(i, carry):
        dh, dc = carry
        t = T - 1 - i
        dh = dh + dys_ref[0, t]
        m = mask_ref[0, t]

        zero = jnp.zeros((B, HP), jnp.float32)
        # both where-branches are evaluated: clamp so t=0 doesn't read [-1]
        # (an out-of-bounds VMEM access faults the TPU worker; interpret mode
        # wraps silently)
        pt = jnp.maximum(t - 1, 0)
        h_prev = jnp.where(t == 0, zero, ys_ref[0, pt])
        c_prev = jnp.where(t == 0, zero, cs_ref[0, pt])

        gates = x_proj_ref[0, t] + jnp.dot(
            h_prev, w, preferred_element_type=jnp.float32)
        ig = jax.nn.sigmoid(gates[:, :HP])
        fg = jax.nn.sigmoid(gates[:, HP:2 * HP])
        gg = jnp.tanh(gates[:, 2 * HP:3 * HP])
        og = jax.nn.sigmoid(gates[:, 3 * HP:])
        c_new = fg * c_prev + ig * gg
        tanh_c = jnp.tanh(c_new)

        dh_new = m * dh
        dc_new = m * dc
        dh_pass = (1.0 - m) * dh
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
        )                                      # (B, GP)

        dx_ref[0, t] = dgates
        dh_prev = jnp.dot(dgates, w.T, preferred_element_type=jnp.float32) + dh_pass
        dw_acc[:] += jnp.dot(h_prev.T, dgates, preferred_element_type=jnp.float32)
        return (dh_prev, dc_prev)

    dh0 = dh_fin_ref[0]
    jax.lax.fori_loop(0, T, step, (dh0, jnp.zeros((B, HP), jnp.float32)))
    dw_ref[0] = dw_acc[:]


def _fwd_call(x_proj, w_hh_t, mask):
    D, T, B, _ = x_proj.shape
    spec = lambda blk: pl.BlockSpec(blk, lambda d: (d,) + (0,) * (len(blk) - 1),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(D,),
        out_shape=(
            jax.ShapeDtypeStruct((D, T, B, HP), jnp.float32),   # ys
            jax.ShapeDtypeStruct((D, T, B, HP), jnp.float32),   # cs
            jax.ShapeDtypeStruct((D, B, HP), jnp.float32),      # h_final
        ),
        in_specs=[spec((1, T, B, GP)), spec((1, HP, GP)), spec((1, T, B, 1))],
        out_specs=(spec((1, T, B, HP)), spec((1, T, B, HP)), spec((1, B, HP))),
        interpret=_interpret(),
    )(x_proj, w_hh_t, mask)


def _bwd_call(x_proj, w_hh_t, mask, ys, cs, dys, dh_fin):
    D, T, B, _ = x_proj.shape
    spec = lambda blk: pl.BlockSpec(blk, lambda d: (d,) + (0,) * (len(blk) - 1),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(D,),
        out_shape=(
            jax.ShapeDtypeStruct((D, T, B, GP), jnp.float32),   # dx_proj
            jax.ShapeDtypeStruct((D, HP, GP), jnp.float32),     # dw_hh_t
        ),
        in_specs=[
            spec((1, T, B, GP)), spec((1, HP, GP)), spec((1, T, B, 1)),
            spec((1, T, B, HP)), spec((1, T, B, HP)),
            spec((1, T, B, HP)), spec((1, B, HP)),
        ],
        out_specs=(spec((1, T, B, GP)), spec((1, HP, GP))),
        scratch_shapes=[pltpu.VMEM((HP, GP), jnp.float32)],
        interpret=_interpret(),
    )(x_proj, w_hh_t, mask, ys, cs, dys, dh_fin)


@jax.custom_vjp
def lstm_scan_multi(x_proj, w_hh_t, mask):
    """D independent masked LSTM recurrences in one kernel launch.

    Args:
      x_proj: (D, T, B, GP) precomputed x@W_ih^T + b_ih + b_hh per direction,
        fp32, gate blocks [i|f|g|o] each lane-padded to HP=128.  Reverse
        directions must be time-flipped by the caller.
      w_hh_t: (D, HP, GP) recurrent weights, transposed + zero-padded.
      mask:   (D, T, B, 1) fp32 validity masks (flipped for reverse dirs).
    Returns:
      ys: (D, T, B, HP) hidden states; h_final: (D, B, HP).
    """
    ys, cs, h_fin = _fwd_call(x_proj, w_hh_t, mask)
    return ys, h_fin


def _multi_fwd(x_proj, w_hh_t, mask):
    ys, cs, h_fin = _fwd_call(x_proj, w_hh_t, mask)
    return (ys, h_fin), (x_proj, w_hh_t, mask, ys, cs)


def _multi_bwd(res, grads):
    x_proj, w_hh_t, mask, ys, cs = res
    dys, dh_fin = grads
    dx, dw = _bwd_call(x_proj, w_hh_t, mask, ys, cs, dys, dh_fin)
    return dx, dw, None


lstm_scan_multi.defvjp(_multi_fwd, _multi_bwd)


# ---------------------------------------------------------------------------
# Host-side packing: raw per-direction params -> padded kernel operands
# ---------------------------------------------------------------------------


def pack_directions(dirs):
    """Pack per-direction work items into the padded kernel operands.

    Args:
      dirs: list of D tuples (params, x, mask, reverse) where params has
        torch-layout w_ih (4H,F) / w_hh (4H,H) / b_ih / b_hh, x is (B, T, F)
        (F and H may differ per direction), mask is (B, T).
    Returns ((x_proj, w_hh_t, mask) kernel operands, true H per direction).
    """
    f32 = jnp.float32
    xp_list, w_list, m_list, hs = [], [], [], []
    for (p, x, mask, reverse) in dirs:
        B, T, _ = x.shape
        H = p["w_hh"].shape[1]
        hs.append(H)
        # hoisted input projection at the RAW size (one MXU matmul), then
        # scatter the 4 gate blocks into HP-padded lanes
        xp = jnp.dot(
            x.reshape(B * T, -1), p["w_ih"].T.astype(x.dtype),
            preferred_element_type=f32,
        ).reshape(B, T, 4, H) + (p["b_ih"] + p["b_hh"]).astype(f32).reshape(4, H)
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, HP - H)))
        xp = jnp.swapaxes(xp.reshape(B, T, GP), 0, 1)            # (T, B, GP)
        m = jnp.swapaxes(mask, 0, 1)[..., None].astype(f32)      # (T, B, 1)
        if reverse:
            xp = jnp.flip(xp, axis=0)
            m = jnp.flip(m, axis=0)
        xp_list.append(xp)
        m_list.append(m)
        # w_hh (4H, H): [gate, h_out, h_in] -> padded (h_in, gate*HP + h_out)
        w = p["w_hh"].astype(f32).reshape(4, H, H)
        w = jnp.pad(w, ((0, 0), (0, HP - H), (0, HP - H)))       # (4, HP, HP)
        w_list.append(jnp.transpose(w, (2, 0, 1)).reshape(HP, GP))
    return (jnp.stack(xp_list), jnp.stack(w_list), jnp.stack(m_list)), hs


def unpack_outputs(ys, h_fin, hs, reverses):
    """Slice padded kernel outputs back to per-direction true sizes.

    Returns lists of ys_d (B, T, H_d) (time-unflipped for reverse dirs) and
    h_d (B, H_d).
    """
    outs, finals = [], []
    for d, (H, reverse) in enumerate(zip(hs, reverses, strict=True)):
        y = ys[d][..., :H]                                      # (T, B, H)
        if reverse:
            y = jnp.flip(y, axis=0)
        outs.append(jnp.swapaxes(y, 0, 1))
        finals.append(h_fin[d][:, :H])
    return outs, finals
