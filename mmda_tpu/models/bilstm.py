"""Masked bidirectional LSTM/GRU with packed-sequence semantics, TPU-first.

Replaces the reference's cuDNN `nn.LSTM` + `pack_padded_sequence` stack
(reference src/models.py:39-55,163-180).  Instead of packing, we run over
fixed-length padded batches with explicit length masking - the idiomatic XLA
formulation (static shapes; one compile).

Parity contract (verified against torch in tests/test_bilstm.py):
  * final hidden state of each direction == state at each sequence's true
    length, exactly like packed sequences;
  * per-timestep outputs inside the valid region match packed outputs;
  * `extract_features` reproduces the reference utterance construction
    (src/models.py:163-180,203-213): rnn1 -> LayerNorm -> rnn2, utterance =
    [h1_fwd, h2_fwd, h1_bwd, h2_bwd] concat -> (B, 4H).

TPU performance notes:
  * The input projection x @ W_ih^T (the bulk of the FLOPs) is hoisted out of
    the scan into ONE (B*T, in) x (in, 4H) matmul that XLA tiles onto the MXU.
    Only the small h @ W_hh^T recurrence stays inside `lax.scan`.
  * The cell state is kept in float32 even when activations are bfloat16
    (LSTM numerics; SURVEY.md hard part #1).
  * A fused Pallas kernel for the recurrence lives in ops/pallas/lstm.py and is
    used when enabled; this module is the always-correct XLA path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# LayerNorm shared with the rest of the model zoo (torch parity: eps=1e-5)
from mmda_tpu.models.common import layer_norm, layer_norm_params  # noqa: F401


# ---------------------------------------------------------------------------
# Parameter initialization (torch-parity)
# ---------------------------------------------------------------------------


def _uniform(key, shape, k):
    return jax.random.uniform(key, shape, jnp.float32, -k, k)


def _orthogonal(key, shape):
    return jax.nn.initializers.orthogonal()(key, shape, jnp.float32)


def rnn_params(
    key,
    input_size: int,
    hidden_size: int,
    cell: str = "lstm",
    bidirectional: bool = True,
    orthogonal_hh: bool = True,
) -> Dict:
    """Init parameters matching torch nn.LSTM/nn.GRU defaults: every tensor
    uniform(-1/sqrt(H), 1/sqrt(H)), then weight_hh re-initialized orthogonal as
    the reference Solver does (src/solver.py:78-79).

    Gate layout follows torch: LSTM [i, f, g, o]; GRU [r, z, n].
    """
    ngates = 4 if cell == "lstm" else 3
    k = 1.0 / np.sqrt(hidden_size)
    dirs = ["fwd", "bwd"] if bidirectional else ["fwd"]
    params = {}
    keys = jax.random.split(key, len(dirs) * 4)
    for d, name in enumerate(dirs):
        k_ih, k_hh, k_bih, k_bhh = keys[4 * d : 4 * d + 4]
        w_hh = (
            _orthogonal(k_hh, (ngates * hidden_size, hidden_size))
            if orthogonal_hh
            else _uniform(k_hh, (ngates * hidden_size, hidden_size), k)
        )
        params[name] = {
            "w_ih": _uniform(k_ih, (ngates * hidden_size, input_size), k),
            "w_hh": w_hh,
            "b_ih": _uniform(k_bih, (ngates * hidden_size,), k),
            "b_hh": _uniform(k_bhh, (ngates * hidden_size,), k),
        }
    return params


# ---------------------------------------------------------------------------
# Cells (pure step functions on (B, *) carries)
# ---------------------------------------------------------------------------


def _lstm_step(h, c, x_proj, w_hh_t):
    """One LSTM step.  x_proj already contains x@W_ih^T + b_ih + b_hh."""
    gates = x_proj + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _gru_step(h, x_proj_ih, b_hh, w_hh_t):
    """One GRU step.  torch semantics: n = tanh(x_n + b_in + r*(h@W_hn + b_hn)).
    x_proj_ih contains x@W_ih^T + b_ih only (b_hh handled here because of r)."""
    hh = jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32) + b_hh
    xr, xz, xn = jnp.split(x_proj_ih, 3, axis=-1)
    hr, hz, hn = jnp.split(hh, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h
    return h_new


# ---------------------------------------------------------------------------
# Masked directional scans
# ---------------------------------------------------------------------------


def _scan_direction(p, x, mask, cell: str, reverse: bool,
                    use_pallas: Optional[bool] = None):
    """Run one direction over (B, T, F) input.

    mask: (B, T) 1.0 where t < length.  Masked steps hold the carry, which
    yields packed-sequence semantics:
      * forward: the carry freezes at t == len-1, so the final carry is the
        state at the true length;
      * reverse: steps with t >= len keep the zero init, so the reverse pass
        effectively starts at each sequence's last valid token.

    Returns (outputs (B, T, H), final_h (B, H)).
    """
    B, T, _ = x.shape
    H = p["w_hh"].shape[1]
    f32 = jnp.float32

    # Hoist the big matmul out of the scan: (B*T, F) @ (F, G*H) on the MXU.
    x_proj = jnp.dot(
        x.reshape(B * T, -1), p["w_ih"].T.astype(x.dtype),
        preferred_element_type=f32,
    ).reshape(B, T, -1) + p["b_ih"].astype(f32)
    if cell == "lstm":
        x_proj = x_proj + p["b_hh"].astype(f32)

    x_proj = jnp.swapaxes(x_proj, 0, 1)          # (T, B, G*H) time-major scan
    m = jnp.swapaxes(mask, 0, 1)[..., None].astype(f32)  # (T, B, 1)
    w_hh_t = p["w_hh"].T.astype(f32)

    if use_pallas is None:
        from mmda_tpu.ops import pallas as pallas_flags

        use_pallas = pallas_flags.is_enabled()
    if use_pallas and cell == "lstm":
        from mmda_tpu.ops.pallas.lstm import lstm_scan

        ys, hT = lstm_scan(x_proj.astype(f32), w_hh_t, m, reverse)
        return jnp.swapaxes(ys, 0, 1), hT

    h0 = jnp.zeros((B, H), f32)

    if cell == "lstm":
        def step(carry, inp):
            h, c = carry
            xp, mm = inp
            h_new, c_new = _lstm_step(h, c, xp, w_hh_t)
            h = mm * h_new + (1.0 - mm) * h
            c = mm * c_new + (1.0 - mm) * c
            return (h, c), h

        (hT, _), ys = jax.lax.scan(step, (h0, jnp.zeros((B, H), f32)),
                                   (x_proj, m), reverse=reverse)
    else:
        b_hh = p["b_hh"].astype(f32)

        def step(h, inp):
            xp, mm = inp
            h_new = _gru_step(h, xp, b_hh, w_hh_t)
            h = mm * h_new + (1.0 - mm) * h
            return h, h

        hT, ys = jax.lax.scan(step, h0, (x_proj, m), reverse=reverse)

    return jnp.swapaxes(ys, 0, 1), hT            # (B, T, H), (B, H)


def birnn(
    params: Dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    cell: str = "lstm",
    zero_masked_outputs: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional masked RNN.

    Args:
      params: {'fwd': {...}, 'bwd': {...}} from `rnn_params`.
      x: (B, T, F) padded inputs.
      lengths: (B,) true lengths.
    Returns:
      outputs: (B, T, 2H) [fwd; bwd] per timestep (zeros at pads when
        zero_masked_outputs, matching pad_packed_sequence).
      final_h: (B, 2H) [fwd_final; bwd_final] - packed final-state semantics.
    """
    B, T, _ = x.shape
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    ys_f, h_f = _scan_direction(params["fwd"], x, mask, cell, reverse=False)
    ys_b, h_b = _scan_direction(params["bwd"], x, mask, cell, reverse=True)
    ys = jnp.concatenate([ys_f, ys_b], axis=-1)
    if zero_masked_outputs:
        ys = ys * mask[..., None]
    return ys, jnp.concatenate([h_f, h_b], axis=-1)




# ---------------------------------------------------------------------------
# Stacked 2-layer extractor (reference extract_features parity)
# ---------------------------------------------------------------------------


def extractor_params(key, input_size: int, hidden_size: int, cell: str = "lstm") -> Dict:
    """Two stacked bidirectional RNNs + inter-layer LayerNorm, mirroring
    trnn1/trnn2 etc. (src/models.py:48-55) and tlayer_norm (src/models.py:155-157).
    rnn2 input = 2*hidden (bidirectional rnn1 output)."""
    k1, k2 = jax.random.split(key)
    return {
        "rnn1": rnn_params(k1, input_size, hidden_size, cell),
        "rnn2": rnn_params(k2, 2 * hidden_size, hidden_size, cell),
        "ln": layer_norm_params(2 * hidden_size),
    }


def extract_features(
    params: Dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    cell: str = "lstm",
) -> jnp.ndarray:
    """Reference `extract_features` + utterance concat (src/models.py:163-180,
    203-213): rnn1 -> LayerNorm(padded outputs) -> rnn2; utterance vector is
    cat((final_h1, final_h2), feature).permute -> [h1_f, h2_f, h1_b, h2_b],
    shape (B, 4H)."""
    ys1, h1 = birnn(params["rnn1"], x, lengths, cell)
    ys1 = layer_norm(params["ln"], ys1)
    _, h2 = birnn(params["rnn2"], ys1, lengths, cell)
    H = h1.shape[-1] // 2
    h1_f, h1_b = h1[:, :H], h1[:, H:]
    h2_f, h2_b = h2[:, :H], h2[:, H:]
    return jnp.concatenate([h1_f, h2_f, h1_b, h2_b], axis=-1)
