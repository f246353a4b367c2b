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


def _use_kernel(cell: str, T: int, B: int, G: int, training: bool) -> bool:
    """The Pallas-vs-XLA recurrence routing decision (requires the global
    Pallas flag on; shape args are the kernel geometry).

    Training (fwd+bwd): any kernelizable geometry wins — whole-T when it
    fits scoped VMEM, else the streaming time-chunked kernel (long T).
    Inference (deterministic fwd-only): ONLY the ungridded single-block
    whole-T geometry — the gridded Pallas GRU measured 2x SLOWER on
    fwd-only at B=128 (1.444 vs 0.727 ms, benchmarks/RESULTS.md round-4
    continuation): with no backward to amortize the double-buffered block
    pipeline, the XLA scan is the better inference path.
    """
    if cell == "lstm":
        from mmda_tpu.ops.pallas import lstm as k
    else:
        from mmda_tpu.ops.pallas import gru as k
    if training:
        return k.kernelizable(T, B, G)
    return k.single_block(T, B, G)


def _scan_direction(p, x, mask, cell: str, reverse: bool,
                    use_pallas: Optional[bool] = None,
                    training: bool = True):
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
    # Whole-T kernel when it fits scoped VMEM, streaming time-chunked kernel
    # at long T (training only — see _use_kernel for the decision matrix).
    if use_pallas and _use_kernel(cell, T, B, x_proj.shape[-1], training):
        if cell == "lstm":
            from mmda_tpu.ops.pallas.lstm import lstm_scan

            ys, hT = lstm_scan(x_proj.astype(f32), w_hh_t, m, reverse)
        else:
            from mmda_tpu.ops.pallas.gru import gru_scan

            ys, hT = gru_scan(x_proj.astype(f32), w_hh_t,
                              p["b_hh"].astype(f32)[None, :], m, reverse)
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


# When True, the fused scan body is wrapped in jax.checkpoint: the backward
# pass recomputes the gates from the (h, c) carries instead of loading the
# saved per-step gate activations from HBM — the same trade the Pallas
# kernel's BPTT makes.  Measured on TPU (benchmarks/bench_towers.py): 1.714
# vs 1.663 ms tower-pair fwd+bwd — scan-bwd saves are NOT the cost, so the
# default is off (kept as a testing/ablation hook).
_SCAN_REMAT = False


def set_scan_remat(value: bool) -> None:
    global _SCAN_REMAT
    _SCAN_REMAT = bool(value)


def _birnn_fused(params: Dict, x: jnp.ndarray, mask: jnp.ndarray, cell: str):
    """Both directions in ONE lax.scan.

    TPU rationale: under lax.scan each timestep's recurrence matmul is tiny
    ((B,H)x(H,4H) with H=35/74) and the step cost is dominated by fixed
    per-iteration overhead, not FLOPs.  Running fwd+bwd as a leading batch
    dim of 2 (reverse direction on time-flipped inputs, so both advance
    t=0..T-1 together) halves the sequential step count; the two input
    projections merge into one (B*T, F) x (F, 2*4H) MXU matmul.

    Equivalence with the two-scan path: flipping x and mask along T and
    scanning forward is exactly the reverse scan — masked (padded) steps sit
    at the front of the flipped sequence where they hold the zero carry, so
    finals and per-step outputs match (tests/test_bilstm.py).
    """
    B, T, _ = x.shape
    H = params["fwd"]["w_hh"].shape[1]
    f32 = jnp.float32
    ngates = 4 if cell == "lstm" else 3
    G = ngates * H

    w_ih = jnp.concatenate(
        [params["fwd"]["w_ih"], params["bwd"]["w_ih"]], axis=0)     # (2G, F)
    b_ih = jnp.concatenate(
        [params["fwd"]["b_ih"], params["bwd"]["b_ih"]], axis=0)     # (2G,)
    if cell == "lstm":
        b_ih = b_ih + jnp.concatenate(
            [params["fwd"]["b_hh"], params["bwd"]["b_hh"]], axis=0)
    xp = jnp.dot(
        x.reshape(B * T, -1), w_ih.T.astype(x.dtype),
        preferred_element_type=f32,
    ).reshape(B, T, 2, G) + b_ih.astype(f32).reshape(2, G)
    xp = jnp.transpose(xp, (1, 2, 0, 3))                            # (T, 2, B, G)
    m = jnp.swapaxes(mask, 0, 1)[:, None, :, None].astype(f32)      # (T, 1, B, 1)
    xp = jnp.concatenate(
        [xp[:, :1], jnp.flip(xp[:, 1:], axis=0)], axis=1)           # flip bwd dir
    m = jnp.concatenate([m, jnp.flip(m, axis=0)], axis=1)           # (T, 2, B, 1)
    w_hh_t = jnp.stack(
        [params["fwd"]["w_hh"].T, params["bwd"]["w_hh"].T]).astype(f32)  # (2, H, G)

    # batched (2,B,H) x (2,H,G) -> (2,B,G)
    dn = (((2,), (1,)), ((0,), (0,)))

    maybe_remat = jax.checkpoint if _SCAN_REMAT else (lambda f: f)

    h0 = jnp.zeros((2, B, H), f32)
    if cell == "lstm":
        @maybe_remat
        def step(carry, inp):
            h, c = carry
            xpt, mm = inp
            gates = xpt + jax.lax.dot_general(
                h, w_hh_t, dn, preferred_element_type=f32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            h = mm * h_new + (1.0 - mm) * h
            c = mm * c_new + (1.0 - mm) * c
            return (h, c), h

        (hT, _), ys = jax.lax.scan(step, (h0, jnp.zeros((2, B, H), f32)), (xp, m))
    else:
        b_hh = jnp.stack(
            [params["fwd"]["b_hh"], params["bwd"]["b_hh"]]).astype(f32)[:, None, :]

        @maybe_remat
        def step(h, inp):
            xpt, mm = inp
            hh = jax.lax.dot_general(
                h, w_hh_t, dn, preferred_element_type=f32) + b_hh
            xr, xz, xn = jnp.split(xpt, 3, axis=-1)
            hr, hz, hn = jnp.split(hh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            h = mm * h_new + (1.0 - mm) * h
            return h, h

        hT, ys = jax.lax.scan(step, h0, (xp, m))

    ys_f = jnp.swapaxes(ys[:, 0], 0, 1)                             # (B, T, H)
    ys_b = jnp.swapaxes(jnp.flip(ys[:, 1], axis=0), 0, 1)
    return ys_f, ys_b, hT[0], hT[1]


def birnn(
    params: Dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    cell: str = "lstm",
    zero_masked_outputs: bool = True,
    fused: Optional[bool] = None,
    training: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional masked RNN.

    Args:
      params: {'fwd': {...}, 'bwd': {...}} from `rnn_params`.
      x: (B, T, F) padded inputs.
      lengths: (B,) true lengths.
      fused: run both directions in one lax.scan (default: yes, unless the
        Pallas kernel path is enabled, which owns its own scan).
      training: fwd+bwd vs deterministic fwd-only — routes the Pallas-vs-XLA
        recurrence decision (_use_kernel); shape-identical either way.
    Returns:
      outputs: (B, T, 2H) [fwd; bwd] per timestep (zeros at pads when
        zero_masked_outputs, matching pad_packed_sequence).
      final_h: (B, 2H) [fwd_final; bwd_final] - packed final-state semantics.
    """
    B, T, _ = x.shape
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    if fused is None:
        from mmda_tpu.ops import pallas as pallas_flags

        use_kernel = pallas_flags.is_enabled()
        if use_kernel:
            ngates = 4 if cell == "lstm" else 3
            use_kernel = _use_kernel(
                cell, T, B, ngates * params["fwd"]["w_hh"].shape[1], training)
        fused = not use_kernel
    if fused:
        ys_f, ys_b, h_f, h_b = _birnn_fused(params, x, mask, cell)
    else:
        ys_f, h_f = _scan_direction(params["fwd"], x, mask, cell,
                                    reverse=False, training=training)
        ys_b, h_b = _scan_direction(params["bwd"], x, mask, cell,
                                    reverse=True, training=training)
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
    training: bool = True,
) -> jnp.ndarray:
    """Reference `extract_features` + utterance concat (src/models.py:163-180,
    203-213): rnn1 -> LayerNorm(padded outputs) -> rnn2; utterance vector is
    cat((final_h1, final_h2), feature).permute -> [h1_f, h2_f, h1_b, h2_b],
    shape (B, 4H)."""
    ys1, h1 = birnn(params["rnn1"], x, lengths, cell, training=training)
    ys1 = layer_norm(params["ln"], ys1)
    _, h2 = birnn(params["rnn2"], ys1, lengths, cell, training=training)
    H = h1.shape[-1] // 2
    h1_f, h1_b = h1[:, :H], h1[:, H:]
    h2_f, h2_b = h2[:, :H], h2[:, H:]
    return jnp.concatenate([h1_f, h2_f, h1_b, h2_b], axis=-1)


# ---------------------------------------------------------------------------
# Two-tower extraction through the multi-direction Pallas kernel
# ---------------------------------------------------------------------------


def extract_features_pair(
    params_v: Dict,
    params_a: Dict,
    xv: jnp.ndarray,
    xa: jnp.ndarray,
    lengths_v: jnp.ndarray,
    lengths_a: jnp.ndarray,
    cell: str = "lstm",
    use_pallas_multi: Optional[bool] = None,
    training: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract the visual and acoustic utterance vectors together.

    With use_pallas_multi, ALL four directional recurrences of each stacked
    layer run in ONE lane-padded kernel launch (ops/pallas/lstm_multi.py) —
    2 launches replace 8 sequential scans.  Measured on TPU
    (benchmarks/bench_towers.py, MOSEI sizes): 1.449 ms tower-pair fwd+bwd vs
    1.295 ms for the per-direction kernel at raw H (ops/pallas/lstm.py) — the
    HP=128 padding FLOPs and the padded dx/ys/cs HBM traffic outweigh the
    launch savings, so this path is MEASURED-REJECTED as a default and kept
    reachable for re-evaluation at larger hidden sizes.  The default routes
    through `extract_features`, whose scans use the winning per-direction
    kernel when cfg.use_pallas is on (TPU) and the fused-direction XLA scan
    elsewhere.
    """
    if use_pallas_multi is None:
        use_pallas_multi = False
    if (not use_pallas_multi) or cell != "lstm" or xv.shape[:2] != xa.shape[:2]:
        return (
            extract_features(params_v, xv, lengths_v, cell, training=training),
            extract_features(params_a, xa, lengths_a, cell, training=training),
        )

    from mmda_tpu.ops.pallas import lstm_multi as lm

    B, T, _ = xv.shape
    mv = (jnp.arange(T)[None, :] < lengths_v[:, None]).astype(jnp.float32)
    ma = (jnp.arange(T)[None, :] < lengths_a[:, None]).astype(jnp.float32)
    reverses = [False, True, False, True]

    def run_layer(pv, pa, inp_v, inp_a):
        dirs = [
            (pv["fwd"], inp_v, mv, False), (pv["bwd"], inp_v, mv, True),
            (pa["fwd"], inp_a, ma, False), (pa["bwd"], inp_a, ma, True),
        ]
        ops, hs = lm.pack_directions(dirs)
        ys, h_fin = lm.lstm_scan_multi(*ops)
        outs, finals = lm.unpack_outputs(ys, h_fin, hs, reverses)
        ys_v = jnp.concatenate([outs[0], outs[1]], axis=-1) * mv[..., None]
        ys_a = jnp.concatenate([outs[2], outs[3]], axis=-1) * ma[..., None]
        h_v = jnp.concatenate([finals[0], finals[1]], axis=-1)
        h_a = jnp.concatenate([finals[2], finals[3]], axis=-1)
        return ys_v, ys_a, h_v, h_a

    ys1_v, ys1_a, h1_v, h1_a = run_layer(
        params_v["rnn1"], params_a["rnn1"], xv, xa)
    ys1_v = layer_norm(params_v["ln"], ys1_v)
    ys1_a = layer_norm(params_a["ln"], ys1_a)
    _, _, h2_v, h2_a = run_layer(
        params_v["rnn2"], params_a["rnn2"], ys1_v, ys1_a)

    def utterance(h1, h2):
        H = h1.shape[-1] // 2
        return jnp.concatenate(
            [h1[:, :H], h2[:, :H], h1[:, H:], h2[:, H:]], axis=-1)

    return utterance(h1_v, h2_v), utterance(h1_a, h2_a)
