"""Packed-sequence parity: masked-scan bi-RNN vs torch nn.LSTM/nn.GRU with
pack_padded_sequence (the subtle hard part, SURVEY.md §7 hard part #1;
reference semantics at src/models.py:163-180)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

import jax
import jax.numpy as jnp

from mmda_tpu.models import bilstm

RNG = np.random.default_rng(7)


def _copy_params_to_jax(rnn: nn.Module) -> dict:
    """Extract torch RNN weights into our {'fwd','bwd'} param dict."""
    out = {}
    for name, suffix in (("fwd", ""), ("bwd", "_reverse")):
        out[name] = {
            "w_ih": jnp.array(getattr(rnn, f"weight_ih_l0{suffix}").detach().numpy()),
            "w_hh": jnp.array(getattr(rnn, f"weight_hh_l0{suffix}").detach().numpy()),
            "b_ih": jnp.array(getattr(rnn, f"bias_ih_l0{suffix}").detach().numpy()),
            "b_hh": jnp.array(getattr(rnn, f"bias_hh_l0{suffix}").detach().numpy()),
        }
    return out


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_birnn_matches_torch_packed(cell):
    torch.manual_seed(0)
    B, T, F, H = 5, 11, 9, 6
    x = RNG.normal(size=(B, T, F)).astype(np.float32)
    lengths = np.array([11, 3, 7, 1, 9])

    rnn_cls = nn.LSTM if cell == "lstm" else nn.GRU
    rnn = rnn_cls(F, H, bidirectional=True)

    # torch packed path (time-major like the reference)
    xt = torch.tensor(x).permute(1, 0, 2)
    packed = pack_padded_sequence(xt, torch.tensor(lengths), enforce_sorted=False)
    if cell == "lstm":
        packed_out, (final_h, _) = rnn(packed)
    else:
        packed_out, final_h = rnn(packed)
    padded_out, _ = pad_packed_sequence(packed_out, total_length=T)
    want_out = padded_out.detach().numpy().transpose(1, 0, 2)     # (B, T, 2H)
    want_h = (
        torch.cat([final_h[0], final_h[1]], dim=1).detach().numpy()
    )  # (B, 2H) [fwd, bwd]

    params = _copy_params_to_jax(rnn)
    got_out, got_h = bilstm.birnn(params, jnp.array(x), jnp.array(lengths), cell)

    # XLA's tanh differs from libm tanh by ~1e-5 relative; the error compounds
    # through the scan, so tolerances are set above that floor (verified the
    # per-step math is exact modulo tanh).
    np.testing.assert_allclose(np.asarray(got_h), want_h, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_out), want_out, rtol=2e-3, atol=2e-3)


def test_extract_features_matches_reference_composition():
    """Full rnn1 -> LayerNorm -> rnn2 utterance pipeline vs a torch
    re-derivation of src/models.py:163-180,203-213."""
    torch.manual_seed(1)
    B, T, F, H = 4, 8, 5, 3
    x = RNG.normal(size=(B, T, F)).astype(np.float32)
    lengths = np.array([8, 2, 5, 6])

    rnn1 = nn.LSTM(F, H, bidirectional=True)
    rnn2 = nn.LSTM(2 * H, H, bidirectional=True)
    ln = nn.LayerNorm(2 * H)

    xt = torch.tensor(x).permute(1, 0, 2)
    lt = torch.tensor(lengths)
    packed = pack_padded_sequence(xt, lt, enforce_sorted=False)
    packed_h1, (final_h1, _) = rnn1(packed)
    padded_h1, _ = pad_packed_sequence(packed_h1)
    normed_h1 = ln(padded_h1)
    packed_normed = pack_padded_sequence(normed_h1, lt, enforce_sorted=False)
    _, (final_h2, _) = rnn2(packed_normed)
    want = (
        torch.cat((final_h1, final_h2), dim=2)
        .permute(1, 0, 2)
        .contiguous()
        .view(B, -1)
        .detach()
        .numpy()
    )

    params = {
        "rnn1": _copy_params_to_jax(rnn1),
        "rnn2": _copy_params_to_jax(rnn2),
        "ln": {
            "scale": jnp.array(ln.weight.detach().numpy()),
            "bias": jnp.array(ln.bias.detach().numpy()),
        },
    }
    got = bilstm.extract_features(params, jnp.array(x), jnp.array(lengths))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_rnn_params_shapes_and_orthogonality():
    p = bilstm.rnn_params(jax.random.PRNGKey(0), 9, 6, "lstm")
    assert p["fwd"]["w_ih"].shape == (24, 9)
    assert p["bwd"]["w_hh"].shape == (24, 6)
    # orthogonal rows: W W^T approx I on the smaller dimension
    w = np.asarray(p["fwd"]["w_hh"])  # (24, 6)
    gram = w.T @ w
    np.testing.assert_allclose(gram, np.eye(6), atol=1e-4)


def test_birnn_is_jittable_and_grad_flows():
    p = bilstm.extractor_params(jax.random.PRNGKey(0), 5, 4)
    x = jnp.array(RNG.normal(size=(3, 7, 5)).astype(np.float32))
    lengths = jnp.array([7, 4, 2])

    @jax.jit
    def f(p, x):
        return jnp.sum(bilstm.extract_features(p, x, lengths) ** 2)

    g = jax.grad(f)(p, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_fused_birnn_matches_two_scan_path(cell):
    """The single-scan fused-direction path must match the two-scan path
    (values AND grads) — it is the default production path."""
    p = bilstm.rnn_params(jax.random.PRNGKey(3), 9, 6, cell)
    x = jnp.array(RNG.normal(size=(4, 11, 9)).astype(np.float32))
    lengths = jnp.array([11, 7, 1, 5])

    ys_ref, h_ref = bilstm.birnn(p, x, lengths, cell, fused=False)
    ys_fused, h_fused = bilstm.birnn(p, x, lengths, cell, fused=True)
    np.testing.assert_allclose(np.asarray(ys_fused), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(p, fused):
        ys, h = bilstm.birnn(p, x, lengths, cell, fused=fused)
        return jnp.sum(ys**2) + jnp.sum(h * h[::-1])

    g_ref = jax.grad(loss)(p, False)
    g_fused = jax.grad(loss)(p, True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g_fused, g_ref)
