"""Loss parity tests: mmda_tpu losses vs fresh torch implementations of the
reference formulas (src/utils/functions.py, src/solver.py:373-462).

torch here is a *test oracle only* - it never appears in the framework itself.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from mmda_tpu.ops import losses
from mmda_tpu.ops.functions import reverse_grad, binarize, masked_mean

RNG = np.random.default_rng(0)


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def test_bce_sum_over_classes_matches_torch():
    scores = RNG.uniform(0.01, 0.99, size=(17, 6)).astype(np.float32)
    labels = (RNG.uniform(size=(17, 6)) > 0.5).astype(np.float32)
    # reference: transpose to (C, B), accumulate BCELoss per class (solver.py:379-384)
    crit = nn.BCELoss(reduction="mean")
    ps, ls = _t(scores).permute(1, 0), _t(labels).permute(1, 0)
    want = sum(crit(ps[i], ls[i]) for i in range(6)).item()
    got = float(losses.bce_sum_over_classes(jnp.array(scores), jnp.array(labels)))
    assert np.isclose(got, want, rtol=1e-5)


def test_diff_loss_matches_torch():
    x1 = RNG.normal(size=(13, 32)).astype(np.float32)
    x2 = RNG.normal(size=(13, 32)).astype(np.float32)

    def torch_diff(a, b):
        a = torch.nan_to_num(a)
        b = torch.nan_to_num(b)
        a = a - a.mean(0, keepdim=True)
        b = b - b.mean(0, keepdim=True)
        an = torch.norm(a, p=2, dim=1, keepdim=True).detach()
        bn = torch.norm(b, p=2, dim=1, keepdim=True).detach()
        a = a / (an + 1e-6)
        b = b / (bn + 1e-6)
        return torch.mean((a.t().mm(b)).pow(2)).item()

    want = torch_diff(_t(x1), _t(x2))
    got = float(losses.diff_loss(jnp.array(x1), jnp.array(x2)))
    assert np.isclose(got, want, rtol=1e-5)


def test_diff_loss_gradient_respects_detached_norm():
    # the L2 norms are detached in the reference; check grads flow only through
    # the numerator
    x1 = torch.tensor(RNG.normal(size=(5, 8)).astype(np.float32), requires_grad=True)
    x2 = torch.tensor(RNG.normal(size=(5, 8)).astype(np.float32))

    a = x1 - x1.mean(0, keepdim=True)
    b = x2 - x2.mean(0, keepdim=True)
    an = torch.norm(a, p=2, dim=1, keepdim=True).detach()
    bn = torch.norm(b, p=2, dim=1, keepdim=True).detach()
    loss_t = torch.mean(((a / (an + 1e-6)).t().mm(b / (bn + 1e-6))).pow(2))
    loss_t.backward()

    g = jax.grad(lambda a_: losses.diff_loss(a_, jnp.array(x2.numpy())))(
        jnp.array(x1.detach().numpy())
    )
    np.testing.assert_allclose(np.asarray(g), x1.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_cmd_matches_torch():
    x1 = RNG.uniform(size=(11, 16)).astype(np.float32)
    x2 = RNG.uniform(size=(11, 16)).astype(np.float32)

    def torch_cmd(a, b, n_moments=5):
        m1, m2 = a.mean(0), b.mean(0)
        s1, s2 = a - m1, b - m2

        def matchnorm(u, v):
            return (torch.sum(torch.pow(u - v, 2))) ** 0.5

        out = matchnorm(m1, m2)
        for i in range(n_moments - 1):
            k = i + 2
            out = out + matchnorm(torch.mean(s1 ** k, 0), torch.mean(s2 ** k, 0))
        return out.item()

    want = torch_cmd(_t(x1), _t(x2))
    got = float(losses.cmd_loss(jnp.array(x1), jnp.array(x2), 5))
    assert np.isclose(got, want, rtol=1e-5)


def test_domain_loss_matches_torch():
    dt = RNG.normal(size=(9, 3)).astype(np.float32)
    dv = RNG.normal(size=(9, 3)).astype(np.float32)
    da = RNG.normal(size=(9, 3)).astype(np.float32)
    pred = torch.cat([_t(dt), _t(dv), _t(da)], dim=0)
    true = torch.cat(
        [torch.zeros(9, dtype=torch.long), torch.ones(9, dtype=torch.long),
         torch.full((9,), 2, dtype=torch.long)]
    )
    want = nn.CrossEntropyLoss(reduction="mean")(pred, true).item()
    got = float(losses.domain_loss(jnp.array(dt), jnp.array(dv), jnp.array(da)))
    assert np.isclose(got, want, rtol=1e-5)


def test_recon_and_simse_match_torch():
    p = RNG.normal(size=(7, 12)).astype(np.float32)
    r = RNG.normal(size=(7, 12)).astype(np.float32)
    want = nn.MSELoss(reduction="mean")(_t(p), _t(r)).item()
    assert np.isclose(float(losses.mse(jnp.array(p), jnp.array(r))), want, rtol=1e-5)

    d = _t(r) - _t(p)
    want_simse = (d.sum() ** 2 / d.numel() ** 2).item()
    assert np.isclose(float(losses.simse(jnp.array(p), jnp.array(r))), want_simse, rtol=1e-5)


def test_conf_loss_matches_torch_reference_semantics():
    # replicate src/solver.py:451-462 exactly, including the batch-axis CE bug
    pred = RNG.uniform(0.05, 0.95, size=(10, 6)).astype(np.float32)
    truth = (RNG.uniform(size=(10, 6)) > 0.4).astype(np.float32)
    tcp = RNG.uniform(size=(10, 6)).astype(np.float32)

    loss_tcp = nn.MSELoss(reduction="mean")
    loss_mcp = nn.CrossEntropyLoss(reduction="mean")
    pt, tt, ct = _t(pred).permute(1, 0), _t(truth).permute(1, 0), _t(tcp).permute(1, 0)
    want = 0.0
    for i in range(6):
        want += torch.div(loss_tcp(ct[i], tt[i] * pt[i]), torch.count_nonzero(tt[i]))
        want += torch.div(loss_mcp(pt[i], tt[i]), torch.count_nonzero(tt[i]))
    want = want.item()
    got = float(losses.conf_loss(jnp.array(pred), jnp.array(truth), jnp.array(tcp)))
    assert np.isclose(got, want, rtol=1e-4)


def test_conf_loss_fixed_is_finite_on_empty_class():
    pred = RNG.uniform(0.05, 0.95, size=(8, 6)).astype(np.float32)
    truth = np.zeros((8, 6), np.float32)  # no positives anywhere
    tcp = RNG.uniform(size=(8, 6)).astype(np.float32)
    got = float(losses.conf_loss(jnp.array(pred), jnp.array(truth), jnp.array(tcp), fix=True))
    assert np.isfinite(got)


def test_reverse_grad():
    x = jnp.array(RNG.normal(size=(4, 3)).astype(np.float32))
    y, vjp = jax.vjp(lambda a: reverse_grad(a, 0.7), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    g = vjp(jnp.ones_like(x))[0]
    np.testing.assert_allclose(np.asarray(g), -0.7 * np.ones_like(x), rtol=1e-6)


def test_binarize_strict_greater():
    s = jnp.array([0.34, 0.35, 0.351, 0.9])
    np.testing.assert_array_equal(np.asarray(binarize(s, 0.35)), [0.0, 0.0, 1.0, 1.0])


def test_masked_mean_matches_torch_bert_pooling():
    x = RNG.normal(size=(3, 7, 5)).astype(np.float32)
    mask = np.zeros((3, 7), np.float32)
    mask[0, :4] = 1
    mask[1, :7] = 1
    mask[2, :2] = 1
    xt, mt = _t(x), _t(mask)
    masked = torch.mul(mt.unsqueeze(2), xt)
    want = (masked.sum(1) / mt.sum(1, keepdim=True)).numpy()
    got = np.asarray(masked_mean(jnp.array(x), jnp.array(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
