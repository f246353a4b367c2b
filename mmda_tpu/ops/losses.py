"""Training losses, vectorized (no Python loops over classes).

Every loss reproduces the reference objective exactly (values verified against
torch in tests/test_losses.py):

  * `bce_sum_over_classes`  - cls loss: per-class BCE (batch mean) summed over the
    6 emotion columns (reference src/solver.py:373-385, criterion nn.BCELoss at
    :108).
  * `diff_loss` / `diff_loss_total` - DSN orthogonality loss
    (src/utils/functions.py:49-78) over the 6 pairs used at src/solver.py:422-441.
  * `cmd_loss` / `cmd_loss_total` - central moment discrepancy, k=5 moments
    (src/utils/functions.py:80-109), averaged over the 3 shared pairs
    (src/solver.py:409-420).
  * `domain_loss` - adversarial domain CE with true labels t=0,v=1,a=2
    (src/solver.py:388-407).
  * `recon_loss_total` - MSE averaged over 3 modalities (src/solver.py:443-449).
  * `conf_loss` - ConfidNet loss (src/solver.py:451-462).  The reference applies
    torch CrossEntropyLoss to a 1-D (batch,) vector with float targets, i.e.
    soft-target CE *over the batch axis* - a live bug we replicate behaviorally
    by default and fix behind `fix=True` (see SURVEY.md hard part #4).
  * `mse`, `simse` - utility losses (src/utils/functions.py:24-46).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Classification loss
# ---------------------------------------------------------------------------


def bce(probs, targets):
    """torch.nn.BCELoss(reduction='mean') on probabilities.

    torch clamps each log term at -100; reproduced for exact parity.
    """
    p = probs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 0.0)), -100.0)
    return -jnp.mean(t * log_p + (1.0 - t) * log_1p)


def bce_sum_over_classes(scores, labels):
    """Per-class BCE (mean over batch), summed over classes.

    scores/labels: (B, C).  Equals the reference loop at src/solver.py:381-384.
    """
    p = scores.astype(jnp.float32)
    t = labels.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 0.0)), -100.0)
    per_class = -jnp.mean(t * log_p + (1.0 - t) * log_1p, axis=0)  # (C,)
    return jnp.sum(per_class)


# ---------------------------------------------------------------------------
# DiffLoss (orthogonality between representations)
# ---------------------------------------------------------------------------


def diff_loss(x1, x2):
    """DSN difference loss (src/utils/functions.py:49-78).

    Zero-mean over the batch, L2-normalize rows with a *detached* norm
    (stop_gradient) + 1e-6, then mean of squared Gram matrix x1^T x2.
    """
    b = x1.shape[0]
    x1 = jnp.nan_to_num(x1.reshape(b, -1).astype(jnp.float32))
    x2 = jnp.nan_to_num(x2.reshape(b, -1).astype(jnp.float32))
    x1 = x1 - jnp.mean(x1, axis=0, keepdims=True)
    x2 = x2 - jnp.mean(x2, axis=0, keepdims=True)
    n1 = jax.lax.stop_gradient(jnp.linalg.norm(x1, axis=1, keepdims=True))
    n2 = jax.lax.stop_gradient(jnp.linalg.norm(x2, axis=1, keepdims=True))
    x1 = x1 / (n1 + 1e-6)
    x2 = x2 / (n2 + 1e-6)
    gram = x1.T @ x2
    return jnp.mean(gram ** 2)


def diff_loss_total(private_t, private_v, private_a, shared_t, shared_v, shared_a):
    """Sum over the 6 pairs the reference uses (src/solver.py:431-439)."""
    return (
        diff_loss(private_t, shared_t)
        + diff_loss(private_v, shared_v)
        + diff_loss(private_a, shared_a)
        + diff_loss(private_a, private_t)
        + diff_loss(private_a, private_v)
        + diff_loss(private_t, private_v)
    )


# ---------------------------------------------------------------------------
# CMD (central moment discrepancy)
# ---------------------------------------------------------------------------


def _matchnorm(a, b):
    # sqrt(sum((a-b)^2)) computed as sum**0.5 like the reference (:99-104)
    return jnp.sum((a - b) ** 2) ** 0.5


def cmd_loss(x1, x2, n_moments: int = 5):
    """Central Moment Discrepancy (src/utils/functions.py:80-109)."""
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    m1 = jnp.mean(x1, axis=0)
    m2 = jnp.mean(x2, axis=0)
    s1 = x1 - m1
    s2 = x2 - m2
    out = _matchnorm(m1, m2)
    for k in range(2, n_moments + 1):
        out = out + _matchnorm(jnp.mean(s1 ** k, axis=0), jnp.mean(s2 ** k, axis=0))
    return out


def cmd_loss_total(shared_t, shared_v, shared_a, n_moments: int = 5):
    """Average over the 3 shared pairs, in the reference's order
    (src/solver.py:415-418: (t,v) + (t,a) + (a,v), / 3)."""
    loss = (
        cmd_loss(shared_t, shared_v, n_moments)
        + cmd_loss(shared_t, shared_a, n_moments)
        + cmd_loss(shared_a, shared_v, n_moments)
    )
    return loss / 3.0


# ---------------------------------------------------------------------------
# Domain-adversarial loss (used when use_cmd_sim=False)
# ---------------------------------------------------------------------------


def softmax_cross_entropy_int(logits, labels):
    """torch.nn.CrossEntropyLoss(reduction='mean') with integer labels."""
    logz = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logz, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def domain_loss(domain_t, domain_v, domain_a):
    """CE over stacked (3B, 3) domain logits with labels t=0, v=1, a=2
    (src/solver.py:399-407)."""
    logits = jnp.concatenate([domain_t, domain_v, domain_a], axis=0)
    b = domain_t.shape[0]
    labels = jnp.concatenate(
        [jnp.zeros(b, jnp.int32), jnp.ones(b, jnp.int32), jnp.full(b, 2, jnp.int32)]
    )
    return softmax_cross_entropy_int(logits, labels)


# ---------------------------------------------------------------------------
# Reconstruction loss
# ---------------------------------------------------------------------------


def mse(pred, real):
    """Mean squared error (torch nn.MSELoss(reduction='mean'))."""
    d = real.astype(jnp.float32) - pred.astype(jnp.float32)
    return jnp.mean(d ** 2)


def simse(pred, real):
    """Scale-invariant MSE (src/utils/functions.py:36-46)."""
    d = real.astype(jnp.float32) - pred.astype(jnp.float32)
    n = d.size
    return jnp.sum(d) ** 2 / (n ** 2)


def recon_loss_total(recon_t, orig_t, recon_v, orig_v, recon_a, orig_a):
    """MSE averaged over 3 modalities (src/solver.py:445-448)."""
    return (mse(recon_t, orig_t) + mse(recon_v, orig_v) + mse(recon_a, orig_a)) / 3.0


# ---------------------------------------------------------------------------
# ConfidNet confidence loss
# ---------------------------------------------------------------------------


def conf_loss(pred, truth, tcp, fix: bool = False, eps: float = 1e-8):
    """ConfidNet loss (src/solver.py:451-462).

    pred, truth, tcp: (B, C) with C classes (C=6).

    Reference behavior (fix=False), per class c:
      tcp_term_c = MSE(tcp[:,c], truth[:,c]*pred[:,c]) / count_nonzero(truth[:,c])
      mcp_term_c = SoftCE(pred[:,c], truth[:,c])       / count_nonzero(truth[:,c])
    where SoftCE treats the (B,) column as unbatched logits over B "classes":
      SoftCE(x, t) = -sum(t * log_softmax(x)).
    This batch-axis CE is a live bug in the reference, replicated for parity.
    Hazard: count_nonzero==0 -> division by zero; the reference inherits
    inf/nan.  We clamp the denominator with `eps` only when fix=True.

    Fixed behavior (fix=True): standard per-class BCE-with-probs for mcp and a
    count-guarded tcp term.
    """
    pred = pred.astype(jnp.float32)
    truth = truth.astype(jnp.float32)
    tcp = tcp.astype(jnp.float32)

    counts = jnp.sum(truth != 0.0, axis=0).astype(jnp.float32)  # (C,)

    tcp_mse = jnp.mean((tcp - truth * pred) ** 2, axis=0)  # (C,)

    if fix:
        denom = jnp.maximum(counts, 1.0)
        log_p = jnp.maximum(jnp.log(jnp.maximum(pred, eps)), -100.0)
        log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - pred, eps)), -100.0)
        mcp = -jnp.mean(truth * log_p + (1.0 - truth) * log_1p, axis=0)
        return jnp.sum(tcp_mse / denom) + jnp.sum(mcp / denom)

    # Faithful reproduction (may produce inf when a class has no positives,
    # exactly like the reference).
    logz = jax.nn.log_softmax(pred, axis=0)          # softmax over the BATCH axis
    soft_ce = -jnp.sum(truth * logz, axis=0)         # (C,)
    return jnp.sum(tcp_mse / counts) + jnp.sum(soft_ce / counts)
