"""Mixture-of-Experts FFN (Switch top-1 / GShard top-2) + expert parallelism.

Net-new capability with no reference counterpart (SoyeonHH/MMDA is dense
everywhere); built TPU-first per the Switch Transformer / GShard recipe:

- **Dense dispatch, static shapes.** Token->expert routing is expressed as
  two einsums against a (N, E, C) one-hot dispatch tensor instead of
  gather/scatter: every shape is static, XLA tiles the per-expert matmuls
  onto the MXU as one batched (E, C, H) x (E, H, F) contraction, and there
  is no data-dependent control flow inside jit.
- **Capacity factor.** Each expert processes at most
  C = ceil(capacity_factor * N / E) tokens; overflow tokens are dropped
  from the FFN (their residual path keeps them alive) — the standard
  static-shape trade.
- **Expert parallelism** rides the existing TP 'model' axis: the E-leading
  expert weights shard over 'model' (mesh.py::param_partition_specs) and an
  activation constraint on the (E, C, H) dispatched blocks
  (parallel/expert.py) lets XLA SPMD derive the all-to-all: each device
  routes its tokens' blocks to the device holding the chosen expert and
  back.  Same install/uninstall hook pattern as SP and PP.

Aux losses (returned, never hidden in globals):
- `balance`: E * sum_e(frac_tokens_e * mean_prob_e) — Switch load-balancing
  loss, = 1.0 at perfectly uniform routing.
- `router_z`: mean(logsumexp(logits)^2) — router z-loss for logit drift.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


# Hook installed by parallel/expert.py: fn((E, C, ...) array) -> same array
# with a sharding constraint on the leading expert axis.  None = no EP.
_EXPERT_CONSTRAINT = None


def set_expert_constraint(fn) -> None:
    global _EXPERT_CONSTRAINT
    _EXPERT_CONSTRAINT = fn


def init_moe_ffn_params(key, hidden: int, intermediate: int, num_experts: int,
                        std: float = 0.02) -> Dict:
    """Gate (H, E) + E stacked expert FFNs.  The E-leading stacking is what
    makes both the batched einsum and the EP sharding natural."""
    k_g, k_in, k_out = jax.random.split(key, 3)
    E, H, F = num_experts, hidden, intermediate
    return {
        "gate": {"kernel": jax.random.truncated_normal(
            k_g, -2, 2, (H, E), jnp.float32) * std},
        "w_in": jax.random.truncated_normal(
            k_in, -2, 2, (E, H, F), jnp.float32) * std,
        "b_in": jnp.zeros((E, F), jnp.float32),
        "w_out": jax.random.truncated_normal(
            k_out, -2, 2, (E, F, H), jnp.float32) * std,
        "b_out": jnp.zeros((E, H), jnp.float32),
    }


def switch_ffn(
    params: Dict,
    x: jnp.ndarray,                  # (N, H) tokens
    *,
    capacity_factor: float = 1.25,
    gelu_exact: bool = True,
    compute_dtype=jnp.bfloat16,
    groups: int = 1,
    top_k: int = 1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Top-k MoE FFN over N tokens (k=1 Switch, k=2 GShard).
    Returns (y (N, H), aux losses).

    Routing math in fp32 (standard: router numerics are precision-sensitive);
    expert matmuls in compute_dtype on the MXU.

    groups: GShard-style dispatch grouping.  The one-hot dispatch einsums
    cost ~capacity_factor * N^2 * H FLOPs ungrouped — quadratic in tokens.
    Routing G independent groups of n = N/G tokens (each with its own
    per-expert capacity C = ceil(cf * n / E)) cuts that by G while keeping
    every shape static; the expert GEMMs see the same (E, G*C, H) total
    work.  bert_layer groups by example (G = batch), the GShard convention.
    Capacity becomes per-group — overflow is decided within each group,
    which is the standard locality trade."""
    N, H = x.shape
    E = params["w_in"].shape[0]
    G = groups
    if N % G:
        raise ValueError(f"groups={G} must divide token count N={N}")
    if top_k not in (1, 2):
        raise ValueError(f"top_k must be 1 (Switch) or 2 (GShard), got {top_k}")
    n = N // G
    C = max(int(math.ceil(capacity_factor * top_k * n / E)), 1)

    xg = x.reshape(G, n, H)
    xf = xg.astype(jnp.float32)
    logits = jnp.einsum("gnh,he->gne", xf,
                        params["gate"]["kernel"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)                             # (G, n)
    gate_p = jnp.max(probs, axis=-1)                                # (G, n)

    onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)           # (G, n, E)

    def make_dispatch(oh, pos):
        """(G, n, E) one-hot + per-expert queue position -> (G, n, E, C)
        one-hot dispatch; over-capacity tokens are all-zero rows."""
        keep = oh * (pos < C)
        return keep[..., None] * jax.nn.one_hot(
            jnp.sum(pos * oh, axis=-1).astype(jnp.int32), C,
            dtype=jnp.float32)[:, :, None, :]

    # position of each token within its expert's per-group queue (0-based)
    pos1 = jnp.cumsum(onehot, axis=1) * onehot - onehot             # (G, n, E)
    dispatch = make_dispatch(onehot, pos1)
    if top_k == 1:
        combine = dispatch * gate_p[..., None, None]
    else:
        # GShard second choice: argmax with the first expert masked out;
        # its tokens queue AFTER all of the expert's first-choice tokens
        probs2 = probs * (1.0 - onehot)
        expert2 = jnp.argmax(probs2, axis=-1)                       # (G, n)
        gate_p2 = jnp.max(probs2, axis=-1)
        onehot2 = jax.nn.one_hot(expert2, E, dtype=jnp.float32)
        count1 = jnp.sum(onehot, axis=1, keepdims=True)             # (G, 1, E)
        pos2 = (jnp.cumsum(onehot2, axis=1) * onehot2 - onehot2
                + count1 * onehot2)
        dispatch2 = make_dispatch(onehot2, pos2)
        # normalized top-2 gates (GShard): weights sum to 1 per token
        denom = gate_p + gate_p2 + 1e-9
        combine = (dispatch * (gate_p / denom)[..., None, None]
                   + dispatch2 * (gate_p2 / denom)[..., None, None])
        dispatch = dispatch + dispatch2

    dtype = jnp.dtype(compute_dtype)
    xe = jnp.einsum("gnec,gnh->gech", dispatch.astype(dtype), xg.astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
    # flatten (group, slot) into one capacity axis so the expert GEMMs and
    # the EP sharding see the same (E, G*C, H) blocks regardless of G
    xe = xe.transpose(1, 0, 2, 3).reshape(E, G * C, H)
    if _EXPERT_CONSTRAINT is not None:
        xe = _EXPERT_CONSTRAINT(xe)
    h = jnp.einsum("ech,ehf->ecf", xe, params["w_in"].astype(dtype),
                   preferred_element_type=jnp.float32)
    h = h + params["b_in"][:, None].astype(jnp.float32)
    if gelu_exact:
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = jax.nn.gelu(h, approximate=True)
    h = h.astype(dtype)
    if _EXPERT_CONSTRAINT is not None:
        h = _EXPERT_CONSTRAINT(h)
    ye = jnp.einsum("ecf,efh->ech", h, params["w_out"].astype(dtype),
                    preferred_element_type=jnp.float32)
    ye = ye + params["b_out"][:, None].astype(jnp.float32)
    ye = ye.astype(dtype)
    if _EXPERT_CONSTRAINT is not None:
        ye = _EXPERT_CONSTRAINT(ye)
    yg = ye.reshape(E, G, C, H).transpose(1, 0, 2, 3)               # (G,E,C,H)
    y = jnp.einsum("gnec,gech->gnh", combine.astype(dtype), yg,
                   preferred_element_type=jnp.float32)

    frac_tokens = jnp.mean(onehot, axis=(0, 1))                     # (E,)
    mean_prob = jnp.mean(probs, axis=(0, 1))                        # (E,)
    balance = E * jnp.sum(frac_tokens * mean_prob)
    router_z = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
    # fraction of (token, choice) routes that overflowed capacity and fell
    # back to the residual path — the standard Switch/GShard health metric
    drop_frac = 1.0 - jnp.sum(dispatch) / (N * top_k)
    return y.reshape(N, H), {"balance": balance, "router_z": router_z,
                             "drop_frac": drop_frac}
