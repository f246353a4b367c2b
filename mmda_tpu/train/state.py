"""Train state: one restorable pytree (params, optimizer state, step, PRNG key).

Replaces the reference's scattered state (model.state_dict + optimizer.state_dict
saved separately, never restored together - src/solver.py:218-223).  The whole
struct checkpoints/restores atomically (SURVEY.md §5 checkpoint/resume plan).

Optimizer parity with src/solver.py:97-99,185-186:
  * element-wise gradient value clipping at cfg.clip (torch clip_grad_value_)
  * Adam(lr) with torch defaults (betas 0.9/0.999, eps 1e-8) or RMSprop
  * NO weight decay (the reference parses it but never applies it)
  * frozen params (BERT layers <= 8 on mosei, src/solver.py:69-73) get
    set_to_zero updates and carry no optimizer state.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mmda_tpu.config import Config


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


def _base_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.optimizer == "Adam":
        opt = optax.adam(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    elif cfg.optimizer == "AdamW":
        opt = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "RMSprop":
        # torch RMSprop defaults: alpha=0.99, eps=1e-8, no momentum/centering
        opt = optax.rmsprop(cfg.learning_rate, decay=0.99, eps=1e-8)
    elif cfg.optimizer == "SGD":
        opt = optax.sgd(cfg.learning_rate)
    else:
        raise ValueError(cfg.optimizer)
    chain = [optax.clip(cfg.clip), opt]
    if cfg.apply_weight_decay and cfg.optimizer not in ("AdamW",):
        chain.insert(1, optax.add_decayed_weights(cfg.weight_decay))
    return optax.chain(*chain)


def make_optimizer(
    cfg: Config, frozen: Optional[Any] = None
) -> optax.GradientTransformation:
    """frozen: pytree of bools (True == frozen), same structure as params.
    grad_accum_steps > 1 wraps in optax.MultiSteps (microbatching: updates
    apply every k-th step with the mean gradient)."""
    base = _base_optimizer(cfg)
    if frozen is not None:
        labels = jax.tree_util.tree_map(lambda f: "frozen" if f else "train", frozen)
        base = optax.multi_transform(
            {"train": base, "frozen": optax.set_to_zero()}, labels
        )
    if cfg.grad_accum_steps > 1:
        base = optax.MultiSteps(base, every_k_schedule=cfg.grad_accum_steps)
    return base


def create_train_state(
    cfg: Config,
    params: Any,
    rng: jax.Array,
    frozen: Optional[Any] = None,
) -> TrainState:
    tx = make_optimizer(cfg, frozen)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
    )


def trainable_param_count(params: Any, frozen: Optional[Any] = None) -> Dict[str, int]:
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if frozen is None:
        return {"total": total, "trainable": total}
    leaves = jax.tree_util.tree_leaves(params)
    flags = jax.tree_util.tree_leaves(frozen)
    trainable = sum(x.size for x, f in zip(leaves, flags) if not f)
    return {"total": total, "trainable": trainable}
