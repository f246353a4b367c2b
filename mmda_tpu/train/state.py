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
    ema_params: Any = None   # EMA shadow of params when cfg.ema_decay > 0
                             # (updated in the train step; eval/serving read
                             # it via Trainer.eval_params) — None when off,
                             # which jax treats as an empty subtree so every
                             # existing construction/donation site is
                             # unaffected


def _base_optimizer(cfg: Config, steps_per_epoch: Optional[int] = None
                    ) -> optax.GradientTransformation:
    lr = cfg.learning_rate
    if cfg.lr_schedule in ("exponential", "cosine") and not steps_per_epoch:
        # Silently falling back to a constant lr would ignore a schedule the
        # user explicitly requested (ADVICE r2): fail loudly instead.
        raise ValueError(
            f"lr_schedule={cfg.lr_schedule!r} needs steps_per_epoch to size "
            "its decay horizon; pass steps_per_epoch=len(train_loader)")
    if cfg.lr_schedule == "exponential":
        # per-epoch staircase decay (the ExponentialLR the reference creates
        # but never steps, src/solver.py:122)
        lr = optax.exponential_decay(
            cfg.learning_rate, transition_steps=steps_per_epoch,
            decay_rate=cfg.lr_decay_rate, staircase=True, end_value=cfg.min_lr)
    elif cfg.lr_schedule == "cosine":
        # warmup + cosine decay to min_lr over the full run (net-new knob;
        # the standard production schedule the reference lacks entirely)
        total = max(steps_per_epoch * cfg.n_epoch, cfg.warmup_steps + 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps, decay_steps=total,
            end_value=cfg.min_lr)

    # cfg.adam_mu_dtype='bfloat16' stores the first moment in bf16 (optax
    # mu_dtype): halves m's HBM read+write per step.  nu stays f32 — see the
    # numerics note on the config knob (b2=0.999 increments underflow bf16's
    # ulp and the EMA freezes).
    mu_dtype = jnp.bfloat16 if cfg.adam_mu_dtype == "bfloat16" else None
    makers = {
        "Adam": lambda lr: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8,
                                      mu_dtype=mu_dtype),
        "AdamW": lambda lr: optax.adamw(lr, weight_decay=cfg.weight_decay,
                                        mu_dtype=mu_dtype),
        # torch RMSprop defaults: alpha=0.99, eps=1e-8, no momentum/centering
        "RMSprop": lambda lr: optax.rmsprop(lr, decay=0.99, eps=1e-8),
        "SGD": lambda lr: optax.sgd(lr),
    }
    try:
        maker = makers[cfg.optimizer]
    except KeyError:
        raise ValueError(cfg.optimizer)

    if cfg.lr_schedule == "plateau":
        # mutable learning rate: the Trainer halves it on dev-loss plateaus
        # (the ReduceLROnPlateau the reference creates but never steps,
        # src/solver.py:100)
        opt = optax.inject_hyperparams(maker)(lr=cfg.learning_rate)
    else:
        opt = maker(lr)

    chain = [optax.clip(cfg.clip), opt]
    if cfg.apply_weight_decay and cfg.optimizer not in ("AdamW",):
        chain.insert(1, optax.add_decayed_weights(cfg.weight_decay))
    return optax.chain(*chain)


def _walk_hyperparams(node, fn):
    if hasattr(node, "hyperparams") and isinstance(node.hyperparams, dict):
        hp = dict(node.hyperparams)
        for k in hp:
            hp[k] = fn(k, hp[k])
        return node._replace(hyperparams=hp)
    if isinstance(node, tuple) and hasattr(node, "_fields"):
        return type(node)(*[_walk_hyperparams(x, fn) for x in node])
    if isinstance(node, tuple):
        return tuple(_walk_hyperparams(x, fn) for x in node)
    if isinstance(node, list):
        return [_walk_hyperparams(x, fn) for x in node]
    if isinstance(node, dict):
        return {k: _walk_hyperparams(v, fn) for k, v in node.items()}
    return node


def set_learning_rate(opt_state, new_lr: float):
    """Overwrite every injected 'lr' hyperparameter in an optimizer state
    (plateau schedule support)."""
    import jax.numpy as jnp

    def fn(k, v):
        if k == "lr":
            return jnp.asarray(new_lr, jnp.asarray(v).dtype)
        return v

    return _walk_hyperparams(opt_state, fn)


def get_learning_rate(opt_state) -> Optional[float]:
    found = []

    def fn(k, v):
        if k == "lr":
            found.append(float(v))
        return v

    _walk_hyperparams(opt_state, fn)
    return found[0] if found else None


def make_optimizer(
    cfg: Config, frozen: Optional[Any] = None,
    steps_per_epoch: Optional[int] = None,
) -> optax.GradientTransformation:
    """frozen: pytree of bools (True == frozen), same structure as params.
    grad_accum_steps > 1 wraps in optax.MultiSteps (microbatching: updates
    apply every k-th step with the mean gradient).  steps_per_epoch drives the
    exponential lr schedule."""
    base = _base_optimizer(cfg, steps_per_epoch)
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
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    tx = tx if tx is not None else make_optimizer(cfg, frozen)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
        # REAL copies, not aliases: the donated train step would otherwise
        # see every param buffer twice ("attempt to donate the same buffer
        # twice") because params and the shadow share leaves
        ema_params=(jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                           params)
                    if cfg.ema_decay > 0 else None),
    )


def trainable_param_count(params: Any, frozen: Optional[Any] = None) -> Dict[str, int]:
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if frozen is None:
        return {"total": total, "trainable": total}
    leaves = jax.tree_util.tree_leaves(params)
    flags = jax.tree_util.tree_leaves(frozen)
    trainable = sum(x.size for x, f in zip(leaves, flags) if not f)
    return {"total": total, "trainable": trainable}
