"""Jit'd train/eval steps.

The reference's hot loop (src/solver.py:139-193) does per-batch H2D copies,
a forward, five Python loss getters, backward, clip, step, then SIX .item()
device syncs.  Here the entire step body is ONE jit'd function with a donated
train state: forward + all losses + grad + clip + Adam + state update, no host
sync (metrics stream back as device arrays the loop reads once per epoch/log
interval).  Under a mesh the same function is pjit-sharded: batch over 'data',
params replicated (or TP-sharded), gradient allreduce emitted by XLA over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mmda_tpu.config import Config
from mmda_tpu.models.bert import BertConfig
from mmda_tpu.models.misa import Batch
from mmda_tpu.ops import losses as L
from mmda_tpu.train.objective import compute_losses
from mmda_tpu.train.state import TrainState


def _static_modality_keep(cfg: Config, batch_size: int) -> Optional[jnp.ndarray]:
    """Static missing-modality configuration (eval-time adaptation):
    'visual'/'acoustic'/'both' zero those streams for every example."""
    if cfg.missing_modality == "none":
        return None
    keep = jnp.ones((batch_size, 3))
    if cfg.missing_modality in ("visual", "both"):
        keep = keep.at[:, 1].set(0.0)
    if cfg.missing_modality in ("acoustic", "both"):
        keep = keep.at[:, 2].set(0.0)
    return keep


def _sample_modality_keep(cfg: Config, rng, batch_size: int) -> Optional[jnp.ndarray]:
    """Train-time random modality dropout (the 'dynamic adaptation' feature):
    with prob p, independently zero the visual / acoustic stream per example.
    Text is never dropped (it carries the labels' main signal)."""
    static = _static_modality_keep(cfg, batch_size)
    if cfg.missing_modality_prob <= 0.0:
        return static
    kv, ka = jax.random.split(rng)
    keep_v = jax.random.bernoulli(kv, 1.0 - cfg.missing_modality_prob, (batch_size,))
    keep_a = jax.random.bernoulli(ka, 1.0 - cfg.missing_modality_prob, (batch_size,))
    keep = jnp.stack([jnp.ones(batch_size), keep_v, keep_a], axis=1).astype(jnp.float32)
    if static is not None:
        keep = keep * static
    return keep


def _ema_update(cfg: Config, ema, params):
    """EMA shadow params: ema <- d*ema + (1-d)*params (cfg.ema_decay = d).
    Identity on None (EMA off) so the step's HLO is unchanged."""
    if ema is None or cfg.ema_decay <= 0.0:
        return ema
    d = cfg.ema_decay
    return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d),
                                  ema, params)


def _stop_frozen(params, frozen):
    """stop_gradient on FROZEN leaves before the forward.  The optimizer mask
    (optax set_to_zero) already discards their updates, but jax.grad would
    still COMPUTE their weight-gradient GEMMs (dW = x^T dy, one per frozen
    linear - ~1/3 of the BERT backward FLOPs under the mosei <=8 freeze rule,
    src/solver.py:69-73).  Zeroing the grad path here lets XLA dead-code-
    eliminate those GEMMs entirely; activation gradients still flow THROUGH
    frozen layers to trainable params below (e.g. embeddings)."""
    if frozen is None:
        return params
    return jax.tree_util.tree_map(
        lambda p, f: jax.lax.stop_gradient(p) if f else p, params, frozen)


def make_train_step(
    cfg: Config,
    tx: optax.GradientTransformation,
    forward_fn: Callable,
    bert_cfg: Optional[BertConfig] = None,
    donate: bool = True,
    conf_only: bool = False,
    frozen: Optional[Any] = None,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """conf_only=True optimizes ONLY the ConfidNet confidence loss - stage 2
    of two-stage ConfidNet training (backbone frozen by the optimizer mask).
    frozen: bool pytree matching params (True == frozen); prunes frozen
    weight-grad computation from the backward (see _stop_frozen).  grad_norm
    then measures trainable grads only."""

    def loss_fn(params, batch: Batch, rng, modality_keep):
        out = forward_fn(
            _stop_frozen(params, frozen), cfg, batch, bert_cfg=bert_cfg,
            deterministic=False, rng=rng, modality_keep=modality_keep,
        )
        losses = compute_losses(cfg, out, batch)
        total = losses["conf"] if conf_only else losses["total"]
        return total, losses

    def step(state: TrainState, batch: Batch):
        rng, r_drop, r_model = jax.random.split(state.rng, 3)
        keep = _sample_modality_keep(cfg, r_drop, batch.emo_label.shape[0])
        grads, losses = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, r_model, keep
        )
        losses = dict(losses, grad_norm=optax.global_norm(grads))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng,
            ema_params=_ema_update(cfg, state.ema_params, params),
        )
        return new_state, losses

    if donate:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(step)


def make_train_epoch(
    cfg: Config,
    tx: optax.GradientTransformation,
    forward_fn: Callable,
    bert_cfg: Optional[BertConfig] = None,
    frozen: Optional[Any] = None,
) -> Callable:
    """Compiled multi-step training: `lax.scan` over a stacked epoch of
    batches -> ONE dispatch for the whole epoch (no per-step host round trip;
    the fully device-resident loop the reference's per-batch Python loop can
    never be).  `batches` is a Batch whose leaves carry a leading step axis.
    Requires one bucket shape per call site."""

    def loss_fn(params, batch: Batch, rng, modality_keep):
        out = forward_fn(
            _stop_frozen(params, frozen), cfg, batch, bert_cfg=bert_cfg,
            deterministic=False, rng=rng, modality_keep=modality_keep,
        )
        losses = compute_losses(cfg, out, batch)
        return losses["total"], losses

    def body(state: TrainState, batch: Batch):
        rng, r_drop, r_model = jax.random.split(state.rng, 3)
        keep = _sample_modality_keep(cfg, r_drop, batch.emo_label.shape[0])
        grads, losses = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, r_model, keep
        )
        # keep the loss-dict keys identical to make_train_step's: an epoch can
        # mix scanned chunks with per-step remainder batches, and the epoch
        # aggregation iterates one dict's keys across both
        losses = dict(losses, grad_norm=optax.global_norm(grads))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, rng=rng,
                          ema_params=_ema_update(cfg, state.ema_params,
                                                 params)), losses

    def epoch(state: TrainState, batches: Batch):
        return jax.lax.scan(body, state, batches)

    return jax.jit(epoch, donate_argnums=(0,))


def _make_eval_body(
    cfg: Config,
    forward_fn: Callable,
    bert_cfg: Optional[BertConfig] = None,
) -> Callable[[Any, Batch], Dict[str, jnp.ndarray]]:
    """The raw (unjitted) eval step body, shared by make_eval_step (jit per
    batch) and make_eval_epoch (scanned) so the two paths cannot diverge.

    Deterministic forward returning everything host-side eval needs:
    binarized labels, scores, and the cls loss computed with exact reference
    semantics (per-class batch-mean BCE summed over classes,
    src/solver.py:353-356).  Static missing-modality zeroing applies here too
    (the eval half of the adaptation feature)."""

    def step(params, batch: Batch):
        keep = _static_modality_keep(cfg, batch.emo_label.shape[0])
        out = forward_fn(
            params, cfg, batch, bert_cfg=bert_cfg,
            deterministic=True, modality_keep=keep,
        )
        if cfg.resolved_task() == "regression":
            err = jnp.abs(out.scores[:, 0] - batch.sentiment)
            cls_loss = jnp.mean(err)
            bce = err[:, None]                       # (B, 1) per-example L1
        else:
            cls_loss = L.bce_sum_over_classes(out.scores, batch.emo_label)
            # per-example-per-class BCE so the host can aggregate with exact
            # reference semantics over REAL rows when the last batch is padded
            p = out.scores.astype(jnp.float32)
            t = batch.emo_label.astype(jnp.float32)
            log_p = jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100.0)
            log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 0.0)), -100.0)
            bce = -(t * log_p + (1.0 - t) * log_1p)
        return {
            "scores": out.scores,
            "labels": out.labels,
            "tcp": out.tcp,
            "cls_loss": cls_loss,
            "bce": bce,
        }

    return step


def make_eval_step(
    cfg: Config,
    forward_fn: Callable,
    bert_cfg: Optional[BertConfig] = None,
) -> Callable[[Any, Batch], Dict[str, jnp.ndarray]]:
    """jit'd single-batch eval step (see _make_eval_body)."""
    return jax.jit(_make_eval_body(cfg, forward_fn, bert_cfg))


def make_eval_epoch(
    cfg: Config,
    forward_fn: Callable,
    bert_cfg: Optional[BertConfig] = None,
) -> Callable[[Any, Batch], Dict[str, jnp.ndarray]]:
    """Scanned eval over stacked same-shape batches: ONE device dispatch and
    ONE host readback per bucket group instead of one per batch.  Through the
    axon relay each dispatch+readback pair costs ~60-90 ms, which dominated
    the epoch-level eval time (benchmarks/bench_epoch.py); the scan removes
    it.  Returns the same dict as make_eval_step with a leading batch-count
    axis on every leaf."""
    inner = _make_eval_body(cfg, forward_fn, bert_cfg)

    @jax.jit
    def epoch(params, batches: Batch):
        def body(carry, b):
            return carry, inner(params, b)

        _, outs = jax.lax.scan(body, None, batches)
        return outs

    return epoch
