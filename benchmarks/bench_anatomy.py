"""Step-anatomy ablations on the real TPU (one process, shared tunnel).

The axon relay exposes no xprof, so attribution comes from ablation timing:
each variant reuses the trusted methodology (scan of N steps, host readback,
median of reps).  Variants:

  base        full train epoch (current production step)
  fwd_only    forward + losses only (no grad, no optimizer)
  fwd_bwd     forward + backward (grads materialized, no optimizer update)
  no_freeze   everything trainable (measures what frozen-layer DCE saves)
  sgd         Adam -> plain SGD (measures Adam state traffic)
  ln_bf16     LayerNorm internals in bf16 (measures the fp32 LN round trips)

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_anatomy.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_time(fn, state, batches, reps=3):
    # the epoch fn donates its state argument: thread it through every call
    state, losses = fn(state, batches)      # warmup/compile
    _ = float(np.asarray(losses["total"]).ravel()[-1])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = fn(state, batches)
        _ = float(np.asarray(losses["total"]).ravel()[-1])
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import BertConfig, frozen_mask
    from mmda_tpu.train.objective import compute_losses
    from mmda_tpu.train.state import create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_epoch

    B, T = 64, 48
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    cfg = Config(use_bert=True, batch_size=B, max_seq_len=T,
                 compute_dtype="bfloat16", data="mosei", name="anatomy")
    bert_cfg = BertConfig.base()

    # production kernel routing, mirroring Trainer/bench.py
    from mmda_tpu.ops import pallas as pallas_flags
    pallas_flags.set_enabled(cfg.use_pallas and jax.default_backend() == "tpu")

    def make_batch(seed):
        split = make_split(SyntheticSpec(num_examples=B, max_len=T, seed=seed))
        split["lengths"][:] = T
        split["bert_mask"][:] = 1
        return split

    splits = [make_batch(s) for s in range(n_steps)]
    batches = Batch(**{
        k: jax.device_put(jnp.stack([jnp.asarray(s[k]) for s in splits]))
        for k in splits[0]
    })

    init_fn, fwd_fn = get_model(cfg.model)
    params0 = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    # donated epochs delete their state buffers: keep a host copy and give
    # every variant fresh device arrays
    params_host = jax.tree_util.tree_map(np.asarray, params0)

    def fresh_params():
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x)), params_host)

    frozen = jax.tree_util.tree_map(lambda _: False, params0)
    frozen["bert"] = frozen_mask(params0["bert"], max_frozen_layer=8)

    results = {}

    # ---- base ----
    tx = make_optimizer(cfg, frozen)
    epoch = make_train_epoch(cfg, tx, fwd_fn, bert_cfg, frozen=frozen)
    results["base"] = median_time(
        epoch,
        create_train_state(cfg, fresh_params(), jax.random.PRNGKey(1), frozen),
        batches)

    # ---- fwd_only ----
    def fwd_epoch(state, batches):
        def body(carry, batch):
            rng, _ = jax.random.split(carry)
            out = fwd_fn(state.params, cfg, batch, bert_cfg=bert_cfg,
                         deterministic=False, rng=rng)
            return rng, compute_losses(cfg, out, batch)
        _, losses = jax.lax.scan(body, state.rng, batches)
        return state, losses
    results["fwd_only"] = median_time(
        jax.jit(fwd_epoch),
        create_train_state(cfg, fresh_params(), jax.random.PRNGKey(1), frozen),
        batches)

    # ---- fwd_bwd (grads computed, no update) ----
    def fwd_bwd_epoch(state, batches):
        def loss_fn(p, batch, rng):
            out = fwd_fn(p, cfg, batch, bert_cfg=bert_cfg,
                         deterministic=False, rng=rng)
            l = compute_losses(cfg, out, batch)
            return l["total"], l
        def body(carry, batch):
            rng, _ = jax.random.split(carry)
            grads, losses = jax.grad(loss_fn, has_aux=True)(
                state.params, batch, rng)
            losses = dict(losses, grad_norm=optax.global_norm(grads))
            return rng, losses
        _, losses = jax.lax.scan(body, state.rng, batches)
        return state, losses
    results["fwd_bwd"] = median_time(
        jax.jit(fwd_bwd_epoch),
        create_train_state(cfg, fresh_params(), jax.random.PRNGKey(1), frozen),
        batches)

    # ---- no_freeze ----
    tx_nf = make_optimizer(cfg, None)
    state_nf = create_train_state(cfg, fresh_params(), jax.random.PRNGKey(1), None)
    epoch_nf = make_train_epoch(cfg, tx_nf, fwd_fn, bert_cfg, frozen=None)
    results["no_freeze"] = median_time(epoch_nf, state_nf, batches)

    # ---- sgd ----
    cfg_sgd = cfg.replace(optimizer="SGD")
    tx_sgd = make_optimizer(cfg_sgd, frozen)
    state_sgd = create_train_state(cfg_sgd, fresh_params(), jax.random.PRNGKey(1),
                                   frozen, tx=tx_sgd)
    epoch_sgd = make_train_epoch(cfg_sgd, tx_sgd, fwd_fn, bert_cfg,
                                 frozen=frozen)
    results["sgd"] = median_time(epoch_sgd, state_sgd, batches)

    for name, dt in results.items():
        per = dt / n_steps * 1e3
        print(f"{name:10s} {per:8.2f} ms/step   {B / (dt / n_steps):8.0f} utt/s")


if __name__ == "__main__":
    main()
