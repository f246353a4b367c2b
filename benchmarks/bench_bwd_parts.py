"""Round-3 backward/step ablations on the real TPU (VERDICT r2 next #1).

The relay exposes no xprof, so the unprofiled ~11 ms backward is attributed by
ablation, same trusted methodology as bench_anatomy.py (scan of N steps inside
one dispatch, forced loss readback, median of reps).  Variants:

  base            production step (rbg dropout, Pallas towers, Adam, frozen<=8)
  det             dropout fully OFF (deterministic fwd in the train step):
                  upper bound on everything dropout costs, fwd+bwd
  drop_recompute  custom-vjp dropout - masks regenerated in bwd from the key
                  instead of saved as residuals (BertConfig.dropout_recompute)
  remat           jax.checkpoint per BERT layer (BertConfig.remat)
  recompute_remat both of the above
  attn_fused      Pallas short-seq attention kernel fwd+bwd (re-measure with
                  the round-2 tower kernels now default)
  gelu_tanh       tanh GELU (informational: known -1.07 ms fwd, parity flag)

  --batches       also re-measure batch scaling at B=128/256 with the current
                  kernel set (the round-2 B=256 row predates rbg + towers)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_bwd_parts.py \
      [--variants base,det,...] [--batches] [--steps 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_time(fn, state, batches, reps=3):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,det,drop_recompute,remat,"
                                          "recompute_remat,attn_fused")
    ap.add_argument("--batches", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    variants = args.variants.split(",") if args.variants else []

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mmda_tpu.config import Config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.models import Batch, get_model
    from mmda_tpu.models.bert import BertConfig, frozen_mask
    from mmda_tpu.train.state import create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_epoch

    T = 48
    n_steps = args.steps
    base_cfg = Config(use_bert=True, batch_size=64, max_seq_len=T,
                      compute_dtype="bfloat16", data="mosei", name="bwdparts")

    from mmda_tpu.ops import pallas as pallas_flags
    pallas_flags.set_enabled(
        base_cfg.use_pallas and jax.default_backend() == "tpu")

    init_fn, fwd_fn = get_model(base_cfg.model)

    def make_batches(B, n):
        splits = []
        for s in range(n):
            sp = make_split(SyntheticSpec(num_examples=B, max_len=T, seed=s))
            sp["lengths"][:] = T
            sp["bert_mask"][:] = 1
            splits.append(sp)
        return Batch(**{
            k: jax.device_put(jnp.stack([jnp.asarray(s[k]) for s in splits]))
            for k in splits[0]
        })

    def run(name, B, bert_cfg, deterministic=False, attn=None):
        cfg = base_cfg.replace(batch_size=B)
        if attn is not None:
            cfg = cfg.replace(attn_impl=attn)
        params0 = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
        frozen = jax.tree_util.tree_map(lambda _: False, params0)
        frozen["bert"] = frozen_mask(params0["bert"], max_frozen_layer=8)
        tx = make_optimizer(cfg, frozen)
        if deterministic:
            # custom epoch builder mirroring make_train_epoch but with the
            # forward forced deterministic
            import optax

            from mmda_tpu.train.objective import compute_losses
            from mmda_tpu.train.state import TrainState

            def loss_fn(p, batch, rng):
                from mmda_tpu.train.step import _stop_frozen
                out = fwd_fn(_stop_frozen(p, frozen), cfg, batch,
                             bert_cfg=bert_cfg,
                             deterministic=True, rng=rng)
                losses = compute_losses(cfg, out, batch)
                return losses["total"], losses

            def body(state, batch):
                rng, r_model = jax.random.split(state.rng)
                grads, losses = jax.grad(loss_fn, has_aux=True)(
                    state.params, batch, r_model)
                losses = dict(losses, grad_norm=optax.global_norm(grads))
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(step=state.step + 1, params=params,
                                  opt_state=opt_state, rng=rng), losses

            epoch = jax.jit(lambda st, bs: jax.lax.scan(body, st, bs),
                            donate_argnums=(0,))
        else:
            epoch = make_train_epoch(cfg, tx, fwd_fn, bert_cfg, frozen=frozen)
        state = create_train_state(cfg, params0, jax.random.PRNGKey(1),
                                   frozen, tx=tx)
        n = n_steps if B == 64 else max(n_steps // 2, 5)
        dt = median_time(epoch, state, make_batches(B, n))
        per = dt / n * 1e3
        print(f"{name:18s} B={B:<4d} {per:8.2f} ms/step "
              f"{B / (dt / n):9.0f} utt/s", flush=True)

    bb = BertConfig.base()
    todo = {
        "base": lambda: run("base", 64, bb),
        "det": lambda: run("det", 64, bb, deterministic=True),
        "drop_recompute": lambda: run(
            "drop_recompute", 64,
            BertConfig(dropout_recompute=True)),
        "drop_u8": lambda: run("drop_u8", 64, BertConfig(dropout_bits=8)),
        # decomposition: which dropout site carries the ~6 ms?
        "attn_drop_off": lambda: run("attn_drop_off", 64,
                                     BertConfig(attention_dropout=0.0)),
        "hidden_drop_off": lambda: run("hidden_drop_off", 64,
                                       BertConfig(hidden_dropout=0.0)),
        "drop_u8_recompute": lambda: run(
            "drop_u8_recompute", 64,
            BertConfig(dropout_bits=8, dropout_recompute=True)),
        "remat": lambda: run("remat", 64, BertConfig(remat=True)),
        "recompute_remat": lambda: run(
            "recompute_remat", 64,
            BertConfig(dropout_recompute=True, remat=True)),
        "attn_fused": lambda: run("attn_fused", 64, bb, attn="fused"),
        "gelu_tanh": lambda: run("gelu_tanh", 64,
                                 BertConfig(gelu_exact=False)),
        "emb_onehot": lambda: run(
            "emb_onehot", 64, BertConfig(embed_grad_matmul=True)),
        "attn_bf16drop": lambda: run(
            "attn_bf16drop", 64, BertConfig(attn_probs_bf16_dropout=True)),
        # best-known composite candidate for the headline
        "combo": lambda: run(
            "combo", 64, BertConfig(dropout_bits=8, dropout_recompute=True,
                                    embed_grad_matmul=True,
                                    attn_probs_bf16_dropout=True)),
    }
    for v in variants:
        todo[v]()
    if args.batches:
        for B in (128, 256):
            run("base", B, bb)


if __name__ == "__main__":
    main()
